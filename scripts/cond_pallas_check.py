"""On-chip regression check: pallas_call inside lax.cond (VERDICT r4 #5).

Round 4 observed WRONG RENDERS when V5S's cleanup pass (a pallas_call)
was wrapped in lax.cond on the axon v5e backend, while interpret-mode
parity stayed green; the workaround made the pass unconditional
(dense_v5.py dense_trace_v5s NOTE). This script isolates the construct at
increasing fidelity and compares cond-gated vs unconditional results ON
CHIP:

  probe 1: tiny elementwise pallas kernel inside lax.cond(True)
  probe 2: the REAL v5l kernel traced inside lax.cond(pred) where pred is
           data-dependent (like the cleanup round's "any ray unresolved")
  probe 3: probe 2 preceded by an argsort+gather permutation of the rays
           (the state shape V5S feeds the cleanup pass)
  probe 4: the full V5S with cond_cleanup=True vs False (subdiv=5,
           CP_N=524288 by default for this probe) — the PINNED repro:
           round-5 measurement shows probes 1-3 PASS at any size while
           probe 4 fails deterministically (494439/524288 prim
           mismatches, hit/miss counts conserved but values on wrong
           lanes -> a layout/packing corruption around the cond).

Exit code 0 = all probes match (the miscompile is gone; the conditional
cleanup could be re-enabled), 1 = mismatch (status quo: keep the
unconditional cleanup workaround in dense_trace_v5s).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe1():
    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0 + 1.0

    def call(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x)

    @jax.jit
    def gated(x, pred):
        return lax.cond(pred, call, lambda v: v, x)

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    a = np.asarray(jax.jit(call)(x))
    b = np.asarray(gated(x, jnp.bool_(True)))
    return np.array_equal(a, b), float(np.abs(a - b).max())


def _scene_and_rays(n=int(os.environ.get("CP_N", "4096")), subdiv=4):
    from pbrlab_tpu.scene.demo import build_demo_scene
    from pbrlab_tpu.scene.scene import scene_to_device

    scene_np, _ = build_demo_scene(subdiv=subdiv)
    scene = scene_to_device(scene_np)
    g = np.random.default_rng(11)
    bmin, bmax = np.asarray(scene_np["aabb_min"]), np.asarray(
        scene_np["aabb_max"])
    org = bmin + g.random((n, 3)).astype(np.float32) * (bmax - bmin)
    d = g.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return scene, (jnp.asarray(org), jnp.asarray(d),
                   jnp.zeros((n,), jnp.float32),
                   jnp.full((n,), 1e30, jnp.float32))


def probe2():
    from pbrlab_tpu.ops.pallas.dense_v5 import dense_trace_v5l

    scene, (org, d, mn, mx) = _scene_and_rays()
    if "dense_tris_v5l" not in scene:
        return True, 0.0  # scene too small for the v5l tables

    def trace(org, d, mn, mx):
        r = dense_trace_v5l(scene["dense_tris_v5l"], scene["v5_node_aabb"],
                            scene["v5_node_meta"], org, d, mn, mx)
        return r["t"], r["prim"]

    @jax.jit
    def gated(org, d, mn, mx):
        # data-dependent predicate, true at runtime (like "any ray
        # unresolved" in the v5s cleanup round)
        pred = jnp.sum(mx) > 0.0
        return lax.cond(pred, lambda a: trace(*a),
                        lambda a: (jnp.zeros_like(a[2]) - 1.0,
                                   jnp.zeros_like(a[2], jnp.int32)),
                        (org, d, mn, mx))

    a_t, a_p = jax.jit(trace)(org, d, mn, mx)
    b_t, b_p = gated(org, d, mn, mx)
    ok = (np.array_equal(np.asarray(a_p), np.asarray(b_p))
          and np.array_equal(np.asarray(a_t), np.asarray(b_t)))
    mism = int((np.asarray(a_p) != np.asarray(b_p)).sum())
    return ok, mism


def probe3():
    from pbrlab_tpu.ops.pallas.dense_v5 import dense_trace_v5l

    scene, (org, d, mn, mx) = _scene_and_rays()
    if "dense_tris_v5l" not in scene:
        return True, 0.0

    def run(org, d, mn, mx, cond_gate):
        # permuted-carry shape like v5s: sort by a key, gather the fat
        # state, then (maybe cond-gated) kernel pass, then un-permute
        key = (org[:, 0] * 37.1 + d[:, 1]).astype(jnp.float32)
        perm = jnp.argsort(key)
        st = jnp.concatenate([org, d, mn[:, None], mx[:, None]],
                             axis=1)[perm]
        o2, d2, mn2, mx2 = st[:, 0:3], st[:, 3:6], st[:, 6], st[:, 7]

        def trace(a):
            r = dense_trace_v5l(scene["dense_tris_v5l"],
                                scene["v5_node_aabb"],
                                scene["v5_node_meta"], *a)
            return r["t"], r["prim"]

        if cond_gate:
            pred = jnp.sum(mx2) > 0.0
            t, p = lax.cond(pred, trace,
                            lambda a: (jnp.zeros_like(a[2]) - 1.0,
                                       jnp.zeros_like(a[2], jnp.int32)),
                            (o2, d2, mn2, mx2))
        else:
            t, p = trace((o2, d2, mn2, mx2))
        inv = jnp.argsort(perm)
        return t[inv], p[inv]

    a_t, a_p = jax.jit(functools.partial(run, cond_gate=False))(org, d, mn,
                                                                mx)
    b_t, b_p = jax.jit(functools.partial(run, cond_gate=True))(org, d, mn,
                                                               mx)
    ok = (np.array_equal(np.asarray(a_p), np.asarray(b_p))
          and np.array_equal(np.asarray(a_t), np.asarray(b_t)))
    mism = int((np.asarray(a_p) != np.asarray(b_p)).sum())
    return ok, mism


def probe4():
    from pbrlab_tpu.ops.pallas.dense_v5 import dense_trace_v5s
    from pbrlab_tpu.scene.demo import build_demo_scene

    scene_np, _ = build_demo_scene(subdiv=5)
    n = int(os.environ.get("CP_N4", "524288"))
    g = np.random.default_rng(0)
    lo, hi = scene_np["aabb_min"], scene_np["aabb_max"]
    org = jnp.asarray(lo + (hi - lo) * g.random((n, 3)), jnp.float32)
    d = g.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    mn = jnp.zeros((n,), jnp.float32)
    mx = jnp.full((n,), 1e18, jnp.float32)
    args = (jnp.asarray(scene_np["dense_tris_v5l"]),
            jnp.asarray(scene_np["v5_node_aabb"]),
            jnp.asarray(scene_np["v5_node_meta"]),
            jnp.asarray(scene_np["v5s_roots"]),
            jnp.asarray(scene_np["v5s_aabb"]), org, d, mn, mx)
    a = dense_trace_v5s(*args, passes=1, cond_cleanup=False)
    b = dense_trace_v5s(*args, passes=1, cond_cleanup=True)
    mism = int((np.asarray(a["prim"]) != np.asarray(b["prim"])).sum())
    return mism == 0, mism


def main():
    bad = False
    for name, fn in [("tiny-elementwise", probe1),
                     ("v5l-in-cond", probe2),
                     ("sorted-state-v5l-in-cond", probe3),
                     ("full-v5s-cond-cleanup", probe4)]:
        ok, detail = fn()
        print(f"{name:28s} {'OK' if ok else 'MISMATCH'} ({detail})",
              file=sys.stderr)
        bad |= not ok
    print("MISCOMPILE REPRODUCED" if bad else "all probes match",
          file=sys.stderr)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
