"""Scale bench: v5l (whole-tree packet) vs v5s (subtree-scheduled) on
large scenes with incoherent rays — the round-3 collapse regime
(ARCHITECTURE.md scale table; targets: >=10 Mray/s at ~42k tris,
>=5 at ~164k).

Pattern per the measured backend quirks: compile every program first,
burn one sacrificial execution, then execute each program ONCE with the
work amplified KB_ITERS-fold inside one jit (data-dependent scan).

Env: KB_SUBDIV (5), KB_N (1<<19), KB_ITERS (4), KB_PASSES (1), KB_CUT (64),
KB_IRREGULAR (1: noise-displaced bodies — the geodesic sphere is SAH
best-case; round-4 verdict Missing #4).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pbrlab_tpu.ops.pallas.dense_v5 import (dense_trace_v5l,
                                            dense_trace_v5s, leaf_major,
                                            subtree_cut)
from pbrlab_tpu.scene.demo import build_demo_scene

SUBDIV = int(os.environ.get("KB_SUBDIV", "5"))
N = int(os.environ.get("KB_N", 1 << 19))
ITERS = int(os.environ.get("KB_ITERS", "4"))
PASSES = int(os.environ.get("KB_PASSES", "1"))
CUT = int(os.environ.get("KB_CUT", "64"))
IRREGULAR = os.environ.get("KB_IRREGULAR", "1") == "1"


def main():
    scene_np, _ = build_demo_scene(subdiv=SUBDIV, irregular=IRREGULAR)
    packed = scene_np["dense_tris_v4"]
    naabb = jnp.asarray(scene_np["v5_node_aabb"])
    nmeta = jnp.asarray(scene_np["v5_node_meta"])
    pl_ = jnp.asarray(scene_np.get("dense_tris_v5l",
                                   leaf_major(np.asarray(packed))))
    roots, sub_aabb = subtree_cut(np.asarray(scene_np["v5_node_aabb"]),
                                  np.asarray(scene_np["v5_node_meta"]),
                                  max_nodes=CUT)
    roots = jnp.asarray(roots)
    sub_aabb = jnp.asarray(sub_aabb)
    ntris = int(scene_np["tri_v0"].shape[0])
    print(f"subdiv={SUBDIV} irregular={IRREGULAR} tris={ntris} slots={packed.shape[1]} "
          f"cut={roots.shape[0]} N={N} iters={ITERS} passes={PASSES}",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    lo, hi = scene_np["aabb_min"], scene_np["aabb_max"]
    org = jnp.asarray((lo + (hi - lo) * rng.random((N, 3))), jnp.float32)
    d = rng.normal(size=(N, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    mint = jnp.zeros((N,), jnp.float32)
    maxt = jnp.full((N,), 1e18, jnp.float32)

    def make(fn):
        def looped(org, d, mint, maxt):
            def body(carry, _):
                o = org + carry * 1e-30
                res = fn(o, d, mint, maxt)
                return jnp.minimum(res["t"], 1e6).sum() * 1e-30, None

            out, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(ITERS))
            return out

        f = jax.jit(looped)
        f.lower(org, d, mint, maxt).compile()
        return f

    def v5l(o, dd, mn, mx):
        return dense_trace_v5l(pl_, naabb, nmeta, o, dd, mn, mx)

    def v5s(o, dd, mn, mx):
        return dense_trace_v5s(pl_, naabb, nmeta, roots, sub_aabb,
                               o, dd, mn, mx, passes=PASSES)

    def v5s_any(o, dd, mn, mx):
        return dense_trace_v5s(pl_, naabb, nmeta, roots, sub_aabb,
                               o, dd, mn, jnp.minimum(mx, 1.0),
                               any_hit=True, passes=PASSES)

    jobs = []
    for tag, fn in (("v5l", v5l), ("v5s", v5s), ("v5s-any", v5s_any)):
        t0 = time.perf_counter()
        jobs.append((tag, make(fn)))
        print(f"compiled {tag} ({time.perf_counter() - t0:.0f}s)",
              file=sys.stderr)

    sac = jax.jit(lambda x: x.sum() + jnp.ones((1 << 20,)).sum())
    np.asarray(sac(mint))

    # correctness spot check (single execution each, fresh programs)
    a = jax.jit(v5l).lower(org, d, mint, maxt).compile()(org, d, mint, maxt)
    b = jax.jit(v5s).lower(org, d, mint, maxt).compile()(org, d, mint, maxt)
    mism = int((np.asarray(a["prim"]) != np.asarray(b["prim"])).sum())
    print(f"v5l-vs-v5s prim mismatches: {mism}/{N}", file=sys.stderr)

    for tag, f in jobs:
        t0 = time.perf_counter()
        np.asarray(f(org, d, mint, maxt))
        dt = time.perf_counter() - t0
        print(f"{tag:8s} {dt:7.2f} s  {N * ITERS / dt / 1e6:6.2f} Mray/s",
              file=sys.stderr)


if __name__ == "__main__":
    main()
