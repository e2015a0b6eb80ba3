"""Per-stage budget of one wavefront step on TPU (round-3 verdict #1).

XLA fuses the whole step, so timing a stage in isolation mis-states its
cost inside the fused program. The honest budget is DIFFERENCED: time the
full step, then the step with one stage ablated (PBRLAB_ABLATE flags read
at trace time inside wavefront_step), and subtract. Every probe loops the
step INNER times inside ONE jit with a data dependency and subtracts the
re-measured axon tunnel floor (~25-30 ms fixed dispatch+fetch, drifts
with host load — single dispatches under ~50 ms are pure noise).

Env: SP_LANES (default 65536), SP_INNER (default 16),
PBRLAB_TRACE_BACKEND.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pbrlab_tpu.render.integrator import (compact_state, init_state,
                                          wavefront_step)
from pbrlab_tpu.scene.demo import build_demo_scene
from pbrlab_tpu.scene.scene import build_fat_tables, scene_to_device

N = int(os.environ.get("SP_LANES", "65536"))
SIDE = int(np.sqrt(N))
INNER = int(os.environ.get("SP_INNER", "16"))

ABLATIONS = [
    ("full", ""),
    ("-trace", "notrace"),
    ("-shadow", "noshadow"),
    ("-nee(all)", "nonee"),
    ("-closure", "noclosure"),
    ("-shade", "noshade"),
    ("-volume", "novolume"),
    ("-emis", "noemis"),
    ("-rng", "norng"),
    ("kernels-only", "noclosure,noshade,novolume,noemis,norng"),
    ("math-only", "notrace,nonee"),
    ("nothing", "notrace,nonee,noclosure,noshade,novolume,noemis,norng"),
]


def main():
    scene_np, _ = build_demo_scene(subdiv=3)
    scene = scene_to_device(scene_np)

    @jax.jit
    def floor_fn(x):
        return x.sum()

    xf = jnp.ones((1 << 20,), jnp.float32)
    np.asarray(floor_fn(xf))

    def measure_floor():
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(floor_fn(xf))
            best = min(best, time.perf_counter() - t0)
        return best

    print(f"floor: {measure_floor() * 1e3:.1f} ms  lanes={N} inner={INNER}",
          file=sys.stderr)

    @jax.jit
    def mk_state(scene):
        s = build_fat_tables(scene)
        st = init_state(s, SIDE, SIDE, jnp.uint32(0), 0)
        st = wavefront_step(s, st, 0)
        st = wavefront_step(s, st, 0)
        st = compact_state(st, s)
        return st

    state = jax.block_until_ready(mk_state(scene))

    # Backend quirks measured on this axon tunnel (see /tmp diag runs):
    # (a) the SECOND execution of one of these big scan programs raises
    #     INVALID_ARGUMENT (first is fine) -> every program runs ONCE;
    # (b) the first execution AFTER compile traffic pays a multi-second
    #     penalty -> compile ALL programs first, burn one sacrificial
    #     execution, THEN execute the timed ones.
    # Per probe, TWO programs loop the step 4 and 4+INNER times; the wall
    # difference is (INNER x step) with trace overhead, dispatch and the
    # tunnel floor cancelled.
    def make(fn, inner):
        def looped(scene, st):
            def body(carry, _):
                st2 = st._replace(min_t=st.min_t + carry * 1e-30)
                out = fn(scene, st2)
                return out.astype(jnp.float32), None

            out, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(inner))
            return out

        return jax.jit(looped)

    def full_step(scene, st):
        s = build_fat_tables(scene)
        return wavefront_step(s, st, 0).contribution.sum()

    def compact_only(scene, st):
        s = build_fat_tables(scene)
        return compact_state(st, s).org.sum()

    def scatter_fb(scene, st):
        """The refill loop's framebuffer scatter-add (65k rows -> 4x fb).
        Every input derives from the perturbed min_t or the scan can
        hoist the whole op (measured: hoisted ops time as 0)."""
        salt = (st.min_t * 1e25).astype(jnp.int32) & 1
        fb = jnp.zeros((4 * N, 3), jnp.float32)
        idx = jnp.minimum(jnp.abs(st.lane + salt), 4 * N - 1)
        return fb.at[idx].add(st.contribution
                              + st.min_t[:, None] * 1e-30).sum()

    def refill_math(scene, st):
        """Camera rays + PCG reseed for every lane (the refill body)."""
        from pbrlab_tpu.core import rng as prng
        from pbrlab_tpu.render.camera import generate_rays

        s = build_fat_tables(scene)
        salt = (st.min_t * 1e25).astype(jnp.int32) & 1
        pixel = jnp.abs(st.lane + salt)
        rng0 = prng.seed_state(pixel.astype(jnp.uint32),
                               jnp.uint32(1), 0)
        rng0, (u1, u2) = prng.draw_n(rng0, 2)
        org0, dir0 = generate_rays(s, SIDE, SIDE, u1, u2, pixel)
        return org0.sum() + dir0.sum() + rng0.sum()

    def signature_only(scene, st):
        from pbrlab_tpu.render.integrator import _signature_word

        s = build_fat_tables(scene)
        return _signature_word(s, st.direction, st.org, st.min_t).sum()

    ISOLATED = {"compact": compact_only, "scatter_fb": scatter_fb,
                "refill_math": refill_math, "signature": signature_only}

    jobs = []
    for tag, flags in ABLATIONS + [(t, None) for t in ISOLATED]:
        os.environ["PBRLAB_ABLATE"] = flags or ""
        fn = ISOLATED.get(tag, full_step)
        fa, fb = make(fn, 4), make(fn, 4 + INNER)
        t0 = time.perf_counter()
        fa.lower(scene, state).compile()
        fb.lower(scene, state).compile()
        print(f"compiled {tag} ({time.perf_counter() - t0:.0f}s)",
              file=sys.stderr)
        jobs.append((tag, flags, fa, fb))

    os.environ["PBRLAB_ABLATE"] = ""
    sac = make(full_step, 2)
    sac.lower(scene, state).compile()
    np.asarray(sac(scene, state))  # sacrificial: absorbs post-compile cost

    def one(f, flags):
        os.environ["PBRLAB_ABLATE"] = flags or ""
        t0 = time.perf_counter()
        np.asarray(f(scene, state))
        return time.perf_counter() - t0

    results = {}
    for tag, flags, fa, fb in jobs:
        ta, tb = one(fa, flags), one(fb, flags)
        dt = (tb - ta) / INNER
        results[tag] = dt
        if tag == "full" or tag in ISOLATED:
            print(f"{tag:22s} {dt * 1e3:8.2f} ms   "
                  f"{dt / N * 1e9:6.1f} ns/lane", file=sys.stderr)
        else:
            delta = results["full"] - dt
            print(f"{tag:22s} {dt * 1e3:8.2f} ms   stage ~ "
                  f"{delta * 1e3:6.2f} ms   {delta / N * 1e9:6.1f} ns/lane",
                  file=sys.stderr)
    os.environ["PBRLAB_ABLATE"] = ""


if __name__ == "__main__":
    main()
