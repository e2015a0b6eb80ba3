"""Surgical stage timing for one wavefront step on TPU.

Measures (each as ONE jitted dispatch, minus the measured axon tunnel
floor): full wavefront_step, trace_scene, occluded_scene, compact_state,
and the fat gathers, at SP_LANES lanes (default 65536).

Env: SP_LANES, PBRLAB_TRACE_BACKEND.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pbrlab_tpu.ops.intersect import occluded_scene, trace_scene
    from pbrlab_tpu.render.integrator import (compact_state, init_state,
                                              wavefront_step)
    from pbrlab_tpu.scene.demo import build_demo_scene
    from pbrlab_tpu.scene.scene import build_fat_tables, scene_to_device

    n = int(os.environ.get("SP_LANES", "65536"))
    side = int(np.sqrt(n))
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

    print(f"floor: {measure_floor() * 1e3:.1f} ms  lanes={n}",
          file=sys.stderr)

    # realistic mid-render state: 2 steps from camera
    @jax.jit
    def mk_state(scene):
        s = build_fat_tables(scene)
        st = init_state(s, side, side, jnp.uint32(0), 0)
        st = wavefront_step(s, st, 0)
        st = wavefront_step(s, st, 0)
        st = compact_state(st, s)
        return st

    state = jax.block_until_ready(mk_state(scene))

    INNER = 16

    def timeit(tag, fn, *args):
        """fn(scene, state) -> scalar; looped INNER times inside ONE jit
        with a data dependency (axon round-trip jitter is ~±3 ms, so
        per-dispatch timing of <5 ms ops is noise)."""

        def looped(scene, st):
            def body(carry, _):
                # perturb an input so the op can't be hoisted
                st2 = st._replace(min_t=st.min_t + carry * 1e-30)
                out = fn(scene, st2)
                return out.astype(jnp.float32), None

            out, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(INNER))
            return out

        f = jax.jit(looped)
        np.asarray(f(*args))
        floor = measure_floor()  # re-measured: tunnel latency drifts
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            best = min(best, time.perf_counter() - t0)
        dt = (best - floor) / INNER
        print(f"{tag:24s} {dt * 1e3:8.2f} ms   "
              f"{dt / n * 1e9:6.1f} ns/lane", file=sys.stderr)

    def full_step(scene, st):
        s = build_fat_tables(scene)
        return wavefront_step(s, st, 0).contribution.sum()

    def noop(scene, st):
        return st.min_t.sum()

    def trace_only(scene, st):
        s = build_fat_tables(scene)
        r = trace_scene(s, st.org, st.direction, st.min_t,
                        jnp.where(st.alive, 1e18, -1.0))
        return r["t"].sum()

    def shadow_only(scene, st):
        s = build_fat_tables(scene)
        return occluded_scene(s, st.org, st.direction,
                              jnp.full((n,), 1e-3, jnp.float32),
                              jnp.where(st.alive, 2.0, -1.0)).sum()

    def compact_only(scene, st):
        s = build_fat_tables(scene)
        return compact_state(st, s).org.sum()

    def face_gather(scene, st):
        s = build_fat_tables(scene)
        prim = jnp.abs(st.lane) % s["face_fat"].shape[0]
        return s["face_fat"][prim].sum()

    def gathers_only(scene, st):
        s = build_fat_tables(scene)
        prim = jnp.abs(st.lane) % s["face_fat"].shape[0]
        frow = s["face_fat"][prim]
        mrow = s["mat_fat"][prim % s["mat_fat"].shape[0]]
        lrow = s["light_fat"][prim % s["light_fat"].shape[0]]
        return frow.sum() + mrow.sum() + lrow.sum()

    timeit("noop", noop, scene, state)
    timeit("full_step", full_step, scene, state)
    timeit("trace_only", trace_only, scene, state)
    timeit("shadow_only", shadow_only, scene, state)
    timeit("compact_only", compact_only, scene, state)
    timeit("3_fat_gathers", gathers_only, scene, state)
    timeit("face_gather", face_gather, scene, state)


if __name__ == "__main__":
    main()
