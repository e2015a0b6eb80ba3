"""End-to-end decomposition on TPU: where does a wavefront render spend time?

Measures wall time of ONE jitted dispatch per config (axon tunnel adds a
~30 ms fixed round-trip per dispatch — measured by the 'floor' row and
subtracted). Configs toggle trace backend / compaction key / sort cadence
via env vars read at trace time, with a FRESH jit closure per config.

Env: EP_RES (512), EP_SPP (4), EP_STEPS (12).
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pbrlab_tpu.render.integrator import render_lanes
    from pbrlab_tpu.scene.demo import build_demo_scene
    from pbrlab_tpu.scene.scene import scene_to_device

    W = H = int(os.environ.get("EP_RES", "512"))
    SPP = int(os.environ.get("EP_SPP", "4"))
    STEPS = int(os.environ.get("EP_STEPS", "12"))

    scene_np, _ = build_demo_scene(subdiv=3)
    scene = scene_to_device(scene_np)

    @jax.jit
    def floor_fn(x):
        return x.sum()

    xf = jnp.ones((1 << 20,), jnp.float32)
    np.asarray(floor_fn(xf))
    t0 = time.perf_counter()
    for _ in range(8):
        np.asarray(floor_fn(xf))
    floor = (time.perf_counter() - t0) / 8
    print(f"floor (dispatch+fetch): {floor * 1e3:.1f} ms", file=sys.stderr)

    def build(sort_every):
        def f(scene):
            def body(acc, sid):
                img = render_lanes(scene, W, H, sid, 0, STEPS,
                                   sort_every=sort_every)
                return acc + img, None

            acc, _ = lax.scan(body, jnp.zeros((W * H, 3), jnp.float32),
                              jnp.arange(SPP, dtype=jnp.uint32))
            return acc

        return jax.jit(f)

    results = {}

    def run(tag, backend, key, sort_every):
        os.environ["PBRLAB_TRACE_BACKEND"] = backend
        os.environ["PBRLAB_COMPACT_KEY"] = key
        fn = build(sort_every)
        t0 = time.perf_counter()
        np.asarray(fn(scene))
        print(f"{tag}: compiled in {time.perf_counter() - t0:.0f}s",
              file=sys.stderr)
        t0 = time.perf_counter()
        for _ in range(3):
            np.asarray(fn(scene))
        dt = (time.perf_counter() - t0) / 3 - floor
        results[tag] = dt
        print(f"{tag:28s} {dt * 1e3:9.1f} ms", file=sys.stderr)

    import json
    for tag, backend, key, sort_every in json.loads(
            os.environ.get("EP_CONFIGS", '[]')):
        run(tag, backend, key, sort_every)

    print({k: round(v * 1e3, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
