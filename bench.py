"""Benchmark: rays/s on the cornellbox demo scene (BASELINE.md target:
>= 100 Mrays/s/chip at 1024^2 x 64 spp; scale down via BENCH_* env vars —
Mrays/s is the scale-invariant metric).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Ray accounting: a wavefront step fires one closest-hit ray per alive lane
plus one shadow ray per shading lane. Occupancy is algorithm behavior, not
hardware behavior, so it is measured with a small jitted probe on the CPU
backend (fast compiles) and applied to the TPU wall time:
    rays = width * height * spp * sum_steps(alive_frac) * 2.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np


def main():
    # defaults = the BASELINE.md headline workload (cornellbox 1024^2,
    # 64 spp); BENCH_* env scales down for quick runs
    width = height = int(os.environ.get("BENCH_RES", "1024"))
    spp = int(os.environ.get("BENCH_SPP", "64"))
    max_steps = int(os.environ.get("BENCH_STEPS", "12"))

    from pbrlab_tpu.render.integrator import render
    from pbrlab_tpu.scene.demo import build_demo_scene
    from pbrlab_tpu.scene.scene import scene_to_device
    from pbrlab_tpu.utils.profiling import measure_occupancy

    scene_np, _ = build_demo_scene(subdiv=3)
    alive_steps = measure_occupancy(scene_np, max_steps)

    scene = scene_to_device(scene_np)
    # warmup/compile (1 spp shares the per-sample graph with the spp scan)
    img = render(scene, width, height, spp, max_steps=max_steps)
    jax.block_until_ready(img)
    np.asarray(img)

    t0 = time.perf_counter()
    img = np.asarray(render(scene, width, height, spp, max_steps=max_steps))
    dt = time.perf_counter() - t0

    total_rays = width * height * spp * alive_steps * 2.0
    mrays = total_rays / dt / 1e6
    baseline = 100.0  # Mrays/s/chip north-star from BASELINE.json
    print(json.dumps({
        "metric": f"Mrays/s/chip (cornellbox {width}^2, {spp}spp, "
                  f"{max_steps} wavefront steps, occupancy-weighted)",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / baseline, 3),
    }))


if __name__ == "__main__":
    main()
