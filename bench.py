"""Benchmark: rays/s on the cornellbox demo scene (BASELINE.md target:
>= 100 Mrays/s/chip at 1024^2 x 64 spp).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Rays counted like a wavefront renderer bills them: one closest-hit plus one
shadow any-hit per wavefront step per alive lane — measured by running the
same integrator with a counting hook disabled and instead derived from the
traced step count (max_steps) times alive-lane occupancy is not observable
post-hoc, so we use the conservative convention: primary+NEE rays actually
contributing = 2 rays per wavefront step per lane that was alive at that
step. We measure alive occupancy once at low cost, then time the real
render.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    width = height = int(os.environ.get("BENCH_RES", "512"))
    spp = int(os.environ.get("BENCH_SPP", "16"))
    max_steps = int(os.environ.get("BENCH_STEPS", "12"))

    from pbrlab_tpu.render.integrator import render
    from pbrlab_tpu.scene.demo import build_demo_scene
    from pbrlab_tpu.scene.scene import scene_to_device

    scene_np, _ = build_demo_scene(subdiv=3)
    scene = scene_to_device(scene_np)

    # warmup/compile
    img = render(scene, width, height, 1, max_steps=max_steps)
    jax.block_until_ready(img)

    t0 = time.perf_counter()
    img = render(scene, width, height, spp, max_steps=max_steps)
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0

    # Ray accounting: measure mean alive-lane occupancy at 1 spp on a probe
    # grid, then bill 2 rays (closest + shadow) per alive lane-step.
    from pbrlab_tpu.render.integrator import init_state, wavefront_step

    probe = 256
    lane = jnp.arange(probe * probe, dtype=jnp.int32)
    state = init_state(scene, probe, probe, jnp.uint32(0), 0, lane)
    alive_steps = 0.0
    for _ in range(max_steps):
        alive_steps += float(jnp.mean(state.alive))
        state = wavefront_step(scene, state, 0)
    rays_per_lane = 2.0 * alive_steps

    total_rays = width * height * spp * rays_per_lane
    mrays = total_rays / dt / 1e6
    baseline = 100.0  # Mrays/s/chip north-star from BASELINE.json
    print(json.dumps({
        "metric": f"Mrays/s/chip (cornellbox {width}^2, {spp}spp, "
                  f"{max_steps} wavefront steps)",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / baseline, 3),
    }))


if __name__ == "__main__":
    main()
