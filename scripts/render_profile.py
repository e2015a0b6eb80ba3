"""Macro profile: where does a FULL refill-render's wall time go?

Times whole `render_lanes_wavefront` launches (one jit; re-executable —
the second-execution backend bug hits only the scan-looped step programs)
under PBRLAB_ABLATE stage removals, and reports wall, iteration count and
ms/iteration. This is the bench workload's own loop, so overheads the
single-step probe can't see (refill, fb scatter, cond reduction, compact,
occupancy decay) are all included.

Env: RP_RES (512), RP_SPP (16), RP_STEPS (12), PBRLAB_LANES, PBRLAB_*.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pbrlab_tpu.render.integrator import render_lanes_wavefront
from pbrlab_tpu.scene.demo import build_demo_scene
from pbrlab_tpu.scene.scene import scene_to_device

RES = int(os.environ.get("RP_RES", "512"))
SPP = int(os.environ.get("RP_SPP", "16"))
STEPS = int(os.environ.get("RP_STEPS", "12"))

VARIANTS = [
    ("full", "", {}),
    ("-trace", "notrace", {}),
    ("-nee(all)", "nonee", {}),
    ("-shadow", "noshadow", {}),
    ("math-only", "notrace,nonee", {}),
    ("nothing", "notrace,nonee,noclosure,noshade,novolume,noemis,norng", {}),
    ("full-nosort", "", {"sort_every": 0}),
    ("nothing-nosort",
     "notrace,nonee,noclosure,noshade,novolume,noemis,norng",
     {"sort_every": 0}),
]


def main():
    scene_np, _ = build_demo_scene(subdiv=3)
    scene = scene_to_device(scene_np)

    # Backend quirks (see scripts/step_profile.py): executions right after
    # compile traffic can fail with INVALID_ARGUMENT or pay a multi-second
    # penalty. Compile every variant first, burn a sacrificial execution,
    # then time ONE execution per variant (wall is seconds, so the ~0.3 s
    # re-trace inside the timed call is noise).
    def make(flags, kw):
        os.environ["PBRLAB_ABLATE"] = flags

        def fn(scene):
            fb, iters = render_lanes_wavefront(
                scene, RES, RES, SPP, 0, STEPS, return_iters=True, **kw)
            return fb.sum(), iters

        f = jax.jit(fn)
        f.lower(scene).compile()
        return f

    print(f"res={RES} spp={SPP} steps={STEPS}", file=sys.stderr)
    jobs = []
    for tag, flags, kw in VARIANTS:
        t0 = time.perf_counter()
        jobs.append((tag, flags, make(flags, kw)))
        print(f"compiled {tag} ({time.perf_counter() - t0:.0f}s)",
              file=sys.stderr)

    os.environ["PBRLAB_ABLATE"] = ""
    sac = jax.jit(lambda s: s["tri_v0"].sum() * 0 +
                  jnp.ones((1 << 20,)).sum())
    np.asarray(sac(scene))

    for tag, flags, f in jobs:
        os.environ["PBRLAB_ABLATE"] = flags
        for attempt in range(2):
            try:
                t0 = time.perf_counter()
                s, iters = f(scene)
                s = float(s)
                iters = int(iters)
                dt = time.perf_counter() - t0
                print(f"{tag:14s} {dt:7.2f} s  {iters:5d} iters  "
                      f"{dt / iters * 1e3:6.2f} ms/iter  (sum {s:.0f})",
                      file=sys.stderr)
                break
            except Exception as e:
                print(f"{tag:14s} attempt {attempt}: {type(e).__name__}",
                      file=sys.stderr)
    os.environ["PBRLAB_ABLATE"] = ""


if __name__ == "__main__":
    main()
