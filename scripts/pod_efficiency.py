"""Multi-host scaling efficiency harness (BASELINE.md: >=80% rays/s
efficiency at >=2 hosts).

Two modes:

* **Pod mode** (real hardware; run ONE copy per host, e.g. via your pod
  launcher): no --procs flag. Each copy calls
  ``pbrlab_tpu.parallel.distributed.init_distributed()`` (auto-detects the
  pod cluster env, or uses PBRLAB_COORDINATOR / PBRLAB_NUM_PROCESSES /
  PBRLAB_PROCESS_ID), renders PASSES progressive passes of the demo scene
  with lanes sharded over every global device, and process 0 prints one
  JSON line with per-pass wall time and rays/s. Efficiency = rays/s at N
  hosts / (N x rays/s at 1 host): run once with 1 host, once with N, and
  divide — or pass --baseline-rays <rays/s-at-1-host> to have the script
  print the efficiency directly.

* **Local smoke mode** (--procs N): spawns N local CPU worker processes
  (2 virtual devices each) against a localhost coordinator, runs the same
  measurement path end-to-end, and reports the numbers. On a shared-core
  host the efficiency figure is meaningless (workers compete for the same
  CPUs) — the mode exists to prove the harness runs before pod time is
  booked.

The measured quantity mirrors bench.py: occupancy-weighted rays per pass
(width*height*spp*sum_steps(alive_frac)*2) divided by the median per-pass
wall time across PASSES passes (first pass excluded: compile).
"""
import argparse
import json
import os
import socket
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_measurement(args):
    import jax
    import numpy as np

    from pbrlab_tpu.parallel.distributed import (global_mesh,
                                                 init_distributed,
                                                 render_distributed)
    from pbrlab_tpu.scene.demo import build_demo_scene
    from pbrlab_tpu.utils.profiling import measure_occupancy

    multi = init_distributed()
    scene_np, _ = build_demo_scene(subdiv=args.subdiv)
    mesh = global_mesh()
    is_zero = jax.process_index() == 0

    # occupancy probe (host-side, cheap shapes) for the rays metric
    # (units include the closest+shadow x2 factor)
    ray_units = measure_occupancy(scene_np, args.max_steps)
    rays_per_pass = args.res * args.res * args.spp * ray_units

    times = []
    for p in range(args.passes + 1):  # +1: first pass compiles
        t0 = time.perf_counter()
        img = render_distributed(scene_np, args.res, args.res, args.spp,
                                 mesh=mesh, seed=p, max_steps=args.max_steps)
        np.asarray(img)
        times.append(time.perf_counter() - t0)
    per_pass = float(np.median(times[1:]))
    mrays = rays_per_pass / per_pass / 1e6
    if is_zero:
        out = {
            "processes": jax.process_count(),
            "devices": jax.device_count(),
            "per_pass_s": round(per_pass, 4),
            "mrays_per_s": round(mrays, 3),
            "workload": f"{args.res}^2 x {args.spp}spp x "
                        f"{args.max_steps}steps",
            "multi_process": multi,
        }
        if args.baseline_rays:
            ideal = args.baseline_rays * jax.process_count()
            out["efficiency_vs_1host"] = round(mrays / ideal, 3)
        print(json.dumps(out), flush=True)
    return 0


def spawn_local(args):
    """Local smoke mode: N CPU processes x 2 virtual devices each."""
    port = _free_port()
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = []
    for pid in range(args.procs):
        env = dict(
            env_base,
            PBRLAB_COORDINATOR=f"127.0.0.1:{port}",
            PBRLAB_NUM_PROCESSES=str(args.procs),
            PBRLAB_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=(env_base.get("XLA_FLAGS", "")
                       + " --xla_force_host_platform_device_count=2"),
            PBRLAB_POD_WORKER="1",
        )
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)] + _fwd_args(args),
            env=env,
            stdout=None if pid == 0 else subprocess.DEVNULL,
            stderr=subprocess.STDOUT if pid else subprocess.DEVNULL))
    rc = [p.wait(timeout=1200) for p in procs]
    return max(rc)


def _fwd_args(args):
    return ["--res", str(args.res), "--spp", str(args.spp),
            "--max-steps", str(args.max_steps), "--passes",
            str(args.passes), "--subdiv", str(args.subdiv)] + (
        ["--baseline-rays", str(args.baseline_rays)]
        if args.baseline_rays else [])


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--procs", type=int, default=0,
                    help="local smoke mode: spawn N CPU worker processes")
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--max-steps", type=int, default=8)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--subdiv", type=int, default=2)
    ap.add_argument("--baseline-rays", type=float, default=0.0,
                    help="Mrays/s measured at 1 host; prints efficiency")
    args = ap.parse_args()
    if args.procs and not os.environ.get("PBRLAB_POD_WORKER"):
        sys.exit(spawn_local(args))
    # worker / pod mode: JAX config must happen pre-backend-init
    if os.environ.get("PBRLAB_POD_WORKER"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    sys.exit(run_measurement(args))


if __name__ == "__main__":
    main()
