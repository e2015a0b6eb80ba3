"""Micro-benchmark: dense trace kernels on 1M incoherent rays.

Env knobs:
  KB_KERNELS  comma list of v2,v3,v3exact (default "v2,v3")
  KB_SUBDIV   icosphere subdiv for the demo scene (3 -> 2.7k tris,
              5 -> 42k, 6 -> 164k)
  KB_N        ray count (default 1<<20)
  KB_SHADOW   "1" -> also time the any-hit short-ray (shadow) workload

Variants per kernel:
  base      — incoherent rays as-is
  dead      — all rays maxt=-1: every cluster body must be skipped
  sorted    — rays host-pre-sorted by cluster-hit signature so 128-ray
              groups agree on clusters (upper bound for compaction)

Also prints mean clusters-per-ray (the culling ceiling).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def slab_mask(aabb, org, direction):
    """[N, M] bool: ray (with t in [0, inf)) hits cluster AABB."""
    inv = 1.0 / np.where(np.abs(direction) < 1e-12, 1e-12, direction)
    bmin = aabb[0:3].T[None]  # [1, M, 3]
    bmax = aabb[3:6].T[None]
    t0 = (bmin - org[:, None]) * inv[:, None]
    t1 = (bmax - org[:, None]) * inv[:, None]
    tnear = np.minimum(t0, t1).max(-1)
    tfar = np.maximum(t0, t1).min(-1)
    return (tnear <= tfar * 1.00000024) & (tfar >= 0.0)


def main():
    import jax
    from pbrlab_tpu.scene.demo import build_demo_scene

    subdiv = int(os.environ.get("KB_SUBDIV", "3"))
    scene_np, _ = build_demo_scene(subdiv=subdiv)
    packed = scene_np["dense_tris"]
    aabb = scene_np["dense_cluster_aabb"]
    M = aabb.shape[1]
    print(f"tris={packed.shape[1]} clusters={M}", file=sys.stderr)

    rng = np.random.default_rng(0)
    N = int(os.environ.get("KB_N", 1 << 20))
    lo, hi = scene_np["aabb_min"], scene_np["aabb_max"]
    org = (lo + (hi - lo) * rng.random((N, 3))).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    mint = np.zeros(N, np.float32)
    maxt = np.full(N, 1e18, np.float32)

    mask = slab_mask(aabb, org, d)
    cpr = mask.sum(1)
    print(f"clusters/ray mean={cpr.mean():.2f} p50={np.median(cpr):.0f} "
          f"max={cpr.max()}", file=sys.stderr)
    # (cell, octant) sort — EXACTLY what integrator compaction does
    # (render/integrator.py compact_state): spatially compact groups are
    # what makes the beam cull tight.
    octant = ((d[:, 0] > 0) * 4 + (d[:, 1] > 0) * 2
              + (d[:, 2] > 0)).astype(np.int64)
    ext = np.maximum(hi - lo, 1e-6)
    cf = np.clip((org - lo) / ext * 4.0, 0.0, 3.999)
    cell = (cf[:, 0].astype(np.int64) * 16 + cf[:, 1].astype(np.int64) * 4
            + cf[:, 2].astype(np.int64))
    perm = np.argsort(cell * 8 + octant, kind="stable")
    gm = mask[perm].reshape(-1, 128, M).any(1).sum(1)
    print(f"exact survivors/group sorted: mean={gm.mean():.2f} "
          f"max={gm.max()}", file=sys.stderr)
    gu = mask.reshape(-1, 128, M).any(1).sum(1)
    print(f"exact survivors/group unsorted: mean={gu.mean():.2f}",
          file=sys.stderr)

    from pbrlab_tpu.ops.pallas.dense_v2 import dense_trace_v2
    from pbrlab_tpu.ops.pallas.dense_v3 import (dense_trace_v3,
                                                group_survivors_beam)
    jp = jax.numpy

    # what the kernel actually loops over: conservative beam survivors
    for tag, o_, d_ in (("sorted", org[perm], d[perm]), ("unsorted", org, d)):
        gb = np.asarray(group_survivors_beam(
            jp.asarray(aabb), jp.asarray(o_), jp.asarray(d_),
            jp.asarray(mint), jp.asarray(maxt))).sum(1)
        print(f"beam survivors/group {tag}: mean={gb.mean():.2f} "
              f"max={gb.max()}", file=sys.stderr)

    import functools
    kernels = {
        "v2": dense_trace_v2,
        "v3": functools.partial(dense_trace_v3, cull="beam"),
        "v3exact": functools.partial(dense_trace_v3, cull="exact"),
    }
    names = os.environ.get("KB_KERNELS", "v2,v3").split(",")

    def run(kern, name, o, dd, mn, mx, iters=8, any_hit=False):
        o, dd, mn, mx = map(jp.asarray, (o, dd, mn, mx))
        r = kern(packed, aabb, o, dd, mn, mx, any_hit=any_hit)
        # sync via a SCALAR fetch: the axon tunnel moves ~33 MB/s, so
        # fetching the 4MB result would dominate (~113ms); a sum forces
        # execution at ~25ms overhead (see ARCHITECTURE.md perf notes)
        np.asarray(r["t"].sum())  # compile + settle
        t0 = time.perf_counter()
        for _ in range(iters):
            r = kern(packed, aabb, o, dd, mn, mx, any_hit=any_hit)
            np.asarray(r["t"].sum())
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:16s} {dt*1e3:8.1f} ms   {N/dt/1e6:7.2f} Mray/s",
              file=sys.stderr)
        return r

    for kn in names:
        kern = kernels[kn]
        r_base = run(kern, f"{kn}:base", org, d, mint, maxt)
        run(kern, f"{kn}:dead", org, d, mint, np.full(N, -1.0, np.float32))
        r_sort = run(kern, f"{kn}:sorted", org[perm], d[perm], mint[perm],
                     maxt[perm])
        tb = np.asarray(r_base["t"])[perm]
        ts = np.asarray(r_sort["t"])
        bad = np.abs(tb - ts) > 1e-4
        print(f"{kn}: sorted-vs-base mismatches: {bad.sum()}",
              file=sys.stderr)
        if os.environ.get("KB_SHADOW") == "1":
            # shadow workload: short segments toward the light
            to_l = np.array([0.0, 1.98, 0.0], np.float32)[None] - org
            dist = np.linalg.norm(to_l, axis=1, keepdims=True)
            run(kern, f"{kn}:shadow", org, to_l / dist, mint,
                (dist[:, 0] - 1e-3), any_hit=True)


if __name__ == "__main__":
    main()
