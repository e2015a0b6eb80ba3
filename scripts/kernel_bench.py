"""Micro-benchmark: dense_trace_v2 on 1M incoherent rays vs the demo scene.

Variants isolate where time goes:
  base      — incoherent rays as-is (the historical 191ms number)
  dead      — all rays maxt=-1: every cluster body must be skipped; if this
              is NOT much faster, lax.cond in Mosaic is not really branching
  sorted    — same rays, host-pre-sorted by their cluster-hit signature so
              the 128-ray groups agree on clusters and jnp.any culling works

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

    scene_np, _ = build_demo_scene(subdiv=3)
    packed = scene_np["dense_tris"]
    aabb = scene_np["dense_cluster_aabb"]
    M = aabb.shape[1]
    print(f"tris={packed.shape[1]} clusters={M}", file=sys.stderr)

    rng = np.random.default_rng(0)
    N = 1 << 20
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
    # signature sort (host): pack mask bits (M<=32 here)
    bits = (mask.astype(np.uint64)
            << np.arange(M, dtype=np.uint64)[None]).sum(1)
    perm = np.argsort(bits, kind="stable")
    # expected per-group survivors after sort
    gm = mask[perm].reshape(-1, 128, M).any(1).sum(1)
    print(f"survivors/group sorted: mean={gm.mean():.2f} max={gm.max()}",
          file=sys.stderr)
    gu = mask.reshape(-1, 128, M).any(1).sum(1)
    print(f"survivors/group unsorted: mean={gu.mean():.2f}", file=sys.stderr)

    from pbrlab_tpu.ops.pallas.dense_v2 import dense_trace_v2
    from pbrlab_tpu.ops.pallas.dense_v3 import dense_trace_v3
    jp = jax.numpy
    kern = (dense_trace_v3 if os.environ.get("KB_V3") == "1"
            else dense_trace_v2)

    def run(name, o, dd, mn, mx, iters=4):
        o, dd, mn, mx = map(jp.asarray, (o, dd, mn, mx))
        r = kern(packed, aabb, o, dd, mn, mx)
        np.asarray(r["t"])  # compile + settle
        t0 = time.perf_counter()
        for _ in range(iters):
            r = kern(packed, aabb, o, dd, mn, mx)
            np.asarray(r["t"])
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:10s} {dt*1e3:8.1f} ms   {N/dt/1e6:7.2f} Mray/s",
              file=sys.stderr)
        return r

    r_base = run("base", org, d, mint, maxt)
    run("dead", org, d, mint, np.full(N, -1.0, np.float32))
    r_sort = run("sorted", org[perm], d[perm], mint[perm], maxt[perm])
    # correctness: sorted results must match base under the permutation
    tb = np.asarray(r_base["t"])[perm]
    ts = np.asarray(r_sort["t"])
    bad = np.abs(tb - ts) > 1e-4
    print(f"sorted-vs-base mismatches: {bad.sum()}", file=sys.stderr)


if __name__ == "__main__":
    main()
