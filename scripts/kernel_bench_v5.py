"""Micro-benchmark: dense_v5 fused packet-traversal kernel on 1M rays (TPU).

Env knobs: KB_SUBDIV (3), KB_N (1<<20), KB_ITERS (8).
Variants: base (incoherent), sorted (signature-sorted groups), dead
(all maxt=-1), shadow (short any-hit rays toward the light).
Correctness: sorted-vs-base t mismatch count (must be 0).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from pbrlab_tpu.ops.pallas.dense_v5 import (dense_trace_v5,
                                                 dense_trace_v5l)
    from pbrlab_tpu.scene.demo import build_demo_scene
    import functools
    import jax.numpy as jp

    subdiv = int(os.environ.get("KB_SUBDIV", "3"))
    scene_np, _ = build_demo_scene(subdiv=subdiv)
    packed = scene_np["dense_tris_v4"]
    aabb = scene_np["dense_cluster_aabb_v4"]
    naabb = scene_np["v5_node_aabb"]
    nmeta = scene_np["v5_node_meta"]
    if "dense_tris_v5l" in scene_np:
        trace = functools.partial(dense_trace_v5l,
                                  scene_np["dense_tris_v5l"], naabb, nmeta)
        print("backend: v5l (leaf-DMA, HBM tris)", file=sys.stderr)
    else:
        trace = functools.partial(dense_trace_v5, packed, naabb, nmeta)
    M = aabb.shape[1]
    print(f"slots={packed.shape[1]} M={M} Nn={naabb.shape[1]} "
          f"smem_tris={packed.nbytes // 1024}KB", file=sys.stderr)

    rng = np.random.default_rng(0)
    N = int(os.environ.get("KB_N", 1 << 20))
    lo, hi = scene_np["aabb_min"], scene_np["aabb_max"]
    org = (lo + (hi - lo) * rng.random((N, 3))).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    mint = np.zeros(N, np.float32)
    maxt = np.full(N, 1e18, np.float32)

    # signature sort on the leaf-cluster mask (idealized compaction);
    # chunked over rays — the dense [N, M, 3] broadcast blows host RAM
    # past a few k clusters, so keep chunks small and skip the analysis
    # entirely when N*M is impractical
    do_sort = N * M <= (1 << 31)
    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    mask = np.zeros((N, min(M, 128)), bool)
    mcap = min(M, 128)  # sort key uses 128 bits anyway
    if do_sort:
        for a in range(0, N, 8192):
            b = min(a + 8192, N)
            t0 = (aabb[0:3, :mcap].T[None] - org[a:b, None]) * inv[a:b, None]
            t1 = (aabb[3:6, :mcap].T[None] - org[a:b, None]) * inv[a:b, None]
            tnear = np.minimum(t0, t1).max(-1)
            tfar = np.maximum(t0, t1).min(-1)
            mask[a:b] = (tnear <= tfar * 1.00000024) & (tfar >= 0.0)
    k1 = np.zeros(N, np.uint64)
    k2 = np.zeros(N, np.uint64)
    for c in range(min(mcap, 64)):
        k1 |= mask[:, c].astype(np.uint64) << np.uint64(c)
    for c in range(64, mcap):
        k2 |= mask[:, c].astype(np.uint64) << np.uint64(c - 64)
    perm = np.lexsort((k2, k1))
    if do_sort:
        u = mask[perm].reshape(-1, 1024, mcap).any(1).sum(1)
        print(f"sorted survivors(first {mcap} leaves)/1024-group: "
              f"mean={u.mean():.2f} max={u.max()}", file=sys.stderr)

    iters = int(os.environ.get("KB_ITERS", "8"))

    def run(name, o, dd, mn, mx, any_hit=False):
        o, dd, mn, mx = map(jp.asarray, (o, dd, mn, mx))
        r = trace(o, dd, mn, mx, any_hit=any_hit)
        np.asarray(r["t"].sum())  # compile + settle (scalar fetch sync)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = trace(o, dd, mn, mx, any_hit=any_hit)
            np.asarray(r["t"].sum())
        dt = (time.perf_counter() - t0) / iters
        print(f"v5:{name:12s} {dt * 1e3:8.1f} ms   {N / dt / 1e6:7.2f} Mray/s",
              file=sys.stderr)
        return r

    r_base = run("base", org, d, mint, maxt)
    r_sort = run("sorted", org[perm], d[perm], mint[perm], maxt[perm])
    run("dead", org, d, mint, np.full(N, -1.0, np.float32))
    tb = np.asarray(r_base["t"])[perm]
    ts = np.asarray(r_sort["t"])
    print(f"sorted-vs-base t mismatches: {(np.abs(tb - ts) > 1e-4).sum()}",
          file=sys.stderr)
    # shadow workload: short any-hit segments toward the light
    to_l = np.array([0.0, 1.98, 0.0], np.float32)[None] - org
    dist = np.linalg.norm(to_l, axis=1, keepdims=True)
    run("shadow", org, to_l / dist, mint, (dist[:, 0] - 1e-3), any_hit=True)
    run("shadow_sort", org[perm], (to_l / dist)[perm], mint,
        (dist[:, 0] - 1e-3)[perm], any_hit=True)


if __name__ == "__main__":
    main()
