"""Isolate where dense_v3 time goes on the real chip.

Times (scalar-sync, see kernel_bench.py):
  sync      — empty jit: dispatch + scalar fetch floor
  prep      — XLA side only: beam cull + argsort + ray stack
  kern:cN   — pallas kernel alone with synthetic survivor lists of
              exactly N clusters per group (prep excluded)
  full      — dense_trace_v3 end to end

Env: KP_N rays (default 1<<20), KP_SUBDIV scene size.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from pbrlab_tpu.ops.pallas import dense_v3 as v3
    from pbrlab_tpu.scene.demo import build_demo_scene

    scene_np, _ = build_demo_scene(subdiv=int(os.environ.get("KP_SUBDIV",
                                                             "3")))
    packed = jnp.asarray(scene_np["dense_tris"])
    aabb = jnp.asarray(scene_np["dense_cluster_aabb"])
    M = aabb.shape[1]
    N = int(os.environ.get("KP_N", 1 << 20))
    rng = np.random.default_rng(0)
    lo, hi = scene_np["aabb_min"], scene_np["aabb_max"]
    org = jnp.asarray(lo + (hi - lo) * rng.random((N, 3)), jnp.float32)
    d = rng.normal(size=(N, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    mint = jnp.zeros(N)
    maxt = jnp.full(N, 1e18)

    def timeit(name, fn, *args, iters=8):
        r = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0].sum()
                   if hasattr(jax.tree_util.tree_leaves(r)[0], "sum")
                   else r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(r)[0].sum())
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:12s} {dt*1e3:8.1f} ms   {N/dt/1e6:8.2f} Mray/s",
              file=sys.stderr)
        return dt

    @jax.jit
    def empty(x):
        return x * 1.0

    timeit("sync", empty, jnp.zeros((8, 8)))

    @jax.jit
    def prep(org, d, mint, maxt):
        gm = v3.group_survivors_beam(aabb, org, d, mint, maxt)
        cnt = gm.sum(axis=1).astype(jnp.int32)[:, None]
        surv = jnp.argsort(~gm, axis=1, stable=True).astype(jnp.int32)
        rays = jnp.stack([org[:, 0], org[:, 1], org[:, 2], d[:, 0], d[:, 1],
                          d[:, 2], mint, maxt])
        return surv, cnt, rays

    timeit("prep", prep, org, d, mint, maxt)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad = (N + v3.RAY_TILE - 1) // v3.RAY_TILE * v3.RAY_TILE
    G_total = n_pad // v3.LANES

    @functools.partial(jax.jit, static_argnames=("nsurv",))
    def kern_only(rays, nsurv):
        surv = jnp.broadcast_to(
            jnp.arange(v3.GROUPS * 0 + M, dtype=jnp.int32)[None, :],
            (G_total, M)) % M
        cnt = jnp.full((G_total, 1), nsurv, jnp.int32)
        # tnear = -inf everywhere: the front-to-back early exit never fires,
        # so the synthetic survivor counts are timed undistorted
        tnear = jnp.full((G_total, M), -1e30, jnp.float32)
        tris_rows = packed.T
        out = pl.pallas_call(
            functools.partial(v3._trace_kernel, any_hit=False),
            grid=(n_pad // v3.RAY_TILE,),
            in_specs=[
                pl.BlockSpec((8, v3.RAY_TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(tris_rows.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((v3.GROUPS, M), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((v3.GROUPS, 1), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((v3.GROUPS, M), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((8, v3.RAY_TILE), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        )(rays, tris_rows, surv, cnt, tnear)
        return out[0].sum()

    rays = np.zeros((8, n_pad), np.float32)
    rays[0:3, :N] = np.asarray(org).T
    rays[3:6, :N] = np.asarray(d).T
    rays[7, :N] = 1e18
    rays[3:6, N:] = 1.0
    rays[7, N:] = -1.0
    rays = jnp.asarray(rays)

    for c in (0, 1, 2, 5, min(21, M)):
        timeit(f"kern:c{c}", functools.partial(kern_only, nsurv=c), rays)

    timeit("full", functools.partial(v3.dense_trace_v3), packed, aabb, org,
           d, mint, maxt)


if __name__ == "__main__":
    main()
