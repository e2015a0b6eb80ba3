"""Pallas TPU kernel V3: survivor-list dense clustered intersection.

Profiling V2 (scripts/kernel_bench.py) showed the per-cluster culling
machinery INSIDE the kernel — vector slab test, jnp.any lane reduction to a
scalar, lax.cond branch, 21x per 128-ray group — costs more than the
triangle math it tries to skip (162 ms of a 263 ms trace at 1M rays even
when every cluster body is skipped). V3 inverts the design:

* ALL culling runs in XLA outside the kernel, where the [N_rays, M_clusters]
  slab test is a dense fused elementwise+reduce at full VPU rate;
* per 128-ray group, XLA compacts the surviving cluster ids into an SMEM
  int32 list + count (mean ~2-6 survivors on sorted rays vs 21 clusters);
* the kernel is a pure executor: for each group it loops over exactly
  `count` survivor clusters with NO vector tests, no reductions, no conds —
  the 16-tri-step body of V2 runs unconditionally per survivor.

The group survivor union is tight only when the 128 rays agree on clusters;
callers sort rays by cluster-hit signature (see `signature_key`, used by the
integrator's compaction) so they do. Per-ray max_t (shadow rays) is folded
into the XLA-side mask, so short shadow rays get small survivor lists.

Reference semantics replaced: rtcIntersect1 / rtcOccluded1
(/root/reference/src/raytracer/raytracer_impl.cc:268-287).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.math import INF
from .dense import TRI_BLOCK

LANES = 128
SLOTS = 8
STEPS = TRI_BLOCK // SLOTS
RAY_TILE = 4096
GROUPS = RAY_TILE // LANES


def _trace_kernel(ray_ref, tri_ref, surv_ref, cnt_ref, out_ref):
    """ray_ref [8, RAY_TILE] rows ox oy oz dx dy dz mint maxt
    tri_ref [Fpad, 12] row-major linear forms (dense.pack_triangles)
    surv_ref [GROUPS, M] (SMEM) surviving cluster ids, compacted left
    cnt_ref [GROUPS, 1] (SMEM) number of survivors per group
    out_ref [8, RAY_TILE] rows: t, u, v, prim, hit, unused...
    """
    B = (SLOTS, LANES)
    iota_sub = jax.lax.broadcasted_iota(jnp.int32, B, 0).astype(jnp.float32)

    def group(gi):
        # STATIC lane offsets: dynamic lane-dim slices lower to very slow
        # Mosaic code (measured: they dominated V2/V3 fori-over-groups time)
        cols = slice(gi * LANES, (gi + 1) * LANES)
        r = ray_ref[:, cols]  # [8, 128]
        o1 = [r[i:i + 1, :] for i in range(8)]
        ox, oy, oz, dx, dy, dz, mint, maxt = (
            jnp.broadcast_to(q, B) for q in o1)

        # max_t folds into the initial best; found-ness rides best_p
        best_t = maxt
        best_u = jnp.zeros(B, jnp.float32)
        best_v = jnp.zeros(B, jnp.float32)
        best_p = jnp.full(B, -1.0, jnp.float32)

        def surv_body(si, carry):
            best_t, best_u, best_v, best_p = carry
            c = surv_ref[gi, si]
            for step in range(STEPS):
                base = c * TRI_BLOCK + step * SLOTS
                tq = tri_ref[pl.ds(base, SLOTS), :]  # [8, 12] one load

                def tb(col):
                    return jnp.broadcast_to(tq[:, col:col + 1], B)

                nx, ny, nz, k0 = tb(0), tb(1), tb(2), tb(3)
                b1x, b1y, b1z, c1 = tb(4), tb(5), tb(6), tb(7)
                b2x, b2y, b2z, c2 = tb(8), tb(9), tb(10), tb(11)

                den = dx * nx + dy * ny + dz * nz
                num = k0 - (ox * nx + oy * ny + oz * nz)
                t = num / jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
                u = (ox * b1x + oy * b1y + oz * b1z) - c1 \
                    + t * (dx * b1x + dy * b1y + dz * b1z)
                v = (ox * b2x + oy * b2y + oz * b2z) - c2 \
                    + t * (dx * b2x + dy * b2y + dz * b2z)
                hit = ((jnp.abs(den) > 1e-12) & (u >= 0.0) & (v >= 0.0)
                       & (u + v <= 1.0) & (t >= mint) & (t < best_t))
                tid = iota_sub + jnp.float32(1.0) * base
                best_u = jnp.where(hit, u, best_u)
                best_v = jnp.where(hit, v, best_v)
                best_p = jnp.where(hit, tid, best_p)
                best_t = jnp.where(hit, t, best_t)
            return best_t, best_u, best_v, best_p

        best_t, best_u, best_v, best_p = jax.lax.fori_loop(
            0, cnt_ref[gi, 0], surv_body,
            (best_t, best_u, best_v, best_p))

        tmin = jnp.min(best_t, axis=0, keepdims=True)  # [1,128]
        is_min = (best_t == tmin) & (best_p >= 0.0)
        found = jnp.any(is_min, axis=0, keepdims=True)
        first = jnp.min(jnp.where(is_min, iota_sub, 1e9), axis=0,
                        keepdims=True)
        sel = is_min & (iota_sub == first)
        u_min = jnp.sum(jnp.where(sel, best_u, 0.0), axis=0, keepdims=True)
        v_min = jnp.sum(jnp.where(sel, best_v, 0.0), axis=0, keepdims=True)
        p_min = jnp.sum(jnp.where(sel, best_p, 0.0), axis=0, keepdims=True)

        out_ref[0:1, cols] = tmin
        out_ref[1:2, cols] = u_min
        out_ref[2:3, cols] = v_min
        out_ref[3:4, cols] = jnp.where(found, p_min, -1.0)
        out_ref[4:5, cols] = jnp.where(found, 1.0, 0.0)

    for gi in range(GROUPS):
        group(gi)


def cluster_mask(cluster_aabb, org, direction, min_t, max_t):
    """[N, M] bool: the ray segment [min_t, max_t] can hit cluster AABB.

    Dense vectorized slab test (XLA fuses it into one elementwise+reduce
    pass); rays with max_t < 0 (dead/padding) get an all-false row.
    """
    inv = 1.0 / jnp.where(jnp.abs(direction) < 1e-12, 1e-12, direction)
    o = org

    def axis(k):
        t0 = (cluster_aabb[k][None, :] - o[:, k:k + 1]) * inv[:, k:k + 1]
        t1 = (cluster_aabb[k + 3][None, :] - o[:, k:k + 1]) * inv[:, k:k + 1]
        return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

    n0, f0 = axis(0)
    n1, f1 = axis(1)
    n2, f2 = axis(2)
    tnear = jnp.maximum(jnp.maximum(n0, n1), n2)
    tfar = jnp.minimum(jnp.minimum(f0, f1), f2)
    return ((tnear <= tfar * 1.00000024) & (tfar >= min_t[:, None])
            & (tnear <= max_t[:, None]))


def signature_key(cluster_aabb, org, direction, min_t, max_t):
    """uint32 sort key grouping rays by which cluster AABBs they hit.

    Rays with equal keys hit exactly the same clusters (for M <= 32; above
    that bits alias, which only degrades grouping, never correctness), so
    sorting by this key makes per-group survivor unions tight.
    """
    m = cluster_mask(cluster_aabb, org, direction, min_t, max_t)
    M = m.shape[1]
    key = jnp.zeros(m.shape[0], jnp.uint32)
    for c in range(M):
        key = key | (m[:, c].astype(jnp.uint32) << jnp.uint32(c % 32))
    return key


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def dense_trace_v3(packed_tris, cluster_aabb, org, direction, min_t, max_t,
                   any_hit=False, interpret=False):
    """Same contract as dense.dense_trace. any_hit only affects the caller's
    interpretation (no in-kernel early exit: the survivor lists are already
    tight for short shadow rays via the max_t-aware mask)."""
    del any_hit
    n = org.shape[0]
    n_pad = (n + RAY_TILE - 1) // RAY_TILE * RAY_TILE
    pad = n_pad - n
    if pad:
        org = jnp.concatenate([org, jnp.zeros((pad, 3), org.dtype)])
        direction = jnp.concatenate(
            [direction, jnp.ones((pad, 3), direction.dtype)])
        min_t = jnp.concatenate([min_t, jnp.zeros((pad,), min_t.dtype)])
        max_t = jnp.concatenate([max_t, jnp.full((pad,), -1.0, max_t.dtype)])
    max_t = jnp.minimum(max_t, INF)

    # all culling happens HERE, in XLA
    hitm = cluster_mask(cluster_aabb, org, direction, min_t, max_t)
    gm = hitm.reshape(n_pad // LANES, LANES, -1).any(axis=1)  # [G, M]
    cnt = gm.sum(axis=1).astype(jnp.int32)[:, None]  # [G, 1]
    # compact surviving ids to the left (stable argsort on ~mask)
    surv = jnp.argsort(~gm, axis=1, stable=True).astype(jnp.int32)  # [G, M]

    rays = jnp.stack([org[:, 0], org[:, 1], org[:, 2], direction[:, 0],
                      direction[:, 1], direction[:, 2], min_t, max_t])

    tris_rows = packed_tris.T  # [Fpad, 12]
    M = cluster_aabb.shape[1]
    out = pl.pallas_call(
        _trace_kernel,
        grid=(n_pad // RAY_TILE,),
        in_specs=[
            pl.BlockSpec((8, RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tris_rows.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUPS, M), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((GROUPS, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, RAY_TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        interpret=interpret,
    )(rays, tris_rows, surv, cnt)
    hit = out[4, :n] > 0.0
    return {
        "t": jnp.where(hit, out[0, :n], INF),
        "u": out[1, :n],
        "v": out[2, :n],
        "prim": jnp.where(hit, out[3, :n].astype(jnp.int32), -1),
    }
