"""Pallas TPU kernel V2: rays-on-lanes dense clustered intersection.

Layout lessons from V1 (see dense.py): per-iteration scalar overhead
(lax.cond, SMEM reads, bookkeeping) dominated when each iteration covered
only 8 rays x 128 triangles with rays on sublanes. V2 flips the layout:

* 128 RAYS on the lane axis per group, 8 TRIANGLES on sublanes per step;
  a cluster is 16 statically-unrolled tri-steps, so one lax.cond / slab
  test / SMEM read amortizes over 128 rays x 128 triangles;
* each tri-step loads the whole [8, 12] triangle row block with ONE VMEM
  load and lane-broadcasts the 12 columns, instead of 12 separate loads;
* the running best lives per (tri-slot, ray) in [8, 128] vregs across the
  whole cluster loop; the cross-sublane argmin runs once per ray group.

Precomputed linear-form triangle data and Morton clustering are shared
with V1 (pack_triangles in dense.py).
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
SLOTS = 8  # triangles per step (sublanes)
STEPS = TRI_BLOCK // SLOTS  # tri-steps per cluster
RAY_TILE = 4096  # rays per grid cell


def _trace_kernel(ray_ref, tri_ref, aabb_ref, out_ref, *, n_clusters,
                  any_hit):
    """ray_ref [8, RAY_TILE] rows ox oy oz dx dy dz mint maxt (quantity-major)
    tri_ref [Fpad, 12] row-major linear forms
    aabb_ref [8, M] (SMEM)
    out_ref [8, RAY_TILE] rows: t, u, v, prim, hit, unused...
    """
    n_groups = RAY_TILE // LANES
    B = (SLOTS, LANES)
    iota_sub = jax.lax.broadcasted_iota(jnp.int32, B, 0).astype(jnp.float32)

    def group(gi, _):
        cols = pl.ds(gi * LANES, LANES)
        r = ray_ref[:, cols]  # [8, 128]
        o1 = [r[i:i + 1, :] for i in range(8)]  # [1,128] each
        ox, oy, oz, dx, dy, dz, mint, maxt = (
            jnp.broadcast_to(q, B) for q in o1)
        inv_x = 1.0 / jnp.where(jnp.abs(o1[3]) < 1e-12, 1e-12, o1[3])
        inv_y = 1.0 / jnp.where(jnp.abs(o1[4]) < 1e-12, 1e-12, o1[4])
        inv_z = 1.0 / jnp.where(jnp.abs(o1[5]) < 1e-12, 1e-12, o1[5])

        # fold max_t into the initial best (saves a compare per tri-step);
        # found-ness is tracked through best_p (-1 = none)
        best_t = maxt
        best_u = jnp.zeros(B, jnp.float32)
        best_v = jnp.zeros(B, jnp.float32)
        best_p = jnp.full(B, -1.0, jnp.float32)

        def cluster_body(c, carry):
            best_t, best_u, best_v, best_p = carry
            bminx = aabb_ref[0, c]
            bminy = aabb_ref[1, c]
            bminz = aabb_ref[2, c]
            bmaxx = aabb_ref[3, c]
            bmaxy = aabb_ref[4, c]
            bmaxz = aabb_ref[5, c]
            tx0 = (bminx - o1[0]) * inv_x
            tx1 = (bmaxx - o1[0]) * inv_x
            ty0 = (bminy - o1[1]) * inv_y
            ty1 = (bmaxy - o1[1]) * inv_y
            tz0 = (bminz - o1[2]) * inv_z
            tz1 = (bmaxz - o1[2]) * inv_z
            tnear = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                            jnp.minimum(ty0, ty1)),
                                jnp.minimum(tz0, tz1))
            tfar = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                           jnp.maximum(ty0, ty1)),
                               jnp.maximum(tz0, tz1))
            # cull against the per-lane running best, not just maxt
            lane_best = jnp.min(best_t, axis=0, keepdims=True)  # [1,128]
            box_hit = ((tnear <= tfar * 1.00000024) & (tfar >= o1[6])
                       & (tnear <= lane_best))

            def tri_test(carry):
                best_t, best_u, best_v, best_p = carry
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

            do_cluster = jnp.any(box_hit)
            if any_hit:
                # shadow rays: stop testing once every LANE found a hit
                # (per-lane found = OR over the 8 tri slots)
                lane_found = jnp.any(best_p >= 0.0, axis=0, keepdims=True)
                do_cluster = do_cluster & ~jnp.all(lane_found)
            return jax.lax.cond(do_cluster, tri_test,
                                lambda carry_: carry_,
                                (best_t, best_u, best_v, best_p))

        best_t, best_u, best_v, best_p = jax.lax.fori_loop(
            0, n_clusters, cluster_body, (best_t, best_u, best_v, best_p))

        # cross-sublane argmin once per group; found-ness via best_p >= 0
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
        return _

    jax.lax.fori_loop(0, n_groups, group, 0)


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def dense_trace_v2(packed_tris, cluster_aabb, org, direction, min_t, max_t,
                   any_hit=False, interpret=False):
    """Same contract as dense.dense_trace, V2 layout."""
    n = org.shape[0]
    n_pad = (n + RAY_TILE - 1) // RAY_TILE * RAY_TILE
    rays = jnp.zeros((8, n_pad), jnp.float32)
    rays = rays.at[0:3, :n].set(org.T)
    rays = rays.at[3:6, :n].set(direction.T)
    rays = rays.at[6, :n].set(min_t)
    rays = rays.at[7, :n].set(jnp.minimum(max_t, INF))
    if n_pad > n:
        rays = rays.at[3:6, n:].set(1.0)
        rays = rays.at[7, n:].set(-1.0)

    tris_rows = packed_tris.T  # [Fpad, 12]
    n_clusters = cluster_aabb.shape[1]
    kernel = functools.partial(_trace_kernel, n_clusters=n_clusters,
                               any_hit=any_hit)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // RAY_TILE,),
        in_specs=[
            pl.BlockSpec((8, RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tris_rows.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n_clusters), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, RAY_TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        interpret=interpret,
    )(rays, tris_rows, cluster_aabb)
    hit = out[4, :n] > 0.0
    return {
        "t": jnp.where(hit, out[0, :n], INF),
        "u": out[1, :n],
        "v": out[2, :n],
        "prim": jnp.where(hit, out[3, :n].astype(jnp.int32), -1),
    }
