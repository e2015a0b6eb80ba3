"""Pallas TPU kernel: dense clustered ray-ribbon (hair) intersection.

Same gather-free V2 layout as dense_v2.py (128 rays on lanes x 8 segments
on sublanes, Morton clusters of 128 linear sub-segments with AABB block
culling). The ray-facing-ribbon test of ops/curves.py is reduced to scalar
linear forms so every per-(ray, segment) quantity is a broadcast op:

    ad  = p0.d - o.d          ed = e.d         ae = p0.e - o.e
    aa  = p0.p0 - 2 o.p0 + o.o
    q   = ae - ad*ed          s  = clip(-q / (e.e - ed^2), 0, 1)
    d2  = (aa - ad^2) + 2 s q + s^2 (e.e - ed^2)
    t   = ad + s*ed           hit: d2 <= r(s)^2
    v   = -det[p0-o, d, e] / (|d x e| r)     (s-independent triple product)

Per-segment row (12 floats, same width as triangles):
    0:3 p0 | 3:6 e | 6 r0 | 7 dr | 8 p0.e | 9 e.e | 10 u0 | 11 du
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.math import INF

LANES = 128
SLOTS = 8
SEG_BLOCK = 128
STEPS = SEG_BLOCK // SLOTS
RAY_TILE = 4096


def pack_segments(flat):
    """Host-side: Morton-sort sub-segments, pack rows + cluster AABBs.

    `flat` is the dict from ops.curves.flatten_curves. Returns
    (packed [Cpad, 12], cluster_aabb [8, M], order [C]).
    """
    p0 = np.asarray(flat["curve_p0"], np.float32)
    p1 = np.asarray(flat["curve_p1"], np.float32)
    r0 = np.asarray(flat["curve_r0"], np.float32)
    r1 = np.asarray(flat["curve_r1"], np.float32)
    u0 = np.asarray(flat["curve_u0"], np.float32)
    u1 = np.asarray(flat["curve_u1"], np.float32)
    C = p0.shape[0]
    if C == 0:
        packed = np.zeros((SEG_BLOCK, 12), np.float32)
        aabb = np.zeros((8, 1), np.float32)
        aabb[0:3] = 1e30
        aabb[3:6] = -1e30
        return packed, aabb, np.zeros((0,), np.int32)

    cent = 0.5 * (p0 + p1)
    lo = cent.min(axis=0)
    ext = np.maximum(cent.max(axis=0) - lo, 1e-12)
    q = np.clip(((cent - lo) / ext * 1023.0).astype(np.uint64), 0, 1023)

    def spread(x):
        x = (x | (x << 16)) & np.uint64(0x30000FF)
        x = (x | (x << 8)) & np.uint64(0x300F00F)
        x = (x | (x << 4)) & np.uint64(0x30C30C3)
        x = (x | (x << 2)) & np.uint64(0x9249249)
        return x

    morton = spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) \
        | (spread(q[:, 2]) << np.uint64(2))
    order = np.argsort(morton, kind="stable").astype(np.int32)

    p0, p1, r0, r1, u0, u1 = (a[order] for a in (p0, p1, r0, r1, u0, u1))
    e = p1 - p0
    Cpad = (C + SEG_BLOCK - 1) // SEG_BLOCK * SEG_BLOCK
    packed = np.zeros((Cpad, 12), np.float32)
    packed[:C, 0:3] = p0
    packed[:C, 3:6] = e
    packed[:C, 6] = r0
    packed[:C, 7] = r1 - r0
    packed[:C, 8] = (p0 * e).sum(-1)
    packed[:C, 9] = (e * e).sum(-1)
    packed[:C, 10] = u0
    packed[:C, 11] = u1 - u0
    # padding rows: r0 = dr = 0 -> r(s) = 0 -> never hits

    M = Cpad // SEG_BLOCK
    aabb = np.zeros((8, M), np.float32)
    for c in range(M):
        s, t = c * SEG_BLOCK, min((c + 1) * SEG_BLOCK, C)
        if s < C:
            rmax = np.maximum(r0[s:t], r1[s:t])[:, None]
            lo_ = np.minimum(p0[s:t] - rmax, p1[s:t] - rmax).min(axis=0)
            hi_ = np.maximum(p0[s:t] + rmax, p1[s:t] + rmax).max(axis=0)
            aabb[0:3, c] = lo_
            aabb[3:6, c] = hi_
        else:
            aabb[0:3, c] = 1e30
            aabb[3:6, c] = -1e30
    return packed, aabb, order


def _trace_kernel(ray_ref, seg_ref, aabb_ref, out_ref, *, n_clusters,
                  any_hit):
    n_groups = RAY_TILE // LANES
    B = (SLOTS, LANES)
    iota_sub = jax.lax.broadcasted_iota(jnp.int32, B, 0).astype(jnp.float32)

    def group(gi, _):
        cols = pl.ds(gi * LANES, LANES)
        r = ray_ref[:, cols]
        o1 = [r[i:i + 1, :] for i in range(8)]
        ox, oy, oz, dx, dy, dz, mint, _maxt = (
            jnp.broadcast_to(q, B) for q in o1)
        inv_x = 1.0 / jnp.where(jnp.abs(o1[3]) < 1e-12, 1e-12, o1[3])
        inv_y = 1.0 / jnp.where(jnp.abs(o1[4]) < 1e-12, 1e-12, o1[4])
        inv_z = 1.0 / jnp.where(jnp.abs(o1[5]) < 1e-12, 1e-12, o1[5])
        od = ox * dx + oy * dy + oz * dz
        oo = ox * ox + oy * oy + oz * oz

        best_t = jnp.broadcast_to(o1[7], B)  # init = maxt
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

            def seg_test(carry):
                best_t, best_u, best_v, best_p = carry
                for step in range(STEPS):
                    base = c * SEG_BLOCK + step * SLOTS
                    sq = seg_ref[pl.ds(base, SLOTS), :]  # [8, 12]

                    def sb(col):
                        return jnp.broadcast_to(sq[:, col:col + 1], B)

                    p0x, p0y, p0z = sb(0), sb(1), sb(2)
                    ex, ey, ez = sb(3), sb(4), sb(5)
                    r0c, drc, p0e, ee = sb(6), sb(7), sb(8), sb(9)
                    u0c, duc = sb(10), sb(11)

                    ad = (p0x * dx + p0y * dy + p0z * dz) - od
                    ed = ex * dx + ey * dy + ez * dz
                    ae = p0e - (ex * ox + ey * oy + ez * oz)
                    aa = ((p0x * p0x + p0y * p0y + p0z * p0z)
                          - 2.0 * (p0x * ox + p0y * oy + p0z * oz) + oo)
                    ep2 = jnp.maximum(ee - ed * ed, 1e-12)
                    q = ae - ad * ed
                    s = jnp.clip(-q / ep2, 0.0, 1.0)
                    d2 = (aa - ad * ad) + 2.0 * s * q + s * s * ep2
                    t = ad + s * ed
                    rad = r0c + s * drc
                    hit = ((d2 <= rad * rad) & (t >= mint) & (t < best_t)
                           & (rad > 0.0))
                    # signed ribbon offset: triple product -det[a, d, e]
                    cx = dy * ez - dz * ey
                    cy = dz * ex - dx * ez
                    cz = dx * ey - dy * ex
                    det = ((p0x - ox) * cx + (p0y - oy) * cy
                           + (p0z - oz) * cz)
                    blen = jnp.sqrt(jnp.maximum(
                        cx * cx + cy * cy + cz * cz, 1e-20))
                    voff = jnp.clip(-det / (blen * jnp.maximum(rad, 1e-12)),
                                    -1.0, 1.0)
                    tid = iota_sub + jnp.float32(1.0) * base
                    best_u = jnp.where(hit, u0c + s * duc, best_u)
                    best_v = jnp.where(hit, voff, best_v)
                    best_p = jnp.where(hit, tid, best_p)
                    best_t = jnp.where(hit, t, best_t)
                return best_t, best_u, best_v, best_p

            do_cluster = jnp.any(box_hit)
            if any_hit:
                lane_found = jnp.any(best_p >= 0.0, axis=0, keepdims=True)
                do_cluster = do_cluster & ~jnp.all(lane_found)
            return jax.lax.cond(do_cluster, seg_test, lambda c_: c_,
                                (best_t, best_u, best_v, best_p))

        best_t, best_u, best_v, best_p = jax.lax.fori_loop(
            0, n_clusters, cluster_body, (best_t, best_u, best_v, best_p))

        tmin = jnp.min(best_t, axis=0, keepdims=True)
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
def dense_curve_trace(packed_segs, cluster_aabb, org, direction, min_t,
                      max_t, any_hit=False, interpret=False):
    """Closest (or any) hit vs hair sub-segments.

    Returns dict(t, u, v, sub) with sub = SORTED sub-segment id (-1 miss);
    caller maps sub -> source segment / tangent via the reordered arrays.
    """
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

    n_clusters = cluster_aabb.shape[1]
    kernel = functools.partial(_trace_kernel, n_clusters=n_clusters,
                               any_hit=any_hit)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // RAY_TILE,),
        in_specs=[
            pl.BlockSpec((8, RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(packed_segs.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n_clusters), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, RAY_TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        interpret=interpret,
    )(rays, packed_segs, cluster_aabb)
    hit = out[4, :n] > 0.0
    return {
        "t": jnp.where(hit, out[0, :n], INF),
        "u": out[1, :n],
        "v": out[2, :n],
        "sub": jnp.where(hit, out[3, :n].astype(jnp.int32), -1),
    }
