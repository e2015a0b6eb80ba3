"""Pallas TPU kernel V4: scalar-triangle survivor-list intersection.

Replaces rtcIntersect1 / rtcOccluded1
(/root/reference/src/raytracer/raytracer_impl.cc:268-287).

Lessons V2/V3 taught (judge-measured on chip, ARCHITECTURE.md):

* V3's [8-tris-in-sublanes x 128-rays-in-lanes] layout pays a lane
  broadcast per triangle attribute (12 per 8 tris) plus dynamic-slice
  vector loads — Mosaic lowers both poorly; the kernel ran at ~25% of its
  op-count bound (6.9 of ~28 Mray/s).
* The beam (interval) cull over 128-ray groups was loose: 11-12 of 21
  cluster survivors where the exact per-ray union is 5.8.

V4 removes every vector-lowering hazard:

* A ray group is 1024 rays filling BOTH vreg dims: each ray attribute is
  one native (8, 128) vreg — zero broadcasts, zero transposes, and the
  closest hit is tracked per element, so there is NO cross-lane argmin
  epilogue at all.
* Triangle data is read as SMEM *scalars* (12 per triangle) and enters the
  VPU as scalar operands: dynamic indexing of SMEM by the survivor list is
  cheap scalar address arithmetic (vs V3's slow dynamic vector slices).
* Clusters are SAH-BVH subtrees of <= 32 tris (pack_triangles_sah):
  scalar operands make the cluster size independent of the 128-lane
  width, so culling granularity is 4x finer than V2/V3's 128.
* Culling runs in XLA with EXACT per-ray slab tests (cheap: ~20 ops per
  (ray, cluster)), reduced to per-1024-group survivor lists sorted
  front-to-back by the group's tnear lower bound; the kernel early-exits
  once every lane's best_t beats the next cluster's tnear (ordered
  traversal as raytracer_impl.cc:268-287), and any-hit additionally stops
  when every lane found an occluder.

Contract matches dense.dense_trace: returns dict(t, u, v, prim) with prim
in the SAH-sorted order (scene commit reorders all face columns to match).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.math import INF

GROUP = 1024  # rays per group: 8 sublanes x 128 lanes
TILE = GROUP  # rays per grid step (one group per step)
CLUSTER = 32  # triangles per cluster (SAH leaf window)
_BIG = jnp.float32(1e30)

# rows of the packed triangle matrix [12, Fpad] (same linear forms as
# dense.pack_triangles; attr-major so the SMEM window's 128-padded last
# dim is the long one — Mosaic pads the LAST dim of SMEM windows to 128,
# which would inflate [Fpad, 12] by 10.7x past the 1MB SMEM budget):
# 0:3 n, 3 k0(=n.v0), 4:7 b1, 7 c1(=b1.v0), 8:11 b2, 11 c2(=b2.v0)


def pack_triangles_sah(tri_v0: np.ndarray, tri_e1: np.ndarray,
                       tri_e2: np.ndarray, cluster: int = CLUSTER):
    """SAH-subtree clustering: leaves of a binned-SAH BVH with
    leaf_size=cluster become fixed 'cluster'-wide windows (padded slots are
    all-zero rows -> den=0 -> miss). Boxes are much tighter than Morton
    runs (measured: ~30% fewer slab survivors on incoherent rays).

    Returns (packed [Fpad, 12], cluster_aabb [8, M], order [Fpad] source
    ids with -1 padding).
    """
    from ...geometry.bvh import build_bvh

    F = tri_v0.shape[0]
    if F == 0:
        packed = np.zeros((12, cluster), np.float32)
        aabb = np.zeros((8, 1), np.float32)
        aabb[0:3] = 1e30
        aabb[3:6] = -1e30
        return packed, aabb, np.full((cluster,), -1, np.int32)

    bmin = np.minimum(np.minimum(tri_v0, tri_v0 + tri_e1), tri_v0 + tri_e2)
    bmax = np.maximum(np.maximum(tri_v0, tri_v0 + tri_e1), tri_v0 + tri_e2)
    bvh = build_bvh(bmin, bmax, leaf_size=cluster)
    leaf = bvh.prim_offset >= 0
    lo = bvh.aabb_min[leaf]
    hi = bvh.aabb_max[leaf]
    order = bvh.prim_ids.astype(np.int32)  # [M*cluster], -1 padded
    M = lo.shape[0]
    assert order.shape[0] == M * cluster

    src = np.maximum(order, 0)
    v0 = tri_v0[src]
    e1 = tri_e1[src]
    e2 = tri_e2[src]
    n = np.cross(e1, e2)
    nn = np.maximum((n * n).sum(-1, keepdims=True), 1e-30)
    b1 = np.cross(e2, n) / nn
    b2 = np.cross(n, e1) / nn

    packed = np.zeros((12, M * cluster), np.float32)
    packed[0:3] = n.T
    packed[3] = (n * v0).sum(-1)
    packed[4:7] = b1.T
    packed[7] = (b1 * v0).sum(-1)
    packed[8:11] = b2.T
    packed[11] = (b2 * v0).sum(-1)
    packed[:, order < 0] = 0.0  # padding: den = 0 -> miss

    aabb = np.zeros((8, M), np.float32)
    aabb[0:3] = lo.T
    aabb[3:6] = hi.T
    return packed, aabb, order


def _trace_kernel(ray_ref, tri_ref, surv_ref, cnt_ref, tnear_ref, out_ref,
                  *, any_hit, cluster):
    """One 1024-ray group per grid step.

    ray_ref [1, 8, 8, 128] (VMEM): attr-major 1024-ray block
      (ox oy oz dx dy dz mint maxt).
    tri_ref [12, Fpad] (SMEM): whole packed triangle table as scalars
      (resident across steps — index_map is constant).
    surv_ref [1, 1, M] / cnt_ref [1, 1, 1] / tnear_ref [1, 1, M] (SMEM):
      this group's front-to-back survivor ids / count / tnear lower bounds
      (the extra singleton dim satisfies the SMEM block-shape rule: the
      block's last two dims equal the array's).
    out_ref [1, 8, 8, 128] (VMEM): rows t, u, v, prim, hit, 0, 0, 0.
    """
    n_surv_max = surv_ref.shape[2]

    def group(g):
        ox = ray_ref[g, 0]
        oy = ray_ref[g, 1]
        oz = ray_ref[g, 2]
        dx = ray_ref[g, 3]
        dy = ray_ref[g, 4]
        dz = ray_ref[g, 5]
        mint = ray_ref[g, 6]
        maxt = ray_ref[g, 7]

        # max_t folds into the initial best; found-ness rides best_p
        best_t = maxt
        zero = jnp.zeros_like(ox)
        best_u = zero
        best_v = zero
        best_p = zero - 1.0

        def cond(carry):
            si, best_t, best_u, best_v, best_p = carry
            live = si < cnt_ref[g, 0, 0]
            # relative pad keeps the cutoff as tolerant as the slab test
            nxt = tnear_ref[g, 0, jnp.minimum(si, n_surv_max - 1)]
            can_improve = jnp.max(best_t) > nxt * (1.0 - 1e-6) - 1e-6
            if any_hit:
                # dead/invalid lanes (maxt < mint) count as done, else a
                # single dead lane blocks the early exit forever
                can_improve = can_improve & ~jnp.all((best_p >= 0.0)
                                                     | (maxt < mint))
            return live & can_improve

        def body(carry):
            si, best_t, best_u, best_v, best_p = carry
            base = surv_ref[g, 0, si] * cluster
            for k in range(cluster):
                i = base + k
                nx = tri_ref[0, i]
                ny = tri_ref[1, i]
                nz = tri_ref[2, i]
                k0 = tri_ref[3, i]
                den = dx * nx + dy * ny + dz * nz
                num = k0 - (ox * nx + oy * ny + oz * nz)
                # den==0 -> t inf/nan -> every comparison below fails
                # (padding rows are all-zero, so they can never hit)
                t = num / den
                b1x = tri_ref[4, i]
                b1y = tri_ref[5, i]
                b1z = tri_ref[6, i]
                c1 = tri_ref[7, i]
                u = (ox * b1x + oy * b1y + oz * b1z - c1) \
                    + t * (dx * b1x + dy * b1y + dz * b1z)
                b2x = tri_ref[8, i]
                b2y = tri_ref[9, i]
                b2z = tri_ref[10, i]
                c2 = tri_ref[11, i]
                v = (ox * b2x + oy * b2y + oz * b2z - c2) \
                    + t * (dx * b2x + dy * b2y + dz * b2z)
                ok = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                      & (t >= mint) & (t < best_t))
                fi = i.astype(jnp.float32)
                best_u = jnp.where(ok, u, best_u)
                best_v = jnp.where(ok, v, best_v)
                best_p = jnp.where(ok, fi, best_p)
                best_t = jnp.where(ok, t, best_t)
            return si + 1, best_t, best_u, best_v, best_p

        _, best_t, best_u, best_v, best_p = jax.lax.while_loop(
            cond, body, (jnp.int32(0), best_t, best_u, best_v, best_p))

        found = best_p >= 0.0
        out_ref[g, 0] = best_t
        out_ref[g, 1] = best_u
        out_ref[g, 2] = best_v
        out_ref[g, 3] = best_p
        out_ref[g, 4] = jnp.where(found, 1.0, 0.0)
        out_ref[g, 5] = zero
        out_ref[g, 6] = zero
        out_ref[g, 7] = zero

    group(0)


def exact_group_survivors(cluster_aabb, org, direction, min_t, max_t,
                          group=GROUP):
    """Exact per-ray slab test -> per-group survivor mask + tnear bound.

    Returns (gm [G, M] bool, tnear_lo [G, M] f32): gm[g, c] iff ANY ray of
    group g can hit cluster c within its [min_t, max_t]; tnear_lo is the
    min over the group's hitting rays of the slab tnear (clamped >= 0 via
    min_t >= 0), the front-to-back sort key. Cost O(N*M) elementwise —
    ~20 ops per pair, negligible next to the trace for M up to ~hundreds.
    """
    n = org.shape[0]
    g = n // group
    inv = 1.0 / jnp.where(jnp.abs(direction) < 1e-12,
                          jnp.where(direction < 0.0, -1e-12, 1e-12),
                          direction)
    o = org

    def axis(k):
        t0 = (cluster_aabb[k][None, :] - o[:, k:k + 1]) * inv[:, k:k + 1]
        t1 = (cluster_aabb[k + 3][None, :] - o[:, k:k + 1]) * inv[:, k:k + 1]
        return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

    n0, f0 = axis(0)
    n1, f1 = axis(1)
    n2, f2 = axis(2)
    tnear = jnp.maximum(jnp.maximum(jnp.maximum(n0, n1), n2),
                        min_t[:, None])
    tfar = jnp.minimum(jnp.minimum(jnp.minimum(f0, f1), f2),
                       max_t[:, None])
    mask = (tnear <= tfar * 1.00000024) & (max_t >= min_t)[:, None]
    M = cluster_aabb.shape[1]
    gm = mask.reshape(g, group, M).any(axis=1)
    tnear_lo = jnp.where(mask, tnear, _BIG).reshape(g, group, M).min(axis=1)
    return gm, tnear_lo


def _trace_kernel_dual(ray_ref, tri_ref, surv_ref, cnt_ref, tnear_ref,
                       out_ref, *, cluster):
    """Dual-query variant: one 1024-LANE group per grid step, each lane
    carrying a closest-hit query AND an any-hit (shadow) query that SHARE
    the ray origin (deferred NEE: the shadow ray leaves the same hit
    point as the continuation ray). One survivor walk serves both: the
    per-triangle SMEM scalar fetches and the three origin dot products
    are paid once, and overlapping footprints (common near-origin
    clusters) are visited once instead of twice.

    ray_ref [1, 16, 8, 128]: rows 0:3 org | 3:6 closest dir | 6 mint_c |
      7 maxt_c | 8:11 shadow dir | 11 mint_s | 12 maxt_s (< mint_s = no
      shadow query) | 13:16 pad.
    out_ref [1, 8, 8, 128]: rows t, u, v, prim, hit, occluded, 0, 0.
    Survivor lists must cover the UNION of both queries' slab tests.
    """
    n_surv_max = surv_ref.shape[2]
    g = 0
    ox = ray_ref[g, 0]
    oy = ray_ref[g, 1]
    oz = ray_ref[g, 2]
    dx = ray_ref[g, 3]
    dy = ray_ref[g, 4]
    dz = ray_ref[g, 5]
    mint = ray_ref[g, 6]
    maxt = ray_ref[g, 7]
    sx = ray_ref[g, 8]
    sy = ray_ref[g, 9]
    sz = ray_ref[g, 10]
    smint = ray_ref[g, 11]
    smaxt = ray_ref[g, 12]

    best_t = maxt
    zero = jnp.zeros_like(ox)
    best_u = zero
    best_v = zero
    best_p = zero - 1.0
    occ = zero  # 1.0 once the shadow query finds any hit
    s_dead = smaxt < smint  # no shadow query on this lane

    def cond(carry):
        si, best_t, best_u, best_v, best_p, occ = carry
        live = si < cnt_ref[g, 0, 0]
        nxt = tnear_ref[g, 0, jnp.minimum(si, n_surv_max - 1)]
        nxt_pad = nxt * (1.0 - 1e-6) - 1e-6
        can_c = jnp.max(best_t) > nxt_pad
        # unresolved shadow lanes can still be occluded by clusters
        # entered before their maxt
        gs = jnp.max(jnp.where(s_dead | (occ > 0.0), -1.0, smaxt))
        can_s = gs > nxt_pad
        return live & (can_c | can_s)

    def body(carry):
        si, best_t, best_u, best_v, best_p, occ = carry
        base = surv_ref[g, 0, si] * cluster
        for k in range(cluster):
            i = base + k
            nx = tri_ref[0, i]
            ny = tri_ref[1, i]
            nz = tri_ref[2, i]
            k0 = tri_ref[3, i]
            b1x = tri_ref[4, i]
            b1y = tri_ref[5, i]
            b1z = tri_ref[6, i]
            c1 = tri_ref[7, i]
            b2x = tri_ref[8, i]
            b2y = tri_ref[9, i]
            b2z = tri_ref[10, i]
            c2 = tri_ref[11, i]
            # origin terms are shared by both queries
            num = k0 - (ox * nx + oy * ny + oz * nz)
            ob1 = ox * b1x + oy * b1y + oz * b1z - c1
            ob2 = ox * b2x + oy * b2y + oz * b2z - c2
            # closest-hit query
            den = dx * nx + dy * ny + dz * nz
            t = num / den
            u = ob1 + t * (dx * b1x + dy * b1y + dz * b1z)
            v = ob2 + t * (dx * b2x + dy * b2y + dz * b2z)
            ok = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                  & (t >= mint) & (t < best_t))
            fi = i.astype(jnp.float32)
            best_u = jnp.where(ok, u, best_u)
            best_v = jnp.where(ok, v, best_v)
            best_p = jnp.where(ok, fi, best_p)
            best_t = jnp.where(ok, t, best_t)
            # shadow any-hit query
            dens = sx * nx + sy * ny + sz * nz
            ts = num / dens
            us = ob1 + ts * (sx * b1x + sy * b1y + sz * b1z)
            vs = ob2 + ts * (sx * b2x + sy * b2y + sz * b2z)
            oks = ((us >= 0.0) & (vs >= 0.0) & (us + vs <= 1.0)
                   & (ts >= smint) & (ts < smaxt))
            occ = jnp.where(oks, 1.0, occ)
        return si + 1, best_t, best_u, best_v, best_p, occ

    _, best_t, best_u, best_v, best_p, occ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), best_t, best_u, best_v, best_p, occ))

    found = best_p >= 0.0
    out_ref[g, 0] = best_t
    out_ref[g, 1] = best_u
    out_ref[g, 2] = best_v
    out_ref[g, 3] = best_p
    out_ref[g, 4] = jnp.where(found, 1.0, 0.0)
    out_ref[g, 5] = occ
    out_ref[g, 6] = zero
    out_ref[g, 7] = zero


@functools.partial(jax.jit, static_argnames=("interpret",))
def dense_trace_v4_dual(packed_tris, cluster_aabb, org, direction, min_t,
                        max_t, sdir, smin_t, smax_t, interpret=False):
    """Closest hit + shadow any-hit in ONE launch; the two queries of a
    lane share the origin `org` (deferred NEE). Returns
    (dict(t, u, v, prim), occluded bool). Shadow lanes with
    smax_t < smin_t ask no shadow query (occluded=False)."""
    n = org.shape[0]
    n_pad = (n + TILE - 1) // TILE * TILE
    pad = n_pad - n
    if pad:
        org = jnp.concatenate([org, jnp.zeros((pad, 3), org.dtype)])
        direction = jnp.concatenate(
            [direction, jnp.ones((pad, 3), direction.dtype)])
        sdir = jnp.concatenate([sdir, jnp.ones((pad, 3), sdir.dtype)])
        min_t = jnp.concatenate([min_t, jnp.zeros((pad,), min_t.dtype)])
        max_t = jnp.concatenate([max_t, jnp.full((pad,), -1.0, max_t.dtype)])
        smin_t = jnp.concatenate([smin_t, jnp.zeros((pad,), smin_t.dtype)])
        smax_t = jnp.concatenate([smax_t, jnp.full((pad,), -1.0,
                                                   smax_t.dtype)])
    max_t = jnp.minimum(max_t, INF)
    smax_t = jnp.minimum(smax_t, INF)

    gm_c, tn_c = exact_group_survivors(cluster_aabb, org, direction,
                                       min_t, max_t)
    gm_s, tn_s = exact_group_survivors(cluster_aabb, org, sdir,
                                       smin_t, smax_t)
    gm = gm_c | gm_s
    tnear_lo = jnp.minimum(tn_c, tn_s)
    cnt = gm.sum(axis=1).astype(jnp.int32)[:, None]
    key = jnp.where(gm, tnear_lo, _BIG)
    surv = jnp.argsort(key, axis=1, stable=True).astype(jnp.int32)
    tnear_sorted = jnp.take_along_axis(key, surv, axis=1)

    G = n_pad // GROUP
    rays = jnp.stack([org[:, 0], org[:, 1], org[:, 2], direction[:, 0],
                      direction[:, 1], direction[:, 2], min_t, max_t,
                      sdir[:, 0], sdir[:, 1], sdir[:, 2], smin_t, smax_t,
                      min_t, min_t, min_t])
    rays = rays.reshape(16, G, 8, 128).transpose(1, 0, 2, 3)

    M = cluster_aabb.shape[1]
    out = pl.pallas_call(
        functools.partial(_trace_kernel_dual, cluster=CLUSTER),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 16, 8, 128), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(packed_tris.shape, lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, M), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, M), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 8, 128), lambda g: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, 8, 8, 128), jnp.float32),
        interpret=interpret,
    )(rays, packed_tris, surv[:, None, :], cnt[:, :, None],
      tnear_sorted[:, None, :])

    out = out.transpose(1, 0, 2, 3).reshape(8, n_pad)
    hit = out[4, :n] > 0.0
    return {
        "t": jnp.where(hit, out[0, :n], INF),
        "u": out[1, :n],
        "v": out[2, :n],
        "prim": jnp.where(hit, out[3, :n].astype(jnp.int32), -1),
    }, out[5, :n] > 0.0


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def dense_trace_v4(packed_tris, cluster_aabb, org, direction, min_t, max_t,
                   any_hit=False, interpret=False):
    """Same contract as dense.dense_trace (t, u, v, prim in sorted order)."""
    n = org.shape[0]
    n_pad = (n + TILE - 1) // TILE * TILE
    pad = n_pad - n
    if pad:
        org = jnp.concatenate([org, jnp.zeros((pad, 3), org.dtype)])
        direction = jnp.concatenate(
            [direction, jnp.ones((pad, 3), direction.dtype)])
        min_t = jnp.concatenate([min_t, jnp.zeros((pad,), min_t.dtype)])
        max_t = jnp.concatenate([max_t, jnp.full((pad,), -1.0, max_t.dtype)])
    max_t = jnp.minimum(max_t, INF)

    gm, tnear_lo = exact_group_survivors(cluster_aabb, org, direction,
                                         min_t, max_t)
    cnt = gm.sum(axis=1).astype(jnp.int32)[:, None]  # [G, 1]
    key = jnp.where(gm, tnear_lo, _BIG)
    surv = jnp.argsort(key, axis=1, stable=True).astype(jnp.int32)  # [G, M]
    tnear_sorted = jnp.take_along_axis(key, surv, axis=1)

    G = n_pad // GROUP
    rays = jnp.stack([org[:, 0], org[:, 1], org[:, 2], direction[:, 0],
                      direction[:, 1], direction[:, 2], min_t, max_t])
    rays = rays.reshape(8, G, 8, 128).transpose(1, 0, 2, 3)  # [G, 8, 8, 128]

    M = cluster_aabb.shape[1]
    out = pl.pallas_call(
        functools.partial(_trace_kernel, any_hit=any_hit, cluster=CLUSTER),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 8, 8, 128), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(packed_tris.shape, lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, M), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, M), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 8, 128), lambda g: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, 8, 8, 128), jnp.float32),
        interpret=interpret,
    )(rays, packed_tris, surv[:, None, :], cnt[:, :, None],
      tnear_sorted[:, None, :])

    out = out.transpose(1, 0, 2, 3).reshape(8, n_pad)
    hit = out[4, :n] > 0.0
    return {
        "t": jnp.where(hit, out[0, :n], INF),
        "u": out[1, :n],
        "v": out[2, :n],
        "prim": jnp.where(hit, out[3, :n].astype(jnp.int32), -1),
    }
