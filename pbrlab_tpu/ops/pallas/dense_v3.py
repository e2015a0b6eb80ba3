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
the integrator's compaction sorts lanes by (dead, mode, cell, octant) so
they mostly do (`signature_key` is an exact alternative sort key, currently
used only by scripts/kernel_bench.py). Per-group max_t (shadow rays) is
folded into the culling, so short shadow rays get small survivor lists.

Two cull modes build the survivor lists:

* ``cull="exact"`` — per-ray [N, M] slab test reduced over each group.
  O(N*M) XLA work; exact group unions.
* ``cull="beam"`` (default) — ONE conservative interval-arithmetic slab
  test per 128-ray group: the group's rays are bounded by an origin box x
  an inverse-direction box, and the cluster test runs on those intervals.
  O(N*M/128) work, so culling stays negligible for 100k+ triangle scenes
  (M in the hundreds). Strictly conservative: it can only add survivors,
  never lose one, so results are identical.

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


def _trace_kernel(ray_ref, tri_ref, surv_ref, cnt_ref, tnear_ref, out_ref,
                  *, any_hit):
    """ray_ref [8, RAY_TILE] rows ox oy oz dx dy dz mint maxt
    tri_ref [Fpad, 12] row-major linear forms (dense.pack_triangles)
    surv_ref [GROUPS, M] (SMEM) surviving cluster ids, FRONT-TO-BACK
    cnt_ref [GROUPS, 1] (SMEM) number of survivors per group
    tnear_ref [GROUPS, M] (SMEM) beam tnear lower bound per survivor slot
    out_ref [8, RAY_TILE] rows: t, u, v, prim, hit, unused...

    Early exit (the Embree-style front-to-back walk,
    raytracer_impl.cc:268-287): survivors are sorted by their beam tnear
    lower bound, so once every lane's running best_t <= the next
    survivor's tnear no later cluster can produce a closer hit. For
    any_hit, also stops once every lane found an occluder.
    """
    B = (SLOTS, LANES)
    iota_sub = jax.lax.broadcasted_iota(jnp.int32, B, 0).astype(jnp.float32)
    n_surv_max = surv_ref.shape[1]

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

        def surv_cond(carry):
            si, best_t, best_u, best_v, best_p = carry
            live = si < cnt_ref[gi, 0]
            # front-to-back cutoff: strict improvement needs t < best_t.
            # The relative pad keeps the cutoff as tolerant as the slab
            # test's 1.00000024 slop (degenerate groups can otherwise skip
            # a hit closer by ~1 ulp).
            nxt = tnear_ref[gi, jnp.minimum(si, n_surv_max - 1)]
            can_improve = jnp.max(best_t) > nxt * (1.0 - 1e-6) - 1e-6
            if any_hit:
                all_found = jnp.all(jnp.max(best_p, axis=0) >= 0.0)
                can_improve = can_improve & ~all_found
            return live & can_improve

        def surv_body(carry):
            si, best_t, best_u, best_v, best_p = carry
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
            return si + 1, best_t, best_u, best_v, best_p

        _, best_t, best_u, best_v, best_p = jax.lax.while_loop(
            surv_cond, surv_body,
            (jnp.int32(0), best_t, best_u, best_v, best_p))

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
    pass). Rays with max_t < min_t (dead/padding) get an all-false row, so
    dead lanes never contribute survivors.
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
            & (tnear <= max_t[:, None]) & (max_t >= min_t)[:, None])


_BIG = jnp.float32(1e30)


def group_survivors_beam(cluster_aabb, org, direction, min_t, max_t,
                         lanes=LANES, return_tnear=False):
    """[G, M] bool: conservative "some ray in this 128-lane group can hit
    cluster AABB" via interval arithmetic on the group's ray bounds.
    With return_tnear, also returns the [G, M] tnear lower bound (the
    front-to-back sort key for the kernel's early exit).

    Each group is bounded by an origin box [o_lo, o_hi] and an
    inverse-direction box [i_lo, i_hi]; the slab test is evaluated on those
    intervals (products take the min/max over the 4 endpoint combinations).
    For any ray r in the group, tnear(r) >= tnear_lo and tfar(r) <=
    tfar_hi, so every per-ray pass implies a group pass: strictly
    conservative, never drops a true survivor. Axes whose direction sign
    flips within a group (1/d spans +-inf) are treated as unconstraining.

    Cost is O(N * M / lanes) vs cluster_mask's O(N * M): the cull stays
    negligible even at M ~ thousands of clusters (500k+ triangles).
    """
    n = org.shape[0]
    g = n // lanes
    inv = 1.0 / jnp.where(jnp.abs(direction) < 1e-12,
                          jnp.where(direction < 0.0, -1e-12, 1e-12),
                          direction)
    og = org.reshape(g, lanes, 3)
    ig = inv.reshape(g, lanes, 3)
    o_lo, o_hi = og.min(axis=1), og.max(axis=1)  # [G, 3]
    i_lo, i_hi = ig.min(axis=1), ig.max(axis=1)
    mixed = (i_lo < 0.0) & (i_hi > 0.0)  # sign flip within group
    mn_lo = min_t.reshape(g, lanes).min(axis=1)  # [G]
    mx_hi = max_t.reshape(g, lanes).max(axis=1)

    tnear_lo = jnp.full((g, cluster_aabb.shape[1]), -_BIG)
    tfar_hi = jnp.full((g, cluster_aabb.shape[1]), _BIG)
    for k in range(3):
        d_lo = (cluster_aabb[k][None, :] - o_hi[:, k:k + 1],
                cluster_aabb[k + 3][None, :] - o_hi[:, k:k + 1])
        d_hi = (cluster_aabb[k][None, :] - o_lo[:, k:k + 1],
                cluster_aabb[k + 3][None, :] - o_lo[:, k:k + 1])
        il = i_lo[:, k:k + 1]
        ih = i_hi[:, k:k + 1]
        lo_k = jnp.minimum(
            jnp.minimum(jnp.minimum(d_lo[0] * il, d_lo[0] * ih),
                        jnp.minimum(d_hi[0] * il, d_hi[0] * ih)),
            jnp.minimum(jnp.minimum(d_lo[1] * il, d_lo[1] * ih),
                        jnp.minimum(d_hi[1] * il, d_hi[1] * ih)))
        hi_k = jnp.maximum(
            jnp.maximum(jnp.maximum(d_lo[0] * il, d_lo[0] * ih),
                        jnp.maximum(d_hi[0] * il, d_hi[0] * ih)),
            jnp.maximum(jnp.maximum(d_lo[1] * il, d_lo[1] * ih),
                        jnp.maximum(d_hi[1] * il, d_hi[1] * ih)))
        free = mixed[:, k:k + 1]
        tnear_lo = jnp.maximum(tnear_lo, jnp.where(free, -_BIG, lo_k))
        tfar_hi = jnp.minimum(tfar_hi, jnp.where(free, _BIG, hi_k))
    mask = ((tnear_lo <= tfar_hi * 1.00000024)
            & (tfar_hi >= mn_lo[:, None]) & (tnear_lo <= mx_hi[:, None])
            & (mx_hi >= mn_lo)[:, None])
    if return_tnear:
        return mask, tnear_lo
    return mask


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


@functools.partial(jax.jit,
                   static_argnames=("any_hit", "interpret", "cull"))
def dense_trace_v3(packed_tris, cluster_aabb, org, direction, min_t, max_t,
                   any_hit=False, interpret=False, cull="beam"):
    """Same contract as dense.dense_trace. Survivors are sorted
    front-to-back by beam tnear so the kernel early-exits once the running
    best of all 128 lanes beats the next cluster (Embree-style ordered
    traversal, raytracer_impl.cc:268-287); any_hit additionally stops when
    every lane found an occluder. cull: "beam" (O(N*M/128) conservative
    group test, default) or "exact" (O(N*M) per-ray mask reduced per
    group; no tnear ordering — debug/oracle mode)."""
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
    if cull == "beam":
        gm, tnear = group_survivors_beam(cluster_aabb, org, direction,
                                         min_t, max_t, return_tnear=True)
    else:
        hitm = cluster_mask(cluster_aabb, org, direction, min_t, max_t)
        gm = hitm.reshape(n_pad // LANES, LANES, -1).any(axis=1)  # [G, M]
        tnear = jnp.full(gm.shape, -_BIG)  # no ordering info -> no early out
    cnt = gm.sum(axis=1).astype(jnp.int32)[:, None]  # [G, 1]
    # survivors to the front, ordered front-to-back by beam tnear
    key = jnp.where(gm, tnear, _BIG)
    surv = jnp.argsort(key, axis=1, stable=True).astype(jnp.int32)  # [G, M]
    tnear_sorted = jnp.take_along_axis(key, surv, axis=1)

    rays = jnp.stack([org[:, 0], org[:, 1], org[:, 2], direction[:, 0],
                      direction[:, 1], direction[:, 2], min_t, max_t])

    tris_rows = packed_tris.T  # [Fpad, 12]
    M = cluster_aabb.shape[1]
    out = pl.pallas_call(
        functools.partial(_trace_kernel, any_hit=any_hit),
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
            pl.BlockSpec((GROUPS, M), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, RAY_TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        interpret=interpret,
    )(rays, tris_rows, surv, cnt, tnear_sorted)
    hit = out[4, :n] > 0.0
    return {
        "t": jnp.where(hit, out[0, :n], INF),
        "u": out[1, :n],
        "v": out[2, :n],
        "prim": jnp.where(hit, out[3, :n].astype(jnp.int32), -1),
    }
