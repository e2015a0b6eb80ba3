"""Pallas TPU kernel V5: fused BVH packet traversal (cull + trace).

Replaces rtcIntersect1 / rtcOccluded1
(/root/reference/src/raytracer/raytracer_impl.cc:268-287). The SAH build
algorithm mirrors nanort's binned-SAH (/root/reference/src/nanort.h:1887)
via geometry.bvh.build_bvh; this kernel is the traversal.

Why V5 (measured on chip, ARCHITECTURE.md):

* V4 moved the trace itself to scalar-triangle survivor lists and hit
  23.8 Mray/s on signature-sorted rays — but its cluster cull ran in XLA
  as an O(N_rays x M_clusters) elementwise pass over HBM plus a [G, M]
  argsort. That prep alone floors the pipeline at ~32 Mray/s (the all-dead
  "empty work" case) and is paid by closest-hit, shadow, AND the
  compaction signature every wavefront step.
* V5 does the cull INSIDE the kernel as a classic packet traversal: one
  1024-ray group descends the binned-SAH BVH with an explicit scalar
  stack in SMEM, slab-testing each node against all 1024 rays on the VPU
  (~25 ops + one min-reduce), descending near-child-first, and pruning
  subtrees once every lane's best_t beats the subtree's entry t
  (front-to-back early exit == Embree's ordered traversal). Nothing is
  materialized to HBM; scaling is O(log F) per group, not O(M).

A NOTE ON THE MXU: the per-(ray,tri) work is 6 dot products against the
7-vector (o, d, 1). On the MXU that is a contraction of depth K=7 padded
to 128 -> >= 18x waste; at f32 the effective cost is ~48-64 cycles/tri vs
~35 on the VPU with scalar-operand FMAs. Measured-and-rejected; see
ARCHITECTURE.md perf notes.

Contract matches dense.dense_trace: returns dict(t, u, v, prim) with prim
in SAH slot order (scene commit reorders all face columns to match, so
slot ids ARE face ids).
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
CLUSTER = 32  # triangles per BVH leaf (slot window)
STACK = 128  # max traversal stack entries (asserted at build)
_BIG = 1e30  # python float: jnp module constants commit to a device (CLAUDE.md)


def build_v5(tri_v0: np.ndarray, tri_e1: np.ndarray, tri_e2: np.ndarray,
             cluster: int = CLUSTER):
    """Build the packed triangle table + flat BVH node arrays.

    Returns (packed [12, S], leaf_aabb [8, M], order [S], node_aabb
    [6, Nn], node_meta [2, Nn]) where S = M * cluster slots (padding rows
    are all-zero -> den = 0 -> miss), node_meta[0] = right-child index for
    internal nodes / -1 for leaves, node_meta[1] = leaf slot base / -1.

    The BVH is depth-first with skip links (geometry.bvh): left child =
    n + 1 and right child = skip[n + 1] (the next disjoint subtree after
    the left child IS the right child). Validated here so the native C++
    builder path can't silently break the derivation.
    """
    from ...geometry.bvh import build_bvh

    if tri_v0.shape[0] == 0:
        packed = np.zeros((12, cluster), np.float32)
        leaf_aabb = np.zeros((8, 1), np.float32)
        leaf_aabb[0:3] = 1e30
        leaf_aabb[3:6] = -1e30
        node_aabb = np.zeros((6, 1), np.float32)
        node_aabb[0:3] = 1e30
        node_aabb[3:6] = -1e30
        node_meta = np.asarray([[-1], [0]], np.int32)
        return (packed, leaf_aabb, np.full((cluster,), -1, np.int32),
                node_aabb, node_meta)

    bmin = np.minimum(np.minimum(tri_v0, tri_v0 + tri_e1), tri_v0 + tri_e2)
    bmax = np.maximum(np.maximum(tri_v0, tri_v0 + tri_e1), tri_v0 + tri_e2)
    bvh = build_bvh(bmin, bmax, leaf_size=cluster)

    nn = bvh.num_nodes
    is_leaf = bvh.prim_offset >= 0
    right = np.full((nn,), -1, np.int32)
    internal = np.nonzero(~is_leaf)[0]
    if internal.size:
        right[internal] = bvh.skip[internal + 1]
        # validate the left/right derivation (guards the native builder)
        assert (right[internal] > internal + 1).all()
        assert (bvh.skip[right[internal]] == bvh.skip[internal]).all()
    # stack bound: depth-first max live stack = tree depth + 1
    depth = np.zeros((nn,), np.int32)
    for n in internal:
        depth[n + 1] = depth[n] + 1
        depth[right[n]] = depth[n] + 1
    assert depth.max() + 2 < STACK, f"BVH depth {depth.max()} overflows stack"

    node_meta = np.stack([right, bvh.prim_offset]).astype(np.int32)
    node_aabb = np.concatenate([bvh.aabb_min.T, bvh.aabb_max.T]).astype(
        np.float32)

    order = bvh.prim_ids.astype(np.int32)
    src = np.maximum(order, 0)
    v0 = tri_v0[src]
    e1 = tri_e1[src]
    e2 = tri_e2[src]
    n = np.cross(e1, e2)
    nrm2 = np.maximum((n * n).sum(-1, keepdims=True), 1e-30)
    b1 = np.cross(e2, n) / nrm2
    b2 = np.cross(n, e1) / nrm2
    packed = np.zeros((12, order.shape[0]), np.float32)
    packed[0:3] = n.T
    packed[3] = (n * v0).sum(-1)
    packed[4:7] = b1.T
    packed[7] = (b1 * v0).sum(-1)
    packed[8:11] = b2.T
    packed[11] = (b2 * v0).sum(-1)
    packed[:, order < 0] = 0.0  # padding: den = 0 -> miss

    leaves = np.nonzero(is_leaf)[0]
    leaf_aabb = np.zeros((8, leaves.shape[0]), np.float32)
    # leaf_aabb column ORDER matches slot order: leaf k covers slots
    # [k*cluster, (k+1)*cluster) because prim windows are emitted in DFS
    # order (geometry.bvh emit()); assert it.
    assert (bvh.prim_offset[leaves]
            == np.arange(leaves.shape[0]) * cluster).all()
    leaf_aabb[0:3] = bvh.aabb_min[leaves].T
    leaf_aabb[3:6] = bvh.aabb_max[leaves].T
    return packed, leaf_aabb, order, node_aabb, node_meta


def _trace_kernel(ray_ref, tri_ref, naabb_ref, nmeta_ref, out_ref,
                  stk_id, stk_tn, *, any_hit, cluster):
    """One 1024-ray group per grid step; packet BVH traversal.

    ray_ref [1, 8, 8, 128] VMEM: attr-major (ox oy oz dx dy dz mint maxt).
    tri_ref [12, S] SMEM: packed triangles (scalar operands).
    naabb_ref [6, Nn] SMEM: node lo.xyz/hi.xyz.
    nmeta_ref [2, Nn] SMEM: right-child / leaf slot base.
    stk_id/stk_tn: SMEM scratch [STACK] traversal stack (id, entry tnear).
    out_ref [1, 8, 8, 128] VMEM: rows t, u, v, prim, hit, 0, 0, 0.
    """
    ox = ray_ref[0, 0]
    oy = ray_ref[0, 1]
    oz = ray_ref[0, 2]
    dx = ray_ref[0, 3]
    dy = ray_ref[0, 4]
    dz = ray_ref[0, 5]
    mint = ray_ref[0, 6]
    maxt = ray_ref[0, 7]

    eps = jnp.float32(1e-12)
    idx = 1.0 / jnp.where(jnp.abs(dx) < eps, jnp.where(dx < 0, -eps, eps), dx)
    idy = 1.0 / jnp.where(jnp.abs(dy) < eps, jnp.where(dy < 0, -eps, eps), dy)
    idz = 1.0 / jnp.where(jnp.abs(dz) < eps, jnp.where(dz < 0, -eps, eps), dz)
    oxx = ox * idx
    oyy = oy * idy
    ozz = oz * idz

    best_t = maxt  # max_t folds into the initial best
    zero = jnp.zeros_like(ox)
    best_u = zero
    best_v = zero
    best_p = zero - 1.0

    # group-dead check: all padding/dead lanes carry maxt < 0
    gmax = jnp.max(best_t)
    stk_id[0] = jnp.int32(0)
    stk_tn[0] = jnp.float32(-1e30)
    sp0 = jnp.where(gmax >= 0.0, jnp.int32(1), jnp.int32(0))

    slop = jnp.float32(1.00000024)
    big = jnp.float32(_BIG)

    def slab(node, best_t):
        """Group slab test vs node AABB -> scalar min entry-t (BIG=miss)."""
        t0 = naabb_ref[0, node] * idx - oxx
        t1 = naabb_ref[3, node] * idx - oxx
        nx = jnp.minimum(t0, t1)
        fx = jnp.maximum(t0, t1)
        t0 = naabb_ref[1, node] * idy - oyy
        t1 = naabb_ref[4, node] * idy - oyy
        ny = jnp.minimum(t0, t1)
        fy = jnp.maximum(t0, t1)
        t0 = naabb_ref[2, node] * idz - ozz
        t1 = naabb_ref[5, node] * idz - ozz
        nz = jnp.minimum(t0, t1)
        fz = jnp.maximum(t0, t1)
        tnear = jnp.maximum(jnp.maximum(nx, ny), jnp.maximum(nz, mint))
        tfar = jnp.minimum(jnp.minimum(fx, fy),
                           jnp.minimum(fz, best_t))
        return jnp.min(jnp.where(tnear <= tfar * slop, tnear, big))

    def cond(carry):
        sp = carry[0]
        return sp > 0

    def body(carry):
        sp, best_t, best_u, best_v, best_p, gmax = carry
        sp = sp - 1
        node = stk_id[sp]
        tn_pop = stk_tn[sp]
        # relative pad keeps the cutoff as tolerant as the slab test
        live = tn_pop * (1.0 - 1e-6) - 1e-6 <= gmax

        def visit(carry):
            sp, best_t, best_u, best_v, best_p, gmax = carry
            right = nmeta_ref[0, node]

            def leaf(carry):
                sp, best_t, best_u, best_v, best_p, gmax = carry
                base = nmeta_ref[1, node]
                for k in range(cluster):
                    i = base + k
                    nx = tri_ref[0, i]
                    ny = tri_ref[1, i]
                    nz = tri_ref[2, i]
                    k0 = tri_ref[3, i]
                    den = dx * nx + dy * ny + dz * nz
                    num = k0 - (ox * nx + oy * ny + oz * nz)
                    # den==0 -> t inf/nan -> comparisons fail (padding
                    # rows are all-zero, so they can never hit)
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
                gmax = jnp.max(best_t)
                if any_hit:
                    # stop once every LIVE lane has an occluder: dead /
                    # padding / invalid-NEE lanes (maxt < mint) can never
                    # find one and must not block the early exit
                    done = jnp.all((best_p >= 0.0) | (maxt < mint))
                    sp = jnp.where(done, jnp.int32(0), sp)
                return sp, best_t, best_u, best_v, best_p, gmax

            def internal(carry):
                sp, best_t, best_u, best_v, best_p, gmax = carry
                left = node + 1
                tn_l = slab(left, best_t)
                tn_r = slab(right, best_t)
                # push far child first, near second (popped first)
                l_far = tn_l > tn_r
                far_id = jnp.where(l_far, left, right)
                far_tn = jnp.maximum(tn_l, tn_r)
                near_id = jnp.where(l_far, right, left)
                near_tn = jnp.minimum(tn_l, tn_r)
                hit_far = far_tn < big
                hit_near = near_tn < big

                @pl.when(hit_far)
                def _():
                    stk_id[sp] = far_id
                    stk_tn[sp] = far_tn

                sp1 = sp + hit_far.astype(jnp.int32)

                @pl.when(hit_near)
                def _():
                    stk_id[sp1] = near_id
                    stk_tn[sp1] = near_tn

                sp2 = sp1 + hit_near.astype(jnp.int32)
                return sp2, best_t, best_u, best_v, best_p, gmax

            return jax.lax.cond(right < 0, leaf, internal,
                                (sp, best_t, best_u, best_v, best_p, gmax))

        return jax.lax.cond(
            live, visit, lambda c: c,
            (sp, best_t, best_u, best_v, best_p, gmax))

    _, best_t, best_u, best_v, best_p, _ = jax.lax.while_loop(
        cond, body, (sp0, best_t, best_u, best_v, best_p, gmax))

    found = best_p >= 0.0
    out_ref[0, 0] = best_t
    out_ref[0, 1] = best_u
    out_ref[0, 2] = best_v
    out_ref[0, 3] = best_p
    out_ref[0, 4] = jnp.where(found, 1.0, 0.0)
    out_ref[0, 5] = zero
    out_ref[0, 6] = zero
    out_ref[0, 7] = zero


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def dense_trace_v5(packed_tris, node_aabb, node_meta, org, direction,
                   min_t, max_t, any_hit=False, interpret=False):
    """Same contract as dense.dense_trace (t, u, v, prim in slot order)."""
    n = org.shape[0]
    n_pad = (n + GROUP - 1) // GROUP * GROUP
    pad = n_pad - n
    if pad:
        org = jnp.concatenate([org, jnp.zeros((pad, 3), org.dtype)])
        direction = jnp.concatenate(
            [direction, jnp.ones((pad, 3), direction.dtype)])
        min_t = jnp.concatenate([min_t, jnp.zeros((pad,), min_t.dtype)])
        max_t = jnp.concatenate([max_t, jnp.full((pad,), -1.0, max_t.dtype)])
    max_t = jnp.minimum(max_t, INF)

    G = n_pad // GROUP
    rays = jnp.stack([org[:, 0], org[:, 1], org[:, 2], direction[:, 0],
                      direction[:, 1], direction[:, 2], min_t, max_t])
    rays = rays.reshape(8, G, 8, 128).transpose(1, 0, 2, 3)  # [G, 8, 8, 128]

    out = pl.pallas_call(
        functools.partial(_trace_kernel, any_hit=any_hit, cluster=CLUSTER),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 8, 8, 128), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(packed_tris.shape, lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(node_aabb.shape, lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(node_meta.shape, lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 8, 128), lambda g: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, 8, 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((STACK,), jnp.int32),
            pltpu.SMEM((STACK,), jnp.float32),
        ],
        interpret=interpret,
    )(rays, packed_tris, node_aabb, node_meta)

    out = out.transpose(1, 0, 2, 3).reshape(8, n_pad)
    hit = out[4, :n] > 0.0
    return {
        "t": jnp.where(hit, out[0, :n], INF),
        "u": out[1, :n],
        "v": out[2, :n],
        "prim": jnp.where(hit, out[3, :n].astype(jnp.int32), -1),
    }


def _trace_kernel_dual(ray_ref, tri_ref, naabb_ref, nmeta_ref, out_ref,
                       stk_id, stk_tn, *, cluster):
    """Dual-query packet traversal: each lane carries a closest-hit query
    and a shadow any-hit query sharing the ray ORIGIN (deferred NEE).
    One stack walk serves both: a node is descended if EITHER query set
    can enter it, per-triangle SMEM scalars and origin dot products are
    paid once, and overlapping footprints are visited once.

    ray_ref [1, 16, 8, 128]: rows 0:3 org | 3:6 dir_c | 6 mint_c |
    7 maxt_c | 8:11 dir_s | 11 mint_s | 12 maxt_s | 13:16 pad.
    out_ref rows: t, u, v, prim, hit, occluded, 0, 0.
    """
    ox = ray_ref[0, 0]
    oy = ray_ref[0, 1]
    oz = ray_ref[0, 2]
    dx = ray_ref[0, 3]
    dy = ray_ref[0, 4]
    dz = ray_ref[0, 5]
    mint = ray_ref[0, 6]
    maxt = ray_ref[0, 7]
    sx = ray_ref[0, 8]
    sy = ray_ref[0, 9]
    sz = ray_ref[0, 10]
    smint = ray_ref[0, 11]
    smaxt = ray_ref[0, 12]

    eps = jnp.float32(1e-12)

    def inv3(x, y, z):
        ix = 1.0 / jnp.where(jnp.abs(x) < eps, jnp.where(x < 0, -eps, eps), x)
        iy = 1.0 / jnp.where(jnp.abs(y) < eps, jnp.where(y < 0, -eps, eps), y)
        iz = 1.0 / jnp.where(jnp.abs(z) < eps, jnp.where(z < 0, -eps, eps), z)
        return ix, iy, iz

    idx, idy, idz = inv3(dx, dy, dz)
    isx, isy, isz = inv3(sx, sy, sz)
    oxx = ox * idx
    oyy = oy * idy
    ozz = oz * idz
    oxs = ox * isx
    oys = oy * isy
    ozs = oz * isz

    best_t = maxt
    zero = jnp.zeros_like(ox)
    best_u = zero
    best_v = zero
    best_p = zero - 1.0
    occ = zero
    s_dead = smaxt < smint

    gmax = jnp.maximum(jnp.max(best_t),
                       jnp.max(jnp.where(s_dead, -1.0, smaxt)))
    stk_id[0] = jnp.int32(0)
    stk_tn[0] = jnp.float32(-1e30)
    sp0 = jnp.where(gmax >= 0.0, jnp.int32(1), jnp.int32(0))

    slop = jnp.float32(1.00000024)
    big = jnp.float32(_BIG)

    def slab(node, best_t, occ):
        """Union entry-t over both query sets (BIG = neither can enter)."""
        t0 = naabb_ref[0, node] * idx - oxx
        t1 = naabb_ref[3, node] * idx - oxx
        nx = jnp.minimum(t0, t1)
        fx = jnp.maximum(t0, t1)
        t0 = naabb_ref[1, node] * idy - oyy
        t1 = naabb_ref[4, node] * idy - oyy
        ny = jnp.minimum(t0, t1)
        fy = jnp.maximum(t0, t1)
        t0 = naabb_ref[2, node] * idz - ozz
        t1 = naabb_ref[5, node] * idz - ozz
        nz = jnp.minimum(t0, t1)
        fz = jnp.maximum(t0, t1)
        tnear = jnp.maximum(jnp.maximum(nx, ny), jnp.maximum(nz, mint))
        tfar = jnp.minimum(jnp.minimum(fx, fy), jnp.minimum(fz, best_t))
        tc = jnp.min(jnp.where(tnear <= tfar * slop, tnear, big))
        t0 = naabb_ref[0, node] * isx - oxs
        t1 = naabb_ref[3, node] * isx - oxs
        nx = jnp.minimum(t0, t1)
        fx = jnp.maximum(t0, t1)
        t0 = naabb_ref[1, node] * isy - oys
        t1 = naabb_ref[4, node] * isy - oys
        ny = jnp.minimum(t0, t1)
        fy = jnp.maximum(t0, t1)
        t0 = naabb_ref[2, node] * isz - ozs
        t1 = naabb_ref[5, node] * isz - ozs
        nz = jnp.minimum(t0, t1)
        fz = jnp.maximum(t0, t1)
        cap = jnp.where(s_dead | (occ > 0.0), -big, smaxt)
        tnear = jnp.maximum(jnp.maximum(nx, ny), jnp.maximum(nz, smint))
        tfar = jnp.minimum(jnp.minimum(fx, fy), jnp.minimum(fz, cap))
        ts = jnp.min(jnp.where(tnear <= tfar * slop, tnear, big))
        return jnp.minimum(tc, ts)

    def cond(carry):
        return carry[0] > 0

    def body(carry):
        sp, best_t, best_u, best_v, best_p, occ, gmax = carry
        sp = sp - 1
        node = stk_id[sp]
        tn_pop = stk_tn[sp]
        live = tn_pop * (1.0 - 1e-6) - 1e-6 <= gmax

        def visit(carry):
            sp, best_t, best_u, best_v, best_p, occ, gmax = carry
            right = nmeta_ref[0, node]

            def leaf(carry):
                sp, best_t, best_u, best_v, best_p, occ, gmax = carry
                base = nmeta_ref[1, node]
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
                    num = k0 - (ox * nx + oy * ny + oz * nz)
                    ob1 = ox * b1x + oy * b1y + oz * b1z - c1
                    ob2 = ox * b2x + oy * b2y + oz * b2z - c2
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
                    dens = sx * nx + sy * ny + sz * nz
                    ts = num / dens
                    us = ob1 + ts * (sx * b1x + sy * b1y + sz * b1z)
                    vs = ob2 + ts * (sx * b2x + sy * b2y + sz * b2z)
                    oks = ((us >= 0.0) & (vs >= 0.0) & (us + vs <= 1.0)
                           & (ts >= smint) & (ts < smaxt))
                    occ = jnp.where(oks, 1.0, occ)
                gmax = jnp.maximum(
                    jnp.max(best_t),
                    jnp.max(jnp.where(s_dead | (occ > 0.0), -1.0, smaxt)))
                return sp, best_t, best_u, best_v, best_p, occ, gmax

            def internal(carry):
                sp, best_t, best_u, best_v, best_p, occ, gmax = carry
                left = node + 1
                tn_l = slab(left, best_t, occ)
                tn_r = slab(right, best_t, occ)
                l_far = tn_l > tn_r
                far_id = jnp.where(l_far, left, right)
                far_tn = jnp.maximum(tn_l, tn_r)
                near_id = jnp.where(l_far, right, left)
                near_tn = jnp.minimum(tn_l, tn_r)
                hit_far = far_tn < big
                hit_near = near_tn < big

                @pl.when(hit_far)
                def _():
                    stk_id[sp] = far_id
                    stk_tn[sp] = far_tn

                sp1 = sp + hit_far.astype(jnp.int32)

                @pl.when(hit_near)
                def _():
                    stk_id[sp1] = near_id
                    stk_tn[sp1] = near_tn

                sp2 = sp1 + hit_near.astype(jnp.int32)
                return sp2, best_t, best_u, best_v, best_p, occ, gmax

            return jax.lax.cond(right < 0, leaf, internal, carry)

        return jax.lax.cond(
            live, visit, lambda c: c,
            (sp, best_t, best_u, best_v, best_p, occ, gmax))

    _, best_t, best_u, best_v, best_p, occ, _ = jax.lax.while_loop(
        cond, body, (sp0, best_t, best_u, best_v, best_p, occ, gmax))

    found = best_p >= 0.0
    out_ref[0, 0] = best_t
    out_ref[0, 1] = best_u
    out_ref[0, 2] = best_v
    out_ref[0, 3] = best_p
    out_ref[0, 4] = jnp.where(found, 1.0, 0.0)
    out_ref[0, 5] = occ
    out_ref[0, 6] = zero
    out_ref[0, 7] = zero


@functools.partial(jax.jit, static_argnames=("interpret",))
def dense_trace_v5_dual(packed_tris, node_aabb, node_meta, org, direction,
                        min_t, max_t, sdir, smin_t, smax_t,
                        interpret=False):
    """Closest + shadow any-hit in one packet-traversal launch (queries
    share the origin). Returns (dict(t, u, v, prim), occluded bool)."""
    n = org.shape[0]
    n_pad = (n + GROUP - 1) // GROUP * GROUP
    pad = n_pad - n
    if pad:
        org = jnp.concatenate([org, jnp.zeros((pad, 3), org.dtype)])
        direction = jnp.concatenate(
            [direction, jnp.ones((pad, 3), direction.dtype)])
        sdir = jnp.concatenate([sdir, jnp.ones((pad, 3), sdir.dtype)])
        min_t = jnp.concatenate([min_t, jnp.zeros((pad,), min_t.dtype)])
        max_t = jnp.concatenate([max_t, jnp.full((pad,), -1.0,
                                                 max_t.dtype)])
        smin_t = jnp.concatenate([smin_t, jnp.zeros((pad,), smin_t.dtype)])
        smax_t = jnp.concatenate([smax_t, jnp.full((pad,), -1.0,
                                                   smax_t.dtype)])
    max_t = jnp.minimum(max_t, INF)
    smax_t = jnp.minimum(smax_t, INF)

    G = n_pad // GROUP
    rays = jnp.stack([org[:, 0], org[:, 1], org[:, 2], direction[:, 0],
                      direction[:, 1], direction[:, 2], min_t, max_t,
                      sdir[:, 0], sdir[:, 1], sdir[:, 2], smin_t, smax_t,
                      min_t, min_t, min_t])
    rays = rays.reshape(16, G, 8, 128).transpose(1, 0, 2, 3)

    out = pl.pallas_call(
        functools.partial(_trace_kernel_dual, cluster=CLUSTER),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 16, 8, 128), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(packed_tris.shape, lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(node_aabb.shape, lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(node_meta.shape, lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 8, 128), lambda g: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, 8, 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((STACK,), jnp.int32),
            pltpu.SMEM((STACK,), jnp.float32),
        ],
        interpret=interpret,
    )(rays, packed_tris, node_aabb, node_meta)

    out = out.transpose(1, 0, 2, 3).reshape(8, n_pad)
    hit = out[4, :n] > 0.0
    return {
        "t": jnp.where(hit, out[0, :n], INF),
        "u": out[1, :n],
        "v": out[2, :n],
        "prim": jnp.where(hit, out[3, :n].astype(jnp.int32), -1),
    }, out[5, :n] > 0.0


# ---------------------------------------------------------------------------
# V5L: large-scene variant. The v5e SMEM budget is 1 MB; the SMEM-resident
# triangle table caps out around ~20k slots (measured: 58k slots -> Mosaic
# "would exceed memory (size=1048576)"). V5L keeps triangles in HBM as
# leaf-contiguous [M, 12, CLUSTER] blocks and DMAs each visited leaf into a
# double-buffered SMEM scratch: the DMA for leaf k+1 is issued before leaf
# k's 32-triangle scalar loop runs, so HBM latency hides behind compute.
# Node AABBs/meta stay SMEM-resident (~68 B/node -> ceiling ~400k tris;
# past that the node arrays would need the same treatment).
# ---------------------------------------------------------------------------


def leaf_major(packed: np.ndarray, cluster: int = CLUSTER) -> np.ndarray:
    """[12, S] attr-major -> [M, 3, 128] leaf-major: one contiguous 1.5 KB
    DMA per leaf, viewed as 3 rows of 128 lanes because Mosaic requires
    DMA slices to be 128-aligned in the lane dimension (12 * 32 = 384 =
    3 * 128 exactly). Element (attr a, tri k) of leaf m lives at flat
    index a * cluster + k."""
    assert 12 * cluster % 128 == 0
    s = packed.shape[1]
    m = s // cluster
    return np.ascontiguousarray(
        packed.reshape(12, m, cluster).transpose(1, 0, 2)).reshape(
            m, 12 * cluster // 128, 128)


def _trace_kernel_dma(ray_ref, tri_hbm, naabb_ref, nmeta_ref, roots_ref,
                      out_ref, leaf_buf, sem, stk_id, stk_tn, *, any_hit,
                      cluster):
    """V5 packet traversal with leaf-DMA double buffering.

    tri_hbm [M, 3, 128] (ANY; leaf_major layout). leaf_buf [2, 3, 128]
    SMEM scratch; sem: 2 DMA semaphores. roots_ref [G] SMEM: per-group
    traversal ROOT node (0 = whole tree; the subtree-scheduled path
    dense_trace_v5s restricts each sorted group to its rays' common
    subtree). Other refs as _trace_kernel.
    """
    ox = ray_ref[0, 0]
    oy = ray_ref[0, 1]
    oz = ray_ref[0, 2]
    dx = ray_ref[0, 3]
    dy = ray_ref[0, 4]
    dz = ray_ref[0, 5]
    mint = ray_ref[0, 6]
    maxt = ray_ref[0, 7]

    eps = jnp.float32(1e-12)
    idx = 1.0 / jnp.where(jnp.abs(dx) < eps, jnp.where(dx < 0, -eps, eps), dx)
    idy = 1.0 / jnp.where(jnp.abs(dy) < eps, jnp.where(dy < 0, -eps, eps), dy)
    idz = 1.0 / jnp.where(jnp.abs(dz) < eps, jnp.where(dz < 0, -eps, eps), dz)
    oxx = ox * idx
    oyy = oy * idy
    ozz = oz * idz

    best_t = maxt
    zero = jnp.zeros_like(ox)
    best_u = zero
    best_v = zero
    best_p = zero - 1.0

    gmax = jnp.max(best_t)
    stk_id[0] = roots_ref[pl.program_id(0)]
    stk_tn[0] = jnp.float32(-1e30)
    sp0 = jnp.where(gmax >= 0.0, jnp.int32(1), jnp.int32(0))

    slop = jnp.float32(1.00000024)
    big = jnp.float32(_BIG)

    def slab(node, best_t):
        t0 = naabb_ref[0, node] * idx - oxx
        t1 = naabb_ref[3, node] * idx - oxx
        nx = jnp.minimum(t0, t1)
        fx = jnp.maximum(t0, t1)
        t0 = naabb_ref[1, node] * idy - oyy
        t1 = naabb_ref[4, node] * idy - oyy
        ny = jnp.minimum(t0, t1)
        fy = jnp.maximum(t0, t1)
        t0 = naabb_ref[2, node] * idz - ozz
        t1 = naabb_ref[5, node] * idz - ozz
        nz = jnp.minimum(t0, t1)
        fz = jnp.maximum(t0, t1)
        tnear = jnp.maximum(jnp.maximum(nx, ny), jnp.maximum(nz, mint))
        tfar = jnp.minimum(jnp.minimum(fx, fy), jnp.minimum(fz, best_t))
        return jnp.min(jnp.where(tnear <= tfar * slop, tnear, big))

    def start_dma(slot, leaf):
        pltpu.make_async_copy(tri_hbm.at[leaf], leaf_buf.at[slot],
                              sem.at[slot]).start()

    def wait_dma(slot, leaf):
        pltpu.make_async_copy(tri_hbm.at[leaf], leaf_buf.at[slot],
                              sem.at[slot]).wait()

    def process(slot, leaf, carry):
        """Intersect the cluster in leaf_buf[slot] (slot ids = leaf*cluster
        + k, matching the SAH slot order)."""
        best_t, best_u, best_v, best_p = carry
        base = leaf * cluster

        def at(slot, a, k):
            flat = a * cluster + k  # python ints: resolved statically
            return leaf_buf[slot, flat // 128, flat % 128]

        for k in range(cluster):
            nx = at(slot, 0, k)
            ny = at(slot, 1, k)
            nz = at(slot, 2, k)
            k0 = at(slot, 3, k)
            den = dx * nx + dy * ny + dz * nz
            num = k0 - (ox * nx + oy * ny + oz * nz)
            t = num / den
            b1x = at(slot, 4, k)
            b1y = at(slot, 5, k)
            b1z = at(slot, 6, k)
            c1 = at(slot, 7, k)
            u = (ox * b1x + oy * b1y + oz * b1z - c1) \
                + t * (dx * b1x + dy * b1y + dz * b1z)
            b2x = at(slot, 8, k)
            b2y = at(slot, 9, k)
            b2z = at(slot, 10, k)
            c2 = at(slot, 11, k)
            v = (ox * b2x + oy * b2y + oz * b2z - c2) \
                + t * (dx * b2x + dy * b2y + dz * b2z)
            ok = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                  & (t >= mint) & (t < best_t))
            fi = (base + k).astype(jnp.float32)
            best_u = jnp.where(ok, u, best_u)
            best_v = jnp.where(ok, v, best_v)
            best_p = jnp.where(ok, fi, best_p)
            best_t = jnp.where(ok, t, best_t)
        return best_t, best_u, best_v, best_p

    # carry: sp, bests, gmax, pending (leaf id, valid, slot)
    def cond(carry):
        return carry[0] > 0

    def body(carry):
        (sp, best_t, best_u, best_v, best_p, gmax,
         pend_leaf, pend_valid, pend_slot) = carry
        sp = sp - 1
        node = stk_id[sp]
        tn_pop = stk_tn[sp]
        live = tn_pop * (1.0 - 1e-6) - 1e-6 <= gmax

        def visit(carry):
            (sp, best_t, best_u, best_v, best_p, gmax,
             pend_leaf, pend_valid, pend_slot) = carry
            right = nmeta_ref[0, node]

            def leaf(carry):
                (sp, best_t, best_u, best_v, best_p, gmax,
                 pend_leaf, pend_valid, pend_slot) = carry
                my_leaf = nmeta_ref[1, node] // cluster
                my_slot = 1 - pend_slot
                start_dma(my_slot, my_leaf)

                def drain(args):
                    best_t, best_u, best_v, best_p = args
                    wait_dma(pend_slot, pend_leaf)
                    return process(pend_slot, pend_leaf,
                                   (best_t, best_u, best_v, best_p))

                best_t, best_u, best_v, best_p = jax.lax.cond(
                    pend_valid, drain, lambda a: a,
                    (best_t, best_u, best_v, best_p))
                gmax = jnp.max(best_t)
                if any_hit:
                    done = jnp.all((best_p >= 0.0) | (maxt < mint))
                    sp = jnp.where(done, jnp.int32(0), sp)
                return (sp, best_t, best_u, best_v, best_p, gmax,
                        my_leaf, jnp.bool_(True), my_slot)

            def internal(carry):
                (sp, best_t, best_u, best_v, best_p, gmax,
                 pend_leaf, pend_valid, pend_slot) = carry
                left = node + 1
                tn_l = slab(left, best_t)
                tn_r = slab(right, best_t)
                l_far = tn_l > tn_r
                far_id = jnp.where(l_far, left, right)
                far_tn = jnp.maximum(tn_l, tn_r)
                near_id = jnp.where(l_far, right, left)
                near_tn = jnp.minimum(tn_l, tn_r)
                hit_far = far_tn < big
                hit_near = near_tn < big

                @pl.when(hit_far)
                def _():
                    stk_id[sp] = far_id
                    stk_tn[sp] = far_tn

                sp1 = sp + hit_far.astype(jnp.int32)

                @pl.when(hit_near)
                def _():
                    stk_id[sp1] = near_id
                    stk_tn[sp1] = near_tn

                sp2 = sp1 + hit_near.astype(jnp.int32)
                return (sp2, best_t, best_u, best_v, best_p, gmax,
                        pend_leaf, pend_valid, pend_slot)

            return jax.lax.cond(right < 0, leaf, internal, carry)

        return jax.lax.cond(
            live, visit, lambda c: c,
            (sp, best_t, best_u, best_v, best_p, gmax,
             pend_leaf, pend_valid, pend_slot))

    carry = jax.lax.while_loop(
        cond, body, (sp0, best_t, best_u, best_v, best_p, gmax,
                     jnp.int32(0), jnp.bool_(False), jnp.int32(0)))
    (_, best_t, best_u, best_v, best_p, _,
     pend_leaf, pend_valid, pend_slot) = carry

    # drain the last pending leaf
    def drain(args):
        best_t, best_u, best_v, best_p = args
        wait_dma(pend_slot, pend_leaf)
        return process(pend_slot, pend_leaf,
                       (best_t, best_u, best_v, best_p))

    best_t, best_u, best_v, best_p = jax.lax.cond(
        pend_valid, drain, lambda a: a, (best_t, best_u, best_v, best_p))

    found = best_p >= 0.0
    out_ref[0, 0] = best_t
    out_ref[0, 1] = best_u
    out_ref[0, 2] = best_v
    out_ref[0, 3] = best_p
    out_ref[0, 4] = jnp.where(found, 1.0, 0.0)
    out_ref[0, 5] = zero
    out_ref[0, 6] = zero
    out_ref[0, 7] = zero


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def dense_trace_v5l(packed_leaf, node_aabb, node_meta, org, direction,
                    min_t, max_t, any_hit=False, interpret=False,
                    group_roots=None):
    """Large-scene trace: packed_leaf [M, 3, 128] (leaf_major) stays off
    SMEM. Same contract as dense_trace_v5. group_roots [ceil(N/GROUP)]
    optionally restricts each 1024-ray group to a subtree root."""
    n = org.shape[0]
    n_pad = (n + GROUP - 1) // GROUP * GROUP
    pad = n_pad - n
    if pad:
        org = jnp.concatenate([org, jnp.zeros((pad, 3), org.dtype)])
        direction = jnp.concatenate(
            [direction, jnp.ones((pad, 3), direction.dtype)])
        min_t = jnp.concatenate([min_t, jnp.zeros((pad,), min_t.dtype)])
        max_t = jnp.concatenate([max_t, jnp.full((pad,), -1.0, max_t.dtype)])
    max_t = jnp.minimum(max_t, INF)

    G = n_pad // GROUP
    if group_roots is None:
        group_roots = jnp.zeros((G,), jnp.int32)
    rays = jnp.stack([org[:, 0], org[:, 1], org[:, 2], direction[:, 0],
                      direction[:, 1], direction[:, 2], min_t, max_t])
    rays = rays.reshape(8, G, 8, 128).transpose(1, 0, 2, 3)

    out = pl.pallas_call(
        functools.partial(_trace_kernel_dma, any_hit=any_hit,
                          cluster=CLUSTER),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 8, 8, 128), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(node_aabb.shape, lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(node_meta.shape, lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((G,), lambda g: (0,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 8, 128), lambda g: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, 8, 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((2, 12 * CLUSTER // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((STACK,), jnp.int32),
            pltpu.SMEM((STACK,), jnp.float32),
        ],
        interpret=interpret,
    )(rays, packed_leaf, node_aabb, node_meta,
      group_roots.astype(jnp.int32))

    out = out.transpose(1, 0, 2, 3).reshape(8, n_pad)
    hit = out[4, :n] > 0.0
    return {
        "t": jnp.where(hit, out[0, :n], INF),
        "u": out[1, :n],
        "v": out[2, :n],
        "prim": jnp.where(hit, out[3, :n].astype(jnp.int32), -1),
    }


# ---------------------------------------------------------------------------
# V5S: subtree-scheduled tracing for LARGE scenes with INCOHERENT rays.
#
# The packet kernels collapse when a 1024-ray group decoheres: at 42k
# triangles an incoherent signature-sorted group still visits 654/1815
# leaves, so every ray pays ~36% of the scene in triangle tests
# (ARCHITECTURE.md scale table: 1.69 Mray/s at 42k, 1.15 at 164k). True
# per-lane divergent traversal (nanort-style per-ray stacks,
# /root/reference/src/nanort.h:691-849) is hostile to the TPU: there is
# no per-lane dynamic indexing inside a kernel, and XLA's HBM gather
# (~15 ns/row) caps a gather-walk at ~1 Mray/s.
#
# V5S instead restores COHERENCE by scheduling: cut the BVH into C
# subtrees (BFS cut by surface area); each pass, every unresolved ray
# picks its NEAREST unvisited candidate subtree (dense slab test against
# C boxes, fused by XLA), rays are sorted by that subtree id, and each
# 1024-group runs the packet kernel RESTRICTED to the group's common
# subtree root. Early t-culling (max_t = the ray's current best) plus
# front-to-back candidate order means most rays resolve in 1-2 passes;
# a final unrestricted pass sweeps stragglers. The group-union problem
# shrinks from "the whole tree" to "one subtree".
# ---------------------------------------------------------------------------


def subtree_cut(node_aabb: np.ndarray, node_meta: np.ndarray,
                max_nodes: int = 64):
    """BFS cut of the BVH into <= max_nodes subtree roots (expand the
    largest-surface node first). Returns (roots [C] int32 node ids,
    aabb [6, C] float32)."""
    right = node_meta[0]
    cut = [0]
    while True:
        areas = []
        for n_id in cut:
            if right[n_id] < 0:
                areas.append(-1.0)
            else:
                d = np.maximum(node_aabb[3:6, n_id] - node_aabb[0:3, n_id],
                               0.0)
                areas.append(float(d[0] * d[1] + d[1] * d[2] + d[2] * d[0]))
        j = int(np.argmax(areas))
        if areas[j] < 0.0 or len(cut) + 1 > max_nodes:
            break
        n_id = cut.pop(j)
        cut = [n_id + 1, int(right[n_id])] + cut
    roots = np.asarray(sorted(cut), np.int32)
    return roots, node_aabb[:, roots].astype(np.float32)


@functools.partial(jax.jit,
                   static_argnames=("any_hit", "interpret", "passes",
                                    "cond_cleanup"))
def dense_trace_v5s(packed_leaf, node_aabb, node_meta, sub_roots, sub_aabb,
                    org, direction, min_t, max_t, any_hit=False,
                    interpret=False, passes=2, cond_cleanup=False):
    """Subtree-scheduled large-scene trace (see block comment above).
    Same contract as dense_trace_v5; sub_roots/sub_aabb from subtree_cut.

    The state rides PERMUTED across passes (rays+bests+consumed-bitmask
    packed into one fat matrix, ONE gather per pass, one final scatter):
    a first cut of this scheduler permuted rays/results back and forth
    every pass and spent ~2/3 of its wall in gathers/scatters.
    """
    n0 = org.shape[0]
    n = (n0 + GROUP - 1) // GROUP * GROUP
    pad = n - n0
    if pad:
        org = jnp.concatenate([org, jnp.zeros((pad, 3), org.dtype)])
        direction = jnp.concatenate(
            [direction, jnp.ones((pad, 3), direction.dtype)])
        min_t = jnp.concatenate([min_t, jnp.zeros((pad,), min_t.dtype)])
        max_t = jnp.concatenate([max_t, jnp.full((pad,), -1.0,
                                                 max_t.dtype)])
    max_t = jnp.minimum(max_t, INF)
    C = sub_aabb.shape[1]
    assert C <= 64, "consumed bitmask is 2 uint32 words"
    big = jnp.float32(_BIG)
    f32 = jnp.float32
    from jax import lax as _lax

    lo_c = sub_aabb[0:3].T[None]  # [1, C, 3]
    hi_c = sub_aabb[3:6].T[None]

    def slab_all(org, direction, min_t, max_t):
        eps = 1e-12
        inv = 1.0 / jnp.where(jnp.abs(direction) < eps,
                              jnp.where(direction < 0.0, -eps, eps),
                              direction)
        t0 = (lo_c - org[:, None]) * inv[:, None]
        t1 = (hi_c - org[:, None]) * inv[:, None]
        tnear = jnp.maximum(jnp.minimum(t0, t1).max(-1), min_t[:, None])
        tfar = jnp.minimum(jnp.maximum(t0, t1).min(-1), max_t[:, None])
        return jnp.where(tnear <= tfar * 1.00000024, tnear, big)

    # fat state: org3 dir3 mint maxt | best_t best_u best_v best_p |
    # consumed_lo consumed_hi | orig
    state = jnp.concatenate([
        org, direction, min_t[:, None], max_t[:, None],
        jnp.minimum(max_t, INF)[:, None], jnp.zeros((n, 2), f32),
        jnp.full((n, 1), -1.0, f32),
        _lax.bitcast_convert_type(jnp.zeros((n, 2), jnp.uint32), f32),
        _lax.bitcast_convert_type(jnp.arange(n, dtype=jnp.int32),
                                  f32)[:, None],
    ], axis=1)

    def unpack(st):
        d = {
            "org": st[:, 0:3], "dir": st[:, 3:6], "mint": st[:, 6],
            "maxt": st[:, 7], "bt": st[:, 8], "bu": st[:, 9],
            "bv": st[:, 10], "bp": st[:, 11],
            "clo": _lax.bitcast_convert_type(st[:, 12], jnp.uint32),
            "chi": _lax.bitcast_convert_type(st[:, 13], jnp.uint32),
            "orig": _lax.bitcast_convert_type(st[:, 14], jnp.int32),
        }
        return d

    def run_pass(state, cleanup):
        s_ = unpack(state)
        cand = slab_all(s_["org"], s_["dir"], s_["mint"], s_["maxt"])
        bits = (jnp.uint32(1) << (jnp.arange(C, dtype=jnp.uint32)
                                  % jnp.uint32(32)))[None]
        lo_mask = (s_["clo"][:, None] & bits) > 0
        hi_mask = (s_["chi"][:, None] & bits) > 0
        consumed = jnp.where(jnp.arange(C)[None] < 32, lo_mask, hi_mask)
        avail = jnp.where(consumed | (cand >= s_["bt"][:, None]), big,
                          cand)
        if cleanup:
            # whatever still has a nearer candidate runs UNRESTRICTED
            rem = (avail < big).any(axis=1)
            if any_hit:
                rem = rem & (s_["bp"] < 0)
            key = jnp.where(rem, 0, 1).astype(jnp.int32)
        else:
            sid = jnp.argmin(avail, axis=1).astype(jnp.int32)
            has = avail.min(axis=1) < big
            if any_hit:
                has = has & (s_["bp"] < 0)
            key = jnp.where(has, sid, C).astype(jnp.int32)
        perm = jnp.argsort(key)
        state = jnp.concatenate(
            [state, key.astype(f32)[:, None]], axis=1)[perm]
        key_p = state[:, 15].astype(jnp.int32)
        state = state[:, :15]
        s_ = unpack(state)
        if cleanup:
            active = key_p == 0
            groot = None  # whole tree
        else:
            group_first = key_p.reshape(-1, GROUP)[:, 0]
            groot = sub_roots[jnp.minimum(group_first, C - 1)]
            groot = jnp.where(group_first >= C, 0, groot).astype(jnp.int32)
            active = (key_p == jnp.repeat(group_first, GROUP)) & (key_p < C)
        mt = jnp.where(active, s_["bt"], -1.0)
        res = dense_trace_v5l(packed_leaf, node_aabb, node_meta,
                              s_["org"], s_["dir"], s_["mint"], mt,
                              any_hit=any_hit, interpret=interpret,
                              group_roots=groot)
        upd = active & (res["prim"] >= 0) & (res["t"] < s_["bt"])
        bt = jnp.where(upd, res["t"], s_["bt"])
        bu = jnp.where(upd, res["u"], s_["bu"])
        bv = jnp.where(upd, res["v"], s_["bv"])
        bp = jnp.where(upd, res["prim"].astype(f32), s_["bp"])
        if not cleanup:
            kk = key_p.astype(jnp.uint32)
            bit = jnp.uint32(1) << (kk % jnp.uint32(32))
            clo = s_["clo"] | jnp.where(active & (key_p < 32), bit, 0)
            chi = s_["chi"] | jnp.where(active & (key_p >= 32) & (key_p < C),
                                        bit, 0)
        else:
            clo, chi = s_["clo"], s_["chi"]
        return jnp.concatenate([
            state[:, 0:8], bt[:, None], bu[:, None], bv[:, None],
            bp[:, None],
            _lax.bitcast_convert_type(clo, f32)[:, None],
            _lax.bitcast_convert_type(chi, f32)[:, None],
            state[:, 14:15],
        ], axis=1)

    def run_pass2(state):
        """TWO scheduled rounds for ONE sort: the composite (c1, c2) key
        (nearest and second-nearest unvisited candidate subtree) groups
        rays so that after the c1-restricted kernel pass the SAME layout
        is still coherent in c2 — the second restricted pass reuses the
        permutation. Saves one argsort + fat gather + slab_all per pair
        of rounds (~26 ns/ray of the measured ~78 ns/ray scheduling
        floor, ARCHITECTURE.md). Correctness is unaffected by schedule:
        the final unrestricted cleanup sweeps anything with a nearer
        unvisited candidate."""
        s_ = unpack(state)
        cand = slab_all(s_["org"], s_["dir"], s_["mint"], s_["maxt"])
        bits = (jnp.uint32(1) << (jnp.arange(C, dtype=jnp.uint32)
                                  % jnp.uint32(32)))[None]
        lo_mask = (s_["clo"][:, None] & bits) > 0
        hi_mask = (s_["chi"][:, None] & bits) > 0
        consumed = jnp.where(jnp.arange(C)[None] < 32, lo_mask, hi_mask)
        avail = jnp.where(consumed | (cand >= s_["bt"][:, None]), big,
                          cand)
        c1 = jnp.argmin(avail, axis=1).astype(jnp.int32)
        has1 = avail.min(axis=1) < big
        avail2 = jnp.where(jnp.arange(C)[None] == c1[:, None], big, avail)
        c2 = jnp.argmin(avail2, axis=1).astype(jnp.int32)
        has2 = avail2.min(axis=1) < big
        if any_hit:
            unresolved = s_["bp"] < 0
            has1 = has1 & unresolved
            has2 = has2 & unresolved
        k1 = jnp.where(has1, c1, C)
        k2 = jnp.where(has2, c2, C)
        key = k1 * (C + 1) + k2
        perm = jnp.argsort(key)
        state = jnp.concatenate(
            [state, k1.astype(f32)[:, None], k2.astype(f32)[:, None]],
            axis=1)[perm]
        k1_p = state[:, 15].astype(jnp.int32)
        k2_p = state[:, 16].astype(jnp.int32)
        state = state[:, :15]

        def one_round(state, key_p):
            s_ = unpack(state)
            group_first = key_p.reshape(-1, GROUP)[:, 0]
            groot = sub_roots[jnp.minimum(group_first, C - 1)]
            groot = jnp.where(group_first >= C, 0,
                              groot).astype(jnp.int32)
            active = ((key_p == jnp.repeat(group_first, GROUP))
                      & (key_p < C))
            if any_hit:
                active = active & (s_["bp"] < 0)
            mt = jnp.where(active, s_["bt"], -1.0)
            res = dense_trace_v5l(packed_leaf, node_aabb, node_meta,
                                  s_["org"], s_["dir"], s_["mint"], mt,
                                  any_hit=any_hit, interpret=interpret,
                                  group_roots=groot)
            upd = active & (res["prim"] >= 0) & (res["t"] < s_["bt"])
            bt = jnp.where(upd, res["t"], s_["bt"])
            bu = jnp.where(upd, res["u"], s_["bu"])
            bv = jnp.where(upd, res["v"], s_["bv"])
            bp = jnp.where(upd, res["prim"].astype(f32), s_["bp"])
            kk = key_p.astype(jnp.uint32)
            bit = jnp.uint32(1) << (kk % jnp.uint32(32))
            clo = s_["clo"] | jnp.where(active & (key_p < 32), bit, 0)
            chi = s_["chi"] | jnp.where(
                active & (key_p >= 32) & (key_p < C), bit, 0)
            return jnp.concatenate([
                state[:, 0:8], bt[:, None], bu[:, None], bv[:, None],
                bp[:, None],
                _lax.bitcast_convert_type(clo, f32)[:, None],
                _lax.bitcast_convert_type(chi, f32)[:, None],
                state[:, 14:15],
            ], axis=1)

        state = one_round(state, k1_p)
        return one_round(state, k2_p)

    left = passes
    while left >= 2:
        state = run_pass2(state)
        left -= 2
    for _ in range(left):
        state = run_pass(state, cleanup=False)
    # Round-4 NOTE, re-investigated round 5: wrapping this round in
    # lax.cond(any ray still needs cleanup) produces WRONG results on
    # chip — DETERMINISTICALLY at 512k rays on the 42k-tri scene
    # (494439/524288 prim mismatches; scripts/cond_pallas_check.py
    # probe 4), with a tell-tale pattern: total hit/miss COUNTS are
    # conserved but values land on wrong lanes — a layout/packing
    # corruption around the cond, not a traversal bug. Isolated
    # reconstructions of the same construct (v5l pallas_call inside a
    # data-dependent cond, even on an argsort-permuted 512k fat state —
    # probes 1-3) all PASS, and interpret mode is exact, so the trigger
    # needs the full V5S program (scheduled pallas pass with per-group
    # SMEM roots feeding the cond-gated pass). The conditional round is
    # also no faster in practice (the remaining-work predicate costs a
    # full C-box slab pass; measured 5.8 vs 7.0 Mray/s unconditional),
    # so the cleanup stays UNCONDITIONAL; cond_cleanup=True exists only
    # for the pinned regression probe.
    if cond_cleanup and not interpret:
        s_ = unpack(state)
        cand = slab_all(s_["org"], s_["dir"], s_["mint"], s_["maxt"])
        bits = (jnp.uint32(1) << (jnp.arange(C, dtype=jnp.uint32)
                                  % jnp.uint32(32)))[None]
        lo_mask = (s_["clo"][:, None] & bits) > 0
        hi_mask = (s_["chi"][:, None] & bits) > 0
        consumed = jnp.where(jnp.arange(C)[None] < 32, lo_mask, hi_mask)
        avail = jnp.where(consumed | (cand >= s_["bt"][:, None]), big,
                          cand)
        rem = (avail < big).any(axis=1)
        if any_hit:
            rem = rem & (s_["bp"] < 0)
        state = _lax.cond(jnp.any(rem),
                          lambda st: run_pass(st, cleanup=True),
                          lambda st: st, state)
    else:
        state = run_pass(state, cleanup=True)

    s_ = unpack(state)
    out_pack = jnp.stack([s_["bt"], s_["bu"], s_["bv"], s_["bp"]], axis=1)
    # orig is a permutation; argsort(orig) is its inverse — a gather is
    # ~5x cheaper than the equivalent scatter (measured 8 vs 43 ns/row)
    out = out_pack[jnp.argsort(s_["orig"])]
    bp = out[:, 3].astype(jnp.int32)
    found = out[:, 3] >= 0.0
    return {
        "t": jnp.where(found, out[:, 0], INF)[:n0],
        "u": out[:n0, 1],
        "v": out[:n0, 2],
        "prim": jnp.where(found, bp, -1)[:n0],
    }
