"""Pallas TPU kernel V5I: two-level (TLAS/BLAS) packet traversal with
trace-time instancing.

Replaces Embree's RTC_GEOMETRY_TYPE_INSTANCE two-level structure
(/root/reference/src/raytracer/raytracer_impl.cc:49-84): each local scene
is ONE BLAS built in local space and shared by K instances; the TLAS's
leaves are instances carrying a world->local affine transform. K instances
cost K TLAS leaves + K narrow per-face id rows — not K copies of the
geometry, the packed triangles, or the BVH (VERDICT round-2 Missing #2).

Traversal: the V5 packet scheme (dense_v5) with one extra node kind. When
a 1024-ray group reaches an instance leaf it transforms its rays into
local space with the instance's inverse transform (12 SMEM scalars;
direction NOT renormalized, so hit t values stay world-comparable even
under scale — Embree's convention) and runs the BLAS descent as an inner
while_loop on the shared SMEM stack above the current stack pointer.
Reported prim ids are GLOBAL instance-face slots: packed-slot + the
instance's fid_delta.

Node encoding (unified array, TLAS first then all BLAS blocks):
  nmeta[0] = right-child index, or -1 for leaves
  nmeta[1] = tri-leaf packed-slot base (>= 0), or -(instance_id + 1)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.math import INF

GROUP = 1024
CLUSTER = 32
STACK = 160
_BIG = 1e30


def build_tlas(inst_aabb_min: np.ndarray, inst_aabb_max: np.ndarray):
    """TLAS over instance world AABBs: leaf i = instance i.

    Returns (node_aabb [6, Nt], node_right [Nt], node_inst [Nt]) with
    node_inst >= 0 on leaves. Uses the binned-SAH builder with leaf_size=1.
    """
    from ...geometry.bvh import build_bvh

    bvh = build_bvh(inst_aabb_min, inst_aabb_max, leaf_size=1,
                    use_native=False)
    nn = bvh.num_nodes
    is_leaf = bvh.prim_offset >= 0
    right = np.full((nn,), -1, np.int32)
    internal = np.nonzero(~is_leaf)[0]
    if internal.size:
        right[internal] = bvh.skip[internal + 1]
        assert (bvh.skip[right[internal]] == bvh.skip[internal]).all()
    inst = np.full((nn,), -1, np.int32)
    leaves = np.nonzero(is_leaf)[0]
    inst[leaves] = bvh.prim_ids[bvh.prim_offset[leaves]]
    aabb = np.concatenate([bvh.aabb_min.T, bvh.aabb_max.T]).astype(np.float32)
    return aabb, right, inst


def _trace_kernel(ray_ref, tri_ref, naabb_ref, nmeta_ref, inv_ref, meta_ref,
                  out_ref, stk_id, stk_tn, *, any_hit, cluster):
    """V5I: two-level packet traversal, one 1024-ray group per grid step.

    inv_ref [12, Ki] SMEM: world->local affine rows (r00 r01 r02 t0 r10 ..).
    meta_ref [2, Ki] SMEM: (blas_root node id, fid_delta) per instance.
    Other refs as dense_v5._trace_kernel.
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

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < eps,
                               jnp.where(d < 0, -eps, eps), d)

    idx = safe_inv(dx)
    idy = safe_inv(dy)
    idz = safe_inv(dz)
    oxx = ox * idx
    oyy = oy * idy
    ozz = oz * idz

    best_t = maxt
    zero = jnp.zeros_like(ox)
    best_u = zero
    best_v = zero
    best_p = zero - 1.0

    gmax = jnp.max(best_t)
    stk_id[0] = jnp.int32(0)
    stk_tn[0] = jnp.float32(-1e30)
    sp0 = jnp.where(gmax >= 0.0, jnp.int32(1), jnp.int32(0))

    slop = jnp.float32(1.00000024)
    big = jnp.float32(_BIG)
    pad = jnp.float32(1.0 - 1e-6)

    def slab(node, best_t, o3, i3):
        (lox, loy, loz) = o3
        (lix, liy, liz) = i3
        t0 = naabb_ref[0, node] * lix - lox
        t1 = naabb_ref[3, node] * lix - lox
        nx = jnp.minimum(t0, t1)
        fx = jnp.maximum(t0, t1)
        t0 = naabb_ref[1, node] * liy - loy
        t1 = naabb_ref[4, node] * liy - loy
        ny = jnp.minimum(t0, t1)
        fy = jnp.maximum(t0, t1)
        t0 = naabb_ref[2, node] * liz - loz
        t1 = naabb_ref[5, node] * liz - loz
        nz = jnp.minimum(t0, t1)
        fz = jnp.maximum(t0, t1)
        tnear = jnp.maximum(jnp.maximum(nx, ny), jnp.maximum(nz, mint))
        tfar = jnp.minimum(jnp.minimum(fx, fy), jnp.minimum(fz, best_t))
        return jnp.min(jnp.where(tnear <= tfar * slop, tnear, big))

    def internal_visit(sp, node, right, best_t, o3, i3):
        """Test children, push far then near. Returns new sp."""
        left = node + 1
        tn_l = slab(left, best_t, o3, i3)
        tn_r = slab(right, best_t, o3, i3)
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

        return sp1 + hit_near.astype(jnp.int32)

    def leaf_tris(base, fid_delta, carry, ldir, lorg):
        """Intersect the 32-tri leaf at packed-slot base with LOCAL rays."""
        best_t, best_u, best_v, best_p = carry
        (ldx, ldy, ldz) = ldir
        (lox, loy, loz) = lorg
        for k in range(cluster):
            i = base + k
            nx = tri_ref[0, i]
            ny = tri_ref[1, i]
            nz = tri_ref[2, i]
            k0 = tri_ref[3, i]
            den = ldx * nx + ldy * ny + ldz * nz
            num = k0 - (lox * nx + loy * ny + loz * nz)
            t = num / den
            b1x = tri_ref[4, i]
            b1y = tri_ref[5, i]
            b1z = tri_ref[6, i]
            c1 = tri_ref[7, i]
            u = (lox * b1x + loy * b1y + loz * b1z - c1) \
                + t * (ldx * b1x + ldy * b1y + ldz * b1z)
            b2x = tri_ref[8, i]
            b2y = tri_ref[9, i]
            b2z = tri_ref[10, i]
            c2 = tri_ref[11, i]
            v = (lox * b2x + loy * b2y + loz * b2z - c2) \
                + t * (ldx * b2x + ldy * b2y + ldz * b2z)
            ok = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                  & (t >= mint) & (t < best_t))
            fi = (i + fid_delta).astype(jnp.float32)
            best_u = jnp.where(ok, u, best_u)
            best_v = jnp.where(ok, v, best_v)
            best_p = jnp.where(ok, fi, best_p)
            best_t = jnp.where(ok, t, best_t)
        return best_t, best_u, best_v, best_p

    def instance_visit(inst, carry):
        """Transform rays into instance space; run the BLAS descent as an
        inner loop on the shared stack above the caller's sp."""
        sp, best_t, best_u, best_v, best_p, gmax = carry
        a = [inv_ref[r, inst] for r in range(12)]
        lox = a[0] * ox + a[1] * oy + a[2] * oz + a[3]
        loy = a[4] * ox + a[5] * oy + a[6] * oz + a[7]
        loz = a[8] * ox + a[9] * oy + a[10] * oz + a[11]
        ldx = a[0] * dx + a[1] * dy + a[2] * dz
        ldy = a[4] * dx + a[5] * dy + a[6] * dz
        ldz = a[8] * dx + a[9] * dy + a[10] * dz
        lix = safe_inv(ldx)
        liy = safe_inv(ldy)
        liz = safe_inv(ldz)
        o3 = (lox * lix, loy * liy, loz * liz)
        i3 = (lix, liy, liz)
        ldir = (ldx, ldy, ldz)
        lorg = (lox, loy, loz)
        fid_delta = meta_ref[1, inst]

        sp_base = sp
        root = meta_ref[0, inst]
        tn0 = slab(root, best_t, o3, i3)

        @pl.when(tn0 < big)
        def _():
            stk_id[sp_base] = root
            stk_tn[sp_base] = tn0

        sp = sp_base + (tn0 < big).astype(jnp.int32)

        def icond(c):
            return c[0] > sp_base

        def ibody(c):
            sp, best_t, best_u, best_v, best_p, gmax = c
            sp = sp - 1
            node = stk_id[sp]
            tn_pop = stk_tn[sp]
            live = tn_pop * pad - 1e-6 <= gmax

            def visit(c):
                sp, best_t, best_u, best_v, best_p, gmax = c
                right = nmeta_ref[0, node]

                def leaf(c):
                    sp, best_t, best_u, best_v, best_p, gmax = c
                    base = nmeta_ref[1, node]
                    best_t, best_u, best_v, best_p = leaf_tris(
                        base, fid_delta,
                        (best_t, best_u, best_v, best_p), ldir, lorg)
                    gmax = jnp.max(best_t)
                    if any_hit:
                        done = jnp.all((best_p >= 0.0) | (maxt < mint))
                        sp = jnp.where(done, sp_base, sp)
                    return sp, best_t, best_u, best_v, best_p, gmax

                def internal(c):
                    sp, best_t, best_u, best_v, best_p, gmax = c
                    sp = internal_visit(sp, node, right, best_t, o3, i3)
                    return sp, best_t, best_u, best_v, best_p, gmax

                return jax.lax.cond(right < 0, leaf, internal, c)

            return jax.lax.cond(live, visit, lambda c: c,
                                (sp, best_t, best_u, best_v, best_p, gmax))

        sp, best_t, best_u, best_v, best_p, gmax = jax.lax.while_loop(
            icond, ibody, (sp, best_t, best_u, best_v, best_p, gmax))
        if any_hit:
            done = jnp.all((best_p >= 0.0) | (maxt < mint))
            sp_base = jnp.where(done, jnp.int32(0), sp_base)
        return sp_base, best_t, best_u, best_v, best_p, gmax

    w_o3 = (oxx, oyy, ozz)
    w_i3 = (idx, idy, idz)

    def cond(carry):
        return carry[0] > 0

    def body(carry):
        sp, best_t, best_u, best_v, best_p, gmax = carry
        sp = sp - 1
        node = stk_id[sp]
        tn_pop = stk_tn[sp]
        live = tn_pop * pad - 1e-6 <= gmax

        def visit(carry):
            sp, best_t, best_u, best_v, best_p, gmax = carry
            right = nmeta_ref[0, node]

            def leaf(carry):
                # TLAS leaf = instance
                inst = -nmeta_ref[1, node] - 1
                return instance_visit(inst, carry)

            def internal(carry):
                sp, best_t, best_u, best_v, best_p, gmax = carry
                sp = internal_visit(sp, node, right, best_t, w_o3, w_i3)
                return sp, best_t, best_u, best_v, best_p, gmax

            return jax.lax.cond(right < 0, leaf, internal, carry)

        return jax.lax.cond(live, visit, lambda c: c,
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
def dense_trace_v5i(packed_tris, node_aabb, node_meta, inst_inv, inst_meta,
                    org, direction, min_t, max_t, any_hit=False,
                    interpret=False):
    """Instanced trace. prim = GLOBAL instance-face slot (or -1)."""
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
    rays = rays.reshape(8, G, 8, 128).transpose(1, 0, 2, 3)

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
            pl.BlockSpec(inst_inv.shape, lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(inst_meta.shape, lambda g: (0, 0),
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
    )(rays, packed_tris, node_aabb, node_meta, inst_inv, inst_meta)

    out = out.transpose(1, 0, 2, 3).reshape(8, n_pad)
    hit = out[4, :n] > 0.0
    return {
        "t": jnp.where(hit, out[0, :n], INF),
        "u": out[1, :n],
        "v": out[2, :n],
        "prim": jnp.where(hit, out[3, :n].astype(jnp.int32), -1),
    }
