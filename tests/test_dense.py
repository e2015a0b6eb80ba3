"""Dense Pallas intersection kernels vs brute force (interpret mode on CPU).

After commit() the scene's face columns are in the V4 SAH slot order, so
brute-force prim ids ARE slot ids. V4 returns slot ids directly; the legacy
V2/V3 kernels return ids in their own Morton order and are remapped through
scene["dense_order"] (as ops.intersect._remap_legacy_prim does).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from pbrlab_tpu.core.math import INF
from pbrlab_tpu.ops.intersect import intersect_bruteforce
from pbrlab_tpu.ops.pallas.dense import dense_trace


@pytest.fixture(scope="module")
def dense_scene():
    """Small scene for interpret-mode kernel runs (interpret cost scales
    with rays x clusters; subdiv=1 keeps each test in seconds)."""
    from pbrlab_tpu.scene.demo import build_demo_scene
    from pbrlab_tpu.scene.scene import scene_to_device

    scene_np, _ = build_demo_scene(subdiv=1)
    return scene_to_device(scene_np)


def _rays(scene, n, rng):
    bmin = np.asarray(scene["aabb_min"])
    bmax = np.asarray(scene["aabb_max"])
    org = bmin + rng.random((n, 3)) * (bmax - bmin) * 1.5 - 0.25 * (
        bmax - bmin)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (jnp.asarray(org, jnp.float32), jnp.asarray(d, jnp.float32),
            jnp.zeros((n,), jnp.float32), jnp.full((n,), INF, jnp.float32))


def _remap(scene, prim):
    prim = np.asarray(prim)
    order = np.asarray(scene["dense_order"])
    return np.where(prim >= 0, order[np.maximum(prim, 0)], -1)


def _check_against_bruteforce(scene, got, ref, remap=False):
    hit_ref = np.asarray(ref["prim"]) >= 0
    got_prim = _remap(scene, got["prim"]) if remap else np.asarray(
        got["prim"])
    np.testing.assert_array_equal(hit_ref, got_prim >= 0)
    np.testing.assert_allclose(np.asarray(got["t"])[hit_ref],
                               np.asarray(ref["t"])[hit_ref], rtol=1e-3,
                               atol=1e-4)
    same = np.asarray(ref["prim"]) == got_prim
    assert same[hit_ref].mean() > 0.99


def test_dense_matches_bruteforce(dense_scene, rng_np):
    org, d, mn, mx = _rays(dense_scene, 512, rng_np)
    ref = intersect_bruteforce(dense_scene, org, d, mn, mx)
    got = dense_trace(dense_scene["dense_tris"],
                      dense_scene["dense_cluster_aabb"], org, d, mn, mx,
                      interpret=True)
    _check_against_bruteforce(dense_scene, got, ref, remap=True)


def test_dense_any_hit(dense_scene, rng_np):
    org, d, mn, mx = _rays(dense_scene, 256, rng_np)
    closest = dense_trace(dense_scene["dense_tris"],
                          dense_scene["dense_cluster_aabb"], org, d, mn, mx,
                          interpret=True)
    any_h = dense_trace(dense_scene["dense_tris"],
                        dense_scene["dense_cluster_aabb"], org, d, mn, mx,
                        any_hit=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(any_h["prim"]) >= 0,
                                  np.asarray(closest["prim"]) >= 0)


def test_dense_respects_max_t(dense_scene, rng_np):
    org, d, mn, _ = _rays(dense_scene, 256, rng_np)
    full = dense_trace(dense_scene["dense_tris"],
                       dense_scene["dense_cluster_aabb"], org, d, mn,
                       jnp.full((256,), INF), interpret=True)
    t = np.asarray(full["t"])
    hit = np.asarray(full["prim"]) >= 0
    lim = dense_trace(dense_scene["dense_tris"],
                      dense_scene["dense_cluster_aabb"], org, d, mn,
                      jnp.asarray(np.where(hit, t * 0.5, 1.0), jnp.float32),
                      interpret=True)
    assert (np.asarray(lim["prim"])[hit] == -1).all()


def test_dense_v3_matches_bruteforce(dense_scene, rng_np):
    """Survivor-list kernel, both cull modes, vs the brute-force oracle."""
    from pbrlab_tpu.ops.pallas.dense_v3 import dense_trace_v3

    org, d, mn, mx = _rays(dense_scene, 256, rng_np)
    ref = intersect_bruteforce(dense_scene, org, d, mn, mx)
    for cull in ("beam", "exact"):
        got = dense_trace_v3(dense_scene["dense_tris"],
                             dense_scene["dense_cluster_aabb"], org, d, mn,
                             mx, interpret=True, cull=cull)
        _check_against_bruteforce(dense_scene, got, ref, remap=True)


def test_dense_v4_matches_bruteforce(dense_scene, rng_np):
    """Scalar-triangle kernel (default TPU backend) vs brute force —
    closest hit, any hit, and prim ids are slot ids with NO remap."""
    from pbrlab_tpu.ops.pallas.dense_v4 import dense_trace_v4

    org, d, mn, mx = _rays(dense_scene, 512, rng_np)
    ref = intersect_bruteforce(dense_scene, org, d, mn, mx)
    got = dense_trace_v4(dense_scene["dense_tris_v4"],
                         dense_scene["dense_cluster_aabb_v4"], org, d, mn,
                         mx, interpret=True)
    _check_against_bruteforce(dense_scene, got, ref)
    any_h = dense_trace_v4(dense_scene["dense_tris_v4"],
                           dense_scene["dense_cluster_aabb_v4"], org, d, mn,
                           mx, any_hit=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(any_h["prim"]) >= 0,
                                  np.asarray(ref["prim"]) >= 0)


def test_dense_v4_respects_max_t_and_dead_lanes(dense_scene, rng_np):
    """Per-lane max_t clips hits; dead lanes (max_t < 0) never hit, even
    padded into partially-alive groups (n not a multiple of the tile)."""
    from pbrlab_tpu.ops.pallas.dense_v4 import dense_trace_v4

    n = 384
    org, d, mn, _ = _rays(dense_scene, n, rng_np)
    full = dense_trace_v4(dense_scene["dense_tris_v4"],
                          dense_scene["dense_cluster_aabb_v4"], org, d, mn,
                          jnp.full((n,), INF), interpret=True)
    t = np.asarray(full["t"])
    hit = np.asarray(full["prim"]) >= 0
    mx = np.where(hit, t * 0.5, 1.0).astype(np.float32)
    mx[::3] = -1.0
    lim = dense_trace_v4(dense_scene["dense_tris_v4"],
                         dense_scene["dense_cluster_aabb_v4"], org, d, mn,
                         jnp.asarray(mx), interpret=True)
    assert (np.asarray(lim["prim"])[hit] == -1).all()
    assert (np.asarray(lim["prim"])[::3] == -1).all()


def test_dense_v4_permutation_invariant(dense_scene, rng_np):
    """Results are bit-identical per ray under any lane permutation (exact
    culling — grouping only affects survivor list size, never membership
    for the rays present)."""
    from pbrlab_tpu.ops.pallas.dense_v4 import dense_trace_v4

    n = 512
    org, d, mn, mx = _rays(dense_scene, n, rng_np)
    perm = rng_np.permutation(n)
    base = dense_trace_v4(dense_scene["dense_tris_v4"],
                          dense_scene["dense_cluster_aabb_v4"], org, d, mn,
                          mx, interpret=True)
    shuf = dense_trace_v4(dense_scene["dense_tris_v4"],
                          dense_scene["dense_cluster_aabb_v4"], org[perm],
                          d[perm], mn[perm], mx[perm], interpret=True)
    np.testing.assert_array_equal(np.asarray(base["t"])[perm],
                                  np.asarray(shuf["t"]))
    np.testing.assert_array_equal(np.asarray(base["prim"])[perm],
                                  np.asarray(shuf["prim"]))


def test_beam_cull_is_conservative(dense_scene, rng_np):
    """Every exact per-ray survivor is contained in the beam group mask."""
    from pbrlab_tpu.ops.pallas.dense_v3 import (cluster_mask,
                                                group_survivors_beam)

    n = 1024
    org, d, mn, mx = _rays(dense_scene, n, rng_np)
    aabb = dense_scene["dense_cluster_aabb"]
    exact = np.asarray(cluster_mask(aabb, org, d, mn, mx))
    exact_g = exact.reshape(n // 128, 128, -1).any(axis=1)
    beam = np.asarray(group_survivors_beam(aabb, org, d, mn, mx))
    assert (exact_g <= beam).all()


def test_dense_curve_matches_bvh(rng_np):
    """Dense hair kernel vs the BVH ribbon walk on a hair tuft."""
    from pbrlab_tpu.io.cyhair import make_demo_hair
    from pbrlab_tpu.ops.curves import curve_trace
    from pbrlab_tpu.ops.pallas.dense_curve import dense_curve_trace
    from pbrlab_tpu.scene.scene import SceneBuilder, commit, scene_to_device

    b = SceneBuilder()
    hair = make_demo_hair(num_strands=24, base=(0.0, 1.0, 0.0))
    hair.material_id = b.materials.add_hair("hair")
    b.add_instance([], curves=[hair])
    scene = scene_to_device(commit(b.build()))

    n = 512
    org = jnp.asarray(rng_np.normal(0, 1, (n, 3)) + [0, 1, 0], jnp.float32)
    d = rng_np.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    mn = jnp.zeros((n,))
    mx = jnp.full((n,), INF)
    ref = curve_trace(scene, org, d, mn, mx)
    got = dense_curve_trace(scene["dense_segs"], scene["dense_seg_aabb"],
                            org, d, mn, mx, interpret=True)
    hit_ref = np.asarray(ref["seg"]) >= 0
    hit_got = np.asarray(got["sub"]) >= 0
    assert (hit_ref == hit_got).mean() > 0.98  # ribbon edge cases may differ
    both = hit_ref & hit_got
    np.testing.assert_allclose(np.asarray(got["t"])[both],
                               np.asarray(ref["t"])[both], rtol=1e-2,
                               atol=1e-3)
    # signed offsets agree in sign and magnitude for matching hits
    same_sub = both & (np.abs(np.asarray(got["t"]) - np.asarray(ref["t"]))
                       < 1e-4)
    np.testing.assert_allclose(np.asarray(got["v"])[same_sub],
                               np.asarray(ref["v"])[same_sub], atol=5e-2)


def test_dense_v5_matches_bruteforce(dense_scene, rng_np):
    """Fused packet-traversal kernel vs brute force — closest + any hit +
    dead lanes (slot ids, no remap)."""
    from pbrlab_tpu.ops.pallas.dense_v5 import dense_trace_v5

    org, d, mn, mx = _rays(dense_scene, 512, rng_np)
    ref = intersect_bruteforce(dense_scene, org, d, mn, mx)
    got = dense_trace_v5(dense_scene["dense_tris_v4"],
                         dense_scene["v5_node_aabb"],
                         dense_scene["v5_node_meta"], org, d, mn, mx,
                         interpret=True)
    _check_against_bruteforce(dense_scene, got, ref)
    # any-hit with dead lanes mixed in (they must not block early exit)
    mxd = np.asarray(mx).copy()
    mxd[::4] = -1.0
    any_h = dense_trace_v5(dense_scene["dense_tris_v4"],
                           dense_scene["v5_node_aabb"],
                           dense_scene["v5_node_meta"], org, d, mn,
                           jnp.asarray(mxd), any_hit=True, interpret=True)
    want = (np.asarray(ref["prim"]) >= 0) & (mxd > 0)
    np.testing.assert_array_equal(np.asarray(any_h["prim"]) >= 0, want)


def test_dense_v5l_matches_v5(dense_scene, rng_np):
    """Leaf-DMA variant (HBM triangles, double-buffered SMEM) returns
    bit-identical hits to the SMEM-resident V5."""
    from pbrlab_tpu.ops.pallas.dense_v5 import (dense_trace_v5,
                                                dense_trace_v5l, leaf_major)

    org, d, mn, mx = _rays(dense_scene, 256, rng_np)
    a = dense_trace_v5(dense_scene["dense_tris_v4"],
                       dense_scene["v5_node_aabb"],
                       dense_scene["v5_node_meta"], org, d, mn, mx,
                       interpret=True)
    pl_ = leaf_major(np.asarray(dense_scene["dense_tris_v4"]))
    b = dense_trace_v5l(jnp.asarray(pl_), dense_scene["v5_node_aabb"],
                        dense_scene["v5_node_meta"], org, d, mn, mx,
                        interpret=True)
    np.testing.assert_array_equal(np.asarray(a["prim"]), np.asarray(b["prim"]))
    np.testing.assert_array_equal(np.asarray(a["t"]), np.asarray(b["t"]))


def test_dense_v5s_matches_bruteforce(dense_scene, rng_np):
    """Subtree-scheduled large-scene trace (sorted passes over a BFS cut,
    per-group restricted roots, cleanup pass) vs brute force — closest and
    any-hit (round-3 verdict Missing #1 / next-round #2)."""
    from pbrlab_tpu.ops.pallas.dense_v5 import (dense_trace_v5s, leaf_major,
                                                subtree_cut)

    org, d, mn, mx = _rays(dense_scene, 512, rng_np)
    ref = intersect_bruteforce(dense_scene, org, d, mn, mx)
    pl_ = leaf_major(np.asarray(dense_scene["dense_tris_v4"]))
    roots, sub_aabb = subtree_cut(np.asarray(dense_scene["v5_node_aabb"]),
                                  np.asarray(dense_scene["v5_node_meta"]),
                                  max_nodes=16)
    # passes=1: single scheduled round; passes=2: the composite (c1,c2)
    # one-sort-two-rounds path (run_pass2); passes=3: composite + single
    for passes in (1, 2, 3):
        got = dense_trace_v5s(jnp.asarray(pl_),
                              dense_scene["v5_node_aabb"],
                              dense_scene["v5_node_meta"],
                              jnp.asarray(roots),
                              jnp.asarray(sub_aabb), org, d, mn, mx,
                              interpret=True, passes=passes)
        _check_against_bruteforce(dense_scene, got, ref)
    # any-hit with dead lanes mixed in
    mxd = np.asarray(mx).copy()
    mxd[::4] = -1.0
    any_h = dense_trace_v5s(jnp.asarray(pl_), dense_scene["v5_node_aabb"],
                            dense_scene["v5_node_meta"], jnp.asarray(roots),
                            jnp.asarray(sub_aabb), org, d, mn,
                            jnp.asarray(mxd), any_hit=True, interpret=True,
                            passes=2)
    want = (np.asarray(ref["prim"]) >= 0) & (mxd > 0)
    np.testing.assert_array_equal(np.asarray(any_h["prim"]) >= 0, want)


def test_dense_v4_dual_matches_separate(dense_scene, rng_np):
    """Fused dual-query kernel (closest + shared-origin shadow any-hit,
    the deferred-NEE launch) == the two separate launches."""
    from pbrlab_tpu.ops.pallas.dense_v4 import (dense_trace_v4,
                                                dense_trace_v4_dual)

    n = 512
    org, d, mn, mx = _rays(dense_scene, n, rng_np)
    sd = rng_np.normal(size=(n, 3))
    sd /= np.linalg.norm(sd, axis=1, keepdims=True)
    sd = jnp.asarray(sd, jnp.float32)
    smn = jnp.full((n,), 1e-3, jnp.float32)
    smx = jnp.asarray(
        np.where(rng_np.random(n) < 0.3, -1.0,
                 rng_np.random(n) * 4.0), jnp.float32)  # 30% no query
    tris = dense_scene["dense_tris_v4"]
    aabb = dense_scene["dense_cluster_aabb_v4"]
    got, occ = dense_trace_v4_dual(tris, aabb, org, d, mn, mx, sd, smn,
                                   smx, interpret=True)
    ref = dense_trace_v4(tris, aabb, org, d, mn, mx, interpret=True)
    ref_occ = dense_trace_v4(tris, aabb, org, sd, smn, smx, any_hit=True,
                             interpret=True)["prim"] >= 0
    for k in ("t", "u", "v", "prim"):
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(ref[k]))
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref_occ))
    assert np.asarray(occ)[np.asarray(smx) < 0].sum() == 0


def test_dense_v5_dual_matches_separate(dense_scene, rng_np):
    from pbrlab_tpu.ops.pallas.dense_v5 import (dense_trace_v5,
                                                dense_trace_v5_dual)

    n = 512
    org, d, mn, mx = _rays(dense_scene, n, rng_np)
    sd = rng_np.normal(size=(n, 3))
    sd /= np.linalg.norm(sd, axis=1, keepdims=True)
    sd = jnp.asarray(sd, jnp.float32)
    smn = jnp.full((n,), 1e-3, jnp.float32)
    smx = jnp.asarray(
        np.where(rng_np.random(n) < 0.3, -1.0,
                 rng_np.random(n) * 4.0), jnp.float32)
    tris = dense_scene["dense_tris_v4"]
    na, nm = dense_scene["v5_node_aabb"], dense_scene["v5_node_meta"]
    got, occ = dense_trace_v5_dual(tris, na, nm, org, d, mn, mx, sd, smn,
                                   smx, interpret=True)
    ref = dense_trace_v5(tris, na, nm, org, d, mn, mx, interpret=True)
    ref_occ = dense_trace_v5(tris, na, nm, org, sd, smn, smx,
                             any_hit=True, interpret=True)["prim"] >= 0
    for k in ("t", "u", "v", "prim"):
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(ref[k]))
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref_occ))
