"""BVH correctness vs brute-force intersection (SURVEY.md §4 strategy)."""
import jax.numpy as jnp
import numpy as np

from pbrlab_tpu.core.math import INF
from pbrlab_tpu.ops.intersect import (intersect_bruteforce, intersect_bvh,
                                      occluded_bvh)


def _random_rays(scene, n, rng):
    bmin = np.asarray(scene["aabb_min"])
    bmax = np.asarray(scene["aabb_max"])
    center = 0.5 * (bmin + bmax)
    ext = (bmax - bmin).max()
    org = center + (rng.random((n, 3)) - 0.5) * 2.5 * ext
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (jnp.asarray(org, jnp.float32), jnp.asarray(d, jnp.float32),
            jnp.zeros((n,), jnp.float32), jnp.full((n,), INF, jnp.float32))


def test_bvh_matches_bruteforce(demo_scene, rng_np):
    org, d, mn, mx = _random_rays(demo_scene, 512, rng_np)
    ref = intersect_bruteforce(demo_scene, org, d, mn, mx)
    got = intersect_bvh(demo_scene, org, d, mn, mx)
    hit_ref = np.asarray(ref["prim"]) >= 0
    hit_got = np.asarray(got["prim"]) >= 0
    np.testing.assert_array_equal(hit_ref, hit_got)
    # same t everywhere (prim ids can differ on shared edges)
    np.testing.assert_allclose(np.asarray(got["t"])[hit_ref],
                               np.asarray(ref["t"])[hit_ref], rtol=1e-4)
    same_prim = np.asarray(ref["prim"]) == np.asarray(got["prim"])
    assert same_prim[hit_ref].mean() > 0.99
    uvok = same_prim & hit_ref
    np.testing.assert_allclose(np.asarray(got["u"])[uvok],
                               np.asarray(ref["u"])[uvok], atol=1e-4)


def test_bvh_respects_max_t(demo_scene, rng_np):
    org, d, mn, _ = _random_rays(demo_scene, 512, rng_np)
    full = intersect_bvh(demo_scene, org, d, mn,
                         jnp.full((512,), INF, jnp.float32))
    t = np.asarray(full["t"])
    hit = np.asarray(full["prim"]) >= 0
    # shrink max_t below each hit -> those lanes must miss
    limited = intersect_bvh(demo_scene, org, d, mn,
                            jnp.asarray(np.where(hit, t * 0.5, 1.0),
                                        jnp.float32))
    assert (np.asarray(limited["prim"])[hit] == -1).all()


def test_occluded_matches_closest(demo_scene, rng_np):
    org, d, mn, mx = _random_rays(demo_scene, 512, rng_np)
    closest = intersect_bvh(demo_scene, org, d, mn, mx)
    occ = occluded_bvh(demo_scene, org, d, mn, mx)
    np.testing.assert_array_equal(np.asarray(occ),
                                  np.asarray(closest["prim"]) >= 0)


def test_inside_box_hits(demo_scene):
    # rays from the box center away from the +z opening must hit geometry
    g = np.random.default_rng(7)
    d = g.normal(size=(512, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = d[d[:, 2] < -0.05]
    n = d.shape[0]
    org = jnp.broadcast_to(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32),
                           (n, 3))
    res = intersect_bvh(demo_scene, org, jnp.asarray(d, jnp.float32),
                        jnp.zeros((n,)), jnp.full((n,), INF))
    assert (np.asarray(res["prim"]) >= 0).all()


def test_dense5s_dispatch_wiring(monkeypatch):
    """trace_scene/occluded_scene must route through the v5s subtree
    scheduler when the scene carries a subtree cut (large-scene default)
    and agree with brute force (interpret mode)."""
    import jax.numpy as jnp
    import numpy as np

    from pbrlab_tpu.ops.intersect import (intersect_bruteforce,
                                          occluded_scene, trace_scene)
    from pbrlab_tpu.ops.pallas.dense_v5 import leaf_major, subtree_cut
    from pbrlab_tpu.scene.demo import build_demo_scene
    from pbrlab_tpu.scene.scene import scene_to_device

    scene_np, _ = build_demo_scene(subdiv=1)
    scene_np = dict(scene_np)
    scene_np["dense_tris_v5l"] = leaf_major(
        np.asarray(scene_np["dense_tris_v4"]))
    roots, aabb = subtree_cut(np.asarray(scene_np["v5_node_aabb"]),
                              np.asarray(scene_np["v5_node_meta"]),
                              max_nodes=8)
    scene_np["v5s_roots"] = roots
    scene_np["v5s_aabb"] = aabb
    scene = scene_to_device(scene_np)
    monkeypatch.setenv("PBRLAB_TRACE_BACKEND", "dense5s")

    rng = np.random.default_rng(3)
    n = 1024
    lo, hi = scene_np["aabb_min"], scene_np["aabb_max"]
    org = jnp.asarray(lo + (hi - lo) * rng.random((n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    mn = jnp.zeros((n,), jnp.float32)
    mx = jnp.full((n,), 1e18, jnp.float32)
    got = trace_scene(scene, org, d, mn, mx)
    ref = intersect_bruteforce(scene, org, d, mn, mx)
    hit_ref = np.asarray(ref["prim"]) >= 0
    np.testing.assert_array_equal(hit_ref, np.asarray(got["prim"]) >= 0)
    np.testing.assert_allclose(np.asarray(got["t"])[hit_ref],
                               np.asarray(ref["t"])[hit_ref], rtol=1e-3)
    occ = np.asarray(occluded_scene(scene, org, d, mn,
                                    jnp.full((n,), 0.5, jnp.float32)))
    # occlusion within 0.5 == closest hit within 0.5 (away from the
    # boundary, where kernel epsilon conventions legitimately differ)
    t_ref = np.asarray(ref["t"])
    off_boundary = ~hit_ref | (np.abs(t_ref - 0.5) > 1e-3)
    closest_within = hit_ref & (t_ref <= 0.5)
    np.testing.assert_array_equal(occ[off_boundary],
                                  closest_within[off_boundary])
