"""Dense Pallas intersection kernel vs brute force (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np

from pbrlab_tpu.core.math import INF
from pbrlab_tpu.ops.intersect import intersect_bruteforce
from pbrlab_tpu.ops.pallas.dense import dense_trace


def _rays(scene, n, rng):
    bmin = np.asarray(scene["aabb_min"])
    bmax = np.asarray(scene["aabb_max"])
    org = bmin + rng.random((n, 3)) * (bmax - bmin) * 1.5 - 0.25 * (
        bmax - bmin)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (jnp.asarray(org, jnp.float32), jnp.asarray(d, jnp.float32),
            jnp.zeros((n,), jnp.float32), jnp.full((n,), INF, jnp.float32))


def test_dense_matches_bruteforce(demo_scene, rng_np):
    """After commit() the scene's faces are Morton-ordered, so dense prim
    ids are directly comparable with the brute-force ids."""
    org, d, mn, mx = _rays(demo_scene, 512, rng_np)
    ref = intersect_bruteforce(demo_scene, org, d, mn, mx)
    got = dense_trace(demo_scene["dense_tris"],
                      demo_scene["dense_cluster_aabb"], org, d, mn, mx,
                      interpret=True)
    hit_ref = np.asarray(ref["prim"]) >= 0
    hit_got = np.asarray(got["prim"]) >= 0
    np.testing.assert_array_equal(hit_ref, hit_got)
    np.testing.assert_allclose(np.asarray(got["t"])[hit_ref],
                               np.asarray(ref["t"])[hit_ref], rtol=1e-3,
                               atol=1e-4)
    same = np.asarray(ref["prim"]) == np.asarray(got["prim"])
    assert same[hit_ref].mean() > 0.99


def test_dense_any_hit(demo_scene, rng_np):
    org, d, mn, mx = _rays(demo_scene, 256, rng_np)
    closest = dense_trace(demo_scene["dense_tris"],
                          demo_scene["dense_cluster_aabb"], org, d, mn, mx,
                          interpret=True)
    any_h = dense_trace(demo_scene["dense_tris"],
                        demo_scene["dense_cluster_aabb"], org, d, mn, mx,
                        any_hit=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(any_h["prim"]) >= 0,
                                  np.asarray(closest["prim"]) >= 0)


def test_dense_respects_max_t(demo_scene, rng_np):
    org, d, mn, _ = _rays(demo_scene, 256, rng_np)
    full = dense_trace(demo_scene["dense_tris"],
                       demo_scene["dense_cluster_aabb"], org, d, mn,
                       jnp.full((256,), INF), interpret=True)
    t = np.asarray(full["t"])
    hit = np.asarray(full["prim"]) >= 0
    lim = dense_trace(demo_scene["dense_tris"],
                      demo_scene["dense_cluster_aabb"], org, d, mn,
                      jnp.asarray(np.where(hit, t * 0.5, 1.0), jnp.float32),
                      interpret=True)
    assert (np.asarray(lim["prim"])[hit] == -1).all()


def test_dense_v2_matches_bruteforce(demo_scene, rng_np):
    from pbrlab_tpu.ops.pallas.dense_v2 import dense_trace_v2

    org, d, mn, mx = _rays(demo_scene, 512, rng_np)
    ref = intersect_bruteforce(demo_scene, org, d, mn, mx)
    got = dense_trace_v2(demo_scene["dense_tris"],
                         demo_scene["dense_cluster_aabb"], org, d, mn, mx,
                         interpret=True)
    hit_ref = np.asarray(ref["prim"]) >= 0
    np.testing.assert_array_equal(hit_ref, np.asarray(got["prim"]) >= 0)
    np.testing.assert_allclose(np.asarray(got["t"])[hit_ref],
                               np.asarray(ref["t"])[hit_ref], rtol=1e-3,
                               atol=1e-4)
    same = np.asarray(ref["prim"]) == np.asarray(got["prim"])
    assert same[hit_ref].mean() > 0.99
