"""Unit tests for the L0 core kit: math, RNG, ONB, sampling."""
import jax
import jax.numpy as jnp
import numpy as np

from pbrlab_tpu.core import math as pm
from pbrlab_tpu.core import onb, rng, sampling


def test_vector_ops():
    a = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 2.0, 3.0]])
    b = jnp.asarray([[0.0, 1.0, 0.0], [4.0, 5.0, 6.0]])
    np.testing.assert_allclose(pm.vdot(a, b), [0.0, 32.0])
    np.testing.assert_allclose(pm.vcross(a, b)[0], [0, 0, 1.0])
    n = pm.vnormalize(b)
    np.testing.assert_allclose(pm.vlength(n), [1.0, 1.0], rtol=1e-6)


def test_fresnel_matches_scalar():
    # scalar port of the reference FresnelDielectricCos for a spot check
    def ref(cos_, eta):
        if abs(eta) < np.finfo(np.float32).eps:
            return 1.0
        if cos_ < 0.0:
            eta = 1.0 / eta
        c = abs(cos_)
        g = eta * eta - 1 + c * c
        if g > 0:
            g = np.sqrt(g)
            A = (g - c) / (g + c)
            B = (c * (g + c) - 1) / (c * (g - c) + 1)
            return 0.5 * A * A * (1 + B * B)
        return 1.0

    for cos_ in [1.0, 0.5, 0.1, -0.3]:
        for eta in [1.45, 1.5, 2.0, 0.0]:
            got = float(pm.fresnel_dielectric_cos(jnp.float32(cos_),
                                                  jnp.float32(eta)))
            np.testing.assert_allclose(got, ref(cos_, eta), rtol=1e-5,
                                       err_msg=f"cos={cos_} eta={eta}")


def test_rng_uniform_and_deterministic():
    pix = jnp.arange(1 << 14, dtype=jnp.uint32)
    s0 = rng.seed_state(pix, 0, seed=7)
    s1, u = rng.draw(s0)
    assert u.min() >= 0.0 and u.max() < 1.0
    # deterministic
    _, u2 = rng.draw(rng.seed_state(pix, 0, seed=7))
    np.testing.assert_array_equal(u, u2)
    # decorrelated across samples and roughly uniform
    _, v = rng.draw(rng.seed_state(pix, 1, seed=7))
    assert abs(float(jnp.mean(u)) - 0.5) < 0.01
    assert abs(float(jnp.mean(v)) - 0.5) < 0.01
    assert abs(float(jnp.corrcoef(jnp.stack([u, v]))[0, 1])) < 0.05
    # successive draws advance the state
    _, u3 = rng.draw(s1)
    assert not np.array_equal(np.asarray(u), np.asarray(u3))


def test_onb_orthonormal():
    k = np.random.default_rng(0).normal(size=(1024, 3)).astype(np.float32)
    n = jnp.asarray(k / np.linalg.norm(k, axis=1, keepdims=True))
    ex, ey = onb.branchless_onb(n)
    np.testing.assert_allclose(pm.vdot(ex, ey), 0.0, atol=1e-5)
    np.testing.assert_allclose(pm.vdot(ex, n), 0.0, atol=1e-5)
    np.testing.assert_allclose(pm.vlength(ex), 1.0, atol=1e-5)
    np.testing.assert_allclose(pm.vcross(ex, ey), n, atol=1e-5)
    # round trip local <-> global
    v = jnp.asarray(np.random.default_rng(1).normal(size=(1024, 3)),
                    jnp.float32)
    lv = onb.to_local(v, ex, ey, n)
    gv = onb.to_global(lv, ex, ey, n)
    np.testing.assert_allclose(gv, v, atol=1e-4)


def test_cosine_hemisphere_distribution():
    n = 1 << 16
    g = np.random.default_rng(2)
    u1 = jnp.asarray(g.random(n), jnp.float32)
    u2 = jnp.asarray(g.random(n), jnp.float32)
    d = sampling.cosine_sample_hemisphere(u1, u2)
    np.testing.assert_allclose(pm.vlength(d), 1.0, atol=1e-5)
    assert (d[..., 2] >= 0).all()
    # E[cos theta] = 2/3 for pdf cos/pi
    assert abs(float(jnp.mean(d[..., 2])) - 2.0 / 3.0) < 0.01


def test_uniform_sphere_distribution():
    n = 1 << 16
    g = np.random.default_rng(3)
    d = sampling.uniform_sample_sphere(
        jnp.asarray(g.random(n), jnp.float32),
        jnp.asarray(g.random(n), jnp.float32))
    np.testing.assert_allclose(pm.vlength(d), 1.0, atol=1e-5)
    assert np.abs(np.asarray(jnp.mean(d, axis=0))).max() < 0.02


def test_power_heuristic():
    a = jnp.asarray([1.0, 2.0, 0.0, 5.0])
    b = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    w = sampling.power_heuristic_weight(a, b)
    w2 = sampling.power_heuristic_weight(b, a)
    np.testing.assert_allclose(w + w2, 1.0, atol=1e-6)
    assert float(w[0]) == 0.5


def test_sample_cdf_lower_bound():
    cdf = jnp.asarray([0.1, 0.4, 1.0])
    u = jnp.asarray([0.05, 0.1, 0.2, 0.9, 0.9999])
    idx = sampling.sample_cdf(cdf, u)
    np.testing.assert_array_equal(idx, [0, 0, 1, 2, 2])


def test_triangle_sample_in_triangle():
    g = np.random.default_rng(4)
    u, v = sampling.triangle_uniform_sample(
        jnp.asarray(g.random(1000), jnp.float32),
        jnp.asarray(g.random(1000), jnp.float32))
    assert (u >= 0).all() and (v >= 0).all() and (u + v <= 1.0 + 1e-6).all()
