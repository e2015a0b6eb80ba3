"""Closure-level physics tests: GGX + principled (SURVEY.md §4 pyramid)."""
import jax.numpy as jnp
import numpy as np

from pbrlab_tpu.shading import ggx, principled


def _hemi_dirs(n, rng):
    d = rng.normal(size=(n, 3))
    d[:, 2] = np.abs(d[:, 2])
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(d, jnp.float32)


def test_ggx_sample_eval_consistency(rng_np):
    n = 4096
    wo = _hemi_dirs(n, rng_np)
    for ax, ay, distrib in [(0.1, 0.1, 2), (0.3, 0.3, 2), (0.04, 0.04, 1),
                            (0.2, 0.05, 2)]:
        u1 = jnp.asarray(rng_np.random(n), jnp.float32)
        u2 = jnp.asarray(rng_np.random(n), jnp.float32)
        axv = jnp.full((n,), ax)
        ayv = jnp.full((n,), ay)
        wi, f_s, pdf_s = ggx.sample(wo, axv, ayv, u1, u2, distrib)
        f_e, pdf_e = ggx.eval_pdf(wi, wo, axv, ayv, distrib)
        ok = np.asarray(pdf_s) > 1e-5
        np.testing.assert_allclose(np.asarray(f_e)[ok],
                                   np.asarray(f_s)[ok], rtol=1e-4,
                                   err_msg=f"ax={ax} ay={ay} d={distrib}")
        np.testing.assert_allclose(np.asarray(pdf_e)[ok],
                                   np.asarray(pdf_s)[ok], rtol=1e-4)


def test_ggx_matches_reference_formula(rng_np):
    """Spot-check f and pdf against a scalar transcription of the reference
    (microfacet-ggx.h:164-245). NOTE: the reference's pdf divides by an
    extra cos_i relative to the Heitz VNDF density (same `common` term used
    for f and pdf) — it is NOT a normalized density; we reproduce its
    behavior exactly, so the check is against the formula, not against
    integral-to-one."""
    def ref_f_pdf(wi, wo, alpha):
        cos_no, cos_ni = wo[2], wi[2]
        if cos_no <= 0 or cos_ni <= 0:
            return 0.0, 0.0
        m = (wi + wo) / np.linalg.norm(wi + wo)
        a2 = alpha * alpha
        c2 = m[2] * m[2]
        tan2 = (1 - c2) / c2
        D = a2 / (np.pi * c2 * c2 * (a2 + tan2) ** 2)
        g1 = lambda c: 2 / (1 + np.sqrt(1 + a2 * (1 - c * c) / (c * c)))
        G1o, G1i = g1(cos_no), g1(cos_ni)
        common = D * 0.25 / cos_no / cos_ni
        return G1o * G1i * common, G1o * common

    for _ in range(50):
        wo = rng_np.normal(size=3)
        wo[2] = abs(wo[2]) + 0.05
        wo /= np.linalg.norm(wo)
        wi = rng_np.normal(size=3)
        wi[2] = abs(wi[2]) + 0.05
        wi /= np.linalg.norm(wi)
        alpha = 0.05 + rng_np.random() * 0.6
        f, pdf = ggx.eval_pdf(jnp.asarray(wi[None], jnp.float32),
                              jnp.asarray(wo[None], jnp.float32),
                              jnp.full((1,), alpha), jnp.full((1,), alpha),
                              2)
        rf, rp = ref_f_pdf(wi, wo, alpha)
        np.testing.assert_allclose(float(f[0]), rf, rtol=1e-3)
        np.testing.assert_allclose(float(pdf[0]), rp, rtol=1e-3)


def test_ggx_white_furnace_bound(rng_np):
    """Reflection-only GGX without Fresnel: integral of f*cos <= ~1
    (Smith G underestimates multiple scattering, so <= 1)."""
    n = 1 << 16
    wo = jnp.broadcast_to(
        jnp.asarray([0.1, 0.0, np.sqrt(1 - 0.01)], jnp.float32), (n, 3))
    wi = _hemi_dirs(n, rng_np)
    f, _ = ggx.eval_pdf(wi, wo, jnp.full((n,), 0.4), jnp.full((n,), 0.4), 2)
    integral = float(np.mean(np.asarray(f * wi[:, 2]))) * 2.0 * np.pi
    assert integral <= 1.05, f"energy {integral}"
    assert integral > 0.3  # and not degenerate


def _mk_mat(n, **over):
    base = {
        "subsurface": 0.0, "metallic": 0.0, "specular": 0.5,
        "specular_tint": 0.0, "roughness": 0.5, "anisotropic": 0.0,
        "clearcoat": 0.0, "clearcoat_roughness": 0.03, "transmission": 0.0,
    }
    base.update(over)
    mat = {k: jnp.full((n,), v) for k, v in base.items()}
    mat["subsurface_radius"] = jnp.ones((n, 3))
    return mat


def test_principled_weights_partition(rng_np):
    """Closure sample weights must sum to 1 when any closure is enabled
    (FetchClosureSampleWeight normalization, :90-110)."""
    n = 512
    wo = _hemi_dirs(n, rng_np)
    base = jnp.asarray(rng_np.random((n, 3)), jnp.float32) * 0.8 + 0.1
    b = principled.param_to_bsdf(
        _mk_mat(n, specular=0.7, clearcoat=0.5), base, base)
    wd, ws, wsp, wcc = principled.closure_sample_weights(wo, b)
    total = np.asarray(wd + ws + wsp + wcc)
    np.testing.assert_allclose(total, 1.0, atol=1e-5)


def test_principled_sample_eval_consistency(rng_np):
    n = 4096
    wo = _hemi_dirs(n, rng_np)
    base = jnp.broadcast_to(jnp.asarray([0.8, 0.5, 0.2]), (n, 3))
    b = principled.param_to_bsdf(_mk_mat(n, specular=1.0, roughness=0.3),
                                base, base)
    us = [jnp.asarray(rng_np.random(n), jnp.float32) for _ in range(3)]
    wi, f_s, pdf_s, pick_sss = principled.sample_surface(wo, b, *us)
    assert not np.asarray(pick_sss).any()
    f_e, pdf_e = principled.eval_bsdf(wi, wo, b)
    ok = np.asarray(pdf_s) > 1e-5
    np.testing.assert_allclose(np.asarray(pdf_e)[ok], np.asarray(pdf_s)[ok],
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(f_e)[ok], np.asarray(f_s)[ok],
                               rtol=1e-4)


def test_principled_diffuse_furnace(rng_np):
    """Pure diffuse with albedo 1: f*cos integrates to ~1 (white furnace)."""
    n = 1 << 16
    wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    ones = jnp.ones((n, 3))
    b = principled.param_to_bsdf(_mk_mat(n, specular=0.0), ones, ones)
    wi = _hemi_dirs(n, rng_np)
    f, _ = principled.eval_bsdf(wi, wo, b)
    integral = float(np.mean(np.asarray(f[:, 0] * wi[:, 2]))) * 2.0 * np.pi
    np.testing.assert_allclose(integral, 1.0, rtol=0.03)


def test_sss_burley_setup_matches_scalar():
    """bssrdf_setup vs a direct scalar transcription of the reference
    (random-walk-sss.h:35-104, eq.5 + compatible MFP)."""
    from pbrlab_tpu.shading.sss import bssrdf_setup

    weight = jnp.asarray([[0.9, 0.7, 0.6]])
    albedo = jnp.asarray([[1.0, 0.8, 0.8]])
    radius = jnp.asarray([[1.0, 0.2, 1e-9]])
    w2, a2, r2, kd = bssrdf_setup(weight, albedo, radius)
    # channel 2 is tiny -> diffuse fallback
    np.testing.assert_allclose(float(kd[0, 2]), 0.6, rtol=1e-6)
    assert float(w2[0, 2]) == 0.0
    # channels 0/1: l/s with l = 0.25/pi * r, s = 1.85 - A + 7|A-0.8|^3
    for i, (a, r) in enumerate([(1.0, 1.0), (0.8, 0.2)]):
        l = 0.25 / np.pi * r
        s = 1.85 - a + 7.0 * abs((a - 0.8) ** 3)
        np.testing.assert_allclose(float(r2[0, i]), l / s, rtol=1e-5)


def test_sss_scattering_coefficients():
    """Albedo inversion (random-walk-sss.h:111-136) scalar check."""
    from pbrlab_tpu.shading.sss import scattering_coefficients

    w = jnp.asarray([[1.0, 1.0, 1.0]])
    a = jnp.asarray([[0.8, 0.5, 0.2]])
    d = jnp.asarray([[0.1, 0.1, 0.1]])
    sigma_t, sigma_s, tp = scattering_coefficients(w, a, d)
    for i, A in enumerate([0.8, 0.5, 0.2]):
        alpha = 1 - np.exp(A * (-5.09406 + A * (2.61188 - A * 4.31805)))
        s = 1.9 - A + 3.5 * (A - 0.8) ** 2
        st = 1.0 / max(0.1 * s, 1e-16)
        np.testing.assert_allclose(float(sigma_t[0, i]), st, rtol=1e-5)
        np.testing.assert_allclose(float(sigma_s[0, i]), st * alpha,
                                   rtol=1e-5)
