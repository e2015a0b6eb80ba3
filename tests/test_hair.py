"""Hair subsystem: CyHair conversion, curve intersection, hair BSDF."""
import jax.numpy as jnp
import numpy as np
import pytest

from pbrlab_tpu.core.math import INF
from pbrlab_tpu.io.cyhair import (_catmullrom_to_bezier_strand, make_demo_hair)
from pbrlab_tpu.ops.curves import _ribbon_intersect
from pbrlab_tpu.shading import hair


def test_catmullrom_bezier_interpolates_endpoints():
    cv = np.asarray([[0, 0, 0], [1, 0, 0], [2, 1, 0], [3, 1, 1], [4, 0, 1]],
                    np.float32)
    r = np.linspace(0.1, 0.2, 5).astype(np.float32)
    seg = _catmullrom_to_bezier_strand(cv, r)  # [S,4,4]
    # first bezier starts at cv[0], last ends at cv[-1]
    np.testing.assert_allclose(seg[0, 0, :3], cv[0], atol=1e-6)
    np.testing.assert_allclose(seg[-1, 3, :3], cv[-1], atol=1e-6)
    # segment chain is C0: each segment ends where the next starts
    np.testing.assert_allclose(seg[:-1, 3], seg[1:, 0], atol=1e-6)


def test_ribbon_intersect_hits_cylinder():
    # vertical segment at x=0,z=0 radius .1; ray along -z hits at z offset
    p0 = jnp.asarray([[0.0, 0.0, 0.0]])
    p1 = jnp.asarray([[0.0, 1.0, 0.0]])
    r = jnp.asarray([0.1])
    org = jnp.asarray([[0.05, 0.5, 2.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    hit, t, s, v = _ribbon_intersect(org, d, p0, p1, r, r,
                                     jnp.asarray([0.0]), jnp.asarray([INF]))
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 2.0, atol=1e-5)
    np.testing.assert_allclose(float(s[0]), 0.5, atol=1e-5)
    assert abs(float(v[0])) <= 1.0
    # offset magnitude = 0.05 / 0.1 = 0.5
    np.testing.assert_allclose(abs(float(v[0])), 0.5, atol=1e-5)
    # miss outside radius
    org2 = jnp.asarray([[0.2, 0.5, 2.0]])
    hit2, *_ = _ribbon_intersect(org2, d, p0, p1, r, r, jnp.asarray([0.0]),
                                 jnp.asarray([INF]))
    assert not bool(hit2[0])


def _default_hair_bsdf(n=1, h=0.3):
    mat = {
        "hair_coloring": jnp.ones((n,), jnp.int32),
        "hair_base_color": jnp.broadcast_to(
            jnp.asarray([0.18, 0.06, 0.02]), (n, 3)),
        "melanin": jnp.full((n,), 0.5),
        "melanin_redness": jnp.full((n,), 0.8),
        "melanin_randomize": jnp.zeros((n,)),
        "hair_roughness": jnp.full((n,), 0.2),
        "azimuthal_roughness": jnp.full((n,), 0.3),
        "hair_ior": jnp.full((n,), 1.55),
        "shift": jnp.full((n,), 2.0),
        "hair_specular_tint": jnp.ones((n, 3)),
        "second_specular_tint": jnp.ones((n, 3)),
        "transmission_tint": jnp.ones((n, 3)),
    }
    return hair.param_to_bsdf(mat, jnp.full((n,), h))


def test_hair_eval_sample_pdf_consistency():
    """sample() must return the same f/pdf as eval at the sampled direction."""
    n = 512
    g = np.random.default_rng(5)
    b = _default_hair_bsdf(n, h=0.3)
    wo = g.normal(size=(n, 3))
    wo /= np.linalg.norm(wo, axis=1, keepdims=True)
    wo = jnp.asarray(wo, jnp.float32)
    us = [jnp.asarray(g.random(n), jnp.float32) for _ in range(4)]
    wi, f_s, pdf_s = hair.sample(wo, b, *us)
    f_e, pdf_e = hair.eval_cos_pdf(wi, wo, b)
    ok = np.asarray(pdf_s) > 1e-6
    np.testing.assert_allclose(np.asarray(pdf_e)[ok], np.asarray(pdf_s)[ok],
                               rtol=2e-2)
    np.testing.assert_allclose(np.asarray(f_e)[ok], np.asarray(f_s)[ok],
                               rtol=2e-2, atol=1e-5)
    assert np.isfinite(np.asarray(f_s)).all()
    assert (np.asarray(pdf_s) >= 0).all()
    # sampled directions are unit
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(wi)[ok], axis=1), 1.0, atol=1e-4)


def test_hair_pdf_integrates_to_one():
    """MC estimate of the sphere integral of the sampling pdf ~ 1."""
    n = 1 << 15
    g = np.random.default_rng(6)
    b = _default_hair_bsdf(n, h=0.2)
    wo = jnp.broadcast_to(
        jnp.asarray([0.3, 0.5, np.sqrt(1 - 0.09 - 0.25)], jnp.float32),
        (n, 3))
    wi = g.normal(size=(n, 3))
    wi /= np.linalg.norm(wi, axis=1, keepdims=True)
    _, pdf = hair.eval_cos_pdf(jnp.asarray(wi, jnp.float32), wo, b)
    est = float(np.mean(np.asarray(pdf))) * 4.0 * np.pi
    assert abs(est - 1.0) < 0.1, f"pdf integral {est}"


def test_hair_energy_conservation():
    """White furnace-ish: integral of f*cos over sphere <= ~1 per channel."""
    n = 1 << 15
    g = np.random.default_rng(7)
    b = _default_hair_bsdf(n, h=0.1)
    wo = jnp.broadcast_to(jnp.asarray([0.1, 0.6, np.sqrt(1 - 0.01 - 0.36)],
                                      jnp.float32), (n, 3))
    wi = g.normal(size=(n, 3))
    wi /= np.linalg.norm(wi, axis=1, keepdims=True)
    f_cos, _ = hair.eval_cos_pdf(jnp.asarray(wi, jnp.float32), wo, b)
    integral = np.asarray(f_cos).mean(axis=0) * 4.0 * np.pi
    assert (integral <= 1.05).all(), f"energy {integral}"


def test_hair_scene_renders(tmp_path):
    from pbrlab_tpu.render.integrator import render
    from pbrlab_tpu.scene.demo import build_demo_scene
    from pbrlab_tpu.scene.scene import scene_to_device

    scene_np, _ = build_demo_scene(subdiv=1, with_hair=True,
                                   with_monkey=False, with_lucy=False,
                                   lambert_only=True)
    sd = scene_to_device(scene_np)
    img = np.asarray(render(sd, 24, 24, 2, max_steps=8))
    assert np.isfinite(img).all()
    assert img.max() > 0


def test_cyhair_roundtrip(tmp_path):
    """Write a tiny CyHair binary and load it back."""
    import struct

    from pbrlab_tpu.io.cyhair import load_cyhair

    path = tmp_path / "t.hair"
    num_strands, pts = 2, 8
    header = b"HAIR" + struct.pack("<IIIIff", num_strands, pts,
                                   0x1 | 0x2 | 0x4, 0, 0.01, 1.0)
    header += struct.pack("<fff", 0.5, 0.5, 0.5)
    header += b"\0" * (128 - len(header))
    segments = struct.pack("<HH", 3, 3)  # 4 points each
    g = np.random.default_rng(0)
    points = g.random((pts, 3)).astype(np.float32)
    thick = np.full((pts,), 0.02, np.float32)
    with open(path, "wb") as f:
        f.write(header)
        f.write(segments)
        f.write(points.tobytes())
        f.write(thick.tobytes())
    verts, thicks = load_cyhair(str(path))
    assert len(verts) == 2
    np.testing.assert_allclose(verts[0], points[:4])
    np.testing.assert_allclose(thicks[1], thick[4:])
