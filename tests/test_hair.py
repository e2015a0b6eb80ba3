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


def _write_colored_cyhair(path, rgb0=(0.9, 0.1, 0.1), rgb1=(0.1, 0.2, 0.9)):
    """Tiny 2-strand CyHair binary WITH a per-point color block."""
    import struct

    num_strands, pts = 2, 8
    header = b"HAIR" + struct.pack("<IIIIff", num_strands, pts,
                                   0x1 | 0x2 | 0x4 | 0x10, 0, 0.01, 1.0)
    header += struct.pack("<fff", 0.5, 0.5, 0.5)
    header += b"\0" * (128 - len(header))
    g = np.random.default_rng(3)
    base = np.asarray([[0.3, 1.2, 0.0], [-0.3, 1.2, 0.0]], np.float32)
    points = np.concatenate([
        base[s] + np.linspace(0, 1, 4)[:, None]
        * np.asarray([0.05, -0.6, 0.02]) + g.normal(0, 0.01, (4, 3))
        for s in range(2)]).astype(np.float32)
    thick = np.full((pts,), 0.05, np.float32)
    colors = np.concatenate([
        np.broadcast_to(np.asarray(rgb0, np.float32), (4, 3)),
        np.broadcast_to(np.asarray(rgb1, np.float32), (4, 3))])
    with open(path, "wb") as f:
        f.write(header)
        f.write(struct.pack("<HH", 3, 3))
        f.write(points.tobytes())
        f.write(thick.tobytes())
        f.write(colors.astype(np.float32).tobytes())


def test_cyhair_strand_colors_consumed(tmp_path):
    """Per-strand CyHair colors override the hair base color (VERDICT r4
    Missing #5): a colored .hair renders differently from the identical
    geometry without its color block, and color-free scenes don't carry
    the override table at all."""
    from pbrlab_tpu.geometry.mesh import CubicBezierCurveMesh
    from pbrlab_tpu.io.cyhair import load_cyhair_as_bezier
    from pbrlab_tpu.render.integrator import render
    from pbrlab_tpu.scene.scene import SceneBuilder, commit, scene_to_device

    path = tmp_path / "colored.hair"
    _write_colored_cyhair(str(path))
    curve = load_cyhair_as_bezier(str(path))
    assert curve.segment_colors is not None
    assert curve.segment_colors.shape == (curve.num_segments, 3)
    np.testing.assert_allclose(curve.segment_colors[0], [0.9, 0.1, 0.1])

    def build(with_colors):
        b = SceneBuilder()
        hid = b.materials.add_hair("hair", hair_coloring=0,
                                   hair_base_color=(0.5, 0.5, 0.5))
        cm = curve if with_colors else CubicBezierCurveMesh(
            curve.vertices_thickness, curve.indices, name=curve.name)
        cm.material_id = hid
        # a floor + light so strands receive NEE light (winding copied
        # from demo.build_demo_scene's ceiling light: normal -y)
        from pbrlab_tpu.scene.demo import quad_mesh

        floor = quad_mesh([-2, 0, -2], [-2, 0, 2], [2, 0, 2], [2, 0, -2],
                          b.materials.add_principled("floor"), name="floor")
        lid = b.add_area_light_param((6.0, 6.0, 6.0))
        lamp = quad_mesh([-1, 2.5, -1], [1, 2.5, -1], [1, 2.5, 1],
                         [-1, 2.5, 1],
                         b.materials.add_principled("lm"), name="lamp")
        b.add_instance([floor])
        b.add_instance([lamp],
                       light_ids=[np.full((2,), lid, np.int32)])
        b.add_instance([], curves=[cm])
        return commit(b.build())

    s_col = build(True)
    s_plain = build(False)
    assert "curve_color" in s_col
    assert "curve_color" not in s_plain
    img_c = np.asarray(render(scene_to_device(s_col), 32, 32, 4,
                              max_steps=6))
    img_p = np.asarray(render(scene_to_device(s_plain), 32, 32, 4,
                              max_steps=6))
    assert np.isfinite(img_c).all() and np.isfinite(img_p).all()
    assert np.abs(img_c - img_p).max() > 1e-4
