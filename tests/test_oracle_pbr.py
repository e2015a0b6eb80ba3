"""End-to-end statistical validation of the Principled (GGX) and
random-walk-SSS paths against the independent numpy oracle
(BASELINE configs 2-3; VERDICT round-1 Missing #2)."""
import numpy as np
import pytest

from pbrlab_tpu.render.integrator import render
from pbrlab_tpu.scene.demo import build_demo_scene
from pbrlab_tpu.scene.scene import scene_to_device

from oracle_pbr import render_oracle_pbr

W = H = 24
SPP = 96


@pytest.fixture(scope="module")
def ggx_scene():
    """Diffuse walls + glossy monkey (specular 1, roughness .01), no SSS."""
    scene_np, _ = build_demo_scene(subdiv=1, with_lucy=False)
    return scene_np, scene_to_device(scene_np)


@pytest.fixture(scope="module")
def sss_only_scene():
    """Diffuse walls + SSS lucy (subsurface 1, radius 1/.2/.1)."""
    scene_np, _ = build_demo_scene(subdiv=1, with_monkey=False)
    return scene_np, scene_to_device(scene_np)


@pytest.mark.slow
def test_principled_ggx_matches_oracle(ggx_scene):
    scene_np, scene_dev = ggx_scene
    ours = np.asarray(render(scene_dev, W, H, SPP, max_steps=16))
    ref = render_oracle_pbr(scene_np, W, H, SPP, seed=7, max_bounces=16)
    np.testing.assert_allclose(ours.mean(), ref.mean(), rtol=0.05)
    np.testing.assert_allclose(ours.mean(axis=(0, 1)), ref.mean(axis=(0, 1)),
                               rtol=0.08)
    diff = np.abs(ours - ref).mean()
    assert diff < 0.06 * max(ref.mean(), 1e-3) + 0.04, (
        f"mean abs diff {diff}, ref mean {ref.mean()}")


@pytest.mark.slow
def test_sss_matches_oracle(sss_only_scene):
    scene_np, scene_dev = sss_only_scene
    ours = np.asarray(render(scene_dev, W, H, SPP, max_steps=16, k_volume=4))
    ref = render_oracle_pbr(scene_np, W, H, SPP, seed=11, max_bounces=16)
    np.testing.assert_allclose(ours.mean(), ref.mean(), rtol=0.06)
    np.testing.assert_allclose(ours.mean(axis=(0, 1)), ref.mean(axis=(0, 1)),
                               rtol=0.10)
    diff = np.abs(ours - ref).mean()
    assert diff < 0.08 * max(ref.mean(), 1e-3) + 0.04, (
        f"mean abs diff {diff}, ref mean {ref.mean()}")
