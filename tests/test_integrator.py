"""Wavefront integrator validation against the independent numpy oracle and
basic physical invariants."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pbrlab_tpu.render.integrator import render, render_sample
from pbrlab_tpu.scene.demo import build_demo_scene
from pbrlab_tpu.scene.scene import scene_to_device

from oracle import render_oracle

W = H = 24
SPP = 96


@pytest.fixture(scope="module")
def small_scene():
    scene_np, _ = build_demo_scene(subdiv=1, lambert_only=True)
    return scene_np, scene_to_device(scene_np)


def test_matches_numpy_oracle(small_scene):
    """Same physics, independent implementations: per-pixel agreement at
    moderate spp within Monte-Carlo tolerance (SURVEY.md §4/§7 parity plan)."""
    scene_np, scene_dev = small_scene
    ours = np.asarray(render(scene_dev, W, H, SPP, max_steps=16))
    ref = render_oracle(scene_np, W, H, SPP, seed=42, max_bounces=16)
    # global energy agreement ~1%
    np.testing.assert_allclose(ours.mean(), ref.mean(), rtol=0.04)
    # per-channel means
    np.testing.assert_allclose(ours.mean(axis=(0, 1)), ref.mean(axis=(0, 1)),
                               rtol=0.06)
    # per-pixel: smoothed agreement (MC noise ~ 1/sqrt(spp))
    diff = np.abs(ours - ref).mean()
    assert diff < 0.05 * max(ref.mean(), 1e-3) + 0.03, (
        f"mean abs diff {diff}, ref mean {ref.mean()}")


def test_deterministic_across_runs(small_scene):
    _, scene_dev = small_scene
    a = np.asarray(render_sample(scene_dev, W, H, jnp.uint32(3), seed=1,
                                 max_steps=8))
    b = np.asarray(render_sample(scene_dev, W, H, jnp.uint32(3), seed=1,
                                 max_steps=8))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(render_sample(scene_dev, W, H, jnp.uint32(4), seed=1,
                                 max_steps=8))
    assert not np.array_equal(a, c)


def test_finite_and_nonnegative(small_scene):
    _, scene_dev = small_scene
    img = np.asarray(render(scene_dev, W, H, 4, max_steps=8))
    assert np.isfinite(img).all()
    assert (img >= 0).all()
    assert img.max() > 0  # something is lit


def test_principled_scene_renders(demo_scene):
    img = np.asarray(render(demo_scene, 16, 16, 4, max_steps=12))
    assert np.isfinite(img).all()
    assert (img >= 0).all()
    assert img.max() > 0


def test_material_gradients_exist(small_scene):
    """Radiance must be differentiable w.r.t. material parameters."""
    _, scene_dev = small_scene

    def loss(base_color):
        s = dict(scene_dev)
        m = dict(s["materials"])
        m["base_color"] = base_color
        s["materials"] = m
        img = render_sample(s, 8, 8, jnp.uint32(0), max_steps=6)
        return jnp.sum(img)

    g = jax.grad(loss)(scene_dev["materials"]["base_color"])
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0.0


def test_light_emission_gradient_matches_fd(small_scene):
    """Emission enters linearly -> jax.grad must match finite differences
    almost exactly (BASELINE.md gradient target)."""
    _, scene_dev = small_scene

    def loss(scale):
        s = dict(scene_dev)
        s["face_emission"] = s["face_emission"] * scale
        img = render_sample(s, 8, 8, jnp.uint32(0), max_steps=6)
        return jnp.sum(img)

    g = jax.grad(loss)(jnp.float32(1.0))
    eps = 1e-2
    fd = (loss(jnp.float32(1.0 + eps)) - loss(jnp.float32(1.0 - eps))) / (
        2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-2)


def test_volume_substeps_noop_without_sss(small_scene):
    """k_volume substeps must be bit-exact no-ops when no lane ever enters
    volume mode (lambert-only scene)."""
    _, scene_dev = small_scene
    a = np.asarray(render(scene_dev, 8, 8, 2, max_steps=6))
    b = np.asarray(render(scene_dev, 8, 8, 2, max_steps=6, k_volume=3))
    np.testing.assert_array_equal(a, b)


@pytest.fixture(scope="module")
def sss_scene():
    """Lucy-only SSS scene (subsurface 1.0): long volume walks."""
    scene_np, _ = build_demo_scene(subdiv=1, with_monkey=False)
    return scene_to_device(scene_np)


def test_sss_walk_budget(sss_scene):
    """The shared max_steps budget truncates dense SSS walks (VERDICT
    Missing #4); k_volume substeps must recover the energy: a
    (max_steps=8, k_volume=4) render lands near the long-budget reference
    (max_steps=40) where the plain max_steps=8 render is dimmer."""
    ref = np.asarray(render(sss_scene, 16, 16, 24, max_steps=40)).mean()
    short = np.asarray(render(sss_scene, 16, 16, 24, max_steps=8)).mean()
    fixed = np.asarray(
        render(sss_scene, 16, 16, 24, max_steps=8, k_volume=4)).mean()
    assert abs(fixed - ref) <= abs(short - ref) + 1e-6
    assert abs(fixed - ref) / ref < 0.05, (fixed, ref, short)


def test_compaction_is_bit_identical(small_scene):
    """Lane sorting must not change the image (per-lane RNG invariance)."""
    from pbrlab_tpu.render.integrator import render_lanes
    from pbrlab_tpu.scene.scene import build_fat_tables

    _, scene_dev = small_scene
    scene_fat = build_fat_tables(scene_dev)
    a = np.asarray(render_lanes(scene_fat, W, H, jnp.uint32(0), max_steps=8,
                                sort_every=0))
    b = np.asarray(render_lanes(scene_fat, W, H, jnp.uint32(0), max_steps=8,
                                sort_every=1))
    np.testing.assert_array_equal(a, b)


def test_work_queue_lane_count_invariance(small_scene):
    """The dynamic pixel work queue must produce the same image for any
    lane count: with n_lanes < n_pixels, finished lanes CLAIM later
    pixels (cumsum-rank fetch-add), and a pixel's spp samples stay
    sequential on one lane, so every pixel accumulates the same sample
    values in the same order regardless of the claim schedule. Bits can
    move ~1 ulp because each n_lanes is a differently-SHAPED program
    that XLA fuses differently (the same caveat as round 3's
    pixels-per-lane K); at a FIXED n_lanes the image is bit-deterministic
    (goldens + sharding tests). The default suite scenes are smaller
    than the default lane count, so this is the only CI coverage of the
    claiming path."""
    from pbrlab_tpu.render.integrator import render_lanes_wavefront
    from pbrlab_tpu.scene.scene import build_fat_tables

    _, scene_dev = small_scene
    scene_fat = build_fat_tables(scene_dev)
    spp = 3
    ref = np.asarray(render_lanes_wavefront(
        scene_fat, W, H, spp, max_steps=8))  # n_lanes = n (no claims)
    for n_lanes in (7, 32, 100):
        got = np.asarray(render_lanes_wavefront(
            scene_fat, W, H, spp, max_steps=8, n_lanes=n_lanes))
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)
        np.testing.assert_allclose(got.mean(), ref.mean(), rtol=1e-6)


def test_auto_k_volume_rule():
    """VERDICT r4 #7: auto k_volume probes truncation — 0 without SSS,
    3 for the demo medium, raised for a much denser medium."""
    import numpy as np

    from pbrlab_tpu.render.integrator import auto_k_volume
    from pbrlab_tpu.scene.demo import build_demo_scene

    lam, _ = build_demo_scene(subdiv=1, lambert_only=True)
    assert auto_k_volume(lam, max_steps=16, probe=32) == 0

    sss, _ = build_demo_scene(subdiv=1, with_monkey=False)
    assert auto_k_volume(sss, max_steps=16, probe=32) == 3

    dense = dict(sss)
    mats = dict(dense["materials"])
    mats["subsurface_radius"] = (np.asarray(mats["subsurface_radius"])
                                 * 0.03).astype(np.float32)
    dense["materials"] = mats
    assert auto_k_volume(dense, max_steps=16, probe=32) > 3
