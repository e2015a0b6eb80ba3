"""Gradient breadth: finite-difference validation for NONLINEAR parameters
(roughness, specular, subsurface_radius) and a texture texel, plus
texel-target optimization through the sharded train step.

The linear emission-scale FD check lives in test_integrator.py. These
paths cross discrete closure picks (cycles-principled-shader.cc:176-241):
the picks consume raw RNG draws and are detached, so at a FIXED seed the
estimator is piecewise-smooth in the parameter and jax.grad matches
central differences wherever no pick flips inside the eps window
(SURVEY.md §7 step 9 / BASELINE.json gradients target).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pbrlab_tpu.render.integrator import render_sample
from pbrlab_tpu.scene.demo import build_demo_scene
from pbrlab_tpu.scene.scene import SceneBuilder, commit, scene_to_device


def _fd_check(loss, x0=1.0, eps=2e-2, rtol=5e-2):
    g = float(jax.grad(loss)(jnp.float32(x0)))
    fd = (float(loss(jnp.float32(x0 + eps)))
          - float(loss(jnp.float32(x0 - eps)))) / (2 * eps)
    assert np.isfinite(g) and np.isfinite(fd)
    assert abs(fd) > 1e-7, f"degenerate FD check: fd={fd}"
    np.testing.assert_allclose(g, fd, rtol=rtol, atol=1e-5)


@pytest.fixture(scope="module")
def glossy_scene():
    """Glossy floor under an area light: every camera path shades a
    surface whose radiance depends smoothly on roughness/specular (the
    demo walls have specular=0, which made these probes degenerate)."""
    from pbrlab_tpu.geometry.mesh import TriangleMesh

    b = SceneBuilder()
    mat = b.materials.add_principled("floor", base_color=(0.8, 0.6, 0.4),
                                     specular=0.8, roughness=0.4)
    lmat = b.materials.add_principled("light", base_color=(0.0, 0.0, 0.0))

    def quad(y, s, m):
        verts = np.asarray([[-s, y, -s], [s, y, -s], [s, y, s], [-s, y, s]],
                           np.float32)
        faces = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
        return TriangleMesh(verts, faces,
                            material_ids=np.full((2,), m, np.int32))

    lid = b.add_area_light_param((6.0, 6.0, 6.0))
    b.add_instance([quad(0.0, 1.0, mat), quad(1.5, 0.5, lmat)],
                   light_ids=[None, np.full((2,), lid, np.int32)])
    return scene_to_device(commit(b.build()))


def _mat_scale_loss(scene_dev, key, spp=2, max_steps=4):
    def loss(scale):
        s = dict(scene_dev)
        m = dict(s["materials"])
        m[key] = m[key] * scale
        s["materials"] = m
        acc = 0.0
        for sid in range(spp):
            acc = acc + jnp.sum(render_sample(s, 8, 8, jnp.uint32(sid),
                                              max_steps=max_steps))
        return acc / spp

    return loss


def test_roughness_gradient_matches_fd(glossy_scene):
    """Roughness -> GGX alpha (cycles-principled-shader.cc:382-386) is a
    smooth nonlinear path through D/G and the selection weights."""
    _fd_check(_mat_scale_loss(glossy_scene, "roughness"))


def test_specular_gradient_matches_fd(glossy_scene):
    """Specular -> ior + specular_color (cycles-principled-shader.cc:380,
    388-393) feeds Fresnel-weighted closure selection."""
    _fd_check(_mat_scale_loss(glossy_scene, "specular"))


def test_subsurface_radius_gradient_sign():
    """subsurface_radius -> Burley fit + Chiang inversion
    (random-walk-sss.h:35-136) through the volume-mode walk.

    A central-difference check is hopeless here: perturbing the radius
    reshapes the walk's channel/distance draws, so at small spp the FD is
    dominated by discrete path flips. The integrator uses the detached-
    sample / detached-denominator surrogate (g / stop_grad(p), see
    wavefront_step) whose expectation is the true transport derivative —
    a LIVE pdf denominator provably flips the sign (measured before the
    fix: grad -5e-6 while the loss landscape rises at +4e-4/unit). The
    affordable statistical check: the seed-averaged gradient of an MSE
    loss against a smaller-radius target must point DOWNHILL (positive at
    scale 1.0 > target 0.5), which the pre-fix estimator fails."""
    scene_np, _ = build_demo_scene(subdiv=1, with_monkey=False)
    scene_dev = scene_to_device(scene_np)

    def render_at(scale, seed):
        s = dict(scene_dev)
        m = dict(s["materials"])
        m["subsurface_radius"] = m["subsurface_radius"] * scale
        s["materials"] = m
        return render_sample(s, 12, 12, jnp.uint32(0), seed=seed,
                             max_steps=8, k_volume=2)

    target = jnp.asarray(sum(
        np.asarray(render_at(jnp.float32(0.5), sd)) for sd in range(8)) / 8)

    @jax.jit
    def g_at(scale, seed):
        return jax.grad(
            lambda sc: jnp.mean((render_at(sc, seed) - target) ** 2))(scale)

    gs = [float(g_at(jnp.float32(1.0), sd)) for sd in range(8)]
    assert np.isfinite(gs).all()
    assert np.mean(gs) > 0.0, gs


@pytest.fixture(scope="module")
def textured_scene():
    """Emissive quad over a textured floor quad."""
    from pbrlab_tpu.geometry.mesh import TriangleMesh

    b = SceneBuilder()
    tex = np.zeros((4, 4, 3), np.float32)
    tex[:, :, 0] = np.linspace(0.2, 0.9, 4)[None, :]
    tex[:, :, 1] = 0.5
    tex[:, :, 2] = np.linspace(0.9, 0.2, 4)[:, None]
    tid = b.add_texture(tex, "checker")
    mat = b.materials.add_principled("floor", base_color_tex_id=tid,
                                     roughness=0.8)
    lmat = b.materials.add_principled("light", base_color=(0.0, 0.0, 0.0))

    def quad(y, s, m):
        verts = np.asarray([[-s, y, -s], [s, y, -s], [s, y, s], [-s, y, s]],
                           np.float32)
        faces = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
        uv = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        return TriangleMesh(verts, faces,
                            material_ids=np.full((2,), m, np.int32),
                            texcoords=uv, texcoord_idx=faces)

    floor = quad(0.0, 1.0, mat)
    lamp = quad(1.5, 0.5, lmat)
    lid = b.add_area_light_param((6.0, 6.0, 6.0))
    b.add_instance([floor, lamp],
                   light_ids=[None, np.full((2,), lid, np.int32)])
    return scene_to_device(commit(b.build()))


def test_texture_texel_gradient_matches_fd(textured_scene):
    """One texel of the atlas, central differences vs jax.grad through the
    bilinear fetch (image-utils.cc:99-167 semantics)."""
    atlas0 = textured_scene["texture_atlas"]

    def loss_at(atlas):
        s = dict(textured_scene)
        s["texture_atlas"] = atlas
        acc = 0.0
        for sid in range(2):
            acc = acc + jnp.sum(render_sample(s, 8, 8, jnp.uint32(sid),
                                              max_steps=4))
        return acc / 2

    g = np.asarray(jax.grad(loss_at)(atlas0))
    assert np.isfinite(g).all()
    # pick the largest-gradient texel for a well-conditioned FD probe
    idx = np.unravel_index(np.argmax(np.abs(g)), g.shape)
    eps = 5e-3
    ap = np.asarray(atlas0).copy()
    ap[idx] += eps
    am = np.asarray(atlas0).copy()
    am[idx] -= eps
    fd = (float(loss_at(jnp.asarray(ap)))
          - float(loss_at(jnp.asarray(am)))) / (2 * eps)
    assert abs(fd) > 1e-7
    np.testing.assert_allclose(g[idx], fd, rtol=5e-2, atol=1e-5)


def test_train_step_texel_target_converges(textured_scene):
    """Optimizing toward a DIMMED render must decrease loss and move the
    atlas — the texture/emission leaves are live in the sharded train step
    (VERDICT Missing #5)."""
    from pbrlab_tpu.parallel.sharding import make_mesh, train_step_builder

    mesh = make_mesh(2)
    w = h = 8
    # target: the same scene with every texel halved
    dim = dict(textured_scene)
    dim["texture_atlas"] = dim["texture_atlas"] * 0.5
    from pbrlab_tpu.parallel.sharding import render_sharded

    target = render_sharded(dim, w, h, 1, mesh, max_steps=4)
    step = train_step_builder(w, h, 1, mesh, max_steps=4, lr=0.2)
    scene = textured_scene
    losses = []
    for _ in range(4):
        loss, scene = step(scene, target)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses
    moved = np.abs(np.asarray(scene["texture_atlas"])
                   - np.asarray(textured_scene["texture_atlas"])).max()
    assert moved > 1e-4
