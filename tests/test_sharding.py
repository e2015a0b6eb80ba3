"""Multi-device sharding: sharded render must be bit-identical to single
device (the per-lane counter-seeded RNG guarantees layout independence),
and the sharded training step must produce finite psum-reduced gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pbrlab_tpu.parallel.sharding import (make_mesh, render_sharded,
                                          train_step_builder)
from pbrlab_tpu.render.integrator import render

W = H = 16


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_matches_single_device(lambert_scene):
    mesh = make_mesh(8)
    a = np.asarray(render(lambert_scene, W, H, 2, max_steps=6))
    b = np.asarray(render_sharded(lambert_scene, W, H, 2, mesh, max_steps=6))
    np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_train_step_runs_and_reduces(lambert_scene):
    mesh = make_mesh(8)
    target = jnp.zeros((H, W, 3), jnp.float32)
    step = train_step_builder(W, H, 1, mesh, max_steps=4)
    loss, new_scene = step(lambert_scene, target)
    assert np.isfinite(float(loss))
    # parameters actually moved
    moved = np.abs(np.asarray(new_scene["materials"]["base_color"])
                   - np.asarray(lambert_scene["materials"]["base_color"]))
    assert moved.sum() > 0


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out.shape == (64, 64, 3)
    assert bool(jnp.isfinite(out).all())


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_graft_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_matches_single_device_sss_k_volume(demo_scene):
    """VERDICT r4 #6b: the SSS walk budget (k_volume) threads through the
    sharded path, and the sharded render of an SSS scene is bit-identical
    to single-chip AT THE SAME k_volume."""
    mesh = make_mesh(8)
    a = np.asarray(render(demo_scene, W, H, 2, max_steps=4, k_volume=3))
    b = np.asarray(render_sharded(demo_scene, W, H, 2, mesh, max_steps=4,
                                  k_volume=3))
    np.testing.assert_array_equal(a, b)
