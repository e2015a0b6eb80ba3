"""Test harness: force an 8-virtual-device CPU mesh.

jax is pre-imported with the axon TPU backend selected in this image, so
plain env vars are not enough — override via jax.config before any backend
initialization. Sharding tests then run anywhere; the driver validates
real-TPU behavior separately.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))


@pytest.fixture(scope="session")
def demo_scene():
    from pbrlab_tpu.scene.demo import build_demo_scene
    from pbrlab_tpu.scene.scene import scene_to_device

    scene_np, _ = build_demo_scene(subdiv=2)
    return scene_to_device(scene_np)


@pytest.fixture(scope="session")
def lambert_scene():
    from pbrlab_tpu.scene.demo import build_demo_scene
    from pbrlab_tpu.scene.scene import scene_to_device

    scene_np, _ = build_demo_scene(subdiv=2, lambert_only=True)
    return scene_to_device(scene_np)


@pytest.fixture()
def rng_np():
    return np.random.default_rng(12345)
