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
# persistent executable cache: the suite's wall time is dominated by
# XLA:CPU compiles of the big wavefront programs; workers and reruns
# share compiled artifacts
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("PBRLAB_JAX_CACHE", "/tmp/pbrlab_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

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
