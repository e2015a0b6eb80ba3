"""Test harness: run on a virtual 8-device CPU mesh so sharding tests work
anywhere (the driver validates real-TPU behavior separately)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


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
