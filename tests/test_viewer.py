"""Preview server: HTTP surface + EditQueue semantics (reference GUI,
pc/pbrlab-gui.cc:207-238 + glfw-window.cc:651-980)."""
import json
import urllib.request

import numpy as np

from pbrlab_tpu.app.viewer import PreviewServer
from pbrlab_tpu.render.progressive import ProgressiveRenderer
from pbrlab_tpu.scene.demo import build_demo_scene
from pbrlab_tpu.scene.scene import scene_to_device


def test_preview_server_edit_cycle():
    scene_np, builder = build_demo_scene(subdiv=1)
    r = ProgressiveRenderer(scene_to_device(scene_np), 16, 16,
                            material_names=builder.materials.names,
                            max_steps=4)
    srv = PreviewServer(r, max_pass=4)
    port = srv.start(port=0)
    base = f"http://127.0.0.1:{port}"
    try:
        r.step()
        status = json.loads(urllib.request.urlopen(
            base + "/status", timeout=10).read())
        assert status["pass"] == 1
        mats = json.loads(urllib.request.urlopen(
            base + "/materials", timeout=10).read())
        assert "Monkey" in mats and "base_color" in mats["Monkey"]
        png = urllib.request.urlopen(base + "/image.png", timeout=10).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"

        req = urllib.request.Request(
            base + "/edit",
            data=json.dumps({"material": "Monkey", "param": "roughness",
                             "value": 0.77}).encode(), method="POST")
        urllib.request.urlopen(req, timeout=10).read()
        r.step()  # edit applied between passes; resets accumulation
        assert r.num_passes == 1
        got = float(np.asarray(r.scene["materials"]["roughness"])[
            builder.materials.names.index("Monkey")])
        assert abs(got - 0.77) < 1e-6

        urllib.request.urlopen(urllib.request.Request(
            base + "/rerender", method="POST"), timeout=10).read()
        assert r.num_passes == 0
    finally:
        srv.stop()
