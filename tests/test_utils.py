"""Profiling / logging utilities (SURVEY.md §5 aux subsystems)."""
import json
import logging

import numpy as np


def test_step_occupancy_monotone(lambert_scene):
    """Occupancy starts at 1 and never exceeds 1; decays as paths die."""
    from pbrlab_tpu.utils.profiling import step_occupancy

    fracs = np.asarray(step_occupancy(lambert_scene, 16, 16, max_steps=6))
    assert fracs.shape == (6,)
    assert fracs[0] == 1.0
    assert (fracs <= 1.0).all() and (fracs >= 0.0).all()
    # russian roulette + misses must kill some lanes within a few bounces
    assert fracs[-1] < 1.0


def test_measure_occupancy_positive():
    from pbrlab_tpu.scene.demo import build_demo_scene
    from pbrlab_tpu.utils.profiling import measure_occupancy

    scene_np, _ = build_demo_scene(subdiv=1)
    s = measure_occupancy(scene_np, max_steps=4, probe=16)
    assert 1.0 <= s <= 4.0  # step 0 is fully alive; <= max_steps total


def test_rays_meter():
    from pbrlab_tpu.utils.profiling import RaysMeter

    m = RaysMeter(n_pixels=100, occupancy_steps=3.0)
    with m.lap(spp=2):
        pass
    assert m.rays == 100 * 2 * 3.0 * 2.0
    assert m.seconds > 0
    rep = m.report()
    assert rep["laps"] == 1 and rep["mrays_per_s"] > 0


def test_logger_json_fields(capsys):
    from pbrlab_tpu.utils import log as plog

    logger = plog.get_logger("test")
    logger.setLevel(logging.INFO)
    # swap in a JSON formatter on a capture handler
    import io

    buf = io.StringIO()
    h = logging.StreamHandler(buf)
    h.setFormatter(plog._JsonFormatter())
    root = logging.getLogger("pbrlab_tpu")
    root.addHandler(h)
    try:
        plog.event(logger, "pass done", pass_id=3, mrays=1.5)
    finally:
        root.removeHandler(h)
    rec = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert rec["pass_id"] == 3 and rec["mrays"] == 1.5
    assert rec["level"] == "info"
