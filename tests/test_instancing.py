"""Trace-time instancing: shared-BLAS two-level traversal must match the
baked-world-space path (reference instancing raytracer_impl.cc:49-84,
VERDICT round-2 Missing #2) at a fraction of the memory."""
import numpy as np
import pytest

from pbrlab_tpu.scene.demo import icosphere, quad_mesh
from pbrlab_tpu.scene.instanced import build_instanced
from pbrlab_tpu.scene.scene import SceneBuilder, commit, scene_to_device


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float64)


def _transforms(k, spacing=1.2):
    """k transforms on a grid with per-instance rotation + scale."""
    out = []
    side = int(np.ceil(np.sqrt(k)))
    for i in range(k):
        gx, gz = i % side, i // side
        m = np.eye(4)
        m[:3, :3] = _rot_y(0.7 * i) * (0.8 + 0.1 * (i % 3))
        m[:3, 3] = (gx * spacing - side * spacing / 2, 0.55,
                    gz * spacing - side * spacing / 2)
        out.append(m)
    return np.stack(out).astype(np.float32)


def _builders(k):
    """(instanced builder, baked builder) for the same k-sphere scene."""
    def base(b):
        m = b.materials
        white = m.add_principled("floor", base_color=(0.7, 0.7, 0.7),
                                 specular=0.0)
        ball = m.add_principled("ball", base_color=(0.8, 0.4, 0.2),
                                specular=0.0, roughness=0.4)
        side = max(3.0, np.sqrt(k) * 1.2)
        b.add_instance([quad_mesh([-side, 0, -side], [-side, 0, side],
                                  [side, 0, side], [side, 0, -side], white,
                                  "floor")])
        lid = b.add_area_light_param((12.0, 12.0, 12.0))
        lq = quad_mesh([-1, 4.0, -1], [1, 4.0, -1], [1, 4.0, 1],
                       [-1, 4.0, 1], white, "light")
        b.add_instance([lq], light_ids=[np.full((2,), lid, np.int32)])
        return ball

    ts = _transforms(k)
    bi = SceneBuilder()
    ball = base(bi)
    sphere = icosphere(1, 0.45, material_id=ball, name="ball")
    bi.add_shared_instances([sphere], ts)

    bb = SceneBuilder()
    ball_b = base(bb)
    sphere_b = icosphere(1, 0.45, material_id=ball_b, name="ball")
    for m in ts:
        bb.add_instance([sphere_b], transform=m)
    return bi, bb


@pytest.fixture(scope="module")
def scenes9():
    bi, bb = _builders(9)
    return build_instanced(bi), commit(bb.build())


def test_instanced_trace_matches_baked(scenes9):
    """Closest-hit t and any-hit agreement on random rays (kernel in
    interpret mode vs baked brute force)."""
    import jax.numpy as jnp

    from pbrlab_tpu.ops.intersect import intersect_bruteforce
    from pbrlab_tpu.ops.pallas.dense_v5i import dense_trace_v5i

    si, sb = scenes9
    rng = np.random.default_rng(2)
    n = 2048
    lo, hi = si["aabb_min"], si["aabb_max"]
    np.testing.assert_allclose(lo, sb["aabb_min"], atol=1e-4)
    org = (lo + (hi - lo) * rng.random((n, 3))).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    mint = np.zeros(n, np.float32)
    maxt = np.full(n, 1e18, np.float32)

    ri = dense_trace_v5i(si["i5_tris"], si["i5_node_aabb"],
                         si["i5_node_meta"], si["i5_inst_inv"],
                         si["i5_inst_meta"], jnp.asarray(org),
                         jnp.asarray(d), jnp.asarray(mint),
                         jnp.asarray(maxt), interpret=True)
    rb = intersect_bruteforce(
        {k: jnp.asarray(sb[k]) for k in ("tri_v0", "tri_e1", "tri_e2")},
        jnp.asarray(org), jnp.asarray(d), jnp.asarray(mint),
        jnp.asarray(maxt))
    ti = np.asarray(ri["t"])
    tb = np.asarray(rb["t"])
    hit_i = np.asarray(ri["prim"]) >= 0
    hit_b = np.asarray(rb["prim"]) >= 0
    assert hit_b.sum() > n // 4
    assert (hit_i != hit_b).mean() < 2e-3  # instance-boundary float edges
    both = hit_i & hit_b
    np.testing.assert_allclose(ti[both], tb[both], rtol=2e-4, atol=2e-4)


def test_instanced_render_matches_baked(scenes9):
    """End-to-end: tiny render of the instanced scene vs the baked scene
    (rotated-normal shading path vs baked normals)."""
    from pbrlab_tpu.render.integrator import render

    si, sb = scenes9
    a = np.asarray(render(scene_to_device(si), 20, 20, 4, max_steps=5))
    b = np.asarray(render(scene_to_device(sb), 20, 20, 4, max_steps=5))
    assert np.isfinite(a).all()
    assert a.mean() > 1e-3
    # same RNG streams, same sampling decisions except where float edges
    # flip a hit: compare robustly
    close = np.isclose(a, b, rtol=2e-2, atol=2e-2)
    assert close.mean() > 0.97, f"only {close.mean():.3f} pixels match"
    np.testing.assert_allclose(a.mean(), b.mean(), rtol=2e-2)


def test_instanced_memory_is_shared():
    """100 instances must NOT cost 100x the baked per-face memory
    (VERDICT done-bar: matches baked without 100x memory)."""
    bi, bb = _builders(100)
    si = build_instanced(bi)
    sb = commit(bb.build())

    def nbytes(scene):
        return sum(np.asarray(v).nbytes for v in scene.values()
                   if not isinstance(v, dict))

    ni, nb = nbytes(si), nbytes(sb)
    assert ni < nb / 5, f"instanced {ni / 1e6:.1f} MB vs baked {nb / 1e6:.1f} MB"
