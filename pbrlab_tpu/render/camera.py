"""Auto-framing pinhole camera, exactly mirroring the reference.

Reference: /root/reference/src/render.cc:132-167 — screen plane sized from
the scene AABB (~30 deg vertical fov), eye at z = bmax.z + 0.5*w*sqrt(3),
jittered subpixel samples, y scanned downward.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..core.math import vnormalize


def camera_setup(aabb_min, aabb_max, width: int, height: int):
    """Returns (ray_org [3], x_corner, y_corner, z_corner, dx, dy)."""
    ext = aabb_max - aabb_min
    wide = ext[0] > ext[1]
    horizontal = jnp.where(wide, ext[0], ext[1] * width / height)
    vertical = jnp.where(wide, ext[0] * height / width, ext[1])
    x_center = (aabb_max[0] + aabb_min[0]) * 0.5
    y_center = (aabb_max[1] + aabb_min[1]) * 0.5
    z_center = aabb_max[2] + horizontal * 0.5 * jnp.sqrt(3.0)
    org = jnp.stack([x_center, y_center, z_center])
    x_corner = x_center - horizontal * 0.5
    y_corner = y_center + vertical * 0.5
    z_corner = aabb_max[2]
    dx = horizontal / width
    dy = vertical / height
    return org, x_corner, y_corner, z_corner, dx, dy


def generate_rays(scene, width: int, height: int, u1, u2, lane=None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Primary rays; u1/u2 are per-lane jitters [N].

    Lane i maps to pixel (y, x) = divmod(i, width) (row-major, matching the
    reference's layer indexing y*width+x). Pass an explicit `lane` array of
    pixel indices to generate a slice of the image (sharded rendering).
    """
    org, x_corner, y_corner, z_corner, dx, dy = camera_setup(
        scene["aabb_min"], scene["aabb_max"], width, height)
    if lane is None:
        lane = jnp.arange(width * height, dtype=jnp.int32)
    n = lane.shape[0]
    px = (lane % width).astype(jnp.float32)
    py = (lane // width).astype(jnp.float32)
    target = jnp.stack(
        [x_corner + dx * (px + u1), y_corner - dy * (py + u2),
         jnp.full((n,), z_corner)], axis=-1)
    ray_org = jnp.broadcast_to(org[None, :], (n, 3))
    ray_dir = vnormalize(target - ray_org)
    return ray_org, ray_dir
