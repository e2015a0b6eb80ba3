"""Bilinear texture fetch from the padded atlas stack.

Reference: /root/reference/src/texture.{h,cc} FetchFloatN with clamp
addressing and the bilinear filter in image-utils.cc:99-167. Textures are
stacked into one [T, Hmax, Wmax, 3] atlas (scene.build) so a per-lane fetch
is a single 4-point gather regardless of which texture each lane addresses.
"""
from __future__ import annotations

import jax.numpy as jnp


def fetch_float3(atlas, sizes, tex_id, u, v):
    """Per-lane bilinear RGB fetch.

    atlas [T, H, W, 3], sizes [T, 2] (h, w), tex_id [N] (>=0), u/v [N].
    Clamp addressing; pixel centers at integer+0.5 like stb/reference.
    """
    tid = jnp.maximum(tex_id, 0)
    h = sizes[tid, 0].astype(jnp.float32)
    w = sizes[tid, 1].astype(jnp.float32)
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def at(xi, yi):
        xi = jnp.clip(xi, 0, (w - 1).astype(jnp.int32))
        yi = jnp.clip(yi, 0, (h - 1).astype(jnp.int32))
        return atlas[tid, yi, xi]

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    c00 = at(x0i, y0i)
    c10 = at(x0i + 1, y0i)
    c01 = at(x0i, y0i + 1)
    c11 = at(x0i + 1, y0i + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    return (c00 * (1 - fx) * (1 - fy) + c10 * fx * (1 - fy)
            + c01 * (1 - fx) * fy + c11 * fx * fy)
