"""Sampling primitives, vectorized over wavefront lanes.

Reference: /root/reference/src/sampler/sampling-utils.h. Each function takes
uniform draws u* of shape [...] and returns arrays with a trailing xyz axis
where applicable.
"""
from __future__ import annotations

import jax.numpy as jnp

from .math import PI


def cosine_sample_hemisphere(u1, u2):
    """Cosine-weighted hemisphere around +z (sampling-utils.h:10-14)."""
    phi = u1 * (2.0 * PI)
    r = jnp.sqrt(u2)
    z = jnp.sqrt(jnp.maximum(1.0 - u2, 0.0))
    return jnp.stack([jnp.cos(phi) * r, jnp.sin(phi) * r, z], axis=-1)


def uniform_sample_sphere(u1, u2):
    """Uniform sphere, y-up convention as the reference (sampling-utils.h:16-23)."""
    y = 2.0 * u2 - 1.0
    norm = jnp.sqrt(jnp.maximum(0.0, 1.0 - y * y))
    theta = 2.0 * PI * u1
    return jnp.stack([norm * jnp.cos(theta), y, norm * jnp.sin(theta)], axis=-1)


def uniform_sample_sphere_pdf():
    return 1.0 / (4.0 * PI)


def power_heuristic_weight(sampled_pdf, other_pdf):
    """Power heuristic (beta=2) with the reference's exact-tie 0.5 case
    (sampling-utils.h:27-57). Safe for zero pdfs."""
    sampled_pdf = jnp.asarray(sampled_pdf, jnp.float32)
    other_pdf = jnp.asarray(other_pdf, jnp.float32)
    big = jnp.maximum(sampled_pdf, other_pdf)
    big = jnp.where(big > 0.0, big, 1.0)
    r_gt = other_pdf / big
    r_lt = sampled_pdf / big
    mis_gt = 1.0 / (1.0 + r_gt * r_gt)
    mis_lt = 1.0 - 1.0 / (1.0 + r_lt * r_lt)
    return jnp.where(
        sampled_pdf > other_pdf,
        mis_gt,
        jnp.where(sampled_pdf < other_pdf, mis_lt, 0.5),
    )


def triangle_uniform_sample(u1, u2):
    """Uniform barycentric (u, v) via sorted pair (sampling-utils.h:59-66)."""
    big = jnp.maximum(u1, u2)
    small = jnp.minimum(u1, u2)
    return 1.0 - big, big - small


def sample_cdf(cdf, u):
    """Vectorized lower_bound over a normalized inclusive CDF [K].

    Returns per-lane index of the first entry with cdf[i] >= u, matching
    std::lower_bound in the reference light sampler (light-manager.h:93-96).
    `cdf` is shared across lanes; `u` has lane shape [...].
    """
    # searchsorted(side='left') == lower_bound.
    idx = jnp.searchsorted(cdf, u, side="left")
    return jnp.minimum(idx, cdf.shape[0] - 1)
