"""Random-walk subsurface scattering support math, vectorized over lanes.

Semantics from /root/reference/src/shader/random-walk-sss.h (Cycles lineage):
Burley "Approximate Reflectance Profiles" radius fitting (eq. 5/6) with the
compatible-MFP scale, the tiny-radius -> diffuse fallback of BssrdfSetup, and
the Chiang/Kutz/Burley SIGGRAPH 2016 albedo inversion + channel-MIS distance
sampling. The walk itself is executed by the wavefront integrator as a
"volume mode" (one step per wavefront iteration); this module provides the
per-step math.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.math import PI, safe_divide_spectrum, sqr

BSSRDF_MIN_RADIUS = 1e-8


def burley_fitting5(a):
    """Eq. 5 diffuse surface transmission (random-walk-sss.h:40-43)."""
    return 1.85 - a + 7.0 * jnp.abs((a - 0.8) ** 3)


def burley_compatible_mfp(r):
    return 0.25 * (1.0 / PI) * r


def bssrdf_setup(weight, albedo, radius):
    """BssrdfSetup with burey_radius/scale_mfp/use_eq5 all true, as called by
    the principled shader (cycles-principled-shader.cc:352-363).

    Per-channel: radius < 1e-8 turns that channel into diffuse. Returns
    (weight, albedo, radius_out, diffuse_weight).
    """
    tiny = radius < BSSRDF_MIN_RADIUS
    diffuse_weight = jnp.where(tiny, weight, 0.0)
    weight = jnp.where(tiny, 0.0, weight)
    radius = jnp.where(tiny, 0.0, radius)

    l = burley_compatible_mfp(radius)
    s = burley_fitting5(albedo)
    radius_out = l / jnp.maximum(s, 1e-12)
    radius_out = jnp.where(tiny, 0.0, radius_out)
    return weight, albedo, radius_out, diffuse_weight


def scattering_coefficients(weight, albedo, radius):
    """Albedo inversion (random-walk-sss.h:111-136) -> sigma_t, sigma_s,
    initial walk throughput = weight / albedo."""
    a = albedo
    alpha = 1.0 - jnp.exp(a * (-5.09406 + a * (2.61188 - a * 4.31805)))
    s = 1.9 - a + 3.5 * sqr(a - 0.8)
    sigma_t = 1.0 / jnp.maximum(radius * s, 1e-16)
    sigma_s = sigma_t * alpha
    throughput = safe_divide_spectrum(weight, albedo)
    return sigma_t, sigma_s, throughput


def sample_channel_pdf(albedo, throughput):
    """Channel selection pdf proportional to |throughput * albedo|
    (random-walk-sss.h:141-172). Returns pdf [..., 3]."""
    w = jnp.abs(throughput * albedo)
    total = jnp.sum(w, axis=-1, keepdims=True)
    return jnp.where(total > 0.0, w / jnp.where(total > 0.0, total, 1.0),
                     1.0 / 3.0)


def sample_scatter_distance(throughput, sigma_s, sigma_t, u0, u1):
    """Distance sampling with channel MIS (random-walk-sss.h:174-187).

    Returns (distance, channel_pdf[..., 3]).
    """
    albedo = safe_divide_spectrum(sigma_s, sigma_t)
    pdf = sample_channel_pdf(albedo, throughput)
    cdf0 = pdf[..., 0]
    cdf1 = pdf[..., 0] + pdf[..., 1]
    channel = jnp.where(u0 < cdf0, 0, jnp.where(u0 < cdf1, 1, 2))
    sig = jnp.take_along_axis(sigma_t, channel[..., None], axis=-1)[..., 0]
    distance = -jnp.log(jnp.maximum(1.0 - u1, 1e-12)) / jnp.maximum(sig, 1e-12)
    return distance, pdf


def transmittance(sigma_t, distance):
    return jnp.exp(-sigma_t * distance[..., None])
