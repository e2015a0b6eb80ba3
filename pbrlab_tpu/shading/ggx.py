"""Microfacet GGX closure (VNDF sampling), vectorized over lanes.

Semantics from /root/reference/src/closure/microfacet-ggx.h (OSL/Cycles
lineage): D_GTR1 (clearcoat, distrib=1 with fixed alpha2=0.0625) and D_GTR2,
Smith G1, Heitz-d'Eon stretched-slope visible-normal sampling, reflection
only. All directions are in the shading-local frame (n = +z); inputs/outputs
are arrays [..., 3] / [...].
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.math import PI, grad_safe_sqrt, safe_sqrt, vnormalize

_F32_EPS = 1.1920929e-07


def d_gtr1(h, alpha):
    """GTR1 distribution (microfacet-ggx.h:48-53)."""
    alpha2 = alpha * alpha
    t = 1.0 + (alpha2 - 1.0) * h[..., 2] * h[..., 2]
    val = (alpha2 - 1.0) / (PI * jnp.log(jnp.maximum(alpha2, 1e-12)) * t)
    return jnp.where(alpha >= 1.0, 1.0 / PI, val)


def d_gtr2(h, alpha2):
    c2 = h[..., 2] * h[..., 2]
    c4 = c2 * c2
    tan2 = (1.0 - c2) / jnp.maximum(c2, 1e-12)
    return alpha2 / jnp.maximum(PI * c4 * (alpha2 + tan2) * (alpha2 + tan2),
                                1e-12)


def _sample_slopes(cos_theta_i, sin_theta_i, randu, randv):
    """GGX visible-slope sampling (microfacet-ggx.h:65-118)."""
    # general case
    tan_theta_i = sin_theta_i / jnp.maximum(cos_theta_i, 1e-12)
    g1_inv = 0.5 * (1.0 + safe_sqrt(1.0 + tan_theta_i * tan_theta_i))
    g1i = 1.0 / g1_inv

    a = 2.0 * randu * g1_inv - 1.0
    aa = a * a
    tmp = 1.0 / jnp.where(jnp.abs(aa - 1.0) < 1e-12, 1e-12, aa - 1.0)
    b = tan_theta_i
    bb = b * b
    # grad_safe_sqrt: d can touch 0 at the sampling boundary; a plain
    # safe_sqrt there makes the backward pass inf -> 0*inf NaN under the
    # near-normal jnp.where below (the "where trap", see core.math)
    d = grad_safe_sqrt(bb * (tmp * tmp) - (aa - bb) * tmp, 1e-24)
    slope_x_1 = b * tmp - d
    slope_x_2 = b * tmp + d
    slope_x = jnp.where((a < 0.0) | (slope_x_2 * tan_theta_i > 1.0),
                        slope_x_1, slope_x_2)

    s = jnp.where(randv > 0.5, 1.0, -1.0)
    rv = jnp.where(randv > 0.5, 2.0 * (randv - 0.5), 2.0 * (0.5 - randv))
    z = (rv * (rv * (rv * 0.27385 - 0.73369) + 0.46341)) / (
        rv * (rv * (rv * 0.093073 + 0.309420) - 1.0) + 0.597999)
    slope_y = s * z * safe_sqrt(1.0 + slope_x * slope_x)

    # special case: normal incidence (cos >= 0.99999)
    r = jnp.sqrt(randu / jnp.maximum(1.0 - randu, 1e-12))
    phi = 2.0 * PI * randv
    near_normal = cos_theta_i >= 0.99999
    slope_x = jnp.where(near_normal, r * jnp.cos(phi), slope_x)
    slope_y = jnp.where(near_normal, r * jnp.sin(phi), slope_y)
    g1i = jnp.where(near_normal, 1.0, g1i)
    return slope_x, slope_y, g1i


def sample_stretched(omega_i, alpha_x, alpha_y, randu, randv):
    """Sample the half-vector m (microfacet-ggx.h:121-162)."""
    stretched = jnp.stack(
        [alpha_x * omega_i[..., 0], alpha_y * omega_i[..., 1],
         omega_i[..., 2]], axis=-1)
    wi = vnormalize(stretched)
    costheta = jnp.where(wi[..., 2] < 0.99999, wi[..., 2], 1.0)
    # grad_safe_sqrt: at near-normal incidence 1 - wi_z^2 ~ 0 and the
    # OTHER where-branch is taken; sqrt's inf derivative would turn the
    # masked-out gradient into 0*inf = NaN (see core.math.grad_safe_sqrt)
    sintheta = jnp.where(wi[..., 2] < 0.99999,
                         grad_safe_sqrt(1.0 - wi[..., 2] * wi[..., 2]), 0.0)
    invlen = 1.0 / jnp.maximum(sintheta, 1e-12)
    cosphi = jnp.where(wi[..., 2] < 0.99999, wi[..., 0] * invlen, 1.0)
    sinphi = jnp.where(wi[..., 2] < 0.99999, wi[..., 1] * invlen, 0.0)

    slope_x, slope_y, _g1i = _sample_slopes(costheta, sintheta, randu, randv)

    tmp = cosphi * slope_x - sinphi * slope_y
    slope_y = sinphi * slope_x + cosphi * slope_y
    slope_x = tmp
    slope_x = alpha_x * slope_x
    slope_y = alpha_y * slope_y
    return vnormalize(jnp.stack(
        [-slope_x, -slope_y, jnp.ones_like(slope_x)], axis=-1))


def eval_pdf(omega_in, omega_out, alpha_x, alpha_y, distrib):
    """BSDF value + pdf for reflection (microfacet-ggx.h:164-245).

    distrib: 1 = GTR1 clearcoat (alpha2 fixed to 0.0625 in G, f *= 0.25),
             2 = GTR2. Only the isotropic/anisotropic GGX forms of the
    reference are implemented; returns (f, pdf), both [...].
    """
    cos_no = omega_out[..., 2]
    cos_ni = omega_in[..., 2]
    reflect = (cos_no > 0.0) & (cos_ni > 0.0)

    m = vnormalize(omega_in + omega_out)
    alpha2 = alpha_x * alpha_y
    iso = jnp.abs(alpha_x - alpha_y) < _F32_EPS

    # isotropic branch
    if distrib == 1:
        d_iso = d_gtr1(m, alpha_x)
        alpha2_g = jnp.full_like(alpha2, 0.0625)
    else:
        d_iso = d_gtr2(m, alpha2)
        alpha2_g = alpha2
    cos_no2 = cos_no * cos_no
    cos_ni2 = cos_ni * cos_ni
    g1o_iso = 2.0 / (1.0 + safe_sqrt(
        1.0 + alpha2_g * (1.0 - cos_no2) / jnp.maximum(cos_no2, 1e-12)))
    g1i_iso = 2.0 / (1.0 + safe_sqrt(
        1.0 + alpha2_g * (1.0 - cos_ni2) / jnp.maximum(cos_ni2, 1e-12)))

    # anisotropic branch
    mz = jnp.where(jnp.abs(m[..., 2]) < 1e-12, 1e-12, m[..., 2])
    slope_x = -m[..., 0] / (mz * jnp.maximum(alpha_x, 1e-12))
    slope_y = -m[..., 1] / (mz * jnp.maximum(alpha_y, 1e-12))
    slope_len = 1.0 + slope_x * slope_x + slope_y * slope_y
    cos_m2 = m[..., 2] * m[..., 2]
    cos_m4 = cos_m2 * cos_m2
    d_aniso = 1.0 / jnp.maximum(
        (slope_len * slope_len) * PI * alpha2 * cos_m4, 1e-12)

    def aniso_g1(omega, cos_n):
        tan2 = (1.0 - cos_n * cos_n) / jnp.maximum(cos_n * cos_n, 1e-12)
        cph, sph = omega[..., 0], omega[..., 1]
        denom = jnp.maximum(cph * cph + sph * sph, 1e-12)
        a2 = ((cph * cph) * (alpha_x * alpha_x)
              + (sph * sph) * (alpha_y * alpha_y)) / denom
        return 2.0 / (1.0 + safe_sqrt(1.0 + a2 * tan2))

    g1o_aniso = aniso_g1(omega_out, cos_no)
    g1i_aniso = aniso_g1(omega_in, cos_ni)

    d = jnp.where(iso, d_iso, d_aniso)
    g1o = jnp.where(iso, g1o_iso, g1o_aniso)
    g1i = jnp.where(iso, g1i_iso, g1i_aniso)

    common = d * 0.25 / jnp.maximum(cos_no * cos_ni, 1e-12)
    f = g1o * g1i * common
    if distrib == 1:
        f = 0.25 * f
    pdf = g1o * common
    return jnp.where(reflect, f, 0.0), jnp.where(reflect, pdf, 0.0)


def sample(omega_out, alpha_x, alpha_y, u1, u2, distrib):
    """Importance-sample a reflected direction (microfacet-ggx.h:247-286).

    Returns (omega_in, f, pdf). Invalid samples get f = pdf = 0.
    """
    m = sample_stretched(omega_out, alpha_x, alpha_y, u1, u2)
    cos_mo = jnp.sum(m * omega_out, axis=-1)
    omega_in = 2.0 * cos_mo[..., None] * m - omega_out
    f, pdf = eval_pdf(omega_in, omega_out, alpha_x, alpha_y, distrib)
    ok = (omega_out[..., 2] > 0.0) & (cos_mo > 0.0)
    return omega_in, jnp.where(ok, f, 0.0), jnp.where(ok, pdf, 0.0)
