"""Cycles-compatible Principled BSDF, vectorized over wavefront lanes.

Semantics from /root/reference/src/shader/cycles-principled-shader.cc:
ParamToBsdf closure setup (:244-412), luminance-normalized one-sample
closure selection (:63-112), EvalBsdf summing closure values with
selection-weighted pdfs (:114-155), and SampleBsdf closure pick by CDF
(:169-242). The reference's boolean enable_* flags become per-lane masks;
the variant dispatch becomes masked arithmetic. All directions are in the
shading-local frame.

The SSS branch is NOT executed here: `sample` returns a `pick_sss` mask and
the volume coefficients; the wavefront integrator switches those lanes into
volume mode (see pbrlab_tpu.render.integrator).
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import jax.numpy as jnp

from ..core.math import (EPS, INV_PI, fresnel_dielectric_cos, lerp, rgb_to_y,
                         safe_sqrt, saturate, vnormalize)
from ..core.sampling import cosine_sample_hemisphere
from . import ggx


class PrincipledBsdf(NamedTuple):
    """Per-lane closure parameters (CyclesPrincipledBsdf struct, :20-45)."""

    enable_diffuse: jnp.ndarray  # [N] bool
    diffuse_weight: jnp.ndarray  # [N,3]
    enable_subsurface: jnp.ndarray
    subsurface_weight: jnp.ndarray
    subsurface_albedo: jnp.ndarray
    subsurface_radius: jnp.ndarray
    enable_specular: jnp.ndarray
    specular_weight: jnp.ndarray  # [N,3]
    alpha_x: jnp.ndarray
    alpha_y: jnp.ndarray
    ior: jnp.ndarray
    specular_color: jnp.ndarray
    enable_clearcoat: jnp.ndarray
    clearcoat_weight: jnp.ndarray
    clearcoat_alpha: jnp.ndarray
    clearcoat_ior: jnp.ndarray
    clearcoat_color: jnp.ndarray


def diffuse_only_bsdf(weight):
    """A pure-diffuse PrincipledBsdf (used at SSS exit re-shading)."""
    n = weight.shape[0]
    t = jnp.ones((n,), bool)
    f = jnp.zeros((n,), jnp.float32)
    f3 = jnp.zeros((n, 3), jnp.float32)
    return PrincipledBsdf(
        enable_diffuse=t, diffuse_weight=weight,
        enable_subsurface=~t, subsurface_weight=f3, subsurface_albedo=f3,
        subsurface_radius=f3,
        enable_specular=~t, specular_weight=f3, alpha_x=f, alpha_y=f,
        ior=jnp.full((n,), 1.5), specular_color=f3,
        enable_clearcoat=~t, clearcoat_weight=f3, clearcoat_alpha=f,
        clearcoat_ior=jnp.full((n,), 1.5), clearcoat_color=f3)


def param_to_bsdf(mat: Dict[str, jnp.ndarray], base_color, subsurface_color):
    """ParamToBsdf (:244-412). `mat` holds per-lane gathered material columns;
    base_color/subsurface_color are pre-fetched (texture or constant)."""
    from .sss import bssrdf_setup

    subsurface = mat["subsurface"]
    metallic = mat["metallic"]
    specular = mat["specular"]
    specular_tint = mat["specular_tint"]
    roughness = mat["roughness"]
    anisotropic = mat["anisotropic"]
    clearcoat = mat["clearcoat"]
    clearcoat_roughness = mat["clearcoat_roughness"]
    transmission = mat["transmission"]

    cutoff = EPS

    diffuse_w = (1.0 - saturate(metallic)) * (1.0 - saturate(transmission))
    final_transmission = saturate(transmission) * (1.0 - saturate(metallic))
    specular_w = 1.0 - final_transmission

    # diffuse / subsurface (:333-365)
    mixed_ss_base = (subsurface_color * subsurface[..., None]
                     + base_color * (1.0 - subsurface[..., None]))
    mixed_ok = jnp.mean(mixed_ss_base, axis=-1) > cutoff
    pick_diffuse = mixed_ok & (subsurface < cutoff) & (diffuse_w > cutoff)
    pick_sss = mixed_ok & (subsurface > cutoff)

    diffuse_weight = jnp.where(pick_diffuse[..., None],
                               base_color * diffuse_w[..., None], 0.0)

    ss_weight = mixed_ss_base * diffuse_w[..., None]
    ss_radius = mat["subsurface_radius"] * subsurface[..., None]
    w2, albedo2, radius2, add_diffuse = bssrdf_setup(
        ss_weight, mixed_ss_base, ss_radius)
    subsurface_weight = jnp.where(pick_sss[..., None], w2, 0.0)
    subsurface_albedo = jnp.where(pick_sss[..., None], albedo2, 0.0)
    subsurface_radius = jnp.where(pick_sss[..., None], radius2, 0.0)
    add_diffuse = jnp.where(pick_sss[..., None], add_diffuse, 0.0)
    has_add = jnp.sum(jnp.abs(add_diffuse), axis=-1) > 0.0
    enable_diffuse = pick_diffuse | (pick_sss & has_add)
    diffuse_weight = diffuse_weight + add_diffuse

    # specular (:372-394)
    enable_specular = (specular_w > cutoff) & (
        (specular > cutoff) | (metallic > cutoff))
    ior = (2.0 / (1.0 - safe_sqrt(0.08 * specular))) - 1.0
    aspect = safe_sqrt(1.0 - anisotropic * 0.9)
    r2 = roughness * roughness
    alpha_x = r2 / jnp.maximum(aspect, 1e-12)
    alpha_y = r2 * aspect
    y_base = rgb_to_y(base_color)
    rho_tint = jnp.where(y_base[..., None] > 0.0,
                         base_color / jnp.maximum(y_base[..., None], 1e-12),
                         0.0)
    rho_specular = lerp(jnp.ones_like(rho_tint), rho_tint,
                        specular_tint[..., None])
    specular_color = lerp(0.08 * specular[..., None] * rho_specular,
                          base_color, metallic[..., None])
    specular_weight = jnp.where(enable_specular[..., None],
                                jnp.broadcast_to(specular_w[..., None],
                                                 base_color.shape), 0.0)

    # clearcoat (:396-409)
    enable_clearcoat = clearcoat > cutoff
    clearcoat_weight = jnp.where(enable_clearcoat[..., None],
                                 0.25 * clearcoat[..., None]
                                 * jnp.ones_like(base_color), 0.0)
    clearcoat_alpha = clearcoat_roughness * clearcoat_roughness

    return PrincipledBsdf(
        enable_diffuse=enable_diffuse,
        diffuse_weight=diffuse_weight,
        enable_subsurface=pick_sss,
        subsurface_weight=subsurface_weight,
        subsurface_albedo=subsurface_albedo,
        subsurface_radius=subsurface_radius,
        enable_specular=enable_specular,
        specular_weight=specular_weight,
        alpha_x=alpha_x, alpha_y=alpha_y, ior=ior,
        specular_color=specular_color,
        enable_clearcoat=enable_clearcoat,
        clearcoat_weight=clearcoat_weight,
        clearcoat_alpha=clearcoat_alpha,
        clearcoat_ior=jnp.full_like(clearcoat_alpha, 1.5),
        clearcoat_color=jnp.full_like(clearcoat_weight, 0.04))


def _specular_color(omega_in, omega_out, color, ior):
    """Fresnel-blended specular tint (:54-61)."""
    h = vnormalize(omega_in + omega_out)
    f0 = fresnel_dielectric_cos(jnp.ones_like(ior), ior)
    fh = (fresnel_dielectric_cos(jnp.sum(h * omega_out, axis=-1), ior) - f0) \
        / jnp.maximum(1.0 - f0, 1e-12)
    return color * (1.0 - fh[..., None]) + fh[..., None]


def closure_sample_weights(omega_out, bsdf: PrincipledBsdf):
    """FetchClosureSampleWeight (:63-112): luminance-normalized one-sample
    weights. Returns (w_diffuse, w_sss, w_specular, w_clearcoat)."""
    mirror = jnp.stack([-omega_out[..., 0], -omega_out[..., 1],
                        omega_out[..., 2]], axis=-1)
    wd = jnp.where(bsdf.enable_diffuse, rgb_to_y(bsdf.diffuse_weight), 0.0)
    ws = jnp.where(bsdf.enable_subsurface, rgb_to_y(bsdf.subsurface_weight),
                   0.0)
    wsp = jnp.where(
        bsdf.enable_specular,
        rgb_to_y(bsdf.specular_weight * _specular_color(
            mirror, omega_out, bsdf.specular_color, bsdf.ior)), 0.0)
    wcc = jnp.where(
        bsdf.enable_clearcoat,
        rgb_to_y(bsdf.clearcoat_weight * _specular_color(
            mirror, omega_out, bsdf.clearcoat_color, bsdf.clearcoat_ior)),
        0.0)
    total = wd + ws + wsp + wcc
    inv = jnp.where(total > 0.0, 1.0 / jnp.where(total > 0.0, total, 1.0), 0.0)
    return wd * inv, ws * inv, wsp * inv, wcc * inv


def eval_bsdf(omega_in, omega_out, bsdf: PrincipledBsdf):
    """EvalBsdf (:114-155): sum closure f, selection-weighted pdf sum."""
    wd, _ws, wsp, wcc = closure_sample_weights(omega_out, bsdf)
    f = jnp.zeros_like(bsdf.diffuse_weight)
    pdf = jnp.zeros_like(wd)

    # diffuse: f = 1/pi, pdf = cos/pi (closure/lambert.h:11-20)
    lam_pdf = omega_in[..., 2] * INV_PI
    f = f + jnp.where(bsdf.enable_diffuse[..., None],
                      bsdf.diffuse_weight * INV_PI, 0.0)
    pdf = pdf + jnp.where(bsdf.enable_diffuse, wd * lam_pdf, 0.0)

    sf, sp = ggx.eval_pdf(omega_in, omega_out, bsdf.alpha_x, bsdf.alpha_y, 2)
    spec_col = _specular_color(omega_in, omega_out, bsdf.specular_color,
                               bsdf.ior)
    f = f + jnp.where(bsdf.enable_specular[..., None],
                      bsdf.specular_weight * spec_col * sf[..., None], 0.0)
    pdf = pdf + jnp.where(bsdf.enable_specular, wsp * sp, 0.0)

    cf, cp = ggx.eval_pdf(omega_in, omega_out, bsdf.clearcoat_alpha,
                          bsdf.clearcoat_alpha, 1)
    cc_col = _specular_color(omega_in, omega_out, bsdf.clearcoat_color,
                             bsdf.clearcoat_ior)
    f = f + jnp.where(bsdf.enable_clearcoat[..., None],
                      bsdf.clearcoat_weight * cc_col * cf[..., None], 0.0)
    pdf = pdf + jnp.where(bsdf.enable_clearcoat, wcc * cp, 0.0)
    return f, pdf


def sample_surface(omega_out, bsdf: PrincipledBsdf, u_select, u1, u2):
    """SampleBsdf surface branches (:176-242): pick closure by the sample-
    weight CDF and sample a direction; SSS lanes are only flagged.

    Returns (omega_in, f, pdf, pick_sss).
    """
    wd, ws, wsp, _wcc = closure_sample_weights(omega_out, bsdf)
    c_d = wd
    c_s = wd + ws
    c_sp = wd + ws + wsp
    pick_diffuse = u_select < c_d
    pick_sss = (~pick_diffuse) & (u_select < c_s)
    pick_spec = (~pick_diffuse) & (~pick_sss) & (u_select < c_sp)
    # else clearcoat

    wi_d = cosine_sample_hemisphere(u1, u2)
    wi_s, _, _ = ggx.sample(omega_out, bsdf.alpha_x, bsdf.alpha_y, u1, u2, 2)
    wi_c, _, _ = ggx.sample(omega_out, bsdf.clearcoat_alpha,
                            bsdf.clearcoat_alpha, u1, u2, 1)
    omega_in = jnp.where(pick_diffuse[..., None], wi_d,
                         jnp.where(pick_spec[..., None], wi_s, wi_c))
    f, pdf = eval_bsdf(omega_in, omega_out, bsdf)
    return omega_in, f, pdf, pick_sss
