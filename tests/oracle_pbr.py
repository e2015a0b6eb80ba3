"""Independent numpy oracle: Principled BSDF (diffuse + GGX specular) +
random-walk SSS, with area-light NEE + MIS.

A second, non-JAX transcription of the reference semantics used to
statistically validate the wavefront integrator on BASELINE configs 2-3:
/root/reference/src/shader/cycles-principled-shader.cc (ParamToBsdf :244-412,
FetchClosureSampleWeight :63-112, EvalBsdf :114-155, SampleBsdf :169-242),
/root/reference/src/closure/microfacet-ggx.h (:48-286),
/root/reference/src/shader/random-walk-sss.h (:35-136 fitting/inversion,
:227-405 walk). Same physics, independently written numpy code with its own
RNG; brute-force intersection. Vectorized over pixel lanes.
"""
from __future__ import annotations

import numpy as np

from oracle import EPS, INF, _intersect, _occluded, _power_heuristic

_CUTOFF = 1e-3


def _rgb_to_y(c):
    return 0.212671 * c[..., 0] + 0.715160 * c[..., 1] + 0.072169 * c[..., 2]


def _fresnel_dielectric_cos(cos_i, eta):
    eta_eff = np.where(cos_i < 0.0, 1.0 / np.where(eta == 0, 1.0, eta), eta)
    c = np.abs(cos_i)
    g2 = eta_eff * eta_eff - 1.0 + c * c
    g = np.sqrt(np.maximum(g2, 1e-20))
    a = (g - c) / (g + c)
    b = (c * (g + c) - 1.0) / (c * (g - c) + 1.0)
    refl = np.where(g2 > 0.0, 0.5 * a * a * (1.0 + b * b), 1.0)
    return np.where(np.abs(eta) < 1.2e-7, 1.0, refl)


def _onb(ez):
    sign = np.where(ez[:, 2] >= 0, 1.0, -1.0)
    a = -1.0 / (sign + ez[:, 2])
    b = ez[:, 0] * ez[:, 1] * a
    ex = np.stack([1.0 + sign * ez[:, 0] ** 2 * a, sign * b,
                   -sign * ez[:, 0]], axis=-1)
    ey = np.stack([b, sign + ez[:, 1] ** 2 * a, -ez[:, 1]], axis=-1)
    return ex, ey


def _to_local(w, ex, ey, ez):
    return np.stack([np.einsum("nk,nk->n", w, e) for e in (ex, ey, ez)],
                    axis=-1)


def _to_global(w, ex, ey, ez):
    return w[:, 0:1] * ex + w[:, 1:2] * ey + w[:, 2:3] * ez


# ---------------------------------------------------------------- GGX ----
def _ggx_d_gtr2(hz, alpha2):
    c2 = hz * hz
    c4 = np.maximum(c2 * c2, 1e-20)
    tan2 = (1.0 - c2) / np.maximum(c2, 1e-12)
    return alpha2 / np.maximum(np.pi * c4 * (alpha2 + tan2) ** 2, 1e-20)


def _ggx_g1(cos_n, alpha2):
    c2 = np.maximum(cos_n * cos_n, 1e-12)
    return 2.0 / (1.0 + np.sqrt(np.maximum(1.0 + alpha2 * (1.0 - c2) / c2,
                                           0.0)))


def _ggx_eval_pdf(wi, wo, alpha):
    """Isotropic GTR2 reflection f / pdf (microfacet-ggx.h:164-245)."""
    cos_no, cos_ni = wo[:, 2], wi[:, 2]
    reflect = (cos_no > 0) & (cos_ni > 0)
    m = wi + wo
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    alpha2 = alpha * alpha
    d = _ggx_d_gtr2(m[:, 2], alpha2)
    g1o = _ggx_g1(cos_no, alpha2)
    g1i = _ggx_g1(cos_ni, alpha2)
    common = d * 0.25 / np.maximum(cos_no * cos_ni, 1e-12)
    f = g1o * g1i * common
    pdf = g1o * common
    return np.where(reflect, f, 0.0), np.where(reflect, pdf, 0.0)


def _ggx_sample(wo, alpha, u1, u2):
    """Heitz-d'Eon stretched-slope VNDF sample (microfacet-ggx.h:65-162)."""
    st = np.stack([alpha * wo[:, 0], alpha * wo[:, 1], wo[:, 2]], axis=-1)
    st = st / np.maximum(np.linalg.norm(st, axis=1, keepdims=True), 1e-30)
    near = st[:, 2] >= 0.99999
    ct = np.where(near, 1.0, st[:, 2])
    stn = np.where(near, 0.0, np.sqrt(np.maximum(1 - st[:, 2] ** 2, 0)))
    inv = 1.0 / np.maximum(stn, 1e-12)
    cph = np.where(near, 1.0, st[:, 0] * inv)
    sph = np.where(near, 0.0, st[:, 1] * inv)

    tan_i = stn / np.maximum(ct, 1e-12)
    g1_inv = 0.5 * (1.0 + np.sqrt(1.0 + tan_i * tan_i))
    a = 2.0 * u1 * g1_inv - 1.0
    aa = a * a
    tmp = 1.0 / np.where(np.abs(aa - 1.0) < 1e-12, 1e-12, aa - 1.0)
    bb = tan_i * tan_i
    dd = np.sqrt(np.maximum(bb * tmp * tmp - (aa - bb) * tmp, 0.0))
    sx1 = tan_i * tmp - dd
    sx2 = tan_i * tmp + dd
    slope_x = np.where((a < 0) | (sx2 * tan_i > 1.0), sx1, sx2)
    s = np.where(u2 > 0.5, 1.0, -1.0)
    rv = np.where(u2 > 0.5, 2.0 * (u2 - 0.5), 2.0 * (0.5 - u2))
    z = (rv * (rv * (rv * 0.27385 - 0.73369) + 0.46341)) / (
        rv * (rv * (rv * 0.093073 + 0.309420) - 1.0) + 0.597999)
    slope_y = s * z * np.sqrt(1.0 + slope_x * slope_x)
    # normal incidence special case
    r = np.sqrt(u1 / np.maximum(1.0 - u1, 1e-12))
    phi = 2 * np.pi * u2
    slope_x = np.where(near, r * np.cos(phi), slope_x)
    slope_y = np.where(near, r * np.sin(phi), slope_y)

    tmp2 = cph * slope_x - sph * slope_y
    slope_y = sph * slope_x + cph * slope_y
    slope_x = tmp2
    m = np.stack([-alpha * slope_x, -alpha * slope_y, np.ones_like(slope_x)],
                 axis=-1)
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    cos_mo = np.einsum("nk,nk->n", m, wo)
    wi = 2.0 * cos_mo[:, None] * m - wo
    ok = (wo[:, 2] > 0) & (cos_mo > 0)
    return wi, ok


# ------------------------------------------------------------ closures ----
def _setup(mats, mat_id):
    """ParamToBsdf for the demo parameter subset (no metallic/transmission/
    aniso/clearcoat): diffuse + GGX specular + SSS."""
    base = mats["base_color"][mat_id]
    spec = mats["specular"][mat_id]
    spec_tint = mats["specular_tint"][mat_id]
    rough = mats["roughness"][mat_id]
    subsurface = mats["subsurface"][mat_id]
    sub_color = mats["subsurface_color"][mat_id]
    sub_radius = mats["subsurface_radius"][mat_id]

    out = {}
    mixed = sub_color * subsurface[:, None] + base * (1 - subsurface[:, None])
    mixed_ok = mixed.mean(axis=1) > _CUTOFF
    pick_diffuse = mixed_ok & (subsurface < _CUTOFF)
    pick_sss = mixed_ok & (subsurface > _CUTOFF)
    out["diffuse_weight"] = np.where(pick_diffuse[:, None], base, 0.0)

    # BssrdfSetup (random-walk-sss.h:71-104): tiny radius -> diffuse
    ss_weight = mixed.copy()
    ss_radius = sub_radius * subsurface[:, None]
    tiny = ss_radius < 1e-8
    add_diffuse = np.where(tiny, ss_weight, 0.0)
    ss_weight = np.where(tiny, 0.0, ss_weight)
    mfp = 0.25 / np.pi * np.where(tiny, 0.0, ss_radius)
    s_fit = 1.85 - mixed + 7.0 * np.abs((mixed - 0.8) ** 3)
    out["ss_weight"] = np.where(pick_sss[:, None], ss_weight, 0.0)
    out["ss_albedo"] = np.where(pick_sss[:, None], mixed, 0.0)
    out["ss_radius"] = np.where(pick_sss[:, None],
                                mfp / np.maximum(s_fit, 1e-12), 0.0)
    out["diffuse_weight"] = out["diffuse_weight"] + np.where(
        pick_sss[:, None], add_diffuse, 0.0)
    out["enable_diffuse"] = pick_diffuse | (
        pick_sss & (np.abs(add_diffuse).sum(1) > 0))
    out["enable_sss"] = pick_sss

    out["enable_specular"] = spec > _CUTOFF
    out["ior"] = 2.0 / (1.0 - np.sqrt(np.maximum(0.08 * spec, 0.0))) - 1.0
    out["alpha"] = rough * rough
    y = _rgb_to_y(base)
    rho_tint = np.where(y[:, None] > 0, base / np.maximum(y[:, None], 1e-12),
                        0.0)
    rho_spec = 1.0 + (rho_tint - 1.0) * spec_tint[:, None]
    out["specular_color"] = 0.08 * spec[:, None] * rho_spec
    return out


def _spec_tint(wi, wo, color, ior):
    h = wi + wo
    h = h / np.maximum(np.linalg.norm(h, axis=1, keepdims=True), 1e-30)
    f0 = _fresnel_dielectric_cos(np.ones_like(ior), ior)
    fh = (_fresnel_dielectric_cos(np.einsum("nk,nk->n", h, wo), ior) - f0) \
        / np.maximum(1.0 - f0, 1e-12)
    return color * (1.0 - fh[:, None]) + fh[:, None]


def _weights(wo, bs):
    mirror = np.stack([-wo[:, 0], -wo[:, 1], wo[:, 2]], axis=-1)
    wd = np.where(bs["enable_diffuse"], _rgb_to_y(bs["diffuse_weight"]), 0.0)
    ws = np.where(bs["enable_sss"], _rgb_to_y(bs["ss_weight"]), 0.0)
    wsp = np.where(bs["enable_specular"], _rgb_to_y(_spec_tint(
        mirror, wo, bs["specular_color"], bs["ior"])), 0.0)
    tot = wd + ws + wsp
    inv = np.where(tot > 0, 1.0 / np.where(tot > 0, tot, 1), 0.0)
    return wd * inv, ws * inv, wsp * inv


def _eval(wi, wo, bs):
    wd, _ws, wsp = _weights(wo, bs)
    f = np.where(bs["enable_diffuse"][:, None],
                 bs["diffuse_weight"] / np.pi, 0.0)
    pdf = np.where(bs["enable_diffuse"], wd * wi[:, 2] / np.pi, 0.0)
    sf, sp = _ggx_eval_pdf(wi, wo, bs["alpha"])
    tint = _spec_tint(wi, wo, bs["specular_color"], bs["ior"])
    f = f + np.where(bs["enable_specular"][:, None], tint * sf[:, None], 0.0)
    pdf = pdf + np.where(bs["enable_specular"], wsp * sp, 0.0)
    return f, pdf


# ---------------------------------------------------------------- SSS ----
def _sss_walk(s, g, active, pos, ng, ex, ey, ez, instance, bs,
              max_walk=512):
    """Random walk (random-walk-sss.h:227-405) for the `active` lanes.

    Returns (success, exit_pos, exit_ez, exit_wo_local, walk_tp).
    """
    n = len(active)
    # entry: cosine sample INTO the surface, min_t 1e-3
    u1, u2 = g.random(n), g.random(n)
    phi = 2 * np.pi * u1
    r = np.sqrt(u2)
    loc = np.stack([np.cos(phi) * r, np.sin(phi) * r,
                    -np.sqrt(np.maximum(1 - u2, 0))], axis=-1)
    d = _to_global(loc, ex, ey, ez)
    ok = active & (np.einsum("nk,nk->n", -ng, d) > 0)

    # albedo inversion (random-walk-sss.h:111-136)
    a = bs["ss_albedo"]
    alpha = 1.0 - np.exp(a * (-5.09406 + a * (2.61188 - a * 4.31805)))
    s_fit = 1.9 - a + 3.5 * (a - 0.8) ** 2
    sigma_t = 1.0 / np.maximum(bs["ss_radius"] * s_fit, 1e-16)
    sigma_s = sigma_t * alpha
    tp = np.where(np.abs(a) < 1.2e-7, 0.0,
                  bs["ss_weight"] / np.where(np.abs(a) < 1.2e-7, 1.0, a))

    org = pos.copy()
    min_t = np.full(n, 1e-3)
    walking = ok.copy()
    success = np.zeros(n, bool)
    exit_prim = np.zeros(n, np.int64)
    exit_uv = np.zeros((n, 2))
    exit_t = np.zeros(n)
    exit_dir = d.copy()

    for bounce in range(max_walk):
        if not walking.any():
            break
        if bounce > 0:
            u1, u2 = g.random(n), g.random(n)
            z = 1.0 - 2.0 * u1
            rr_ = np.sqrt(np.maximum(1 - z * z, 0))
            ph = 2 * np.pi * u2
            nd = np.stack([rr_ * np.cos(ph), rr_ * np.sin(ph), z], axis=-1)
            d = np.where(walking[:, None], nd, d)
            min_t = np.where(walking, 0.0, min_t)
        # channel-MIS distance sample (random-walk-sss.h:141-187)
        w = np.abs(tp * alpha)
        tot = w.sum(1, keepdims=True)
        cpdf = np.where(tot > 0, w / np.where(tot > 0, tot, 1), 1.0 / 3.0)
        u0, ut = g.random(n), g.random(n)
        ch = np.where(u0 < cpdf[:, 0], 0,
                      np.where(u0 < cpdf[:, 0] + cpdf[:, 1], 1, 2))
        sig = sigma_t[np.arange(n), ch]
        t_sc = -np.log(np.maximum(1.0 - ut, 1e-12)) / np.maximum(sig, 1e-12)

        prim, t, u, v = _intersect(s, org, d,
                                   np.where(walking, min_t, 0.0),
                                   np.where(walking, t_sc, -1.0))
        hit = prim >= 0
        t_eff = np.where(hit, t, t_sc)
        trans = np.exp(-sigma_t * t_eff[:, None])
        pdf_hit = np.einsum("nk,nk->n", cpdf, trans)
        pdf_sc = np.einsum("nk,nk->n", cpdf, sigma_t * trans)
        tp_new = np.where(
            hit[:, None], tp * trans / np.maximum(pdf_hit, 1e-30)[:, None],
            tp * sigma_s * trans / np.maximum(pdf_sc, 1e-30)[:, None])
        tp = np.where(walking[:, None], tp_new, tp)

        done = walking & hit
        success |= done
        exit_prim = np.where(done, np.maximum(prim, 0), exit_prim)
        exit_uv = np.where(done[:, None], np.stack([u, v], -1), exit_uv)
        exit_t = np.where(done, t, exit_t)
        exit_dir = np.where(done[:, None], d, exit_dir)

        # RR on scatter lanes
        p = np.clip(tp.max(1), 0.0, 1.0)
        q = g.random(n)
        die = walking & ~hit & (q >= p)
        tp = np.where((walking & ~hit)[:, None],
                      tp / np.maximum(p, 1e-30)[:, None], tp)
        org = np.where((walking & ~hit)[:, None], org + t_eff[:, None] * d,
                       org)
        walking = walking & ~hit & ~die

    # exit validity: same instance + back face (random-walk-sss.h:371-384)
    p = exit_prim
    e_pos = org + exit_t[:, None] * exit_dir
    e_ng = s["face_ng"][p]
    corner = s["face_ns"][p]
    uu, vv = exit_uv[:, 0], exit_uv[:, 1]
    e_ns = np.where(s["face_has_ns"][p][:, None],
                    corner[:, 0] * (1 - uu - vv)[:, None]
                    + corner[:, 1] * uu[:, None] + corner[:, 2] * vv[:, None],
                    e_ng)
    e_ns /= np.maximum(np.linalg.norm(e_ns, axis=1, keepdims=True), 1e-30)
    dg = np.einsum("nk,nk->n", exit_dir, e_ng)
    ds = np.einsum("nk,nk->n", exit_dir, e_ns)
    back = (dg > 0) & (ds > 0)
    success = success & back & (s["face_instance"][p] == instance)
    e_ex, e_ey = _onb(e_ns)
    wo_local = _to_local(exit_dir, e_ex, e_ey, e_ns)
    return success, e_pos, e_ns, e_ex, e_ey, wo_local, tp


# ------------------------------------------------------------- oracle ----
def render_oracle_pbr(scene_np, width, height, spp, seed=0, max_bounces=16):
    """Principled (diffuse+GGX+SSS) oracle render -> [H, W, 3]."""
    s = {k: np.asarray(v) for k, v in scene_np.items()
         if not isinstance(v, dict)}
    mats = {k: np.asarray(v) for k, v in scene_np["materials"].items()}
    g = np.random.default_rng(seed)
    n = width * height
    bmin, bmax = s["aabb_min"], s["aabb_max"]
    ext = bmax - bmin
    if ext[0] > ext[1]:
        horiz = ext[0]
        vert = horiz * height / width
    else:
        vert = ext[1]
        horiz = vert * width / height
    xc, yc = (bmax[0] + bmin[0]) / 2, (bmax[1] + bmin[1]) / 2
    org0 = np.asarray([xc, yc, bmax[2] + horiz * 0.5 * np.sqrt(3.0)])
    x_corner, y_corner = xc - horiz / 2, yc + vert / 2
    dxp, dyp = horiz / width, vert / height
    px, py = np.arange(n) % width, np.arange(n) // width
    emissive, cdf = s["emissive_faces"], s["light_cdf"]

    acc = np.zeros((n, 3))
    for _ in range(spp):
        target = np.stack([x_corner + dxp * (px + g.random(n)),
                           y_corner - dyp * (py + g.random(n)),
                           np.full(n, bmax[2])], axis=-1)
        d = target - org0[None]
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        org = np.broadcast_to(org0, (n, 3)).copy()
        min_t = np.zeros(n)
        throughput = np.ones((n, 3))
        contrib = np.zeros((n, 3))
        bsdf_pdf = np.zeros(n)
        alive = np.ones(n, bool)
        first = np.ones(n, bool)

        for _depth in range(max_bounces):
            if not alive.any():
                break
            prim, t, u, v = _intersect(s, org, d, min_t, np.full(n, INF))
            alive = alive & (prim >= 0)
            p = np.maximum(prim, 0)
            pos = org + t[:, None] * d
            ng = s["face_ng"][p]
            corner = s["face_ns"][p]
            ns = np.where(s["face_has_ns"][p][:, None],
                          corner[:, 0] * (1 - u - v)[:, None]
                          + corner[:, 1] * u[:, None]
                          + corner[:, 2] * v[:, None], ng)
            ns /= np.maximum(np.linalg.norm(ns, axis=1, keepdims=True), 1e-30)
            dg = np.einsum("nk,nk->n", d, ng)
            ds = np.einsum("nk,nk->n", d, ns)
            front = (dg < 0) & (ds < 0)
            back = (dg > 0) & (ds > 0)

            em = s["face_emission"][p]
            lpdf = s["face_light_pdf"][p]
            a2sa = np.abs(t * t / np.where(ds == 0, 1e-20, ds))
            w = np.where(first, 1.0, _power_heuristic(bsdf_pdf, lpdf * a2sa))
            add = alive & front & (lpdf > 0)
            contrib[add] += (w[:, None] * em * throughput)[add]

            rr = throughput.max(axis=1)
            die = rr < g.random(n)
            throughput = throughput / np.maximum(rr, 1e-30)[:, None]
            alive = alive & ~die & (front | back)

            ez = np.where(front[:, None], ns, -ns)
            ex, ey = _onb(ez)
            wo = _to_local(-d, ex, ey, ez)
            bs = _setup(mats, s["face_material"][p])
            instance = s["face_instance"][p]

            def nee(mask, pos, ez, ex, ey, wo, bs):
                if not len(cdf):
                    return np.zeros((n, 3))
                li = np.minimum(np.searchsorted(cdf, g.random(n)),
                                len(cdf) - 1)
                lface = emissive[li]
                u1, u2 = g.random(n), g.random(n)
                big, small = np.maximum(u1, u2), np.minimum(u1, u2)
                lu, lv = 1 - big, big - small
                lpos = (s["tri_v0"][lface] + lu[:, None] * s["tri_e1"][lface]
                        + lv[:, None] * s["tri_e2"][lface])
                lnrm = s["face_ng"][lface]
                lem = s["face_emission"][lface]
                lp = s["face_light_pdf"][lface]
                tol = lpos - pos
                dist = np.linalg.norm(tol, axis=1)
                wl = tol / np.maximum(dist, 1e-30)[:, None]
                cl = -np.einsum("nk,nk->n", wl, lnrm)
                cp = np.einsum("nk,nk->n", wl, ez)
                denom = cl * cp
                pdf_sig = np.abs(lp * dist * dist
                                 / np.where(denom == 0, 1e-20, denom))
                cand = mask & (cl > 0) & (cp > 0) & (pdf_sig > 0)
                occ = _occluded(s, pos, wl, np.full(n, EPS),
                                np.maximum(EPS, dist - EPS))
                wl_local = _to_local(wl, ex, ey, ez)
                f, pdf_b = _eval(wl_local, wo, bs)
                wmis = _power_heuristic(pdf_sig, pdf_b)
                out = f * lem * (wmis / np.maximum(pdf_sig, 1e-30))[:, None]
                ok = cand & ~occ & np.isfinite(out).all(1)
                return np.where(ok[:, None], out, 0.0)

            # NEE at the surface hit with the surface closures
            # (cycles-principled-shader.cc:461-468)
            contrib += np.where(alive[:, None], throughput, 0.0) * nee(
                alive, pos, ez, ex, ey, wo, bs)

            # closure pick (SampleBsdf :176-241)
            wd, ws, wsp = _weights(wo, bs)
            u_sel = g.random(n)
            pick_d = u_sel < wd
            pick_s = ~pick_d & (u_sel < wd + ws)
            pick_sp = ~pick_d & ~pick_s & (u_sel < wd + ws + wsp)

            sss_lanes = alive & pick_s & front
            alive = alive & ~(pick_s & ~front)
            if sss_lanes.any():
                okw, e_pos, e_ez, e_ex, e_ey, e_wo, tp = _sss_walk(
                    s, g, sss_lanes, pos, ng, ex, ey, ez, instance, bs)
                alive = alive & (~sss_lanes | okw)
                # re-shade as pure diffuse with the walk throughput, plus a
                # second NEE at the exit point (:188-215)
                m = okw
                pos = np.where(m[:, None], e_pos, pos)
                ez = np.where(m[:, None], e_ez, ez)
                ex = np.where(m[:, None], e_ex, ex)
                ey = np.where(m[:, None], e_ey, ey)
                wo = np.where(m[:, None], e_wo, wo)
                bs = {k: (np.where(m[:, None], nv, bs[k])
                          if bs[k].ndim == 2 else np.where(m, nv, bs[k]))
                      for k, nv in _diffuse_bs(tp, n).items()}
                pick_d = pick_d | m
                pick_s = pick_s & ~m
                contrib += np.where(m[:, None], throughput, 0.0) * nee(
                    m, pos, ez, ex, ey, wo, bs)

            # continuation sample
            u1, u2 = g.random(n), g.random(n)
            phi = 2 * np.pi * u1
            r = np.sqrt(u2)
            wi_d = np.stack([np.cos(phi) * r, np.sin(phi) * r,
                             np.sqrt(np.maximum(1 - u2, 0))], axis=-1)
            wi_sp, sp_ok = _ggx_sample(wo, bs["alpha"], u1, u2)
            wi = np.where(pick_d[:, None], wi_d, wi_sp)
            f, pdf_b = _eval(wi, wo, bs)
            fac = f * (np.abs(wi[:, 2])
                       / np.maximum(pdf_b, 1e-30))[:, None]
            bad = ((pdf_b <= 0) | ~np.isfinite(fac).all(1)
                   | (pick_sp & ~sp_ok))
            alive = alive & ~bad
            throughput = np.where(alive[:, None], throughput * fac,
                                  throughput)
            bsdf_pdf = np.where(alive, pdf_b, bsdf_pdf)
            first = first & ~alive
            org = pos
            d = _to_global(wi, ex, ey, ez)
            min_t = np.full(n, 1e-3)
            alive = alive & (throughput.sum(axis=1) > 1e-7)

        acc += contrib
    return (acc / spp).reshape(height, width, 3)


def _diffuse_bs(tp, n):
    z3 = np.zeros((n, 3))
    z = np.zeros(n)
    return {
        "diffuse_weight": tp, "enable_diffuse": np.ones(n, bool),
        "enable_sss": np.zeros(n, bool), "ss_weight": z3, "ss_albedo": z3,
        "ss_radius": z3, "enable_specular": np.zeros(n, bool),
        "ior": np.full(n, 1.5), "alpha": z, "specular_color": z3,
    }
