"""Independent numpy path-tracer oracle for the HAIR config (BASELINE
config 4): energy-conserving hair BSDF + flat-ribbon curve intersection +
area-light NEE with the hair conventions.

A direct, non-JAX transcription of the reference semantics —
/root/reference/src/shader/hair-shader.cc:8-229 (parameter mapping, frame,
hemisphere=false NEE with f = f_cos/|omega_in.x|) and
/root/reference/src/closure/energy‐conserving-hair-bsdf.h (SafeLogI0
improved-robe Horner forms, Mp/Ap/Np, tilt recurrences, 4-u sampling) —
written against the C++ directly, NOT against pbrlab_tpu.shading.hair, so
the two implementations are statistically comparable end to end.

Geometry: the ribbon model intersects the scene's flattened linear
sub-segments (curve_p0/p1/r0/r1) with the classic closest-point-of-two-
lines construction (the same discretization both framework backends use,
so the comparison isolates the shading physics).
"""
from __future__ import annotations

import numpy as np

INF = 1.844e18
EPS = 1e-3
PI = np.pi


# ---------------------------------------------------------------- geometry
def intersect_ribbons(curves, org, d, min_t, max_t):
    """Closest flat-ribbon hit over all linear sub-segments.

    Returns (sub, t, vsig, tangent): sub = sub-segment id or -1, vsig the
    signed offset in [-1, 1] (the hair BSDF h), tangent the unit axis.
    """
    p0 = curves["p0"]  # [S, 3]
    p1 = curves["p1"]
    r0 = curves["r0"]
    r1 = curves["r1"]
    e = p1 - p0  # [S, 3]
    ee = np.einsum("sk,sk->s", e, e)

    # closest points of ray line (o + t d) and segment line (p0 + u e)
    w0 = org[:, None, :] - p0[None]  # [N, S, 3]
    B = np.einsum("nk,sk->ns", d, e)
    D = np.einsum("nsk,nk->ns", w0, d)
    E = np.einsum("nsk,sk->ns", w0, e)
    denom = ee[None] - B * B  # A = d.d = 1
    par = np.abs(denom) < 1e-12  # ray parallel to axis -> no ribbon hit
    denom = np.where(par, 1.0, denom)
    u = (E - B * D) / denom
    u = np.clip(u / np.maximum(ee[None], 1e-20) * ee[None], 0.0, 1.0)
    # NOTE u solved on the unnormalized segment parameter directly:
    u = np.clip((E - B * D) / denom, 0.0, 1.0)
    t = D + u * B
    closest = org[:, None, :] + t[..., None] * d[:, None, :]
    on_axis = p0[None] + u[..., None] * e[None]
    delta = closest - on_axis
    dist = np.sqrt(np.einsum("nsk,nsk->ns", delta, delta))
    r = r0[None] * (1.0 - u) + r1[None] * u
    ok = (~par) & (dist <= r) & (t >= min_t[:, None]) & (t <= max_t[:, None])
    t = np.where(ok, t, INF)
    j = np.argmin(t, axis=1)
    rows = np.arange(len(org))
    tj = t[rows, j]
    hit = tj < INF
    # signed offset: sign of delta . (d x e) (side of the axis seen by ray)
    side = np.cross(d, e[j])
    sgn = np.sign(np.einsum("nk,nk->n", delta[rows, j], side))
    vsig = np.clip(dist[rows, j] / np.maximum(r[rows, j], 1e-20), 0, 1) * sgn
    tang = e[j] / np.maximum(np.sqrt(ee[j])[:, None], 1e-20)
    return np.where(hit, j, -1), tj, vsig, tang


def intersect_tris(s, org, d, min_t, max_t):
    v0, e1, e2 = s["tri_v0"], s["tri_e1"], s["tri_e2"]
    pvec = np.cross(d[:, None, :], e2[None])
    det = np.einsum("fk,nfk->nf", e1, pvec)
    inv = np.where(np.abs(det) > 1e-9, 1.0 / np.where(det == 0, 1, det), 0.0)
    tvec = org[:, None, :] - v0[None]
    u = np.einsum("nfk,nfk->nf", tvec, pvec) * inv
    qvec = np.cross(tvec, e1[None])
    v = np.einsum("nk,nfk->nf", d, qvec) * inv
    t = np.einsum("fk,nfk->nf", e2, qvec) * inv
    ok = ((np.abs(det) > 1e-9) & (u >= 0) & (v >= 0) & (u + v <= 1)
          & (t >= min_t[:, None]) & (t <= max_t[:, None]))
    t = np.where(ok, t, INF)
    j = np.argmin(t, axis=1)
    rows = np.arange(len(org))
    tj = t[rows, j]
    return np.where(tj < INF, j, -1), tj


# ------------------------------------------------------- hair BSDF (numpy)
def _sqr(x):
    return x * x


def betam_to_v(beta_m):
    v0 = _sqr(0.726 * beta_m + 0.812 * _sqr(beta_m) + 3.7 * beta_m ** 20)
    return np.stack([v0, 0.25 * v0, 4.0 * v0, 4.0 * v0])


def calc_s(beta_n):
    b2 = _sqr(beta_n)
    return np.sqrt(PI / 8.0) * (0.265 * beta_n + 1.194 * b2
                                + 5.372 * b2 ** 11)


def sigma_a_from_rgb(c, beta_n):
    den = (5.969 - 0.215 * beta_n + 2.532 * _sqr(beta_n)
           - 10.73 * beta_n ** 3 + 5.574 * beta_n ** 4
           + 0.245 * beta_n ** 5)
    return _sqr(np.log(np.maximum(c, 1e-30)) / den)


def _safe_log_i0(x):
    x = np.abs(x)
    P1 = [1.00000003928615375e+00, 2.49999576572179639e-01,
          2.77785268558399407e-02, 1.73560257755821695e-03,
          6.96166518788906424e-05, 1.89645733877137904e-06,
          4.29455004657565361e-08, 3.90565476357034480e-10,
          1.48095934745267240e-11]
    P2 = [3.98942651588301770e-01, 4.98327234176892844e-02,
          2.91866904423115499e-02, 1.35614940793742178e-02,
          1.31409251787866793e-01]

    def horner(z, P):
        f = np.full_like(z, P[-1])
        for a in P[-2::-1]:
            f = f * z + a
        return f

    x22 = x * x / 4.0
    small = np.log(np.maximum(x22 * horner(x22, P1), 1e-38)) + 1.0
    inv_x = 1.0 / np.maximum(x, 1e-12)
    px = horner(inv_x, P2)
    big = x + 0.5 * np.log(np.maximum(px * px * inv_x, 1e-38))
    return np.where(x < 7.5, small, big)


def _mp(sin_i, cos_i, sin_o, cos_o, v):
    v = np.clip(v, 1e-5, 1e4)
    ccv = cos_i * cos_o / v
    ssv = sin_i * sin_o / v
    return np.exp(_safe_log_i0(ccv) - ssv - 1.0 / v + np.log(1.0 / v)
                  - np.log(-np.expm1(-2.0 / v)))


def _fr_dielectric(cos_i, eta_i, eta_t):
    cos_i = np.clip(cos_i, -1.0, 1.0)
    entering = cos_i > 0
    ei = np.where(entering, eta_i, eta_t)
    et = np.where(entering, eta_t, eta_i)
    ci = np.abs(cos_i)
    si = np.sqrt(np.maximum(0.0, 1.0 - ci * ci))
    st = ei / et * si
    tir = st >= 1.0
    ct = np.sqrt(np.maximum(0.0, 1.0 - st * st))
    r_par = (et * ci - ei * ct) / np.maximum(et * ci + ei * ct, 1e-20)
    r_per = (ei * ci - et * ct) / np.maximum(ei * ci + et * ct, 1e-20)
    return np.where(tir, 1.0, 0.5 * (r_par * r_par + r_per * r_per))


def _rgb_to_y(c):
    return (0.2126729 * c[..., 0] + 0.7151522 * c[..., 1]
            + 0.0721750 * c[..., 2])


def _logistic(x, s):
    x = np.abs(x)
    num = np.exp(-x / s)
    return num / (s * _sqr(1.0 + num))


def _logistic_cdf(x, s):
    return 1.0 / (1.0 + np.exp(-x / s))


def _trimmed_logistic(x, s, a, b):
    return _logistic(x, s) / (_logistic_cdf(b, s) - _logistic_cdf(a, s))


def _np_lobe(phi, p, s, gamma_o, gamma_t):
    dphi = np.mod(phi - (2.0 * p * gamma_t - 2.0 * gamma_o + p * PI),
                  2.0 * PI)
    dphi = np.where(dphi >= PI, dphi - 2.0 * PI, dphi)
    return _trimmed_logistic(dphi, s, -PI, PI)


class HairBsdfO:
    """Per-lane bsdf state (vectorized)."""

    def __init__(self, mat, h):
        self.sigma_a = sigma_a_from_rgb(mat["base_color"],
                                        mat["azimuthal_roughness"])
        self.h = h
        self.v = betam_to_v(mat["roughness"])  # [4, ...]
        self.s = calc_s(mat["azimuthal_roughness"])
        self.eta = mat["ior"]
        self.alpha = mat["shift"] * PI / 180.0
        self.tints = [mat["specular_tint"], mat["transmission_tint"],
                      mat["second_specular_tint"], np.ones(3)]


def _tilt_terms(sin_o, cos_o, alpha):
    s0, c0 = np.sin(alpha), np.cos(alpha)
    s1, c1 = 2 * s0 * c0, c0 * c0 - s0 * s0
    s2, c2 = 2 * s1 * c1, c1 * c1 - s1 * s1
    sin_crt = [sin_o * c1 - cos_o * s1,
               sin_o * c0 + cos_o * s0,
               sin_o * c2 + cos_o * s2,
               sin_o]
    cos_crt = [cos_o * c1 + sin_o * s1,
               cos_o * c0 - sin_o * s0,
               cos_o * c2 - sin_o * s2,
               cos_o]
    return sin_crt, cos_crt


def _common(omega_out, b: HairBsdfO):
    sin_o = omega_out[..., 0]
    cos_o = np.sqrt(np.maximum(0.0, 1.0 - _sqr(sin_o)))
    sin_crt, cos_crt = _tilt_terms(sin_o, cos_o, b.alpha)
    phi_o = np.arctan2(omega_out[..., 2], omega_out[..., 1])
    sin_theta_t = sin_o / b.eta
    cos_theta_t = np.sqrt(np.maximum(0.0, 1.0 - _sqr(sin_theta_t)))
    etap = np.sqrt(np.maximum(b.eta * b.eta - _sqr(sin_o), 0.0)) \
        / np.maximum(cos_o, 1e-12)
    sin_gamma_t = b.h / etap
    cos_gamma_t = np.sqrt(np.maximum(0.0, 1.0 - _sqr(sin_gamma_t)))
    gamma_t = np.arcsin(np.clip(sin_gamma_t, -1, 1))
    el = 2.0 * cos_gamma_t / np.maximum(cos_theta_t, 1e-12)
    T = np.exp(-b.sigma_a * el[..., None])
    gamma_o = np.arcsin(np.clip(b.h, -1, 1))

    cos_gamma_o = np.sqrt(np.maximum(0.0, 1.0 - _sqr(b.h)))
    f = _fr_dielectric(cos_o * cos_gamma_o, 1.0, b.eta)[..., None]
    ap = [np.broadcast_to(f, T.shape).copy(), _sqr(1.0 - f) * T]
    ap.append(ap[1] * T * f)
    a3 = ap[2] * f * T / np.maximum(1.0 - T * f, 1e-20)
    ap.append(np.where(np.isfinite(a3), a3, 0.0))
    ap_y = np.stack([_rgb_to_y(a) for a in ap])  # [4, N]
    ap_pdf = ap_y / np.maximum(ap_y.sum(0), 1e-20)
    return (sin_o, cos_o, sin_crt, cos_crt, phi_o, gamma_o, gamma_t, T, ap,
            ap_pdf)


def hair_eval(omega_in, omega_out, b: HairBsdfO):
    """f*cos, pdf (energy‐conserving-hair-bsdf.h:295-405)."""
    (sin_o, cos_o, sin_crt, cos_crt, phi_o, gamma_o, gamma_t, T, ap,
     ap_pdf) = _common(omega_out, b)
    sin_i = omega_in[..., 0]
    cos_i = np.sqrt(np.maximum(0.0, 1.0 - _sqr(sin_i)))
    phi = np.arctan2(omega_in[..., 2], omega_in[..., 1]) - phi_o
    ret = np.zeros(omega_in.shape)
    pdf = np.zeros(sin_i.shape)
    for p in range(3):
        mpnp = _mp(sin_i, cos_i, sin_crt[p], cos_crt[p], b.v[p]) \
            * _np_lobe(phi, p, b.s, gamma_o, gamma_t)
        pdf = pdf + mpnp * ap_pdf[p]
        ret = ret + mpnp[..., None] * ap[p] * b.tints[p]
    mpnp = _mp(sin_i, cos_i, sin_o, cos_o, b.v[3]) / (2.0 * PI)
    pdf = pdf + mpnp * ap_pdf[3]
    ret = ret + mpnp[..., None] * ap[3] * b.tints[3]
    bad = ~np.isfinite(ret).all(-1) | ~np.isfinite(pdf)
    ret = np.where(bad[..., None], 0.0, ret)
    pdf = np.where(bad, 0.0, pdf)
    return ret, pdf


def hair_sample(omega_out, b: HairBsdfO, us):
    """(omega_in, f*cos, pdf) (energy‐conserving-hair-bsdf.h:419-572)."""
    (sin_o, cos_o, sin_crt, cos_crt, phi_o, gamma_o, gamma_t, T, ap,
     ap_pdf) = _common(omega_out, b)
    n = sin_o.shape[0]
    # lobe pick by luminance CDF
    u0 = us[0].copy()
    p_pick = np.full(n, 3)
    for p in range(3):
        take = (p_pick == 3) & (u0 < ap_pdf[p])
        p_pick = np.where(take, p, p_pick)
        u0 = np.where(p_pick == 3, u0 - ap_pdf[p], u0)
    vp = np.take_along_axis(b.v, p_pick[None], axis=0)[0]
    sin_o_p = np.select([p_pick == q for q in range(4)], sin_crt)
    cos_o_p = np.select([p_pick == q for q in range(4)], cos_crt)

    u = 1.0 + vp * np.log(np.maximum(us[1] + (1.0 - us[1])
                                     * np.exp(-2.0 / np.maximum(vp, 1e-12)),
                                     1e-38))
    sin_i = (-u * sin_o_p + np.sqrt(np.maximum(0.0, 1.0 - u * u))
             * np.cos(2.0 * PI * us[2]) * cos_o_p)
    cos_i = np.sqrt(np.maximum(0.0, 1.0 - _sqr(sin_i)))

    # azimuth
    T_log = _logistic_cdf(PI, b.s) - _logistic_cdf(-PI, b.s)
    samp = -b.s * np.log(1.0 / np.maximum(
        us[3] * T_log + _logistic_cdf(-PI, b.s), 1e-20) - 1.0 + 1e-20)
    dphi_lobed = (2.0 * p_pick * gamma_t - 2.0 * gamma_o + p_pick * PI
                  + samp)
    dphi = np.where(p_pick < 3, dphi_lobed, 2.0 * PI * us[3])
    phi_i = phi_o + dphi
    omega_in = np.stack([sin_i, cos_i * np.cos(phi_i),
                         cos_i * np.sin(phi_i)], axis=-1)

    ret = np.zeros(omega_in.shape)
    pdf = np.zeros(n)
    for q in range(3):
        mpnp = _mp(sin_i, cos_i, sin_crt[q], cos_crt[q], b.v[q]) \
            * _np_lobe(dphi, q, b.s, gamma_o, gamma_t)
        pdf = pdf + mpnp * ap_pdf[q]
        ret = ret + mpnp[..., None] * ap[q] * b.tints[q]
    mpnp = _mp(sin_i, cos_i, sin_o, cos_o, b.v[3]) / (2.0 * PI)
    pdf = pdf + mpnp * ap_pdf[3]
    ret = ret + mpnp[..., None] * ap[3] * b.tints[3]
    bad = ~np.isfinite(ret).all(-1) | ~np.isfinite(pdf)
    return (omega_in, np.where(bad[..., None], 0.0, ret),
            np.where(bad, 0.0, pdf))


# ------------------------------------------------------------ render loop
def _power_heuristic(a, b):
    out = np.full(np.broadcast(a, b).shape, 0.5)
    gt, lt = a > b, a < b
    with np.errstate(divide="ignore", invalid="ignore"):
        r1 = np.where(gt, b / np.where(a == 0, 1, a), 0.0)
        r2 = np.where(lt, a / np.where(b == 0, 1, b), 0.0)
    out = np.where(gt, 1.0 / (1.0 + r1 * r1), out)
    out = np.where(lt, 1.0 - 1.0 / (1.0 + r2 * r2), out)
    return out


def render_oracle_hair(scene_np, width, height, spp, seed=0, max_bounces=6):
    """Hair-tuft + area-light oracle render -> [H, W, 3] mean radiance.

    Hair shading per hair-shader.cc: frame ex=tangent, NEE with
    hemisphere=false and f = f_cos/|omega_l.x|, throughput = f_cos/pdf.
    Non-hair hits terminate with implicit emission only (the test scene
    uses a black-diffuse emissive lamp), mirroring the framework's demo.
    """
    s = {k: np.asarray(v) for k, v in scene_np.items()
         if not isinstance(v, dict)}
    mats = {k: np.asarray(v) for k, v in scene_np["materials"].items()}
    curves = {"p0": s["curve_p0"], "p1": s["curve_p1"],
              "r0": s["curve_r0"], "r1": s["curve_r1"]}
    seg_of_sub = s["curve_seg"]
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
    dxs, dys = horiz / width, vert / height

    emissive = s["emissive_faces"]
    cdf = s["light_cdf"]
    acc = np.zeros((n, 3))
    px = np.arange(n) % width
    py = np.arange(n) // width

    def occluded(org, d, mn, mx):
        pt, _ = intersect_tris(s, org, d, mn, mx)
        sub, _, _, _ = intersect_ribbons(curves, org, d, mn, mx)
        return (pt >= 0) | (sub >= 0)

    for _ in range(spp):
        target = np.stack([x_corner + dxs * (px + g.random(n)),
                           y_corner - dys * (py + g.random(n)),
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
            tp, tt = intersect_tris(s, org, d, min_t, np.full(n, INF))
            sub, tc, vsig, tang = intersect_ribbons(curves, org, d, min_t,
                                                    np.full(n, INF))
            curve_hit = (sub >= 0) & (tc < tt)
            tri_hit = (tp >= 0) & ~curve_hit
            t = np.where(curve_hit, tc, tt)
            alive = alive & (curve_hit | tri_hit)
            pos = org + t[:, None] * d

            # tri hits: add implicit emission with MIS, then terminate
            # (lamp is black diffuse; framework demo behaves identically)
            p = np.maximum(tp, 0)
            em = s["face_emission"][p]
            lpdf = s["face_light_pdf"][p]
            ngt = s["face_ng"][p]
            dgn = np.einsum("nk,nk->n", d, ngt)
            a2sa = np.abs(t * t / np.where(dgn == 0, 1e-20, dgn))
            w = np.where(first, 1.0, _power_heuristic(bsdf_pdf, lpdf * a2sa))
            add = alive & tri_hit & (dgn < 0) & (lpdf > 0)
            contrib[add] += (w[:, None] * em * throughput)[add]
            alive = alive & curve_hit

            # RR (render.cc:66-69)
            rr = throughput.max(axis=1)
            die = rr < g.random(n)
            throughput = throughput / np.maximum(rr, 1e-30)[:, None]
            alive = alive & ~die

            # hair frame: ex = tangent, ey/ez from wo (hair-shader.cc:165)
            wo_g = -d
            ex = tang
            ey = np.cross(np.cross(wo_g, ex), ex)
            ey /= np.maximum(np.linalg.norm(ey, axis=1, keepdims=True),
                             1e-20)
            ez = np.cross(ex, ey)
            ambiguous = np.abs(np.einsum("nk,nk->n", wo_g, ex)) > 1 - 1e-6
            alive = alive & ~ambiguous
            wo = np.stack([np.einsum("nk,nk->n", wo_g, ex),
                           np.einsum("nk,nk->n", wo_g, ey),
                           np.einsum("nk,nk->n", wo_g, ez)], axis=-1)

            mat_id = s["curve_material"][np.maximum(sub, 0)]
            # hair tints are RGB columns (material-param.h:65-67:
            # specular_tint / second_specular_tint / transmission_tint)
            m = {k: mats[k][mat_id] for k in
                 ("base_color", "roughness", "azimuthal_roughness", "ior",
                  "shift", "hair_specular_tint", "transmission_tint",
                  "second_specular_tint")}
            b = HairBsdfO({k: (v.T if v.ndim == 2 else v) for k, v in
                           (("base_color", m["base_color"]),
                            ("azimuthal_roughness",
                             m["azimuthal_roughness"]),
                            ("roughness", m["roughness"]), ("ior", m["ior"]),
                            ("shift", m["shift"]),
                            ("specular_tint", m["hair_specular_tint"]),
                            ("transmission_tint", m["transmission_tint"]),
                            ("second_specular_tint",
                             m["second_specular_tint"]))}, vsig)
            # fix shapes: colors are [N,3]
            b.sigma_a = sigma_a_from_rgb(m["base_color"],
                                         m["azimuthal_roughness"][..., None])
            b.tints = [m["hair_specular_tint"], m["transmission_tint"],
                       m["second_specular_tint"], np.ones((n, 3))]

            # ---- NEE (hemisphere=false, f/|wl.x|) ----
            ul = g.random(n)
            li = np.searchsorted(cdf, ul, side="right").clip(0,
                                                            len(cdf) - 1)
            lface = emissive[li]
            lu, lv = g.random(n), g.random(n)
            su = np.sqrt(lu)
            b0, b1 = 1 - su, lv * su
            lpos = (s["tri_v0"][lface] + b0[:, None] * 0
                    + s["tri_e1"][lface] * b0[:, None]
                    + s["tri_e2"][lface] * b1[:, None])
            lnrm = s["face_ng"][lface]
            lem = s["face_emission"][lface]
            lp = s["face_light_pdf"][lface]
            to_l = lpos - pos
            dist = np.maximum(np.linalg.norm(to_l, axis=1), 1e-9)
            wl = to_l / dist[:, None]
            cosl = -np.einsum("nk,nk->n", wl, lnrm)
            cosp = np.einsum("nk,nk->n", wl, ex)  # hair geom normal = ex
            denom = cosl * cosp
            pdf_sigma = np.abs(lp * dist * dist
                               / np.where(np.abs(denom) > 1e-12, denom,
                                          1e-12))
            wl_local = np.stack([np.einsum("nk,nk->n", wl, ex),
                                 np.einsum("nk,nk->n", wl, ey),
                                 np.einsum("nk,nk->n", wl, ez)], axis=-1)
            f_cos, pdf_b = hair_eval(wl_local, wo, b)
            f = f_cos / np.maximum(np.abs(wl_local[..., 0]), 1e-12)[:, None]
            wmis = _power_heuristic(pdf_sigma, pdf_b)
            cand = alive & (cosl > 0) & (pdf_sigma > 0)
            occ = occluded(pos, wl, np.full(n, EPS),
                           np.where(cand, dist - EPS, -1.0))
            nee = f * lem * (wmis / np.maximum(pdf_sigma, 1e-12))[:, None]
            good = cand & ~occ & np.isfinite(nee).all(-1)
            contrib[good] += (throughput * nee)[good]

            # ---- sample continuation ----
            us = [g.random(n) for _ in range(4)]
            wi_l, f_cos_s, pdf_s = hair_sample(wo, b, us)
            ok = (pdf_s > 1e-12) & np.isfinite(f_cos_s).all(-1)
            factor = f_cos_s / np.maximum(pdf_s, 1e-12)[:, None]
            wi_g = (wi_l[:, 0:1] * ex + wi_l[:, 1:2] * ey
                    + wi_l[:, 2:3] * ez)
            alive = alive & ok
            throughput = np.where(alive[:, None], throughput * factor,
                                  throughput)
            bsdf_pdf = np.where(alive, pdf_s, bsdf_pdf)
            org = np.where(alive[:, None], pos, org)
            d = np.where(alive[:, None], wi_g, d)
            min_t = np.where(alive, 1e-3, min_t)
            first = first & ~alive

        acc += np.where(np.isfinite(contrib), contrib, 0.0)

    return (acc / spp).reshape(height, width, 3)
