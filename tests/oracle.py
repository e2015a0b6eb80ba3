"""Independent numpy path-tracer oracle (Lambert + area-light NEE + MIS).

A direct, non-JAX transcription of the reference semantics
(/root/reference/src/render.cc:24-90 GetRadiance, shader-utils.h:166-212
DirectIllumination, lambert.h) used to statistically validate the wavefront
integrator: same physics, independently written code path, its own RNG.
Vectorized over pixels with plain numpy; brute-force intersection.
"""
from __future__ import annotations

import numpy as np

INF = 1.844e18
EPS = 1e-3


def _intersect(scene, org, d, min_t, max_t):
    v0 = scene["tri_v0"]
    e1 = scene["tri_e1"]
    e2 = scene["tri_e2"]
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
    hit = tj < INF
    return (np.where(hit, j, -1), tj, u[rows, j], v[rows, j])


def _occluded(scene, org, d, min_t, max_t):
    prim, t, _, _ = _intersect(scene, org, d, min_t, max_t)
    return prim >= 0


def _power_heuristic(a, b):
    out = np.full(np.broadcast(a, b).shape, 0.5)
    gt = a > b
    lt = a < b
    with np.errstate(divide="ignore", invalid="ignore"):
        r1 = np.where(gt, b / a, 0.0)
        r2 = np.where(lt, a / b, 0.0)
    out = np.where(gt, 1.0 / (1.0 + r1 * r1), out)
    out = np.where(lt, 1.0 - 1.0 / (1.0 + r2 * r2), out)
    return out


def render_oracle(scene_np, width, height, spp, seed=0, max_bounces=32):
    """Lambert-only oracle render -> [H, W, 3] mean radiance."""
    s = {k: np.asarray(v) for k, v in scene_np.items() if not isinstance(v,
                                                                         dict)}
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
    x_corner = xc - horiz / 2
    y_corner = yc + vert / 2
    dx, dy = horiz / width, vert / height

    acc = np.zeros((n, 3))
    px = np.arange(n) % width
    py = np.arange(n) // width

    emissive = s["emissive_faces"]
    cdf = s["light_cdf"]

    for _ in range(spp):
        target = np.stack([x_corner + dx * (px + g.random(n)),
                           y_corner - dy * (py + g.random(n)),
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
            prim, t, u, v = _intersect(s, org, d, min_t,
                                       np.full(n, INF))
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

            # implicit emission with MIS
            em = s["face_emission"][p]
            lpdf = s["face_light_pdf"][p]
            a2sa = np.abs(t * t / np.where(ds == 0, 1e-20, ds))
            w = np.where(first, 1.0, _power_heuristic(bsdf_pdf, lpdf * a2sa))
            add = alive & front & (lpdf > 0)
            contrib[add] += (w[:, None] * em * throughput)[add]

            # RR
            rr = throughput.max(axis=1)
            die = rr < g.random(n)
            throughput = throughput / np.maximum(rr, 1e-30)[:, None]
            alive = alive & ~die & (front | back)

            # lambert shade
            ez = np.where(front[:, None], ns, -ns)
            sign = np.where(ez[:, 2] >= 0, 1.0, -1.0)
            a = -1.0 / (sign + ez[:, 2])
            b = ez[:, 0] * ez[:, 1] * a
            ex = np.stack([1.0 + sign * ez[:, 0] ** 2 * a, sign * b,
                           -sign * ez[:, 0]], axis=-1)
            ey = np.stack([b, sign + ez[:, 1] ** 2 * a, -ez[:, 1]], axis=-1)
            mat_id = s["face_material"][p]
            albedo = mats["base_color"][mat_id]

            # NEE (flattened CDF)
            if len(cdf):
                li = np.minimum(np.searchsorted(cdf, g.random(n)),
                                len(cdf) - 1)
                lface = emissive[li]
                u1, u2 = g.random(n), g.random(n)
                big = np.maximum(u1, u2)
                small = np.minimum(u1, u2)
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
                pdf_sigma = np.abs(lp * dist * dist
                                   / np.where(denom == 0, 1e-20, denom))
                cand = alive & (cl > 0) & (cp > 0) & (pdf_sigma > 0)
                occ = _occluded(s, pos, wl, np.full(n, EPS),
                                np.maximum(EPS, dist - EPS))
                f = albedo / np.pi
                pdf_b = np.maximum(cp, 0.0) / np.pi
                wmis = _power_heuristic(pdf_sigma, pdf_b)
                nee = f * lem * (wmis / np.maximum(pdf_sigma, 1e-30))[:, None]
                ok = cand & ~occ
                contrib[ok] += (throughput * nee)[ok]

            # cosine sample
            u1, u2 = g.random(n), g.random(n)
            phi = 2 * np.pi * u1
            r = np.sqrt(u2)
            wi_local = np.stack([np.cos(phi) * r, np.sin(phi) * r,
                                 np.sqrt(np.maximum(1 - u2, 0))], axis=-1)
            pdf_b = wi_local[:, 2] / np.pi
            wi = (wi_local[:, 0:1] * ex + wi_local[:, 1:2] * ey
                  + wi_local[:, 2:3] * ez)
            fac = (albedo / np.pi) * (wi_local[:, 2]
                                      / np.maximum(pdf_b, 1e-30))[:, None]
            throughput = np.where(alive[:, None], throughput * fac,
                                  throughput)
            bsdf_pdf = np.where(alive, pdf_b, bsdf_pdf)
            first = first & ~alive
            org = pos
            d = wi
            min_t = np.full(n, 1e-3)
            alive = alive & (throughput.sum(axis=1) > 1e-7)

        acc += contrib
    return (acc / spp).reshape(height, width, 3)
