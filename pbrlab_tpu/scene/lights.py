"""Device-side light sampling over the flattened emissive-face arrays.

Semantics from /root/reference/src/light-manager.h:37-170: SampleAllLight's
chained CDF draws (light, then primitive) are algebraically one draw over the
flattened p(light)*p(prim|light) CDF built in scene.build(); the returned pdf
(area measure) and ImplicitAreaLight's pdf are the same per-face quantity
face_light_pdf = p_choose(face) / area(face).
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import jax.numpy as jnp

from ..core.sampling import sample_cdf, triangle_uniform_sample


class SampledLight(NamedTuple):
    position: jnp.ndarray  # [N,3]
    normal: jnp.ndarray  # [N,3]
    emission: jnp.ndarray  # [N,3]
    pdf: jnp.ndarray  # [N] area-measure pdf
    valid: jnp.ndarray  # [N] bool (False when scene has no lights)


def sample_all_light(scene: Dict, u0, u1, u2) -> SampledLight:
    """Sample a point on an emissive face per lane (light-manager.h:79-170).

    u0 selects the face via the flattened CDF; (u1, u2) sample the triangle
    uniformly (TriangleUniformSampler, sampling-utils.h:59-66).
    """
    cdf = scene["light_cdf"]
    n_lights = cdf.shape[0]
    n = u0.shape[0]
    if n_lights == 0:
        z3 = jnp.zeros((n, 3), jnp.float32)
        return SampledLight(z3, z3, z3, jnp.zeros((n,), jnp.float32),
                            jnp.zeros((n,), bool))
    idx = sample_cdf(cdf, u0)
    u, v = triangle_uniform_sample(u1, u2)
    if "light_fat" in scene:
        # one fat-row fetch: v0 e1 e2 ng emission pdf (build_fat_tables);
        # select-sum instead of gather for few-light scenes
        from ..core.math import small_table_fetch

        row = small_table_fetch(scene["light_fat"], idx)
        v0, e1, e2 = row[:, 0:3], row[:, 3:6], row[:, 6:9]
        normal = row[:, 9:12]
        emission = row[:, 12:15]
        pdf = row[:, 15]
    else:
        face = scene["emissive_faces"][idx]
        v0 = scene["tri_v0"][face]
        e1 = scene["tri_e1"][face]
        e2 = scene["tri_e2"][face]
        normal = scene["face_ng"][face]
        emission = scene["face_emission"][face]
        pdf = scene["face_light_pdf"][face]
    # Lerp3 with P = (1-u-v)p0 + u p1 + v p2  ==  p0 + u e1 + v e2
    position = v0 + u[..., None] * e1 + v[..., None] * e2
    return SampledLight(position, normal, emission, pdf,
                        jnp.ones((n,), bool))


def implicit_area_light(scene: Dict, prim):
    """Emission + area pdf for a BSDF-sampled hit on an emissive face
    (light-manager.h ImplicitAreaLight). prim [N] >= 0 assumed clipped."""
    emission = scene["face_emission"][prim]
    pdf = scene["face_light_pdf"][prim]
    has = pdf > 0.0
    return has, emission, pdf
