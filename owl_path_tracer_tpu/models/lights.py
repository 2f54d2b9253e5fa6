"""Area lights: next-event estimation + MIS power heuristic.

The reference shipped this machinery as dead code -- ``lights.hpp:15-61``
(triangle sampling, area->solid-angle pdf, power heuristic) and the shadow-ray
``visibiliy_test`` (device.cu:97-110) have zero live callers; its renders find
lights only by brute-force BSDF-sample hits (device.cu:157-161).  Here the
same math is promoted to a live, batched light-sampling path (SURVEY.md
section 2 row 14), used when ``RenderSettings.use_nee`` is on.

Monochrome emission (Le = scalar ``emission`` broadcast to gray) is kept for
behavioral parity with the reference's emissive hits.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import math as m
from ..ops import sampling as sm
from .scene import Scene


class LightTable(NamedTuple):
    """Per-emissive-triangle SoA (precomputed at scene compile)."""

    p0: jnp.ndarray  # [L,3]
    p1: jnp.ndarray  # [L,3]
    p2: jnp.ndarray  # [L,3]
    n0: jnp.ndarray  # [L,3] vertex normals (for the sampled-point normal)
    n1: jnp.ndarray
    n2: jnp.ndarray
    emission: jnp.ndarray  # [L]
    area: jnp.ndarray  # [L]
    tri_id: jnp.ndarray  # [L] original triangle ids

    @property
    def count(self) -> int:
        # static under jit (array shape), so light count never retraces
        return self.tri_id.shape[0]


def build_light_table(scene: Scene) -> LightTable:
    import numpy as np

    ids = np.asarray(scene.emissive_tris)
    ids = ids[ids >= 0]
    if len(ids) == 0:
        return None
    tri = np.asarray(scene.tri_idx)[ids]
    v = np.asarray(scene.vertices)
    n = np.asarray(scene.normals)
    p0, p1, p2 = v[tri[:, 0]], v[tri[:, 1]], v[tri[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(p1 - p0, p2 - p0), axis=-1)
    mat_id = np.asarray(scene.tri_mat)[ids]
    emission = np.asarray(scene.materials.emission)[mat_id]
    return LightTable(
        p0=jnp.asarray(p0),
        p1=jnp.asarray(p1),
        p2=jnp.asarray(p2),
        n0=jnp.asarray(n[tri[:, 0]]),
        n1=jnp.asarray(n[tri[:, 1]]),
        n2=jnp.asarray(n[tri[:, 2]]),
        emission=jnp.asarray(emission.astype(np.float32)),
        area=jnp.asarray(area.astype(np.float32)),
        tri_id=jnp.asarray(ids.astype(np.int32)),
    )


def pdf_area_to_solid_angle(pdf_area, dist_sqr, cos_theta):
    """lights.hpp:23-28 incl. the grazing-angle zero guard."""
    a = jnp.abs(cos_theta)
    return jnp.where(a < 1e-4, 0.0, pdf_area * dist_sqr / jnp.where(a < 1e-4, 1.0, a))


def power_heuristic(n_f, pdf_f, n_g, pdf_g):
    """beta=2 power heuristic -- lights.hpp:56-61."""
    f = n_f * pdf_f
    g = n_g * pdf_g
    denom = f * f + g * g
    return jnp.where(denom > 0.0, f * f / jnp.where(denom > 0.0, denom, 1.0), 0.0)


class LightSample(NamedTuple):
    direction: jnp.ndarray  # [N,3] unit, shading point -> light
    distance: jnp.ndarray  # [N]
    pdf: jnp.ndarray  # [N] solid-angle pdf (incl. 1/count light choice)
    emission: jnp.ndarray  # [N] scalar Le (monochrome)
    normal: jnp.ndarray  # [N,3] light-surface normal at the sample
    tri_id: jnp.ndarray  # [N] sampled light triangle id


def sample_lights(lights: LightTable, target: jnp.ndarray, u3: jnp.ndarray) -> LightSample:
    """Uniform light pick + uniform area sample -- lights.hpp:30-48 batched.

    target [N,3] shading points; u3 [N,3] uniforms (light pick, 2x barycentric).
    """
    count = lights.count
    li = jnp.clip((u3[..., 0] * count).astype(jnp.int32), 0, count - 1)
    bary = sm.sample_uniform_triangle(u3[..., 1:3])
    b0 = (1.0 - bary[..., 0] - bary[..., 1])[..., None]
    b1 = bary[..., 0:1]
    b2 = bary[..., 1:2]
    pos = b0 * lights.p0[li] + b1 * lights.p1[li] + b2 * lights.p2[li]
    nrm = b0 * lights.n0[li] + b1 * lights.n1[li] + b2 * lights.n2[li]
    nrm = nrm / jnp.sqrt(jnp.maximum(m.dot(nrm, nrm), 1e-20))[..., None]

    d = pos - target
    dist_sqr = m.dot(d, d)
    dist = jnp.sqrt(jnp.maximum(dist_sqr, 1e-20))
    direction = d / dist[..., None]
    cos_l = m.dot(-direction, nrm)
    pdf_area = 1.0 / (count * jnp.maximum(lights.area[li], 1e-12))
    pdf = pdf_area_to_solid_angle(pdf_area, dist_sqr, cos_l)
    return LightSample(
        direction=direction,
        distance=dist,
        pdf=pdf,
        emission=lights.emission[li],
        normal=nrm,
        tri_id=lights.tri_id[li],
    )


def pdf_hit_light(lights: LightTable, tri: jnp.ndarray, ray_d: jnp.ndarray, t: jnp.ndarray, light_n: jnp.ndarray):
    """Solid-angle pdf that NEE would have assigned to a BSDF-sampled hit of
    triangle ``tri`` at distance ``t`` -- the other half of the MIS pair."""
    count = lights.count
    # match tri against the light table (L is small: linear scan one-hot)
    eq = tri[:, None] == lights.tri_id[None, :]  # [N,L]
    is_light = eq.any(axis=-1)
    area = jnp.where(is_light, (eq * lights.area[None, :]).sum(axis=-1), 1.0)
    pdf_area = 1.0 / (count * jnp.maximum(area, 1e-12))
    cos_l = m.dot(-ray_d, light_n)
    pdf = pdf_area_to_solid_angle(pdf_area, t * t, cos_l)
    return jnp.where(is_light, pdf, 0.0)
