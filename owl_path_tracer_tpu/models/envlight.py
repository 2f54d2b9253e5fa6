"""Environment-map importance sampling (lat-long CDF) for NEE + MIS.

The reference only ever *evaluates* the environment on miss
(``sample_environment``, device.cu:31-39) -- there is no env light sampling
anywhere.  This module adds the standard luminance-weighted 2-D CDF over the
lat-long map (rows marginal, columns conditional), with solid-angle pdfs and
the inverse mapping of the reference's ``uv_on_sphere`` parameterization
(device.cu:23-28), so the NEE integrator can importance-sample bright texels
(sun disks) and MIS them against BSDF samples.

All tables are precomputed on the host at scene compile; sampling is two
searchsorted gathers per ray -- dense, differentiable w.r.t. the radiance
values (not the sample positions, which are detached like all samples).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..ops import math as m
from ..ops import texture as tex


class EnvLight(NamedTuple):
    env_map: jnp.ndarray  # [H,W,3] radiance (pre-intensity)
    row_cdf: jnp.ndarray  # [H] inclusive cdf over rows
    col_cdf: jnp.ndarray  # [H,W] inclusive cdf per row
    pdf_map: jnp.ndarray  # [H,W] solid-angle pdf per texel
    intensity: float


def build_env_light(env_map: np.ndarray, intensity: float = 1.0) -> Optional[EnvLight]:
    env_map = np.asarray(env_map, np.float32)
    if env_map.ndim != 3 or env_map.shape[0] <= 1 or intensity <= 0.0:
        return None
    h, w = env_map.shape[:2]
    lum = 0.2126 * env_map[..., 0] + 0.7152 * env_map[..., 1] + 0.0722 * env_map[..., 2]
    # row v spans elevations [(v0-0.5)pi, (v1-0.5)pi]; exact texel solid angle
    # is (2pi/W) * (sin(e1) - sin(e0))  -- using the row-center cosine instead
    # biases the pdf integral by several % at coarse H
    edges = np.linspace(-0.5 * np.pi, 0.5 * np.pi, h + 1)
    d_sin = np.maximum(np.sin(edges[1:]) - np.sin(edges[:-1]), 1e-12)
    texel_omega = (2 * np.pi / w) * d_sin[:, None]
    weight = lum * texel_omega + 1e-20
    row_w = weight.sum(axis=1)
    total = row_w.sum()
    row_cdf = np.cumsum(row_w) / total
    col_cdf = np.cumsum(weight, axis=1) / row_w[:, None]
    pdf_map = (weight / total) / texel_omega
    return EnvLight(
        env_map=jnp.asarray(env_map),
        row_cdf=jnp.asarray(row_cdf.astype(np.float32)),
        col_cdf=jnp.asarray(col_cdf.astype(np.float32)),
        pdf_map=jnp.asarray(pdf_map.astype(np.float32)),
        intensity=float(intensity),
    )


def _uv_to_direction(u, v):
    """Inverse of tex.uv_on_sphere (device.cu:23-28)."""
    phi = (u - 0.5) * m.TWO_PI
    elev = (v - 0.5) * m.PI
    ce = jnp.cos(elev)
    return jnp.stack([ce * jnp.sin(phi), jnp.sin(elev), ce * jnp.cos(phi)], axis=-1)


class EnvSample(NamedTuple):
    direction: jnp.ndarray  # [N,3]
    radiance: jnp.ndarray  # [N,3] (intensity applied)
    pdf: jnp.ndarray  # [N] solid-angle pdf


def sample_env(env: EnvLight, u2: jnp.ndarray) -> EnvSample:
    """CDF inversion: u2 [N,2] -> direction/radiance/pdf."""
    h, w = env.env_map.shape[0], env.env_map.shape[1]
    row = jnp.clip(jnp.searchsorted(env.row_cdf, u2[..., 0]), 0, h - 1)
    col_cdf_rows = env.col_cdf[row]  # [N,W]
    col = jnp.clip(
        jax_searchsorted_rows(col_cdf_rows, u2[..., 1]), 0, w - 1
    )
    u = (col.astype(jnp.float32) + 0.5) / w
    v = (row.astype(jnp.float32) + 0.5) / h
    d = _uv_to_direction(u, v)
    radiance = env.env_map[row, col] * env.intensity
    pdf = env.pdf_map[row, col]
    return EnvSample(direction=d, radiance=radiance, pdf=pdf)


def jax_searchsorted_rows(cdf_rows: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Per-row searchsorted: cdf_rows [N,W] ascending, u [N] -> index [N]."""
    return jnp.sum(cdf_rows < u[..., None], axis=-1)


def pdf_env_direction(env: EnvLight, d: jnp.ndarray) -> jnp.ndarray:
    """Solid-angle pdf the CDF sampler assigns to an arbitrary direction --
    the MIS counterpart for BSDF-sampled rays that escape to the sky."""
    uv = tex.uv_on_sphere(d)
    h, w = env.pdf_map.shape
    x = jnp.clip(jnp.floor(uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip(jnp.floor(uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    return env.pdf_map[y, x]


def env_radiance(env: EnvLight, d: jnp.ndarray) -> jnp.ndarray:
    return tex.sample_environment(env.env_map, d) * env.intensity
