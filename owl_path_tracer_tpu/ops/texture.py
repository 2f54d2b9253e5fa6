"""Texture and environment-map lookup kernels.

Parity: the reference samples RGBA8 textures with NEAREST filtering and CLAMP
addressing in normalized coordinates (owl.hpp:248-256, application.cpp:233-238)
and maps miss directions to a lat-long environment via ``uv_on_sphere``
(device.cu:23-39).  Textures here are pre-flipped float arrays (load path,
utils/image.py), so a lookup is a pure gather -- VPU-friendly, differentiable
w.r.t. texel values.

Beyond parity: bilinear filtering and an environment CDF for importance
sampling (used by NEE, models/lights.py).
"""
from __future__ import annotations

import jax.numpy as jnp

from . import math as m


def uv_on_sphere(d: jnp.ndarray) -> jnp.ndarray:
    """Direction [...,3] -> lat-long uv [...,2] -- device.cu:23-28."""
    u = 0.5 + jnp.arctan2(d[..., 0], d[..., 2]) / (2.0 * m.PI)
    v = 0.5 + jnp.arcsin(jnp.clip(d[..., 1], -1.0, 1.0)) / m.PI
    return jnp.stack([u, v], axis=-1)


def sample_nearest(tex: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Nearest-clamp normalized-coordinate lookup.

    tex [H,W,C]; uv [...,2] in [0,1] (values outside clamp, matching
    OWL_TEXTURE_CLAMP).  CUDA nearest tex2D picks texel floor(u*W).
    """
    h, w = tex.shape[0], tex.shape[1]
    x = jnp.clip(jnp.floor(uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip(jnp.floor(uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    return tex[y, x]


def sample_bilinear(tex: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-clamp lookup (quality mode; not used in parity renders)."""
    h, w = tex.shape[0], tex.shape[1]
    fx = uv[..., 0] * w - 0.5
    fy = uv[..., 1] * h - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]
    x0c = jnp.clip(x0, 0, w - 1)
    x1c = jnp.clip(x0 + 1, 0, w - 1)
    y0c = jnp.clip(y0, 0, h - 1)
    y1c = jnp.clip(y0 + 1, 0, h - 1)
    t00 = tex[y0c, x0c]
    t01 = tex[y0c, x1c]
    t10 = tex[y1c, x0c]
    t11 = tex[y1c, x1c]
    return (
        t00 * (1 - tx) * (1 - ty)
        + t01 * tx * (1 - ty)
        + t10 * (1 - tx) * ty
        + t11 * tx * ty
    )


def sample_environment(env: jnp.ndarray, d: jnp.ndarray, bilinear: bool = False) -> jnp.ndarray:
    """Environment radiance for miss directions -- device.cu:31-39."""
    uv = uv_on_sphere(d)
    return sample_bilinear(env, uv) if bilinear else sample_nearest(env, uv)


def sky_gradient(d: jnp.ndarray) -> jnp.ndarray:
    """The reference's ``environment_auto`` sky -- device.cu:141."""
    t = 0.5 * (d[..., 1] + 1.0)
    white = jnp.ones(d.shape[:-1] + (3,), d.dtype)
    blue = jnp.broadcast_to(jnp.asarray([0.5, 0.7, 1.0], d.dtype), d.shape[:-1] + (3,))
    return m.lerp(white, blue, t[..., None])


def sample_atlas_nearest(
    atlas: jnp.ndarray, tex_id: jnp.ndarray, uv: jnp.ndarray,
    tex_hw: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Stacked-texture lookup: atlas [K,H,W,3], tex_id [...], uv [...,2].

    ``tex_hw`` [K,2] gives each texture's TRUE (h,w) before zero-padding to
    the stacked extent; uv is scaled by the texture's own size so scenes
    mixing texture sizes never sample the padding.  Omitting it assumes all
    textures fill the atlas (back-compat for uniformly-sized test scenes).
    tex_id < 0 returns zeros (caller keeps the material base_color then).
    """
    k = jnp.maximum(tex_id, 0)
    if tex_hw is None:
        h = jnp.float32(atlas.shape[1])
        w = jnp.float32(atlas.shape[2])
    else:
        hw = tex_hw[k]  # [...,2] (K is tiny; gather is from a <=K*2 table)
        h, w = hw[..., 0], hw[..., 1]
    x = jnp.clip(jnp.floor(uv[..., 0] * w).astype(jnp.int32), 0, (w - 1).astype(jnp.int32))
    y = jnp.clip(jnp.floor(uv[..., 1] * h).astype(jnp.int32), 0, (h - 1).astype(jnp.int32))
    out = atlas[k, y, x]
    return jnp.where((tex_id >= 0)[..., None], out, 0.0)
