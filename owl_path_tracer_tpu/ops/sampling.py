"""Batched low-level samplers + pdfs.

Parity with ``/root/reference/path_tracer/src/sample_methods.hpp:12-86``;
every sampler takes ``u`` with shape ``[..., 2]`` (two uniforms in [0,1)) and
returns directions/points with the same leading batch shape.  Branches become
``jnp.where`` masks so the whole wavefront evaluates in lockstep on the VPU.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import math as m


def sample_uniform_disk(u: jnp.ndarray) -> jnp.ndarray:
    """sample_methods.hpp:12-17."""
    phi = m.TWO_PI * u[..., 1]
    r = jnp.sqrt(u[..., 0])
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def sample_concentric_disk(u: jnp.ndarray) -> jnp.ndarray:
    """Concentric (Shirley) square->disk map -- sample_methods.hpp:19-41.

    Degenerate-origin and |dx|>|dy| branches are masked, matching the
    reference's scalar control flow.
    """
    dx = 2.0 * u[..., 0] - 1.0
    dy = 2.0 * u[..., 1] - 1.0
    use_x = jnp.abs(dx) > jnp.abs(dy)
    # Guard both divisions; the unused lane is masked out below.
    safe_dx = jnp.where(dx == 0.0, 1.0, dx)
    safe_dy = jnp.where(dy == 0.0, 1.0, dy)
    r = jnp.where(use_x, dx, dy)
    phi = jnp.where(
        use_x,
        m.PI_OVER_FOUR * (dy / safe_dx),
        m.PI_OVER_TWO - m.PI_OVER_FOUR * (dx / safe_dy),
    )
    pt = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)
    degenerate = (dx == 0.0) & (dy == 0.0)
    return jnp.where(degenerate[..., None], 0.0, pt)


def sample_uniform_sphere(u: jnp.ndarray) -> jnp.ndarray:
    """sample_methods.hpp:43-51."""
    z = 1.0 - 2.0 * u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = m.TWO_PI * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def sample_cosine_hemisphere(u: jnp.ndarray) -> jnp.ndarray:
    """Concentric-disk lift -- sample_methods.hpp:53-60."""
    d = sample_concentric_disk(u)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - d[..., 0] ** 2 - d[..., 1] ** 2))
    return jnp.concatenate([d, z[..., None]], axis=-1)


def pdf_cosine_hemisphere(wi: jnp.ndarray) -> jnp.ndarray:
    """|cos(theta_i)| / pi -- sample_methods.hpp:62-65."""
    return jnp.abs(m.cos_theta(wi)) * m.INV_PI


def sample_uniform_hemisphere(u: jnp.ndarray) -> jnp.ndarray:
    """sample_methods.hpp:67-75."""
    z = u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = m.TWO_PI * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def pdf_uniform_hemisphere() -> float:
    return 0.5 * m.INV_PI


def sample_uniform_triangle(u: jnp.ndarray) -> jnp.ndarray:
    """Square->barycentric warp -- sample_methods.hpp:82-86."""
    su0 = jnp.sqrt(u[..., 0])
    return jnp.stack([1.0 - su0, u[..., 1] * su0], axis=-1)
