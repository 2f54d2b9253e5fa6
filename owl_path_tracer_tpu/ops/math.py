"""Batched shading-frame math for the wavefront path tracer.

Capability parity with the reference's header-only device math
(``/root/reference/path_tracer/src/math.hpp:6-107``) but written SoA/batched:
every function maps over arbitrary leading batch dimensions with the vector
components in the trailing axis, so the whole wavefront is one VPU-friendly
tensor op instead of a per-thread scalar chain.

Conventions (identical to the reference):
  * local shading frame has the shading normal at +z, so ``cos_theta(w) == w[..., 2]``
    (math.hpp:22);
  * ``reflect(w, n) = 2 (w.n) n - w`` with *w pointing away* from the surface
    (math.hpp:58-61);
  * the ONB is the reference's branchy ``(1,1,1) x N`` construction
    (math.hpp:86-95) so that tangent frames -- and therefore RNG-parity renders --
    match bit-for-bit.
"""
from __future__ import annotations

import jax.numpy as jnp

# Constants -- reference types.hpp:9-18.
PI = 3.14159265358979323
TWO_PI = 6.28318530717958648
PI_OVER_TWO = 1.57079632679489661
PI_OVER_FOUR = 0.78539816339744830
INV_PI = 0.31830988618379067
INV_TWO_PI = 0.15915494309189533
INV_FOUR_PI = 0.07957747154594766
T_MIN = 1e-3
T_MAX = 1e10
ALPHA_MIN = 1e-3


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the trailing axis, keepdims dropped."""
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def length(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(dot(v, v), 0.0))


def normalize(v: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Normalize over the trailing axis.

    With ``eps == 0`` this matches CUDA ``normalize`` exactly (1/sqrt(dot));
    pass a small eps for gradient-safe normalization in the differentiable path.
    """
    d = dot(v, v)[..., None]
    if eps:
        d = jnp.maximum(d, eps)
    return v / jnp.sqrt(d)


def lerp(a, b, t):
    """a + (b - a) * t  -- reference math.hpp:6-10."""
    return a + (b - a) * t


def saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def sqr(x):
    return x * x


# ── Shading-frame trigonometry (local frame, normal == +z) ─────────────────
# reference math.hpp:22-38


def cos_theta(w: jnp.ndarray) -> jnp.ndarray:
    return w[..., 2]


def cos2_theta(w: jnp.ndarray) -> jnp.ndarray:
    return sqr(w[..., 2])


def abs_cos_theta(w: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(w[..., 2])


def sin_theta(w: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(0.0, 1.0 - cos2_theta(w)))


def tan_theta(w: jnp.ndarray) -> jnp.ndarray:
    # Divide-by-zero yields +-inf exactly like the reference (math.hpp:26);
    # downstream code masks on isinf.
    return sin_theta(w) / cos_theta(w)


def cos_phi(w: jnp.ndarray) -> jnp.ndarray:
    st = sin_theta(w)
    return jnp.where(st == 0.0, 1.0, jnp.clip(w[..., 0] / jnp.where(st == 0.0, 1.0, st), -1.0, 1.0))


def sin_phi(w: jnp.ndarray) -> jnp.ndarray:
    st = sin_theta(w)
    return jnp.where(st == 0.0, 1.0, jnp.clip(w[..., 1] / jnp.where(st == 0.0, 1.0, st), -1.0, 1.0))


def same_hemisphere(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """reference math.hpp:79-82."""
    return cos_theta(a) * cos_theta(b) > 0.0


# ── Spherical coordinates ──────────────────────────────────────────────────
# reference math.hpp:42-56


def spherical_direction(theta: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    st, ct = jnp.sin(theta), jnp.cos(theta)
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)


def spherical_direction_sincos(sin_t: jnp.ndarray, cos_t: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)


# ── Reflection / refraction ────────────────────────────────────────────────


def reflect(w: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """reference math.hpp:58-61 (w points away from surface)."""
    return 2.0 * dot(w, n)[..., None] * n - w


def refract(w: jnp.ndarray, n: jnp.ndarray, eta: jnp.ndarray):
    """Batched Walter-style refraction -- reference math.hpp:63-77.

    Returns ``(ok, wi)``: ``ok`` False on total internal reflection (the
    returned wi is then garbage and must be masked), and for eta==1 the
    straight-through direction ``-w`` exactly as the reference does.
    """
    cos_i = dot(w, n)
    sin2_i = jnp.maximum(0.0, 1.0 - sqr(cos_i))
    sin2_t = sqr(eta) * sin2_i
    ok = sin2_t <= 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    wi = eta[..., None] * -w + (eta * cos_i - cos_t)[..., None] * n
    straight = jnp.broadcast_to(-w, wi.shape)
    wi = jnp.where((eta == 1.0)[..., None], straight, wi)
    ok = jnp.where(eta == 1.0, True, ok)
    return ok, wi


# ── Orthonormal basis and frame transforms ─────────────────────────────────


def onb(n: jnp.ndarray):
    """Branchy ONB matching reference math.hpp:86-95 bit-for-bit.

    t = normalize(cross-ish of (1,1,1) with n) unless n has all-equal xyz
    pattern, in which case the (-1,1,1) variant is used; b = n x t.
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    t_a = jnp.stack([nz - ny, nx - nz, ny - nx], axis=-1)
    t_b = jnp.stack([nz - ny, nx + nz, -ny - nx], axis=-1)
    use_a = (nx != ny) | (nx != nz)
    t = jnp.where(use_a[..., None], t_a, t_b)
    t = t / jnp.sqrt(dot(t, t))[..., None]
    b = cross(n, t)
    return t, b


def to_local(t: jnp.ndarray, b: jnp.ndarray, n: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """World -> local (normal at +z), normalized -- reference math.hpp:98-101."""
    v = jnp.stack([dot(w, t), dot(w, b), dot(w, n)], axis=-1)
    return v / jnp.sqrt(dot(v, v))[..., None]


def to_world(t: jnp.ndarray, b: jnp.ndarray, n: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Local -> world, normalized -- reference math.hpp:104-107."""
    v = w[..., 0:1] * t + w[..., 1:2] * b + w[..., 2:3] * n
    return v / jnp.sqrt(dot(v, v))[..., None]


def luminance(c: jnp.ndarray) -> jnp.ndarray:
    """Rec.709 luma -- reference disney_helper.cuh:9-12."""
    return 0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2]


def srgb_to_linear_gamma22(c: jnp.ndarray) -> jnp.ndarray:
    """pow(c, 2.2) -- reference disney_helper.cuh:4-7 (rgbToLin)."""
    return jnp.power(jnp.maximum(c, 0.0), 2.2)
