"""Pinhole camera: look-at basis -> raster-plane frame.

Same math as the reference (``/root/reference/path_tracer/src/camera.cpp:3-22``):
vertical FOV + aspect give the viewport, the focal plane sits at distance 1
along -w, and rays go through ``llc + u*horizontal + v*vertical``.  Stored as a
small pytree of jnp arrays so camera parameters are differentiable (the
reference's camera is host-side constants).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..ops import math as m
from ..utils.parser import CameraDesc


class CameraData(NamedTuple):
    origin: jnp.ndarray  # [3]
    llc: jnp.ndarray  # [3] lower-left corner of the raster plane
    horizontal: jnp.ndarray  # [3]
    vertical: jnp.ndarray  # [3]


def make_camera(desc: CameraDesc, buffer_size) -> CameraData:
    """camera.cpp:3-22 (to_camera_data)."""
    w_px, h_px = buffer_size
    aspect = float(w_px) / float(h_px)
    theta = desc.vertical_fov * np.pi / 180.0
    h = np.tan(theta / 2.0)
    viewport_h = 2.0 * h
    viewport_w = aspect * viewport_h

    look_from = np.asarray(desc.look_from, np.float32)
    look_at = np.asarray(desc.look_at, np.float32)
    look_up = np.asarray(desc.look_up, np.float32)

    w = look_from - look_at
    w = w / np.linalg.norm(w)
    u = np.cross(look_up, w)
    u = u / np.linalg.norm(u)
    v = np.cross(w, u)
    v = v / np.linalg.norm(v)

    horizontal = (viewport_w * u).astype(np.float32)
    vertical = (viewport_h * v).astype(np.float32)
    llc = (look_from - horizontal / 2.0 - vertical / 2.0 - w).astype(np.float32)

    return CameraData(
        origin=jnp.asarray(look_from),
        llc=jnp.asarray(llc),
        horizontal=jnp.asarray(horizontal),
        vertical=jnp.asarray(vertical),
    )


def primary_rays(camera: CameraData, pixel_xy: jnp.ndarray, jitter: jnp.ndarray, fb_size) -> tuple:
    """Jittered primary rays -- reference device.cu:232-241.

    pixel_xy: [..., 2] integer pixel coords (x right, y as in the reference's
    launch index, i.e. y=0 is the *bottom* row of the final image after its
    store-time flip); jitter: [..., 2] uniforms.
    Returns (origins [...,3], directions [...,3] normalized).
    """
    fb = jnp.asarray(fb_size, jnp.float32)
    screen = (pixel_xy.astype(jnp.float32) + jitter) / fb
    d = (
        camera.llc
        + screen[..., 0:1] * camera.horizontal
        + screen[..., 1:2] * camera.vertical
        - camera.origin
    )
    d = d / jnp.sqrt(m.dot(d, d))[..., None]
    o = jnp.broadcast_to(camera.origin, d.shape)
    return o, d
