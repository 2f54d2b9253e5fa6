"""Observability: per-wave statistics, bounce histograms, profiler hooks.

The reference's only observability is colored console prints
(types.hpp:20-28, "TRACING" banner application.cpp:365).  Production
rendering needs real metrics (SURVEY.md section 5): live-ray counts per
bounce (wavefront occupancy), bounce-depth histograms, Mrays/s, gradient
norms, and ``jax.profiler`` traces for kernel-level timing.
"""
from __future__ import annotations

import contextlib
import dataclasses
import json
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.scene import RenderSettings, Scene
from ..ops import rng as rng_mod
from . import integrator


@dataclasses.dataclass
class WaveStats:
    """Statistics for one traced wavefront."""

    live_per_bounce: np.ndarray  # [depth] live rays entering each bounce
    occupancy: np.ndarray  # [depth] live fraction
    mean_path_length: float
    total_rays: int

    def to_json(self) -> str:
        return json.dumps(
            {
                "live_per_bounce": self.live_per_bounce.tolist(),
                "occupancy": [round(float(x), 4) for x in self.occupancy],
                "mean_path_length": round(self.mean_path_length, 3),
                "total_rays": self.total_rays,
            }
        )


def wavefront_stats(
    scene: Scene,
    settings: RenderSettings,
    pixel_xy: jnp.ndarray,
    intersect_fn: Callable,
    enable_textures: bool = False,
) -> WaveStats:
    """Trace one sample-wave and report per-bounce occupancy."""
    n = pixel_xy.shape[0]
    state0 = rng_mod.seed(pixel_xy[..., 0], pixel_xy[..., 1])
    j0, st = rng_mod.next_f32(state0)
    j1, st = rng_mod.next_f32(st)
    from ..models.camera import primary_rays

    o, d = primary_rays(
        scene.camera, pixel_xy, jnp.stack([j0, j1], -1), (settings.width, settings.height)
    )

    ps = integrator.PathState(
        ray_o=o,
        ray_d=d,
        result=jnp.zeros((n, 3), jnp.float32),
        throughput=jnp.ones((n, 3), jnp.float32),
        rng=st,
        alive=jnp.ones((n,), bool),
        prev_lobe=jnp.full((n,), -1, jnp.int32),
        depth=jnp.zeros((n,), jnp.int32),
        prev_pdf=jnp.zeros((n,), jnp.float32),
    )

    @jax.jit
    def stepper(ps):
        def body(st, _):
            live = jnp.sum(st.alive.astype(jnp.int32))
            nxt = integrator.trace_bounce(scene, settings, st, intersect_fn, enable_textures)
            return nxt, live

        _, lives = jax.lax.scan(body, ps, None, length=settings.max_path_depth)
        return lives

    lives = np.asarray(stepper(ps))
    occ = lives / float(n)
    total = int(lives.sum())
    return WaveStats(
        live_per_bounce=lives,
        occupancy=occ,
        mean_path_length=total / float(n),
        total_rays=total,
    )


def grad_norms(grads) -> dict:
    """Per-field L2 norms of a Materials gradient pytree."""
    out = {}
    for name, g in zip(type(grads)._fields, grads):
        out[name] = float(jnp.sqrt(jnp.sum(g * g)))
    return out


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str] = None):
    """jax.profiler trace context (view in TensorBoard / xprof)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Wall-clock rays/s meter for render loops."""

    def __init__(self):
        self.t0 = time.time()
        self.rays = 0

    def add(self, rays: int):
        self.rays += int(rays)

    @property
    def mrays_per_s(self) -> float:
        dt = max(time.time() - self.t0, 1e-9)
        return self.rays / dt / 1e6
