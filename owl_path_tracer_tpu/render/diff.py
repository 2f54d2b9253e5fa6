"""Differentiable rendering + material recovery.

The capability the reference completely lacks (its "training loop" is a
finite-difference-style parameter sweep rendered to PNGs -- test_loop,
application.hpp:89-108).  Here the full radiance estimate is differentiable
end-to-end w.r.t. the material table (and environment map): reverse-mode
gradients flow through BSDF eval, MIS weights, emission, and texture/env
lookups, while sampled directions / lobe choices / RR decisions are detached
(ops/disney.py) -- radiative-backprop-style adjoints, so the backward pass
re-traverses the forward wavefront without score terms.

Because the per-pixel LCG streams are deterministic in the pixel coordinates,
the same-seed render is a deterministic function of the parameters: gradients
are validated against finite differences on that fixed sample set
(tests/test_diff.py), and ``recover_materials`` runs Adam on an image loss --
the inverse-rendering counterpart of the reference's forward sweeps
(BASELINE.json configs 5).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.material import Materials
from ..models.scene import RenderSettings, Scene
from ..ops import rng as rng_mod
from . import integrator

# material fields that are physically constrained to [0,1]
_UNIT_FIELDS = (
    "subsurface", "metallic", "specular", "specular_tint", "roughness",
    "anisotropic", "sheen", "sheen_tint", "clearcoat", "clearcoat_gloss",
    "specular_transmission", "specular_transmission_roughness",
)


@partial(
    jax.jit,
    static_argnames=("settings", "num_samples", "enable_textures"),
)
def render_with_params(
    scene: Scene,
    materials: Materials,
    env_map: jnp.ndarray,
    camera,
    settings: RenderSettings,
    pixel_xy: jnp.ndarray,
    num_samples: int,
    accel,
    enable_textures: bool = False,
):
    """Deterministic spp-averaged radiance for a pixel set, differentiable
    w.r.t. materials, the environment map texels, AND the camera basis
    (all substituted into the scene).

    Works with every accel (integrator.make_intersectors).  The fused2
    Pallas traversal is wrapped in its differentiable-refit form here
    (ops/fused2.py fused2_closest_hit_diff): the kernel's winner topology is
    detached, but (t, u, v) are re-derived from the live rays, so camera
    gradients flow through the production traversal too (round-4; previously
    camera recovery required the cluster/brute fallback).
    """
    scene = scene._replace(materials=materials, env_map=env_map, camera=camera)
    lights = None
    occlude_fn = None
    if settings.use_nee:
        from ..models.lights import build_light_table

        lights = build_light_table(scene)
    intersect_fn, occlude_fn = integrator.make_intersectors(
        scene, accel, differentiable=True
    )

    state0 = rng_mod.seed(pixel_xy[..., 0], pixel_xy[..., 1])
    acc, _, _ = integrator.sample_sum(
        scene, settings, pixel_xy, state0, num_samples, intersect_fn,
        enable_textures, lights=lights, occlude_fn=occlude_fn,
    )
    return acc / float(num_samples)


def render_with_materials(
    scene: Scene,
    materials: Materials,
    settings: RenderSettings,
    pixel_xy: jnp.ndarray,
    num_samples: int,
    accel,
    enable_textures: bool = False,
):
    """Back-compat wrapper differentiating w.r.t. materials only."""
    return render_with_params(
        scene, materials, scene.env_map, scene.camera, settings, pixel_xy,
        num_samples, accel, enable_textures,
    )


def image_loss(
    scene: Scene,
    materials: Materials,
    settings: RenderSettings,
    pixel_xy: jnp.ndarray,
    target: jnp.ndarray,
    num_samples: int,
    accel,
) -> jnp.ndarray:
    """MSE against target radiance at the given pixels."""
    img = render_with_materials(scene, materials, settings, pixel_xy, num_samples, accel)
    return jnp.mean((img - target) ** 2)


loss_and_grad = jax.value_and_grad(image_loss, argnums=1)


def env_loss(scene, env_map, settings, pixel_xy, target, num_samples, accel):
    """MSE differentiable w.r.t. the environment-map texels."""
    img = render_with_params(
        scene, scene.materials, env_map, scene.camera, settings, pixel_xy,
        num_samples, accel,
    )
    return jnp.mean((img - target) ** 2)


env_loss_and_grad = jax.value_and_grad(env_loss, argnums=1)


def camera_loss(scene, camera, settings, pixel_xy, target, num_samples, accel):
    """MSE differentiable w.r.t. the camera basis (CameraData pytree).

    Works with every accel including fused2 (differentiable hit-geometry
    refit; interior gradients only -- silhouette boundary terms are out of
    scope for interior autodiff, as in test_diff.py's camera FD setup).
    """
    img = render_with_params(
        scene, scene.materials, scene.env_map, camera, settings, pixel_xy,
        num_samples, accel,
    )
    return jnp.mean((img - target) ** 2)


camera_loss_and_grad = jax.value_and_grad(camera_loss, argnums=1)


class RecoveryResult(NamedTuple):
    materials: Materials
    losses: np.ndarray


def recover_materials(
    scene: Scene,
    settings: RenderSettings,
    target: jnp.ndarray,
    pixel_xy: jnp.ndarray,
    init_materials: Materials,
    steps: int = 100,
    lr: float = 0.05,
    num_samples: int = 8,
    accel=None,
    trainable: Optional[Sequence[str]] = None,
    grad_mask: Optional[Materials] = None,
) -> RecoveryResult:
    """Adam loop recovering material parameters from a rendered target.

    ``trainable`` restricts optimization to a subset of fields (defaults to
    base_color + roughness + metallic + specular_transmission + emission);
    ``grad_mask`` (a Materials pytree of 0/1) further restricts updates to
    chosen ROWS, e.g. one material of a multi-material scene -- Adam's
    unit-scale steps otherwise make every unconstrained row wander.
    Unit-interval fields are clamped after each step.
    """
    import optax

    if trainable is None:
        trainable = ("base_color", "roughness", "metallic", "emission")
    trainable = tuple(trainable)

    opt = optax.adam(lr)
    params = init_materials
    opt_state = opt.init(params)
    losses = []

    @jax.jit
    def step(params, opt_state):
        loss, grads = loss_and_grad(
            scene, params, settings, pixel_xy, target, num_samples, accel
        )
        # zero out gradients of frozen fields
        grads = Materials(*[
            g if name in trainable else jnp.zeros_like(g)
            for name, g in zip(Materials._fields, grads)
        ])
        if grad_mask is not None:
            grads = jax.tree.map(lambda g, mk: g * mk, grads, grad_mask)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        # project to physical ranges
        clipped = {}
        for name in Materials._fields:
            v = getattr(params, name)
            if name == "base_color":
                v = jnp.clip(v, 0.0, 1.0)
            elif name in _UNIT_FIELDS:
                v = jnp.clip(v, 0.0, 1.0)
            elif name == "ior":
                v = jnp.clip(v, 1.01, 3.0)
            elif name == "emission":
                v = jnp.maximum(v, 0.0)
            clipped[name] = v
        return Materials(**clipped), opt_state, loss

    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    return RecoveryResult(materials=params, losses=np.asarray(losses))
