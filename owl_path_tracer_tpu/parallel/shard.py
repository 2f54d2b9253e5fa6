"""Multi-chip rendering: pixel tiles sharded over a device mesh.

The reference is strictly single-GPU (``create_context(nullptr, 1)``,
application.cpp:62; OWL's multi-device capability unused -- SURVEY.md section
2 "Parallelism").  Here distribution is first-class and TPU-native:

* 1-D mesh over an ``"px"`` (pixels) axis: the scene SoA / BVH / material
  table are **replicated** on every chip, the pixel wavefront (rays, RNG
  streams, film accumulator) is **sharded** -- embarrassing parallelism, no
  per-bounce collectives, so scaling rides ICI only for the final gather;
* the renderer is ``shard_map``-wrapped ``integrator.sample_sum``: each chip
  runs the identical compiled program on its pixel shard;
* gradient rendering all-reduces material-parameter gradients with ``psum``
  (the ICI collective the north star calls for) -- see ``psum_grads``.

Works identically on the virtual CPU mesh used in tests
(``--xla_force_host_platform_device_count``) and on real TPU slices; the
driver validates the multi-chip path through ``__graft_entry__.dryrun_multichip``.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.scene import RenderSettings, Scene
from ..ops import rng as rng_mod
from ..render import integrator
from ..render.film import _pixel_grid, scene_has_textures


def make_pixel_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or given) devices, axis name 'px'."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), ("px",))


def _shard_spec(mesh: Mesh):
    return NamedSharding(mesh, P("px"))


def sharded_sample_sum(
    mesh: Mesh,
    scene: Scene,
    settings: RenderSettings,
    accel,
    lights,
    enable_textures: bool,
    num_samples: int,
):
    """Build the pjit'd per-shard sampler: (pixel_xy, rng) -> (sum, rng', rays).

    Scene/accel/lights are closed over (replicated by XLA); pixel arrays are
    sharded along 'px'.
    """
    from ..ops.cluster import ClusterBVH, cluster_occluded, make_cluster_intersector
    from ..ops.traverse import DeviceBVH, bvh_occluded, make_bvh_intersector

    def local_render(pixel_xy, rng_state):
        if isinstance(accel, ClusterBVH):
            intersect_fn = make_cluster_intersector(accel)

            def occlude_fn(p, d, dist):
                return cluster_occluded(p, d, accel, t_max=dist)

        elif isinstance(accel, DeviceBVH):
            intersect_fn = make_bvh_intersector(accel)

            def occlude_fn(p, d, dist):
                return bvh_occluded(p, d, accel, t_max=dist)

        else:
            intersect_fn = integrator.make_brute_intersector(scene)
            occlude_fn = integrator.make_brute_occluder(scene)
        return integrator.sample_sum(
            scene, settings, pixel_xy, rng_state, num_samples, intersect_fn,
            enable_textures, lights=lights, occlude_fn=occlude_fn,
        )

    fn = jax.shard_map(
        local_render,
        mesh=mesh,
        in_specs=(P("px"), P("px")),
        out_specs=(P("px"), P("px"), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def render_image_sharded(
    scene: Scene,
    settings: RenderSettings,
    mesh: Optional[Mesh] = None,
    spp: Optional[int] = None,
    accel=None,
) -> np.ndarray:
    """Full-frame render with pixels sharded across the mesh.

    Pixel count is padded to a multiple of the mesh size; output matches the
    single-chip renderer exactly (same per-pixel RNG streams).
    """
    if mesh is None:
        mesh = make_pixel_mesh()
    n_dev = mesh.devices.size
    spp = settings.max_samples if spp is None else spp

    lights = None
    if settings.use_nee:
        from ..models.lights import build_light_table

        lights = build_light_table(scene)
    enable_textures = scene_has_textures(scene)

    px = _pixel_grid(settings.width, settings.height)
    total = px.shape[0]
    pad = (-total) % n_dev
    if pad:
        px = np.concatenate([px, np.tile(px[-1:], (pad, 1))])
    state = np.asarray(rng_mod.seed(jnp.asarray(px[:, 0]), jnp.asarray(px[:, 1])))

    fn = sharded_sample_sum(mesh, scene, settings, accel, lights, enable_textures, spp)
    sharding = _shard_spec(mesh)
    px_d = jax.device_put(jnp.asarray(px), sharding)
    st_d = jax.device_put(jnp.asarray(state), sharding)
    acc, _, _ = fn(px_d, st_d)
    acc = np.asarray(acc)[:total]
    img = acc.reshape(settings.height, settings.width, 3) / float(spp)
    return img[::-1].copy()


# ── distributed gradients (material recovery across chips) ─────────────────


def sharded_loss_and_grad(
    mesh: Mesh,
    scene: Scene,
    settings: RenderSettings,
    accel,
    num_samples: int,
):
    """Builds a pjit'd (materials, pixel_xy, rng, target) -> (loss, grads)
    where pixels/targets are sharded and the material gradient is psum'd over
    the mesh -- the all-reduce-over-ICI pattern from BASELINE.json."""
    from ..ops.cluster import ClusterBVH, cluster_occluded, make_cluster_intersector

    def local_loss(materials, pixel_xy, rng_state, target):
        s2 = scene._replace(materials=materials)
        if isinstance(accel, ClusterBVH):
            intersect_fn = make_cluster_intersector(accel)

            def occlude_fn(p, d, dist):
                return cluster_occluded(p, d, accel, t_max=dist)

        else:
            intersect_fn = integrator.make_brute_intersector(s2)
            occlude_fn = integrator.make_brute_occluder(s2)
        lights = None
        if settings.use_nee:
            from ..models.lights import build_light_table

            lights = build_light_table(s2)
        acc, _, _ = integrator.sample_sum(
            s2, settings, pixel_xy, rng_state, num_samples, intersect_fn,
            scene_has_textures(s2), lights=lights, occlude_fn=occlude_fn,
        )
        img = acc / float(num_samples)
        # local mean over this shard's pixels; global loss = mean of shard means
        return jnp.mean((img - target) ** 2)

    def shard_body(materials, pixel_xy, rng_state, target):
        loss, grads = jax.value_and_grad(local_loss)(materials, pixel_xy, rng_state, target)
        # all-reduce across chips over ICI
        loss = jax.lax.pmean(loss, "px")
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, "px"), grads)
        return loss, grads

    fn = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P("px"), P("px"), P("px")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)
