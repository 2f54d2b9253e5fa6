"""Differentiability tests: finite-difference validation of material
gradients and a small material-recovery optimization."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from owl_path_tracer_tpu.models import material as material_mod
from owl_path_tracer_tpu.models.camera import make_camera
from owl_path_tracer_tpu.models.scene import RenderSettings, scene_from_arrays
from owl_path_tracer_tpu.render import diff as diff_mod
from owl_path_tracer_tpu.utils.parser import CameraDesc
from test_integrator import make_sphere_mesh


def diffuse_sphere_scene(base_color=(0.6, 0.4, 0.3), roughness=0.7):
    mat = material_mod.single(base_color=base_color, roughness=roughness, specular=0.0)
    v, idx, n = make_sphere_mesh(np.zeros(3), 1.0)
    cam = make_camera(
        CameraDesc((3, 0, 0), (0, 0, 0), (0, 1, 0), 45), (16, 16)
    )
    return scene_from_arrays(v, idx, mat, np.zeros(len(idx), np.int32), cam, normals=n)


SETTINGS = RenderSettings(
    width=16, height=16, max_samples=4, max_path_depth=3,
    environment_color=(1.0, 0.9, 0.8), environment_intensity=1.0,
)


def pixel_grid():
    x, y = np.meshgrid(np.arange(16, dtype=np.int32), np.arange(16, dtype=np.int32))
    return jnp.asarray(np.stack([x.ravel(), y.ravel()], -1))


def fd_check(field, component=None, eps=1e-3, rtol=0.08):
    scene = diffuse_sphere_scene()
    px = pixel_grid()
    target = jnp.zeros((256, 3))  # loss = mean(img^2)/... arbitrary target

    def loss_of(materials):
        return diff_mod.image_loss(scene, materials, SETTINGS, px, target, 4, None)

    mats = scene.materials
    loss0, grads = jax.value_and_grad(loss_of)(mats)
    g = np.asarray(getattr(grads, field))

    # finite difference on the same fixed RNG sample set
    def perturb(delta):
        v = getattr(mats, field)
        if component is not None:
            v = v.at[0, component].add(delta)
        else:
            v = v.at[0].add(delta)
        return mats._replace(**{field: v})

    lp = float(loss_of(perturb(+eps)))
    lm = float(loss_of(perturb(-eps)))
    fd = (lp - lm) / (2 * eps)
    ad = g[0, component] if component is not None else g[0]
    assert fd != 0.0 or abs(ad) < 1e-7
    np.testing.assert_allclose(ad, fd, rtol=rtol, atol=1e-5)


def test_grad_base_color_fd():
    fd_check("base_color", component=1)


def test_grad_roughness_fd():
    fd_check("roughness", rtol=0.15)


def test_grad_emission_fd():
    # emissive sphere: d(loss)/d(emission) through the termination write
    mat = material_mod.single(base_color=(1, 1, 1), emission=2.0)
    v, idx, n = make_sphere_mesh(np.zeros(3), 1.0)
    cam = make_camera(CameraDesc((3, 0, 0), (0, 0, 0), (0, 1, 0), 45), (16, 16))
    scene = scene_from_arrays(v, idx, mat, np.zeros(len(idx), np.int32), cam, normals=n)
    px = pixel_grid()
    target = jnp.zeros((256, 3))

    def loss_of(materials):
        return diff_mod.image_loss(scene, materials, SETTINGS, px, target, 2, None)

    g = np.asarray(jax.grad(loss_of)(scene.materials).emission)[0]
    eps = 1e-3
    lp = float(loss_of(scene.materials._replace(emission=scene.materials.emission + eps)))
    lm = float(loss_of(scene.materials._replace(emission=scene.materials.emission - eps)))
    fd = (lp - lm) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=0.05)


def test_material_recovery_base_color():
    """Render a target with known albedo, start from gray, recover it."""
    true_color = (0.8, 0.3, 0.2)
    scene_true = diffuse_sphere_scene(base_color=true_color)
    px = pixel_grid()
    target = diff_mod.render_with_materials(
        scene_true, scene_true.materials, SETTINGS, px, 8, None
    )

    scene0 = diffuse_sphere_scene(base_color=(0.5, 0.5, 0.5))
    res = diff_mod.recover_materials(
        scene0, SETTINGS, target, px, scene0.materials,
        steps=60, lr=0.08, num_samples=8, accel=None, trainable=("base_color",),
    )
    got = np.asarray(res.materials.base_color)[0]
    np.testing.assert_allclose(got, true_color, atol=0.05)
    assert res.losses[-1] < res.losses[0] * 0.05
