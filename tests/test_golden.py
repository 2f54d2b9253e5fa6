"""Deterministic golden-value regression tests.

The renders are deterministic (fixed LCG streams), so low-spp scene renders
have stable pixel statistics; these lock in current behavior so refactors
(new intersectors, Pallas kernels, sharding) can't silently change output.
Golden values were produced by the brute-force intersector and are asserted
for every intersector, which also pins cross-intersector equality.
"""
import pathlib

import numpy as np
import pytest

from owl_path_tracer_tpu.models.scene import RenderSettings, compile_scene
from owl_path_tracer_tpu.render import film as film_mod

ASSETS = pathlib.Path(__file__).resolve().parents[1] / "assets"


@pytest.fixture(scope="module", autouse=True)
def ensure_assets():
    import sys

    sys.path.insert(0, str(ASSETS))
    import generate

    generate.ensure_assets()


def render(scene_name, settings, intersector):
    scene = compile_scene(ASSETS, scene_name, (settings.width, settings.height))
    accel = film_mod.make_accel(scene, intersector, cluster_size=64)
    return film_mod.render_image(scene, settings, pixel_chunk=4096, accel=accel)


CORNELL = RenderSettings(
    width=48, height=48, max_samples=4, max_path_depth=4,
    environment_color=(0, 0, 0), environment_intensity=0.0,
)
SPHERE = RenderSettings(
    width=48, height=48, max_samples=4, max_path_depth=3,
    environment_auto=True, environment_intensity=1.0,
)


@pytest.mark.parametrize("intersector", ["brute", "bvh", "cluster"])
def test_cornell_golden(intersector):
    img = render("cornell-box", CORNELL, intersector)
    assert np.isfinite(img).all()
    # golden statistics from the brute-force render (rounded)
    np.testing.assert_allclose(img.mean(), 0.17278366, rtol=1e-4)
    np.testing.assert_allclose(img[:, :, 1].mean(), 0.18428108, rtol=1e-4)
    np.testing.assert_allclose(img.max(), 15.0, rtol=1e-5)  # the light


@pytest.mark.parametrize("intersector", ["brute", "bvh", "cluster"])
def test_sphere_golden(intersector):
    img = render("sphere", SPHERE, intersector)
    assert np.isfinite(img).all()
    np.testing.assert_allclose(img.mean(), 0.89442927, rtol=1e-4)


def test_intersectors_bitwise_equal_on_cornell():
    imgs = [render("cornell-box", CORNELL, k) for k in ("brute", "bvh", "cluster")]
    np.testing.assert_array_equal(imgs[0], imgs[1])
    np.testing.assert_array_equal(imgs[0], imgs[2])
