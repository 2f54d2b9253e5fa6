"""Render the docs gallery: small reference-parity frames of each scene.

Usage: python tools/render_gallery.py [--size 96] [--spp 8]
Writes docs/gallery/*.png (committed -- the README links them).
"""
import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--depth", type=int, default=5)
    args = ap.parse_args()

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "assets"))
    import generate

    generate.ensure_assets()

    from owl_path_tracer_tpu.models.scene import RenderSettings, compile_scene
    from owl_path_tracer_tpu.render import film as film_mod
    from owl_path_tracer_tpu.utils.image import quantize_rgba8, write_png_rgba8

    out_dir = pathlib.Path(__file__).resolve().parents[1] / "docs" / "gallery"
    out_dir.mkdir(parents=True, exist_ok=True)

    configs = [
        ("sphere", dict(environment_auto=True, environment_intensity=1.0), {}),
        ("cube", dict(environment_auto=True, environment_intensity=1.0), {}),
        ("cornell-box", dict(environment_intensity=0.0, environment_color=(0, 0, 0), use_nee=True), {}),
        ("dragon", dict(environment_auto=True, environment_intensity=1.0, use_nee=True), {}),
        ("mitsuba", dict(environment_use=True, environment_intensity=1.0, use_nee=True), {}),
        ("car", dict(environment_use=True, environment_intensity=1.0, use_nee=True), {}),
    ]
    for name, env_kwargs, _ in configs:
        scene = compile_scene("assets", name, (args.size, args.size))
        s = RenderSettings(width=args.size, height=args.size,
                           max_samples=args.spp, max_path_depth=args.depth,
                           **env_kwargs)
        accel = film_mod.make_accel(scene, "cluster", cluster_size=128)
        t0 = time.time()
        img = film_mod.render_image(scene, s, pixel_chunk=args.size * args.size, accel=accel)
        path = out_dir / f"{name}.png"
        write_png_rgba8(path, quantize_rgba8(np.clip(img, 0, 1)))
        print(f"{name}: {time.time()-t0:.1f}s -> {path}", flush=True)


if __name__ == "__main__":
    main()
