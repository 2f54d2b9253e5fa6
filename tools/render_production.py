"""Render the reference's ACTUAL production artifact, checkpointed.

The reference program ships exactly one production configuration
(/root/reference/assets/settings.json:3-5): the car scene at 1080x1440,
max_samples=12288, max_path_depth=16, environment off.  Round 4 ran it at
spp=256 and projected the full frame; this tool renders the real thing in
crash-safe checkpointed segments (render/wavefront.py checkpoint_path) and
writes docs/gallery/car_production.png plus a JSON wall-clock record.

Usage:
  python tools/render_production.py                 # the full 12288-spp frame
  python tools/render_production.py --spp 256       # reduced-spp variant
  python tools/render_production.py --resume-only   # just report checkpoint %

Kill it at any time; rerunning resumes from docs/gallery/car_production.ck
(at most ~checkpoint-every seconds of work is repeated).
"""
import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "assets"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=12288)
    ap.add_argument("--checkpoint-every", type=float, default=300.0)
    ap.add_argument("--lanes", type=int, default=131072)
    ap.add_argument("--resume-only", action="store_true")
    args = ap.parse_args()

    import generate

    generate.ensure_assets()

    from owl_path_tracer_tpu.models.scene import RenderSettings, compile_scene
    from owl_path_tracer_tpu.render import film as film_mod
    from owl_path_tracer_tpu.render.wavefront import render_image_wavefront
    from owl_path_tracer_tpu.utils.image import quantize_rgba8, write_png_rgba8
    from owl_path_tracer_tpu.utils.parser import parse_settings

    here = pathlib.Path(__file__).resolve().parents[1]
    ref = parse_settings(here / "assets" / "settings.json")
    w, h = ref.buffer_size
    spp = args.spp if args.spp else ref.max_samples
    out_dir = here / "docs" / "gallery"
    out_dir.mkdir(parents=True, exist_ok=True)
    ck = out_dir / f"car_production_spp{spp}.ck"

    if args.resume_only:
        if ck.exists():
            d = np.load(ck)
            total = w * h * spp
            print(f"{int(d['work_counter'])}/{total} "
                  f"({100.0 * int(d['work_counter']) / total:.2f}%)")
        else:
            print("no checkpoint")
        return

    # the reference production settings verbatim: environment OFF, light-quad
    # illumination only, no NEE (the reference integrator has none live)
    scene = compile_scene("assets", ref.scene, (w, h))
    settings = RenderSettings(
        width=w, height=h, max_samples=spp,
        max_path_depth=ref.max_path_depth,
        environment_use=ref.environment_use,
        environment_auto=ref.environment_auto,
        environment_color=ref.environment_color,
        environment_intensity=ref.environment_intensity,
    )
    accel = film_mod.make_accel(scene, "fused2-bf16")

    t0 = time.time()
    img, rays = render_image_wavefront(
        scene, settings, accel=accel, lanes=args.lanes, fused2_sort=True,
        checkpoint_path=str(ck), checkpoint_every_s=args.checkpoint_every,
        progress=True,
    )
    dt = time.time() - t0

    out = out_dir / f"car_production_spp{spp}.png"
    write_png_rgba8(out, quantize_rgba8(np.clip(img, 0, 1)))
    rec = {
        "metric": f"car production frame ({w}x{h} spp={spp} "
                  f"depth={ref.max_path_depth}, reference settings.json)",
        "wall_s_this_run": round(dt, 1),
        "rays_total": int(rays),
        "mrays_per_s": round(rays / dt / 1e6, 2),
        "png": str(out.relative_to(here)),
    }
    print(json.dumps(rec), flush=True)
    (out_dir / f"car_production_spp{spp}.json").write_text(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
