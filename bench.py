"""Benchmark: forward path-tracing throughput on the dragon stress scene.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N}

``value`` is live rays traced per second (primary + bounces actually alive at
each wavefront step, counted on-device) on the BASELINE.json north-star
config: dragon scene (sub=7 substitute, ~328k tris), 1024x1024, **spp=64**,
fused2 single-kernel Pallas traversal, persistent-wavefront renderer.
``vs_baseline`` is the ratio against the 50 Mrays/s/chip target.

Flags:  --size --spp --depth --scene --dragon-sub --cluster-size
        --intersector --renderer --lanes --quick
"""
import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="dragon")
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument(
        "--dragon-sub", type=int, default=7,
        help="dragon icosphere subdivisions (6 ~82k tris, 7 ~328k, 8 ~1.3M)",
    )
    ap.add_argument("--cluster-size", type=int, default=None)
    ap.add_argument(
        "--intersector", choices=["fused2", "fused", "cluster", "bvh", "brute"],
        default="fused2",
        help="fused2 = fat-cluster pipelined Pallas traversal (production)",
    )
    ap.add_argument("--pixel-chunk", type=int, default=65536)
    ap.add_argument("--renderer", choices=["wavefront", "scan"], default="wavefront")
    ap.add_argument("--lanes", type=int, default=131072)
    ap.add_argument(
        "--fused2-block", type=int, default=256,
        help="rays per fused2 kernel block (256 best measured; 128 for very incoherent loads)",
    )
    ap.add_argument("--quick", action="store_true", help="256^2, spp=2, sub=6 smoke config")
    args = ap.parse_args()
    if args.quick:
        args.size, args.spp, args.dragon_sub = 256, 2, 6

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent / "assets"))
    import generate

    scene_name = args.scene
    if args.scene == "dragon":
        scene_name = generate.ensure_dragon(args.dragon_sub)
    else:
        generate.ensure_assets()

    from owl_path_tracer_tpu.models.scene import RenderSettings, compile_scene
    from owl_path_tracer_tpu.render import film as film_mod

    scene = compile_scene("assets", scene_name, (args.size, args.size))
    settings = RenderSettings(
        width=args.size,
        height=args.size,
        max_samples=args.spp,
        max_path_depth=args.depth,
        environment_auto=True,
        environment_intensity=1.0,
    )
    accel = film_mod.make_accel(scene, args.intersector, cluster_size=args.cluster_size)
    n_tris = int(scene.tri_idx.shape[0])

    if args.renderer == "wavefront":
        from owl_path_tracer_tpu.render.wavefront import render_image_wavefront

        # warm-up/compile with the IDENTICAL static config (spp is static in
        # the jitted chunk, so a different-spp warm-up would not prime the
        # compile cache and the timed run would include ~25 s of compilation)
        render_image_wavefront(
            scene, settings, accel=accel, lanes=args.lanes,
            fused2_block=args.fused2_block,
        )
        t0 = time.time()
        _, rays = render_image_wavefront(
            scene, settings, accel=accel, lanes=args.lanes,
            fused2_block=args.fused2_block,
        )
        dt = time.time() - t0
    else:
        warm = film_mod.new_film(settings)
        warm = film_mod.add_samples(scene, settings, warm, 1, pixel_chunk=args.pixel_chunk, accel=accel)
        film = film_mod.new_film(settings)
        t0 = time.time()
        film = film_mod.add_samples(
            scene, settings, film, args.spp, pixel_chunk=args.pixel_chunk, accel=accel
        )
        dt = time.time() - t0
        rays = film.rays_traced
    mrays = rays / dt / 1e6

    print(
        json.dumps(
            {
                "metric": f"fwd Mrays/s ({scene_name} {n_tris // 1000}k tris {args.size}^2 spp={args.spp} depth={args.depth}, {args.intersector} intersector, {args.renderer})",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / 50.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
