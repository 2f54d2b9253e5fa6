"""Benchmark: forward path-tracing throughput on the dragon stress scene.

The LAST stdout line is the headline JSON:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N}

``value`` is live rays traced per second (primary + bounces actually alive at
each wavefront step, counted on-device) on the BASELINE.json north-star
config: dragon scene (sub=7 substitute, ~328k tris), 1024x1024, **spp=64**,
fused2 single-kernel Pallas traversal, persistent-wavefront renderer.
``vs_baseline`` is the ratio against the 50 Mrays/s/chip target.

A FROZEN secondary config (dragon sub-6 ~82k tris, 512^2, spp=4) is also run
and printed as an earlier ``"trend"`` JSON line each round, so round-over-
round kernel progress stays comparable even when the headline config moves
(VERDICT r2 weak #5).  ``--no-trend`` skips it.

Flags:  --size --spp --depth --scene --dragon-sub --cluster-size
        --intersector --renderer --lanes --quick --nee --no-sort --no-trend
"""
import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np


def run_config(args, scene_name, size, spp, depth, nee=False):
    """Render one timed frame; returns (mrays, n_tris, label)."""
    import dataclasses

    from owl_path_tracer_tpu.models.scene import RenderSettings, compile_scene
    from owl_path_tracer_tpu.render import film as film_mod

    scene = compile_scene("assets", scene_name, (size, size))
    settings = RenderSettings(
        width=size,
        height=size,
        max_samples=spp,
        max_path_depth=depth,
        environment_auto=True,
        environment_intensity=1.0,
        use_nee=nee,
    )
    accel = film_mod.make_accel(scene, args.intersector, cluster_size=args.cluster_size)
    n_tris = int(scene.tri_idx.shape[0])

    if args.renderer == "wavefront":
        from owl_path_tracer_tpu.render.wavefront import render_image_wavefront

        kw = dict(
            accel=accel, lanes=args.lanes, fused2_block=args.fused2_block,
            fused2_sort=not args.no_sort, readback_f16=args.readback_f16,
            iters_per_launch=args.iters_per_launch, fused_nee=args.fused_nee,
        )
        # warm-up/compile with the IDENTICAL static config (spp is static in
        # the jitted chunk, so a different-spp warm-up would not prime the
        # compile cache and the timed run would include ~25 s of compilation)
        render_image_wavefront(scene, settings, **kw)
        t0 = time.time()
        _, rays = render_image_wavefront(scene, settings, **kw)
        dt = time.time() - t0
    else:
        warm = film_mod.new_film(settings)
        warm = film_mod.add_samples(scene, settings, warm, 1, pixel_chunk=args.pixel_chunk, accel=accel)
        film = film_mod.new_film(settings)
        t0 = time.time()
        film = film_mod.add_samples(
            scene, settings, film, spp, pixel_chunk=args.pixel_chunk, accel=accel
        )
        dt = time.time() - t0
        rays = film.rays_traced
    mrays = rays / dt / 1e6
    label = (
        f"{scene_name} {n_tris // 1000}k tris {size}^2 spp={spp} depth={depth}, "
        f"{args.intersector} intersector, {args.renderer}"
        + (", nee" if nee else "")
        + (", f16-readback" if args.readback_f16 else "")
    )
    return mrays, label


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
        "--intersector",
        choices=["fused2", "fused2-bf16", "fused", "cluster", "bvh", "brute"],
        default="fused2-bf16",
        help="fused2-bf16 (default) = fat-cluster pipelined Pallas traversal "
             "with bfloat16 triangle planes -- BIT-IDENTICAL hardware images "
             "to fused2 (the TPU f32 matmul already rounds identically; "
             "docs/PERF.md bf16_quality probe) at half the plane DMA; "
             "fused2 = f32 planes (CPU-exact mode the tests pin)",
    )
    ap.add_argument("--pixel-chunk", type=int, default=65536)
    ap.add_argument("--renderer", choices=["wavefront", "scan"], default="wavefront")
    ap.add_argument("--lanes", type=int, default=131072)
    ap.add_argument("--iters-per-launch", type=int, default=32)
    ap.add_argument(
        "--fused2-block", type=int, default=256,
        help="rays per fused2 kernel block (256 best measured; 128 for very incoherent loads)",
    )
    ap.add_argument("--no-sort", action="store_true",
                    help="disable the per-wave coherence sort (measured 1.7x "
                         "slower on the honest config; tools/tpu_probe4.py)")
    ap.add_argument("--nee", action="store_true",
                    help="bench the NEE+MIS estimator (doubles traversal with "
                         "any-hit shadow rays)")
    ap.add_argument("--fused-nee", dest="fused_nee", action="store_true",
                    default=False,
                    help="trace NEE shadow rays inside the deferred mixed "
                         "kernel sweep (measured 26%% slower than the default "
                         "separate any-hit sweep on cornell NEE -- kept as an "
                         "A/B knob; docs/PERF.md round 4)")
    ap.add_argument("--no-trend", action="store_true",
                    help="skip the frozen secondary trend config")
    ap.add_argument(
        "--no-readback-f16", dest="readback_f16", action="store_false",
        help="read the film back at full f32 precision (the default f16 "
             "readback is display-only lossy; it halves the ~490 ms relay "
             "readback and does not affect on-device accumulation)",
    )
    ap.add_argument("--quick", action="store_true", help="256^2, spp=2, sub=6 smoke config")
    args = ap.parse_args()
    if args.quick:
        args.size, args.spp, args.dragon_sub = 256, 2, 6
        args.no_trend = True

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent / "assets"))
    import generate

    scene_name = args.scene
    if args.scene == "dragon":
        scene_name = generate.ensure_dragon(args.dragon_sub)
    else:
        generate.ensure_assets()

    # frozen trend config: NEVER change these numbers (round-over-round line)
    if not args.no_trend and args.scene == "dragon":
        import copy

        trend_scene = generate.ensure_dragon(6)
        targs = copy.copy(args)
        targs.intersector = "fused2"  # frozen: f32, regardless of the default
        t_mrays, t_label = run_config(targs, trend_scene, 512, 4, args.depth)
        print(json.dumps({
            "metric": f"trend Mrays/s (frozen: {t_label})",
            "value": round(t_mrays, 3),
            "unit": "Mrays/s",
            "vs_baseline": round(t_mrays / 50.0, 4),
        }), flush=True)

    mrays, label = run_config(
        args, scene_name, args.size, args.spp, args.depth, nee=args.nee
    )
    print(
        json.dumps(
            {
                "metric": f"fwd Mrays/s ({label})",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / 50.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
