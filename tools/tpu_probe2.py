"""Round-2 hardware probes for the fused2 traversal (run on the real TPU).

Each probe prints one JSON line; timings are min-of-repeats with a forced
host readback (the axon relay's block_until_ready does not block).

Usage:
  python tools/tpu_probe2.py traverse [--sub 7] [--c 512] [--block 128] [--n 131072]
  python tools/tpu_probe2.py sweep     # C x B x sort grid on primary+bounce rays
  python tools/tpu_probe2.py sort      # argsort cost
  python tools/tpu_probe2.py wavestep  # full wavefront step vs pure traversal
"""
import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "assets"))

import numpy as np


def sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(jnp.asarray(x)))


def timeit(fn, repeats=3):
    best = 1e30
    for _ in range(repeats):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def load(sub, size=1024):
    import generate

    name = generate.ensure_dragon(sub)
    from owl_path_tracer_tpu.models.scene import RenderSettings, compile_scene

    scene = compile_scene("assets", name, (size, size))
    settings = RenderSettings(
        width=size, height=size, max_samples=64, max_path_depth=4,
        environment_auto=True, environment_intensity=1.0,
    )
    return scene, settings


def make_rays(scene, n, kind="primary", seed=0):
    """primary: camera rays (coherent in pixel-major order with spp folding);
    bounce: hit points of primaries + cosine-ish random dirs (incoherent)."""
    import jax.numpy as jnp

    from owl_path_tracer_tpu.models.camera import primary_rays
    from owl_path_tracer_tpu.ops import rng as rng_mod

    r = np.random.default_rng(seed)
    spp = 64
    ids = np.arange(n)
    pix = ids // spp
    px = (pix % 1024).astype(np.int32)
    py = (pix // 1024).astype(np.int32)
    jitter = r.uniform(0, 1, (n, 2)).astype(np.float32)
    o, d = primary_rays(
        scene.camera, jnp.asarray(np.stack([px, py], -1)), jnp.asarray(jitter), (1024, 1024)
    )
    if kind == "primary":
        return o, d
    # bounce-like: origins on the scene surface (brute offset along ray),
    # random directions, randomly permuted (worst-case incoherence)
    t = r.uniform(0.5, 3.0, (n, 1)).astype(np.float32)
    o2 = np.asarray(o) + np.asarray(d) * t
    d2 = r.normal(size=(n, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    perm = r.permutation(n)
    return jnp.asarray(o2[perm]), jnp.asarray(d2[perm])


def probe_traverse(args):
    import jax.numpy as jnp

    from owl_path_tracer_tpu.ops import fused2 as f2

    scene, settings = load(args.sub)
    fb = f2.build_fused2_scene(scene, cluster_size=args.c)
    for kind in ("primary", "bounce"):
        o, d = make_rays(scene, args.n, kind)
        for sort in (True, False):
            rec, blob = f2.fused2_closest_hit(
                o, d, fb, sort=sort, block=args.block, max_steps=args.max_steps
            )
            sync(rec.t)  # compile + warm
            dt = timeit(lambda: sync(
                f2.fused2_closest_hit(o, d, fb, sort=sort, block=args.block,
                                      max_steps=args.max_steps)[0].t
            ))
            out = f2.fused2_traverse(
                o, d, jnp.full((args.n,), 1e10, jnp.float32), fb,
                block=args.block, max_steps=args.max_steps)
            steps = np.asarray(out[:, 6])
            print(json.dumps({
                "probe": "traverse", "kind": kind, "sort": sort,
                "c": args.c, "block": args.block, "n": args.n, "sub": args.sub,
                "ms": round(dt * 1e3, 2),
                "mrays": round(args.n / dt / 1e6, 2),
                "mean_clusters_per_ray": round(float(steps.mean()), 2),
                "hit_frac": round(float((np.asarray(rec.tri) >= 0).mean()), 3),
            }), flush=True)


def probe_sweep(args):
    import jax.numpy as jnp

    from owl_path_tracer_tpu.ops import fused2 as f2

    scene, settings = load(args.sub)
    o_p, d_p = make_rays(scene, args.n, "primary")
    o_b, d_b = make_rays(scene, args.n, "bounce")
    for c in (256, 512, 1024):
        fb = f2.build_fused2_scene(scene, cluster_size=c)
        for block in (128, 256):
            for kind, (o, d) in (("primary", (o_p, d_p)), ("bounce", (o_b, d_b))):
                f2.fused2_closest_hit(o, d, fb, block=block)[0].t.block_until_ready()
                sync(f2.fused2_closest_hit(o, d, fb, block=block)[0].t)
                dt = timeit(lambda: sync(f2.fused2_closest_hit(o, d, fb, block=block)[0].t))
                print(json.dumps({
                    "probe": "sweep", "c": c, "block": block, "kind": kind,
                    "k": fb.num_clusters,
                    "ms": round(dt * 1e3, 2), "mrays": round(args.n / dt / 1e6, 2),
                }), flush=True)


def probe_sort(args):
    import jax
    import jax.numpy as jnp

    from owl_path_tracer_tpu.ops import fused2 as f2

    scene, settings = load(args.sub)
    fb = f2.build_fused2_scene(scene, cluster_size=512)
    o, d = make_rays(scene, args.n, "bounce")

    @jax.jit
    def sort_only(o, d):
        keys = f2.ray_sort_keys(o, d, fb.bounds)
        perm = jnp.argsort(keys, stable=True)
        return o[perm], jnp.argsort(perm)

    sync(sort_only(o, d)[0])
    dt = timeit(lambda: sync(sort_only(o, d)[0]))
    print(json.dumps({"probe": "sort", "n": args.n, "ms": round(dt * 1e3, 2)}), flush=True)


def probe_wavestep(args):
    import jax.numpy as jnp

    from owl_path_tracer_tpu.ops import fused2 as f2
    from owl_path_tracer_tpu.render import wavefront as wf
    from owl_path_tracer_tpu.render.film import scene_has_textures

    scene, settings = load(args.sub)
    fb = f2.build_fused2_scene(scene, cluster_size=args.c)
    lanes = args.n
    total = settings.width * settings.height * settings.max_samples
    st = wf.new_pool(settings, lanes)
    # advance a few chunks so the pool is in steady state (mixed depths)
    for _ in range(2):
        st, _ = wf._run_chunk(scene, settings, st, fb, False, jnp.int32(total), 8, None, None)
    sync(st.acc)
    iters = 8

    def run():
        s2, _ = wf._run_chunk(scene, settings, st, fb, False, jnp.int32(total), iters, None, None)
        sync(s2.acc)

    run()
    dt = timeit(run)
    rays0 = int(st.rays)
    s2, _ = wf._run_chunk(scene, settings, st, fb, False, jnp.int32(total), iters, None, None)
    rays = int(s2.rays) - rays0
    # pure traversal on the same pool rays
    o, d = st.ray_o, st.ray_d
    sync(f2.fused2_closest_hit(o, d, fb)[0].t)
    dt_trav = timeit(lambda: sync(f2.fused2_closest_hit(o, d, fb)[0].t))
    print(json.dumps({
        "probe": "wavestep", "c": args.c, "lanes": lanes, "iters": iters,
        "step_ms": round(dt / iters * 1e3, 2),
        "mrays_render": round(rays / dt / 1e6, 2),
        "traversal_ms_per_wave": round(dt_trav * 1e3, 2),
        "traversal_share": round(dt_trav / (dt / iters), 3),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["traverse", "traverse8", "sweep", "sort", "wavestep"])
    ap.add_argument("--sub", type=int, default=7)
    ap.add_argument("--c", type=int, default=512)
    ap.add_argument("--block", type=int, default=128)
    ap.add_argument("--n", type=int, default=131072)
    ap.add_argument("--max-steps", type=int, default=256)
    args = ap.parse_args()
    dict(traverse=probe_traverse, traverse8=probe_traverse8, sweep=probe_sweep,
         sort=probe_sort, wavestep=probe_wavestep)[args.cmd](args)




def probe_traverse8(args):
    """8 chained traversals in ONE jit call: separates the ~33 ms relay
    dispatch floor from true on-device kernel time."""
    import jax
    import jax.numpy as jnp

    from owl_path_tracer_tpu.ops import fused2 as f2

    scene, settings = load(args.sub)
    fb = f2.build_fused2_scene(scene, cluster_size=args.c)
    for kind in ("primary", "bounce"):
        o, d = make_rays(scene, args.n, kind)

        @jax.jit
        def run8(o, d):
            def body(carry, _):
                o, d = carry
                out = f2.fused2_traverse(
                    o, d, jnp.full((args.n,), 1e10, jnp.float32), fb,
                    block=args.block, max_steps=args.max_steps)
                s = jnp.sum(out[:, 0]) * 0.0  # data dependency, value-neutral
                return (o + s, d), None

            (o, d), _ = jax.lax.scan(body, (o, d), None, length=8)
            return o

        @jax.jit
        def run1(o, d):
            out = f2.fused2_traverse(
                o, d, jnp.full((args.n,), 1e10, jnp.float32), fb,
                block=args.block, max_steps=args.max_steps)
            return o + jnp.sum(out[:, 0]) * 0.0

        sync(run8(o, d)); sync(run1(o, d))
        dt8 = timeit(lambda: sync(run8(o, d)))
        dt1 = timeit(lambda: sync(run1(o, d)))
        per_wave = (dt8 - dt1) / 7.0
        print(json.dumps({
            "probe": "traverse8", "kind": kind, "c": args.c, "block": args.block,
            "k": fb.num_clusters,
            "ms_1call": round(dt1 * 1e3, 2), "ms_8call": round(dt8 * 1e3, 2),
            "ms_per_wave": round(per_wave * 1e3, 2),
            "mrays_device": round(args.n / per_wave / 1e6, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
