"""Round-3 frame-time reconciliation: where does a BENCH frame's time go?

VERDICT round 2: bench = 2.75 Mrays/s but the kernel's own steady-state step
implied >= 8 Mrays/s -- 3-5x is unaccounted for.  This probe decomposes ONE
full bench frame (dragon7, 1024^2, spp=64, depth=4, fused2, wavefront) into:

  frame    : per-launch wall times of the real render loop (synced per launch)
             -> steady-state launch time, drain structure, total steps
  step     : chained-scan per-step ms of the jitted wavefront step under
             ablations: full / film=scatter / film=window / null intersector
  traverse : bare fused2 kernel on a captured steady-state pool ray mix

Usage: python tools/tpu_probe4.py [frame|step|all] [--launches 12]
"""
import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "assets"))

import numpy as np

from tpu_probe2 import load, sync, timeit


def bench_setup(sub=7, size=1024, spp=64, depth=4, c=512):
    import dataclasses

    from owl_path_tracer_tpu.ops import fused2 as f2

    scene, settings = load(sub, size=size)
    settings = dataclasses.replace(settings, max_samples=spp, max_path_depth=depth)
    fb = f2.build_fused2_scene(scene, cluster_size=c)
    return scene, settings, fb


def probe_frame(args):
    """Real render loop with a per-launch sync: launch-time series."""
    import jax.numpy as jnp

    from owl_path_tracer_tpu.ops import fused2 as f2
    from owl_path_tracer_tpu.render import wavefront as wf

    if args.o_bits:
        f2.SORT_O_BITS = args.o_bits  # fresh process per ablation (jit cache)
    if args.d_bits is not None:
        f2.SORT_D_BITS = args.d_bits
    if args.refresh:
        f2.REFRESH_CLUSTERS = args.refresh
    scene, settings, fb = bench_setup()
    total_work = settings.width * settings.height * settings.max_samples
    lanes, iters = args.lanes, args.iters
    st = wf.new_pool(settings, lanes)
    # warm-up compile
    st_w, status = wf._run_chunk(
        scene, settings, st, fb, False, jnp.int32(total_work), iters,
        None, None, fused2_block=args.block, film_mode=args.film,
        fused2_sort=args.sort,
    )
    np.asarray(status)
    st = wf.new_pool(settings, lanes)
    times, rays_hist, work_hist, alive_hist = [], [], [], []
    t_frame = time.time()
    for i in range(args.launches if args.launches > 0 else 10000):
        t0 = time.time()
        st, status = wf._run_chunk(
            scene, settings, st, fb, False, jnp.int32(total_work), iters,
            None, None, fused2_block=args.block, film_mode=args.film,
            fused2_sort=args.sort, fused2_fanout=args.fanout,
        )
        s = np.asarray(status)  # sync
        times.append(time.time() - t0)
        if i % 8 == 0 or (s[0] and not s[1]):
            rays_hist.append(int(st.rays))
            work_hist.append(int(st.work_counter))
            alive_hist.append(float(np.asarray(st.alive).mean()))
        if s[0] and not s[1]:
            break
    frame_s = time.time() - t_frame
    times = np.asarray(times)
    print(json.dumps({
        "probe": "frame", "film": args.film, "lanes": lanes,
        "sort": args.sort, "fanout": args.fanout,
        "o_bits": args.o_bits or f2.SORT_O_BITS, "d_bits": f2.SORT_D_BITS,
        "iters_per_launch": iters, "block": args.block,
        "launches": len(times), "frame_s": round(frame_s, 2),
        "rays": int(st.rays),
        "mrays": round(int(st.rays) / frame_s / 1e6, 3),
        "launch_ms_p10": round(float(np.percentile(times, 10)) * 1e3, 1),
        "launch_ms_med": round(float(np.median(times)) * 1e3, 1),
        "launch_ms_p90": round(float(np.percentile(times, 90)) * 1e3, 1),
        "launch_ms_first5": [round(t * 1e3, 1) for t in times[:5]],
        "launch_ms_last5": [round(t * 1e3, 1) for t in times[-5:]],
        "step_ms_med": round(float(np.median(times)) / iters * 1e3, 2),
        "alive_frac_hist": [round(a, 3) for a in alive_hist],
    }), flush=True)


def _steady_pool(scene, settings, fb, lanes, block, film, warm_launches=4):
    """Run a few launches to reach the steady-state ray mix."""
    import jax.numpy as jnp

    from owl_path_tracer_tpu.render import wavefront as wf

    total_work = settings.width * settings.height * settings.max_samples
    st = wf.new_pool(settings, lanes)
    for _ in range(warm_launches):
        st, status = wf._run_chunk(
            scene, settings, st, fb, False, jnp.int32(total_work), 16,
            None, None, fused2_block=block, film_mode=film,
        )
    np.asarray(status)
    return st, total_work


def probe_step(args):
    """Chained per-step ms under ablations, from a steady-state pool."""
    import jax
    import jax.numpy as jnp

    from owl_path_tracer_tpu.ops.intersect import HitRecord
    from owl_path_tracer_tpu.render import wavefront as wf

    scene, settings, fb = bench_setup()
    lanes = args.lanes
    st0, total_work = _steady_pool(scene, settings, fb, lanes, args.block, "auto")

    def null_intersect(o, d):
        n = o.shape[0]
        rec = HitRecord(
            t=jnp.full((n,), 1e10, jnp.float32),
            tri=jnp.full((n,), -1, jnp.int32),
            uv=jnp.zeros((n, 2), jnp.float32),
        )
        return rec, jnp.zeros((n, 16), jnp.float32)

    variants = [
        ("full_auto", "auto", None),
        ("film_scatter", "scatter", None),
        ("null_intersector", "auto", null_intersect),
        ("null_and_scatter", "scatter", null_intersect),
    ]
    from owl_path_tracer_tpu.render import integrator

    for name, film, isect in variants:
        real_isect, _ = integrator.make_intersectors(
            scene, fb, fused2_block=args.block, fused2_sort=args.sort)
        use_isect = isect or real_isect

        # freeze work_counter high so regen keeps happening (steady state)
        def step(st):
            return wf.wavefront_step(
                scene, settings, st, use_isect, False,
                jnp.int32(total_work), film_mode=film,
            )

        def mk(length):
            @jax.jit
            def run(st):
                def body(st, _):
                    return step(st), None

                st, _ = jax.lax.scan(body, st, None, length=length)
                # depend on EVERY carry component so XLA cannot dead-code
                # the film/throughput paths out of the loop
                return (
                    st.rays.astype(jnp.float32)
                    + jnp.sum(st.acc)
                    + jnp.sum(st.result)
                    + jnp.sum(st.throughput)
                    + jnp.sum(st.rng.astype(jnp.float32))
                )

            return run

        r1, rN = mk(1), mk(args.reps)
        sync(r1(st0)); sync(rN(st0))
        d1 = timeit(lambda: sync(r1(st0)))
        dN = timeit(lambda: sync(rN(st0)))
        ms = (dN - d1) / (args.reps - 1) * 1e3
        print(json.dumps({
            "probe": "step", "variant": name, "lanes": lanes,
            "block": args.block, "ms_per_step": round(ms, 2),
            "mrays_implied": round(lanes / (ms / 1e3) / 1e6, 2),
        }), flush=True)


def probe_traverse(args):
    """Bare fused2 kernel on the steady-state pool's actual rays."""
    import jax
    import jax.numpy as jnp

    from owl_path_tracer_tpu.ops import fused2 as f2

    scene, settings, fb = bench_setup()
    st0, _ = _steady_pool(scene, settings, fb, args.lanes, args.block, "auto")
    o = jnp.asarray(np.asarray(st0.ray_o))
    d = jnp.asarray(np.asarray(st0.ray_d))
    tmax = jnp.full((args.lanes,), 1e10, jnp.float32)

    for with_attrs in (True, False):
        def tv(o, d, _wa=with_attrs):
            out = f2.fused2_traverse(
                o, d, tmax, fb, block=args.block, with_attrs=_wa)
            return jnp.sum(out[:, 0])

        def mk(length):
            @jax.jit
            def run(o, d):
                def body(carry, _):
                    o, d = carry
                    s = tv(o, d)
                    return (o + s * 0.0, d), None

                (o2, _), _ = jax.lax.scan(body, (o, d), None, length=length)
                return o2

            return run

        r1, rN = mk(1), mk(args.reps)
        sync(r1(o, d)); sync(rN(o, d))
        d1 = timeit(lambda: sync(r1(o, d)))
        dN = timeit(lambda: sync(rN(o, d)))
        ms = (dN - d1) / (args.reps - 1) * 1e3
        out = f2.fused2_traverse(o, d, tmax, fb, block=args.block, with_attrs=with_attrs)
        iters = float(np.asarray(out[:, 6]).mean())
        print(json.dumps({
            "probe": "traverse_pool", "with_attrs": with_attrs,
            "lanes": args.lanes, "block": args.block,
            "ms": round(ms, 2), "mean_block_iters": round(iters, 2),
            "mrays_implied": round(args.lanes / (ms / 1e3) / 1e6, 2),
        }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("what", nargs="?", default="all",
                    choices=["frame", "step", "traverse", "all"])
    ap.add_argument("--lanes", type=int, default=131072)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--block", type=int, default=256)
    ap.add_argument("--film", default="auto")
    ap.add_argument("--sort", action="store_true")
    ap.add_argument("--fanout", type=int, default=None)
    ap.add_argument("--launches", type=int, default=0, help="0 = run to completion")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--o-bits", type=int, default=0, help="sort-key origin Morton bits/axis (0 = default)")
    ap.add_argument("--d-bits", type=int, default=None, help="sort-key direction bits/axis")
    ap.add_argument("--refresh", type=int, default=0, help="frontier refresh interval in clusters (0 = default)")
    args = ap.parse_args()

    if args.what in ("step", "all"):
        probe_step(args)
    if args.what in ("traverse", "all"):
        probe_traverse(args)
    if args.what in ("frame", "all"):
        probe_frame(args)


if __name__ == "__main__":
    main()
