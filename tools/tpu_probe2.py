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


def _chained_wave_ms(fn_wave, o, d, reps=6):
    """Device-side per-wave ms: (time of `reps` chained waves - 1 wave)/(reps-1)."""
    import jax
    import jax.numpy as jnp

    def chained(length):
        @jax.jit
        def run(o, d):
            def body(carry, _):
                o, d = carry
                s = fn_wave(o, d)
                return (o + s * 0.0, d), None

            (o2, _), _ = jax.lax.scan(body, (o, d), None, length=length)
            return o2

        return run

    r1, rN = chained(1), chained(reps)
    sync(r1(o, d)); sync(rN(o, d))
    dt1 = timeit(lambda: sync(r1(o, d)))
    dtN = timeit(lambda: sync(rN(o, d)))
    return (dtN - dt1) / (reps - 1) * 1e3


def probe_sweep(args):
    import jax.numpy as jnp

    from owl_path_tracer_tpu.ops import fused2 as f2

    scene, settings = load(args.sub)
    o_p, d_p = make_rays(scene, args.n, "primary")
    o_b, d_b = make_rays(scene, args.n, "bounce")
    for c in (512, 1024):
        fb = f2.build_fused2_scene(scene, cluster_size=c)
        for block in (128, 256, 512):
            for kind, (o, d) in (("primary", (o_p, d_p)), ("bounce", (o_b, d_b))):
                for sort in ((False,) if kind == "primary" else (True,)):
                    def wave(o, d, _fb=fb, _block=block, _sort=sort):
                        rec, _ = f2.fused2_closest_hit(
                            o, d, _fb, block=_block, sort=_sort)
                        return jnp.sum(rec.t)

                    ms = _chained_wave_ms(wave, o, d)
                    print(json.dumps({
                        "probe": "sweep", "c": c, "block": block, "kind": kind,
                        "sort": sort, "k": fb.num_clusters,
                        "ms_per_wave": round(ms, 2),
                        "mrays_device": round(args.n / ms / 1e3, 2),
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
    """Steady-state wavefront step decomposition: full step vs sort on/off vs
    a null intersector (isolates shade+regen+film-scatter cost)."""
    import jax.numpy as jnp

    from owl_path_tracer_tpu.ops import fused2 as f2
    from owl_path_tracer_tpu.ops.intersect import HitRecord
    from owl_path_tracer_tpu.render import integrator as integ
    from owl_path_tracer_tpu.render import wavefront as wf

    scene, settings = load(args.sub)
    fb = f2.build_fused2_scene(scene, cluster_size=args.c)
    lanes = args.n
    total = settings.width * settings.height * settings.max_samples
    st = wf.new_pool(settings, lanes)
    for _ in range(2):
        st, _ = wf._run_chunk(scene, settings, st, fb, False, jnp.int32(total), 8, None, None)
    sync(st.acc)
    iters = 8

    import jax
    from functools import partial

    def make_chunk(intersect_fn):
        @jax.jit
        def run_chunk(st):
            def body(st, _):
                return wf.wavefront_step(
                    scene, settings, st, intersect_fn, False, jnp.int32(total),
                ), None

            st, _ = jax.lax.scan(body, st, None, length=iters)
            return st

        return run_chunk

    wb = args.wave_block
    variants = {
        "sorted": lambda o, d: f2.fused2_closest_hit(o, d, fb, sort=True, block=wb),
        "unsorted": lambda o, d: f2.fused2_closest_hit(o, d, fb, sort=False, block=wb),
        "null": lambda o, d: (
            HitRecord(
                t=jnp.full(o.shape[:1], 2.0), tri=jnp.zeros(o.shape[:1], jnp.int32),
                uv=jnp.full(o.shape[:1] + (2,), 0.3),
            ),
            jnp.broadcast_to(fb.attr_table[0][:16], o.shape[:1] + (16,)),
        ),
    }
    for name, isect in variants.items():
        run = make_chunk(isect)
        sync(run(st).acc)
        dt = timeit(lambda: sync(run(st).acc))
        s2 = run(st)
        rays = int(s2.rays) - int(st.rays)
        print(json.dumps({
            "probe": "wavestep", "variant": name, "c": args.c, "lanes": lanes,
            "step_ms": round(dt / iters * 1e3, 2),
            "mrays_render": round(rays / dt / 1e6, 2),
        }), flush=True)

    # strided-film pool (scatter-free banking) at steady state
    p_slots = total // lanes // settings.max_samples
    st2 = wf.new_pool(settings, lanes, strided_pixels=p_slots)
    for _ in range(2):
        st2, _ = wf._run_chunk(scene, settings, st2, fb, False, jnp.int32(total), 8, None, None)
    sync(st2.acc)
    run = make_chunk(variants["unsorted"])
    run2 = jax.jit(lambda st: run(st))
    sync(run2(st2).acc)
    dt = timeit(lambda: sync(run2(st2).acc))
    s2 = run2(st2)
    rays = int(s2.rays) - int(st2.rays)
    print(json.dumps({
        "probe": "wavestep", "variant": "unsorted-strided", "c": args.c,
        "lanes": lanes,
        "step_ms": round(dt / iters * 1e3, 2),
        "mrays_render": round(rays / dt / 1e6, 2),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["traverse", "traverse8", "sweep", "sort", "wavestep", "xla", "bank", "scatter"])
    ap.add_argument("--sub", type=int, default=7)
    ap.add_argument("--c", type=int, default=512)
    ap.add_argument("--block", type=int, default=128)
    ap.add_argument("--n", type=int, default=131072)
    ap.add_argument("--max-steps", type=int, default=512)
    ap.add_argument("--wave-block", type=int, default=128)
    args = ap.parse_args()
    dict(traverse=probe_traverse, traverse8=probe_traverse8, sweep=probe_sweep,
         sort=probe_sort, wavestep=probe_wavestep, xla=probe_xla, bank=probe_bank, scatter=probe_scatter)[args.cmd](args)




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




def probe_xla(args):
    """Micro-costs of the non-traversal step ops (film scatter, disney sample,
    spawn, cumsum) at wave size n."""
    import jax
    import jax.numpy as jnp

    from owl_path_tracer_tpu.models.camera import primary_rays
    from owl_path_tracer_tpu.ops import disney
    from owl_path_tracer_tpu.ops import rng as rng_mod

    scene, settings = load(args.sub)
    n = args.n
    r = np.random.default_rng(0)
    pixel = jnp.asarray(r.integers(0, 1024 * 1024, n).astype(np.int32))
    res = jnp.asarray(r.uniform(0, 1, (n, 3)).astype(np.float32))
    acc0 = jnp.zeros((1024 * 1024, 3), jnp.float32)

    def rep(fn, *xs):
        def chained(length):
            @jax.jit
            def run(*xs):
                def body(c, _):
                    out = fn(*c)
                    bump = 0.0 * jnp.sum(out)
                    return tuple(
                        x + bump.astype(x.dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x
                        for x in c
                    ), None

                c, _ = jax.lax.scan(body, xs, None, length=length)
                return c[0]

            return run

        r1, r8 = chained(1), chained(8)
        sync(r1(*xs)); sync(r8(*xs))
        d1 = timeit(lambda: sync(r1(*xs)))
        d8 = timeit(lambda: sync(r8(*xs)))
        return (d8 - d1) / 7 * 1e3

    ms = rep(lambda acc, px, res: acc.at[px].add(res), acc0, pixel, res)
    print(json.dumps({"probe": "xla", "op": "film_scatter_add", "ms": round(ms, 2)}), flush=True)

    st0 = jnp.asarray(r.integers(0, 2**31, n).astype(np.uint32))
    from owl_path_tracer_tpu.models.material import Materials

    mats = jax.tree.map(lambda x: jnp.broadcast_to(x[0], (n,) + x.shape[1:]), scene.materials)
    wo = jnp.asarray(r.normal(size=(n, 3)).astype(np.float32))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    lobe = jnp.zeros((n,), jnp.int32)

    ms = rep(lambda wo, st: disney.sample(mats, wo, st, lobe).f, wo, st0)
    print(json.dumps({"probe": "xla", "op": "disney_sample", "ms": round(ms, 2)}), flush=True)

    ids = jnp.asarray(np.arange(n, dtype=np.int32))

    def spawn(ids, st):
        spp = 64
        px = (ids // spp) % 1024
        py = (ids // spp) // 1024
        s = rng_mod.seed(ids.astype(jnp.uint32), (ids % spp).astype(jnp.uint32))
        j0, s = rng_mod.next_f32(s)
        j1, s = rng_mod.next_f32(s)
        o, d = primary_rays(scene.camera, jnp.stack([px, py], -1), jnp.stack([j0, j1], -1), (1024, 1024))
        return o + d

    ms = rep(spawn, ids, st0)
    print(json.dumps({"probe": "xla", "op": "spawn", "ms": round(ms, 2)}), flush=True)

    alive = jnp.asarray(r.integers(0, 2, n).astype(bool))
    ms = rep(lambda a: jnp.cumsum(a.astype(jnp.int32)), alive)
    print(json.dumps({"probe": "xla", "op": "cumsum", "ms": round(ms, 2)}), flush=True)

    keys = jnp.asarray(r.integers(0, 2**20, n).astype(np.int32))
    ms = rep(lambda k: jnp.argsort(k, stable=True), keys)
    print(json.dumps({"probe": "xla", "op": "argsort", "ms": round(ms, 2)}), flush=True)




def probe_bank(args):
    """Isolate the strided-film banking expression vs scatter-add."""
    import jax
    import jax.numpy as jnp

    n = args.n
    r = np.random.default_rng(0)
    slot = jnp.asarray(r.integers(0, 8, n).astype(np.int32))
    res = jnp.asarray(r.uniform(0, 1, (n, 3)).astype(np.float32))
    done = jnp.asarray(r.integers(0, 2, n).astype(bool))
    acc3 = jnp.zeros((8, 3, n), jnp.float32)
    accL = jnp.zeros((n, 8, 3), jnp.float32)

    def rep(fn, *xs):
        def chained(length):
            @jax.jit
            def run(*xs):
                def body(c, _):
                    out = fn(*c)
                    bump = 0.0 * jnp.sum(out)
                    return tuple(
                        x + bump.astype(x.dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x
                        for x in c
                    ), None

                c, _ = jax.lax.scan(body, xs, None, length=length)
                return c[0]

            return run

        r1, r8 = chained(1), chained(8)
        sync(r1(*xs)); sync(r8(*xs))
        d1 = timeit(lambda: sync(r1(*xs)))
        d8 = timeit(lambda: sync(r8(*xs)))
        return (d8 - d1) / 7 * 1e3

    def bank3(acc, slot, res, done):
        onehot = jnp.arange(8, dtype=jnp.int32)[:, None] == slot[None, :]
        contrib = jnp.where(done[:, None], res, 0.0).T
        return acc + jnp.where(onehot[:, None, :], contrib[None, :, :], 0.0)

    ms = rep(bank3, acc3, slot, res, done)
    print(json.dumps({"probe": "bank", "op": "bank_P3L", "ms": round(ms, 2)}), flush=True)

    def bankL(acc, slot, res, done):
        onehot = jnp.arange(8, dtype=jnp.int32)[None, :] == slot[:, None]
        contrib = jnp.where(done[:, None], res, 0.0)
        return acc + onehot[:, :, None] * contrib[:, None, :]

    ms = rep(bankL, accL, slot, res, done)
    print(json.dumps({"probe": "bank", "op": "bank_LP3", "ms": round(ms, 2)}), flush=True)

    ms = rep(lambda res: res.T + 0.0, res)
    print(json.dumps({"probe": "bank", "op": "transpose_N3", "ms": round(ms, 2)}), flush=True)

    def bank_flat(accf, slot, res, done):
        # [24, L]: row = slot*3 + channel; three masked row-adds
        contrib = jnp.where(done[:, None], res, 0.0).T  # [3,L]
        rows = jnp.arange(24, dtype=jnp.int32)[:, None]  # [24,1]
        sel = rows == (slot[None, :] * 3 + 0)
        out = accf + jnp.where(sel, contrib[0:1, :], 0.0)
        sel = rows == (slot[None, :] * 3 + 1)
        out = out + jnp.where(sel, contrib[1:2, :], 0.0)
        sel = rows == (slot[None, :] * 3 + 2)
        out = out + jnp.where(sel, contrib[2:3, :], 0.0)
        return out

    accf = jnp.zeros((24, n), jnp.float32)
    ms = rep(bank_flat, accf, slot, res, done)
    print(json.dumps({"probe": "bank", "op": "bank_24L", "ms": round(ms, 2)}), flush=True)




def probe_scatter(args):
    """Film scatter-add variants: random vs sorted indices (+XLA hint)."""
    import jax
    import jax.numpy as jnp

    n = args.n
    r = np.random.default_rng(0)
    pix_rand = jnp.asarray(r.integers(0, 1024 * 1024, n).astype(np.int32))
    pix_sorted = jnp.sort(pix_rand)
    res = jnp.asarray(r.uniform(0, 1, (n, 3)).astype(np.float32))
    acc0 = jnp.zeros((1024 * 1024, 3), jnp.float32)

    def rep(fn, *xs):
        def chained(length):
            @jax.jit
            def run(*xs):
                def body(c, _):
                    out = fn(*c)
                    bump = 0.0 * jnp.sum(out)
                    return tuple(
                        x + bump.astype(x.dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x
                        for x in c
                    ), None

                c, _ = jax.lax.scan(body, xs, None, length=length)
                return c[0]

            return run

        r1, r8 = chained(1), chained(8)
        sync(r1(*xs)); sync(r8(*xs))
        d1 = timeit(lambda: sync(r1(*xs)))
        d8 = timeit(lambda: sync(r8(*xs)))
        return (d8 - d1) / 7 * 1e3

    ms = rep(lambda a, p, v: a.at[p].add(v), acc0, pix_rand, res)
    print(json.dumps({"probe": "scatter", "op": "random", "ms": round(ms, 2)}), flush=True)
    ms = rep(lambda a, p, v: a.at[p].add(v), acc0, pix_sorted, res)
    print(json.dumps({"probe": "scatter", "op": "sorted_noflag", "ms": round(ms, 2)}), flush=True)
    ms = rep(lambda a, p, v: a.at[p].add(v, indices_are_sorted=True), acc0, pix_sorted, res)
    print(json.dumps({"probe": "scatter", "op": "sorted_flag", "ms": round(ms, 2)}), flush=True)
    ms = rep(lambda a, p, v: a.at[p].add(v, indices_are_sorted=True, unique_indices=True),
             acc0, jnp.arange(n, dtype=jnp.int32) * 7, res)
    print(json.dumps({"probe": "scatter", "op": "sorted_unique_flag", "ms": round(ms, 2)}), flush=True)


if __name__ == "__main__":
    main()
