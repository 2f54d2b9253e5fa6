"""Bisect the TPU worker crash: run pipeline stages one at a time.

Usage: python tools/tpu_bisect.py <stage>
  stages: entries topk phaseb closest bounce chunk
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "assets"))

import numpy as np
import jax
import jax.numpy as jnp

import generate

generate.ensure_assets()

from owl_path_tracer_tpu.models.scene import RenderSettings, compile_scene
from owl_path_tracer_tpu.ops import cluster as cl
from owl_path_tracer_tpu.ops import math as m

stage = sys.argv[1] if len(sys.argv) > 1 else "entries"
n = int(sys.argv[2]) if len(sys.argv) > 2 else 131072

scene = compile_scene("assets", "dragon", (256, 256))
import os
CS = int(os.environ.get("OPT_CLUSTER_SIZE", "128"))
BLOCK = int(os.environ.get("OPT_BLOCK", "128"))
MAXS = int(os.environ.get("OPT_MAX_STEPS", "192"))
cb = cl.build_clusters(np.asarray(scene.vertices), np.asarray(scene.tri_idx), cluster_size=CS)
print("clusters:", cb.num_clusters, "cluster_size:", cb.cluster_size, flush=True)

key = jax.random.PRNGKey(0)
ro = jnp.zeros((n, 3), jnp.float32) + jnp.asarray(scene.camera.origin)
rd = jax.random.normal(key, (n, 3))
rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)


def sync(x):
    return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])


if stage == "entries":
    f = jax.jit(lambda o, d: cl._cluster_entries(o, d, cb, m.T_MIN, m.T_MAX))
    print("entries:", sync(f(ro, rd)), flush=True)
elif stage == "topk":
    def g(o, d):
        e = cl._cluster_entries(o, d, cb, m.T_MIN, m.T_MAX)
        nt, ti = jax.lax.top_k(-e, 16)
        return nt
    print("topk:", sync(jax.jit(g)(ro, rd)), flush=True)
elif stage == "phaseb":
    cid = jnp.zeros((n,), jnp.int32)
    bt = jnp.full((n,), m.T_MAX, jnp.float32)
    f = jax.jit(lambda o, d, c, b: cl._intersect_cluster(o, d, cb, c, m.T_MIN, b))
    print("phaseb:", sync(f(ro, rd, cid, bt)), flush=True)
elif stage == "closest":
    f = jax.jit(lambda o, d: cl.cluster_closest_hit(o, d, cb))
    t0 = time.time()
    r = f(ro, rd)
    print("closest:", sync(r.t), time.time() - t0, flush=True)
    t0 = time.time()
    r = f(ro, rd)
    print("closest warm:", sync(r.t), time.time() - t0, flush=True)
elif stage == "bounce":
    from owl_path_tracer_tpu.render import integrator
    from owl_path_tracer_tpu.ops import rng as rng_mod
    from owl_path_tracer_tpu.ops import disney

    settings = RenderSettings(width=256, height=256, max_samples=2, max_path_depth=4,
                              environment_auto=True, environment_intensity=1.0)
    ps = integrator.PathState(
        ray_o=ro, ray_d=rd, result=jnp.zeros((n, 3)), throughput=jnp.ones((n, 3)),
        rng=jnp.zeros((n,), jnp.uint32), alive=jnp.ones((n,), bool),
        prev_lobe=jnp.full((n,), disney.LOBE_NONE, jnp.int32),
        depth=jnp.zeros((n,), jnp.int32), prev_pdf=jnp.zeros((n,), jnp.float32),
    )
    intersect_fn = cl.make_cluster_intersector(cb)
    f = jax.jit(lambda ps: integrator.trace_bounce(scene, settings, ps, intersect_fn, False))
    print("bounce:", sync(f(ps).result), flush=True)
elif stage == "step":
    from owl_path_tracer_tpu.render import wavefront as wf
    from owl_path_tracer_tpu.ops import disney

    settings = RenderSettings(width=256, height=256, max_samples=2, max_path_depth=4,
                              environment_auto=True, environment_intensity=1.0)
    total_work = 256 * 256 * 2
    st = wf.PoolState(
        pixel=jnp.zeros((n,), jnp.int32),
        ray_o=jnp.zeros((n, 3), jnp.float32),
        ray_d=jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3)),
        throughput=jnp.ones((n, 3), jnp.float32),
        result=jnp.zeros((n, 3), jnp.float32),
        rng=jnp.zeros((n,), jnp.uint32),
        alive=jnp.zeros((n,), bool),
        prev_lobe=jnp.full((n,), disney.LOBE_NONE, jnp.int32),
        depth=jnp.zeros((n,), jnp.int32),
        prev_pdf=jnp.zeros((n,), jnp.float32),
        work_counter=jnp.int32(0),
        acc=jnp.zeros((256 * 256, 3), jnp.float32),
        rays=jnp.int32(0),
    )
    intersect_fn = cl.make_cluster_intersector(cb)
    f = jax.jit(lambda st: wf.wavefront_step(scene, settings, st, intersect_fn, False, total_work))
    for i in range(8):
        t0 = time.time()
        st = f(st)
        print("step", i, sync(st.rays), time.time() - t0, flush=True)
elif stage.startswith("scan"):
    from owl_path_tracer_tpu.render.wavefront import render_image_wavefront

    iters = int(stage[4:] or 16)
    settings = RenderSettings(width=256, height=256, max_samples=2, max_path_depth=4,
                              environment_auto=True, environment_intensity=1.0)
    img, rays = render_image_wavefront(scene, settings, accel=cb, lanes=n,
                                       iters_per_launch=iters)
    print("chunk:", img.mean(), rays, flush=True)
elif stage == "chunk":
    from owl_path_tracer_tpu.render.wavefront import render_image_wavefront

    settings = RenderSettings(width=256, height=256, max_samples=2, max_path_depth=4,
                              environment_auto=True, environment_intensity=1.0)
    img, rays = render_image_wavefront(scene, settings, accel=cb, lanes=n)
    print("chunk:", img.mean(), rays, flush=True)
print("OK", flush=True)

if stage == "decomp":
    from owl_path_tracer_tpu.render import integrator, wavefront as wf
    from owl_path_tracer_tpu.ops import disney

    settings = RenderSettings(width=256, height=256, max_samples=2, max_path_depth=4,
                              environment_auto=True, environment_intensity=1.0)
    # realistic primary rays: first wavefront spawn
    total_work = 256 * 256 * 2
    ids = jnp.arange(n, dtype=jnp.int32) % total_work
    pixel_s, o_s, d_s, rng_s = wf._spawn(scene, settings, ids, total_work)
    ps = integrator.PathState(
        ray_o=o_s, ray_d=d_s, result=jnp.zeros((n, 3)), throughput=jnp.ones((n, 3)),
        rng=rng_s, alive=jnp.ones((n,), bool),
        prev_lobe=jnp.full((n,), disney.LOBE_NONE, jnp.int32),
        depth=jnp.zeros((n,), jnp.int32), prev_pdf=jnp.zeros((n,), jnp.float32),
    )
    intersect_fn = cl.make_cluster_intersector(cb)

    def timeit(name, f):
        f()
        ts = []
        for _ in range(3):
            t0 = time.time()
            f()
            ts.append(time.time() - t0)
        print(f"{name}: {min(ts)*1e3:.1f} ms", flush=True)

    f_int = jax.jit(lambda o, d: jnp.sum(intersect_fn(o, d).t))
    timeit("intersect(primary)", lambda: float(f_int(ps.ray_o, ps.ray_d)))

    @jax.jit
    def f_fetch(o, d):
        hit = intersect_fn(o, d)
        pos, gn, sn, mat, mid = integrator._fetch_surface(scene, hit, False)
        return jnp.sum(pos) + jnp.sum(sn) + jnp.sum(mat.base_color)

    timeit("+fetch_surface", lambda: float(f_fetch(ps.ray_o, ps.ray_d)))

    f_bounce = jax.jit(lambda ps: jnp.sum(
        integrator.trace_bounce(scene, settings, ps, intersect_fn, False).result))
    timeit("full trace_bounce", lambda: float(f_bounce(ps)))

    f_step = jax.jit(lambda st: wf.wavefront_step(
        scene, settings, st, intersect_fn, False, total_work).rays)
    st0 = wf.PoolState(
        pixel=pixel_s, ray_o=o_s, ray_d=d_s, throughput=jnp.ones((n, 3)),
        result=jnp.zeros((n, 3)), rng=rng_s, alive=jnp.ones((n,), bool),
        prev_lobe=jnp.full((n,), disney.LOBE_NONE, jnp.int32),
        depth=jnp.zeros((n,), jnp.int32), prev_pdf=jnp.zeros((n,), jnp.float32),
        work_counter=jnp.int32(0), acc=jnp.zeros((256 * 256, 3)), rays=jnp.int32(0),
    )
    timeit("full wavefront_step", lambda: float(f_step(st0)))
    print("OK", flush=True)

if stage == "pdecomp":
    from owl_path_tracer_tpu.render import wavefront as wf

    settings = RenderSettings(width=256, height=256, max_samples=2, max_path_depth=4,
                              environment_auto=True, environment_intensity=1.0)
    total_work = 256 * 256 * 2
    ids = jnp.arange(n, dtype=jnp.int32) % total_work
    _, o_s, d_s, _ = wf._spawn(scene, settings, ids, total_work)
    kc = 16

    def timeit(name, f):
        f()
        ts = []
        for _ in range(3):
            t0 = time.time()
            f()
            ts.append(time.time() - t0)
        print(f"{name}: {min(ts)*1e3:.1f} ms", flush=True)

    @jax.jit
    def f_entries(o, d):
        return jnp.sum(cl._cluster_entries(o, d, cb, m.T_MIN, m.T_MAX))

    timeit("entries", lambda: float(f_entries(o_s, d_s)))

    @jax.jit
    def f_topk(o, d):
        e = cl._cluster_entries(o, d, cb, m.T_MIN, m.T_MAX)
        nt, ti = jax.lax.top_k(-e, kc)
        return jnp.sum(nt)

    timeit("entries+topk", lambda: float(f_topk(o_s, d_s)))

    # candidate count stats
    @jax.jit
    def f_ncand(o, d):
        e = cl._cluster_entries(o, d, cb, m.T_MIN, m.T_MAX)
        nc = jnp.sum(jnp.isfinite(e), axis=-1)
        return jnp.max(nc), jnp.mean(nc.astype(jnp.float32)), jnp.mean((nc > kc).astype(jnp.float32))

    mx, mean, frac = f_ncand(o_s, d_s)
    print(f"candidates: max={int(mx)} mean={float(mean):.1f} frac>kc={float(frac):.3f}", flush=True)

    import os
    f_full = jax.jit(lambda o, d: jnp.sum(cl.cluster_closest_hit(o, d, cb).t))
    timeit(f"full closest (overflow={cl.DEFAULT_EXACT_OVERFLOW})", lambda: float(f_full(o_s, d_s)))
    print("OK", flush=True)

if stage == "kc":
    from owl_path_tracer_tpu.render import wavefront as wf

    settings = RenderSettings(width=256, height=256, max_samples=2, max_path_depth=4,
                              environment_auto=True, environment_intensity=1.0)
    total_work = 256 * 256 * 2
    ids = jnp.arange(n, dtype=jnp.int32) % total_work
    _, o_s, d_s, _ = wf._spawn(scene, settings, ids, total_work)

    def timeit(name, f):
        f()
        ts = []
        for _ in range(3):
            t0 = time.time()
            f()
            ts.append(time.time() - t0)
        print(f"{name}: {min(ts)*1e3:.1f} ms", flush=True)

    ref = None
    for kc in (2, 4, 8, 16):
        f = jax.jit(lambda o, d, kc=kc: cl.cluster_closest_hit(o, d, cb, max_candidates=kc))
        timeit(f"kc={kc}", lambda: float(jnp.sum(f(o_s, d_s).t)))
        r = f(o_s, d_s)
        if ref is None:
            ref = r
        else:
            eq = bool(jnp.all(r.t == ref.t) & jnp.all(r.tri == ref.tri))
            print(f"  kc={kc} bitwise-equal vs kc=2: {eq}", flush=True)
    print("OK", flush=True)

if stage == "fused":
    from owl_path_tracer_tpu.render import wavefront as wf
    from owl_path_tracer_tpu.ops import fused as fu

    settings = RenderSettings(width=256, height=256, max_samples=2, max_path_depth=4,
                              environment_auto=True, environment_intensity=1.0)
    total_work = 256 * 256 * 2
    ids = jnp.arange(n, dtype=jnp.int32) % total_work
    _, o_s, d_s, _ = wf._spawn(scene, settings, ids, total_work)
    fb = fu.build_fused(cb)

    def timeit(name, f):
        t0 = time.time(); f(); print(f"  ({name} first: {time.time()-t0:.1f}s)", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.time()
            f()
            ts.append(time.time() - t0)
        print(f"{name}: {min(ts)*1e3:.1f} ms", flush=True)

    f_ref = jax.jit(lambda o, d: cl.cluster_closest_hit(o, d, cb))
    f_new = jax.jit(lambda o, d: fu.fused_closest_hit(o, d, fb, block=BLOCK, max_steps=MAXS))
    timeit("xla cluster", lambda: float(jnp.sum(f_ref(o_s, d_s).t)))
    timeit("fused pallas", lambda: float(jnp.sum(f_new(o_s, d_s).t)))
    r = f_ref(o_s, d_s); g = f_new(o_s, d_s)
    print("tri match:", float(jnp.mean((r.tri == g.tri).astype(jnp.float32))),
          "t close:", bool(jnp.allclose(r.t, g.t, rtol=1e-6, atol=1e-6)), flush=True)
    # steps/resolution stats
    out = fu.fused_traverse(o_s, d_s, m.T_MAX, fb, block=BLOCK, max_steps=MAXS)
    print("mean steps:", float(jnp.mean(out[:, 6])), "max steps:", float(jnp.max(out[:, 6])),
          "resolved:", float(jnp.mean(out[:, 5])), flush=True)
    print("OK", flush=True)
