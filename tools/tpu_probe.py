"""One-shot TPU performance probe. Run stages individually to survive a flaky
tunnel:  python tools/tpu_probe.py <stage>

Stages: health, gather, wave, render, sweep
Every print is flushed; every measurement forces completion via host readback.
"""
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def sync_min(f, n=3):
    f()
    ts = []
    for _ in range(n):
        t0 = time.time()
        f()
        ts.append(time.time() - t0)
    return min(ts)


def stage_health():
    import jax, jax.numpy as jnp

    t0 = time.time()
    print(jax.devices(), f"{time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    print(float(jnp.sum(jnp.ones((128, 128)))), f"{time.time()-t0:.1f}s", flush=True)


def stage_gather():
    import jax, jax.numpy as jnp

    N, K, W = 65536, 1024, 1152
    r = np.random.default_rng(0)
    idx = jnp.asarray(r.integers(0, K, N).astype(np.int32))
    idx_s = jnp.sort(idx)
    tab = jnp.asarray(r.random((K, W), np.float32))
    g = jax.jit(lambda i: jnp.sum(tab[i]))
    print(f"gather random: {sync_min(lambda: float(g(idx)))*1e3:.1f} ms", flush=True)
    print(f"gather sorted: {sync_min(lambda: float(g(idx_s)))*1e3:.1f} ms", flush=True)

    @jax.jit
    def sgu(i):
        perm = jnp.argsort(i)
        out = tab[i[perm]]
        return jnp.sum(out)

    print(f"argsort+sorted gather: {sync_min(lambda: float(sgu(idx)))*1e3:.1f} ms", flush=True)


def stage_wave():
    import jax, jax.numpy as jnp
    from owl_path_tracer_tpu.ops import cluster as cl
    from owl_path_tracer_tpu.models.scene import compile_scene
    from owl_path_tracer_tpu.render import film as film_mod

    scene = compile_scene("assets", "dragon", (512, 512))
    cb = film_mod.make_accel(scene, "cluster", cluster_size=128)
    N = 65536
    r = np.random.default_rng(0)
    o = jnp.asarray(np.tile(np.asarray([[3, 1.5, 0]], np.float32), (N, 1)))
    d = r.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    f = lambda: float(jnp.sum(cl.cluster_closest_hit(o, d, cb).t))
    t0 = time.time()
    f()
    print(f"closest_hit compile+run {time.time()-t0:.1f}s", flush=True)
    dt = sync_min(f)
    print(f"closest_hit steady {dt*1e3:.1f} ms -> {N/dt/1e6:.2f} Mrays/s", flush=True)


def stage_render():
    from owl_path_tracer_tpu.models.scene import RenderSettings, compile_scene
    from owl_path_tracer_tpu.render import film as film_mod

    scene = compile_scene("assets", "dragon", (512, 512))
    cb = film_mod.make_accel(scene, "cluster", cluster_size=128)
    s = RenderSettings(width=512, height=512, max_samples=4, max_path_depth=4,
                       environment_auto=True, environment_intensity=1.0)
    warm = film_mod.new_film(s)
    t0 = time.time()
    warm = film_mod.add_samples(scene, s, warm, 1, pixel_chunk=65536, accel=cb)
    print(f"1spp compile+run {time.time()-t0:.1f}s", flush=True)
    f2 = film_mod.new_film(s)
    t0 = time.time()
    f2 = film_mod.add_samples(scene, s, f2, 4, pixel_chunk=65536, accel=cb)
    dt = time.time() - t0
    print(f"4spp steady {dt:.1f}s rays={f2.rays_traced} -> {f2.rays_traced/dt/1e6:.2f} Mrays/s", flush=True)


def stage_sweep():
    import jax, jax.numpy as jnp
    from owl_path_tracer_tpu.ops import cluster as cl
    from owl_path_tracer_tpu.models.scene import compile_scene

    scene = compile_scene("assets", "dragon", (512, 512))
    v = np.asarray(scene.vertices)
    t = np.asarray(scene.tri_idx)
    N = 65536
    r = np.random.default_rng(0)
    o = jnp.asarray(np.tile(np.asarray([[3, 1.5, 0]], np.float32), (N, 1)))
    d = r.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    for cs in (32, 64, 128, 256):
        cb = cl.build_clusters(v, t, cluster_size=cs)
        f = lambda: float(jnp.sum(cl.cluster_closest_hit(o, d, cb).t))
        dt = sync_min(f)
        print(f"CS={cs} K={cb.num_clusters}: {dt*1e3:.1f} ms -> {N/dt/1e6:.2f} Mrays/s", flush=True)


def stage_phaseb():
    """Compare phase-B strategies on one dragon wave. Set OWLPT_PHASE_B
    before launch; this stage just reports which is active + timing."""
    import jax, jax.numpy as jnp
    from owl_path_tracer_tpu.ops import cluster as cl
    from owl_path_tracer_tpu.models.scene import compile_scene

    import os
    print("PHASE_B =", os.environ.get("OWLPT_PHASE_B", cl.DEFAULT_PHASE_B), flush=True)
    scene = compile_scene("assets", "dragon", (512, 512))
    cb = cl.build_clusters(np.asarray(scene.vertices), np.asarray(scene.tri_idx), cluster_size=128)
    N = 65536
    r = np.random.default_rng(0)
    o = jnp.asarray(np.tile(np.asarray([[3, 1.5, 0]], np.float32), (N, 1)))
    d = r.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    f = lambda: float(jnp.sum(cl.cluster_closest_hit(o, d, cb).t))
    t0 = time.time()
    ref = f()
    print(f"compile+run {time.time()-t0:.1f}s sum={ref:.1f}", flush=True)
    dt = sync_min(f)
    print(f"steady {dt*1e3:.1f} ms -> {N/dt/1e6:.2f} Mrays/s", flush=True)




def stage_parts():
    """Decompose cluster_closest_hit cost: single-jit-call variants with
    pieces removed, so the ~33ms relay dispatch floor amortizes."""
    import jax, jax.numpy as jnp
    from owl_path_tracer_tpu.ops import cluster as cl
    from owl_path_tracer_tpu.ops import math as m
    from owl_path_tracer_tpu.models.scene import compile_scene

    cs = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    scene = compile_scene("assets", "dragon", (512, 512))
    cb = cl.build_clusters(np.asarray(scene.vertices), np.asarray(scene.tri_idx), cluster_size=cs)
    N = 65536
    kc = 16
    r = np.random.default_rng(0)
    import jax.numpy as jnp
    o = jnp.asarray(np.tile(np.asarray([[3, 1.5, 0]], np.float32), (N, 1)))
    d = r.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    print(f"CS={cs} K={cb.num_clusters} N={N} kc={kc}", flush=True)

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

    timeit("entries [N,K]", lambda: float(f_entries(o, d)))

    @jax.jit
    def f_topk(o, d):
        e = cl._cluster_entries(o, d, cb, m.T_MIN, m.T_MAX)
        nt, ti = jax.lax.top_k(-e, kc)
        return jnp.sum(nt) + jnp.sum(ti)

    timeit("entries+topk", lambda: float(f_topk(o, d)))

    @jax.jit
    def f_gather_only(o, d):
        e = cl._cluster_entries(o, d, cb, m.T_MIN, m.T_MAX)
        nt, ti = jax.lax.top_k(-e, kc)

        def body(i, acc):
            cid = jax.lax.dynamic_slice_in_dim(ti, i, 1, axis=1)[:, 0]
            blob = cb.tri_planes[cid]
            return acc + jnp.sum(blob, axis=(1, 2))

        return jnp.sum(jax.lax.fori_loop(0, kc, body, jnp.zeros((N,))))

    timeit("+16x blob row-gather only", lambda: float(f_gather_only(o, d)))

    @jax.jit
    def f_mt_onehot(o, d):
        e = cl._cluster_entries(o, d, cb, m.T_MIN, m.T_MAX)
        neg, ti = jax.lax.top_k(-e, kc)
        cand_t = -neg
        best0 = jnp.full((N,), m.T_MAX, jnp.float32)
        state = (best0, jnp.full((N,), -1.0), jnp.zeros((N, 2)))

        def body(i, st):
            best_t, best_tri, best_uv = st
            cur_t = jax.lax.dynamic_slice_in_dim(cand_t, i, 1, axis=1)[:, 0]
            cid = jax.lax.dynamic_slice_in_dim(ti, i, 1, axis=1)[:, 0]
            active = cur_t < best_t
            cid_safe = jnp.where(active, cid, 0)
            c = cb.cluster_size
            pl = cb.tri_planes[cid_safe]
            p0 = jnp.stack([pl[:,0],pl[:,1],pl[:,2]],-1); e1 = jnp.stack([pl[:,3],pl[:,4],pl[:,5]],-1); e2 = jnp.stack([pl[:,6],pl[:,7],pl[:,8]],-1)
            tid = cb.tri_id[cid_safe].astype(jnp.float32)
            dd = d[:, None, :]; oo = o[:, None, :]
            h = jnp.cross(dd, e2)
            det = jnp.sum(e1 * h, axis=-1)
            inv = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
            s = oo - p0
            u = inv * jnp.sum(s * h, axis=-1)
            q = jnp.cross(s, e1)
            v = inv * jnp.sum(dd * q, axis=-1)
            t = inv * jnp.sum(e2 * q, axis=-1)
            ok = (tid >= 0) & (jnp.abs(det) >= 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > m.T_MIN) & (t < best_t[:, None])
            t = jnp.where(ok, t, jnp.inf)
            # one-hot winner selection: no per-ray gathers
            tj = jnp.min(t, axis=-1)
            onehot = t == tj[:, None]
            hit = jnp.isfinite(tj)
            pick = lambda x: jnp.sum(jnp.where(onehot, x, 0.0), axis=-1) / jnp.maximum(jnp.sum(onehot, -1), 1)
            better = active & hit & (tj < best_t)
            best_t = jnp.where(better, tj, best_t)
            best_tri = jnp.where(better, pick(jnp.broadcast_to(tid, t.shape)), best_tri)
            best_uv = jnp.where(better[:, None], jnp.stack([pick(u), pick(v)], -1), best_uv)
            return (best_t, best_tri, best_uv)

        bt, btri, buv = jax.lax.fori_loop(0, kc, body, state)
        return jnp.sum(bt) + jnp.sum(btri) + jnp.sum(buv)

    timeit("full loop, one-hot select", lambda: float(f_mt_onehot(o, d)))

    f_full = jax.jit(lambda o, d: jnp.sum(cl.cluster_closest_hit(o, d, cb).t))
    timeit("full current (overflow=%s)" % cl.DEFAULT_EXACT_OVERFLOW, lambda: float(f_full(o, d)))


if __name__ == "__main__":
    stage = sys.argv[1] if len(sys.argv) > 1 else "health"
    globals()[f"stage_{stage}"]()
