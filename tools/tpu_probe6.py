"""Round-4 retirement-loop latency decomposition (VERDICT r3 #1).

The fused2 retirement loop measures ~2.5 us per iteration (tools/tpu_probe3,
round 3) while its per-iteration compute (one [B,16]x[16,4C] MXU matmul + a
[B,C*W] VPU winner pass) models at <1 us.  This probe isolates WHERE the
latency lives with self-contained mini-kernels that share the real kernel's
skeleton (phase-A slab -> loop{pick, DMA, matmul, best update}) but ablate
one stage at a time:

  pick_dma_mm   full chain (mirror of production fanout=1, no attrs)
  sched_dma_mm  pick replaced by cid = f(i) (pure scalar index math):
                isolates the VPU->scalar sync cost of the [1,K] min-extract
  sched_mm      + no DMA (intersect a preloaded buffer): isolates DMA cost
  sched_dma     DMA only, no matmul
  pick_only     pick chain alone, no DMA/matmul
  nop_loop      empty fori body: the loop-control floor
  interleaveP   P independent pick+DMA+mm chains per iteration, each with its
                own frontier row and DMA buffer (sub-block software
                pipelining candidate; trip count iters/P so total picks match)

All variants run a FIXED fori trip count; per-iteration cost = the slope of
wave time over iters.  No correctness intent -- results are summed only to
defeat DCE.

Usage: python tools/tpu_probe6.py [--sub 7] [--variants ...] [--b 256]
"""
import argparse
import json
import pathlib
import sys
from functools import partial

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "assets"))

import numpy as np

from tpu_probe2 import load, make_rays, sync, timeit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sub", type=int, default=7)
    ap.add_argument("--c", type=int, default=512)
    ap.add_argument("--n", type=int, default=131072)
    ap.add_argument("--b", type=int, default=256)
    ap.add_argument("--kind", default="bounce")
    ap.add_argument("--variants", default="nop_loop,pick_only,sched_mm,sched_dma,sched_dma_mm,pick_dma_mm,interleave2,interleave4")
    ap.add_argument("--iters", default="0,8,16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from owl_path_tracer_tpu.ops import fused2 as f2
    from owl_path_tracer_tpu.ops import math as m

    scene, settings = load(args.sub)
    fb = f2.build_fused2_scene(scene, cluster_size=args.c)
    o, d = make_rays(scene, args.n, args.kind)
    tmax = jnp.full((args.n,), 1e10, jnp.float32)
    k, c = fb.num_clusters, fb.cluster_size
    gc = 4 * c
    planes_bf16 = fb.planes.astype(jnp.bfloat16)

    def mini_kernel(b, trips, do_pick, do_dma, do_mm, P, bf16, recip,
                    rays_ref, boxes_ref, planes_ref, out_ref,
                    bent_ref, buf_ref, best_ref, sem):
        rays = rays_ref[0]
        ox, oy, oz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]
        dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
        tmx = rays[:, 6:7]
        mx = oy * dz - oz * dy
        my = oz * dx - ox * dz
        mz = ox * dy - oy * dx
        rfeat = jnp.concatenate(
            [dx, dy, dz, mx, my, mz, ox, oy, oz,
             jnp.ones((b, 1), jnp.float32), jnp.zeros((b, 6), jnp.float32)],
            axis=1)

        def inv(dc):
            return 1.0 / jnp.where(jnp.abs(dc) < 1e-12,
                                   jnp.where(dc < 0, -1e-12, 1e-12), dc)

        ix, iy, iz = inv(dx), inv(dy), inv(dz)
        # phase A (same shape of work as production)
        tn = jnp.full((b, k), -jnp.inf, jnp.float32)
        tf = jnp.full((b, k), jnp.inf, jnp.float32)
        for a, (ia, oa) in enumerate(((ix, ox), (iy, oy), (iz, oz))):
            bmin = boxes_ref[a:a + 1, :]
            bmax = boxes_ref[3 + a:4 + a, :]
            oi = oa * ia
            t0 = ia * bmin - oi
            t1 = ia * bmax - oi
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        t_enter = jnp.maximum(tn, m.T_MIN)
        need = (t_enter <= jnp.minimum(tf, tmx))
        front = jnp.min(jnp.where(need, t_enter, jnp.inf), axis=0, keepdims=True)
        for p in range(P):
            bent_ref[p:p + 1, :] = front

        best_ref[:, 0:1] = tmx
        best_ref[:, 1:16] = jnp.zeros((b, 15), jnp.float32)
        col_k1 = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

        def chain(p, i):
            """One pick+DMA+mm chain with its own frontier row + buffers."""
            if do_pick:
                bent = bent_ref[p:p + 1, :]
                mn = jnp.min(bent)
                cid = jnp.min(jnp.where(bent == mn, col_k1, k - 1))
                bent_ref[p:p + 1, :] = jnp.where(col_k1 == cid, jnp.inf, bent)
            else:
                cid = jax.lax.rem(i * P + p, k)
            slot = jax.lax.rem(i, 2) if do_dma == "pipe" else 0
            if do_dma != "none":
                pltpu.make_async_copy(
                    planes_ref.at[cid], buf_ref.at[p, slot], sem.at[p, slot]
                ).start()
                pltpu.make_async_copy(
                    planes_ref.at[cid], buf_ref.at[p, slot], sem.at[p, slot]
                ).wait()
            if do_mm:
                pb = buf_ref[p, slot]
                rf = rfeat.astype(jnp.bfloat16) if bf16 else rfeat
                out4 = jnp.dot(rf, pb, preferred_element_type=jnp.float32)
                det = out4[:, 0:c]
                sgn = jnp.where(det < 0.0, -1.0, 1.0)
                dd = det * sgn
                ua = out4[:, c:2 * c] * sgn
                vb = out4[:, 2 * c:3 * c] * sgn
                tcd = out4[:, 3 * c:4 * c] * sgn
                ok = ((dd >= 1e-12) & (ua >= 0.0) & (vb >= 0.0)
                      & (ua + vb <= dd) & (tcd > dd * m.T_MIN)
                      & (tcd < dd * best_ref[:, 0:1]))
                dd_safe = jnp.where(dd < 1e-12, 1.0, dd)
                if recip:
                    t = jnp.where(ok, tcd * pl.reciprocal(dd_safe, approx=True), jnp.inf)
                else:
                    t = jnp.where(ok, tcd / dd_safe, jnp.inf)
                tc = jnp.min(t, axis=-1, keepdims=True)
                better = tc < best_ref[:, 0:1]
                best_ref[:, 0:1] = jnp.where(better, tc, best_ref[:, 0:1])

        def body(i, carry):
            for p in range(P):
                chain(p, i)
            return carry

        jax.lax.fori_loop(0, trips, body, 0)
        out_ref[0, :, :] = best_ref[:, :]

    def run_variant(name, iters):
        P = 1
        do_pick, do_dma, do_mm = False, "none", False
        bf16 = recip = False
        if name == "nop_loop":
            pass
        elif name == "pick_only":
            do_pick = True
        elif name == "sched_mm":
            do_mm = True
        elif name == "sched_mm_bf16":
            do_mm = bf16 = True
        elif name == "sched_mm_recip":
            do_mm = recip = True
        elif name == "sched_dma":
            do_dma = "sync"
        elif name == "sched_dma_bf16":
            do_dma, bf16 = "sync", True
        elif name == "sched_dma_mm":
            do_dma, do_mm = "sync", True
        elif name == "pick_dma_mm":
            do_pick, do_dma, do_mm = True, "sync", True
        elif name == "pick_dma_mm_bf16":
            do_pick, do_dma, do_mm = True, "sync", True
            bf16 = recip = True
        elif name.startswith("interleave"):
            P = int(name[len("interleave"):])
            do_pick, do_dma, do_mm = True, "sync", True
        else:
            raise ValueError(name)
        b = args.b
        n = args.n
        g = n // b
        trips = max(iters // P, 0)

        planes_in = planes_bf16 if bf16 else fb.planes
        pdtype = jnp.bfloat16 if bf16 else jnp.float32

        @jax.jit
        def tv(o, d):
            rays = f2.pack_rays(o, d, tmax)
            rr = rays.reshape(g, b, 8)
            out = pl.pallas_call(
                partial(mini_kernel, b, trips, do_pick, do_dma, do_mm, P,
                        bf16, recip),
                grid=(g,),
                in_specs=[
                    pl.BlockSpec((1, b, 8), lambda i: (i, 0, 0)),
                    pl.BlockSpec((8, k), lambda i: (0, 0)),
                    pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                ],
                out_specs=pl.BlockSpec((1, b, 16), lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((g, b, 16), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((P, k), jnp.float32),
                    pltpu.VMEM((P, 2, 16, gc), pdtype),
                    pltpu.VMEM((b, 16), jnp.float32),
                    pltpu.SemaphoreType.DMA((P, 2)),
                ],
            )(rr, fb.boxes, planes_in)
            return jnp.sum(out[:, :, 0])

        return tv

    it_list = [int(x) for x in args.iters.split(",")]
    for name in args.variants.split(","):
        times = []
        for iters in it_list:
            tv = run_variant(name, iters)
            sync(tv(o, d))
            ms = timeit(lambda: sync(tv(o, d))) * 1e3
            times.append(ms)
        blocks = args.n // args.b
        span = it_list[-1] - it_list[0]
        slope_us = (times[-1] - times[0]) / max(span, 1) / blocks * 1e3
        print(json.dumps({
            "probe": "latency", "variant": name, "b": args.b, "k": k,
            "kind": args.kind,
            "ms_at": {str(i): round(t, 2) for i, t in zip(it_list, times)},
            "us_per_block_iter": round(slope_us, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
