"""Fused Pallas traversal: phase A + candidate walk in ONE kernel.

FROZEN ABLATION BASELINE -- not on any production path.  Superseded by
ops/fused2.py (fat clusters + MXU Moller-Trumbore + in-loop attribute
replay); kept as the small-cluster ablation point in docs/PERF.md and as a
second independent Pallas implementation the tests cross-check.  Do not
extend.

The XLA cluster intersector (ops/cluster.py) materializes a [N,K] entry
matrix in HBM, top_k's it, then walks a fixed kc=16 candidate columns with a
full [N, C*9] triangle gather per column -- ~190 ms per 131k-ray wave, almost
all of it HBM traffic and fixed-width iteration over mostly-idle lanes
(measured mean candidates/ray is ~1.6).

This kernel keeps the whole traversal on-chip:

  * cluster AABBs ([8,K] planes, ~24 KB) stay **resident in VMEM**; the
    per-block [B,K] entry matrix lives in VMEM scratch and never touches HBM;
  * each iteration retires ONE distinct cluster for the whole block: the
    scalar core picks the minimum needed cluster id, DMAs its 16xC triangle
    plane block HBM->VMEM (~8 KB), and every ray whose entry to that cluster
    is closer than its current best tests its C triangles densely -- the
    block-level dedup that an XLA gather cannot express;
  * the loop is gated by an SMEM done flag, so blocks stop paying VPU work
    the moment every ray is resolved (work ~ union of needed clusters, not a
    fixed kc).

Rays that exhaust MAX_STEPS report resolved=0 and fall back to the exact XLA
intersector (lax.cond -- compiles to nothing when, as virtually always, no
ray overflows).

Same capability as the reference's OptiX hardware traversal (owl::traceRay,
/root/reference/path_tracer/src/device/device.cu:133), re-derived for a
vector machine with explicit DMA.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import math as m
from .cluster import ClusterBVH, cluster_closest_hit
from .intersect import HitRecord

_EPS_DET = 1e-12
BLOCK_RAYS = 128
MAX_STEPS = 192


class FusedBVH(NamedTuple):
    boxes: jnp.ndarray  # [8,K] rows cmin xyz, cmax xyz, 0, 0 -- VMEM resident
    planes: jnp.ndarray  # [K,16,C] rows p0(3) e1(3) e2(3) tid(1) pad(6)
    cluster: ClusterBVH  # exact-fallback + occlusion path

    @property
    def num_clusters(self) -> int:
        return self.boxes.shape[1]

    @property
    def cluster_size(self) -> int:
        return self.planes.shape[2]


def build_fused(cb: ClusterBVH) -> FusedBVH:
    """Re-layout a ClusterBVH for the fused kernel."""
    k = cb.num_clusters
    c = cb.cluster_size
    boxes = np.zeros((8, k), np.float32)
    boxes[0:3] = np.asarray(cb.cmin).T
    boxes[3:6] = np.asarray(cb.cmax).T
    planes = np.zeros((k, 16, c), np.float32)
    planes[:, 0:9] = np.asarray(cb.tri_planes)
    # triangle ids as exact float32 (ids < 2^24; -1 for padding)
    tid = np.asarray(cb.tri_id)
    assert tid.max() < (1 << 24), "tri ids exceed exact f32 range"
    planes[:, 9] = tid.astype(np.float32)
    return FusedBVH(
        boxes=jnp.asarray(boxes), planes=jnp.asarray(planes), cluster=cb
    )


def _kernel(b: int, k: int, c: int, max_steps: int,
            rays_ref, boxes_ref, planes_ref, out_ref,
            entries_ref, clus_ref, best_ref, sem, done_ref):
    rays = rays_ref[0]  # [B,8]
    ox, oy, oz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]  # [B,1]
    dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
    tmax = rays[:, 6:7]

    def inv(dc):
        return 1.0 / jnp.where(
            jnp.abs(dc) < 1e-12, jnp.where(dc < 0, -1e-12, 1e-12), dc
        )

    ix, iy, iz = inv(dx), inv(dy), inv(dz)
    t_min = m.T_MIN

    # ── phase A in VMEM: [B,K] slab entries ──
    tn = jnp.full((b, k), -jnp.inf, jnp.float32)
    tf = jnp.full((b, k), jnp.inf, jnp.float32)
    for a, (ia, oa) in enumerate(((ix, ox), (iy, oy), (iz, oz))):
        bmin = boxes_ref[a : a + 1, :]  # [1,K]
        bmax = boxes_ref[3 + a : 4 + a, :]
        oi = oa * ia  # [B,1]
        t0 = ia * bmin - oi  # [B,K]
        t1 = ia * bmax - oi
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    t_enter = jnp.maximum(tn, t_min)
    hit_box = t_enter <= jnp.minimum(tf, tmax)
    entries_ref[:, :] = jnp.where(hit_box, t_enter, jnp.inf)

    # ── best-hit state in VMEM: cols t,u,v,tri,hit,resolved,steps,pad ──
    zeros = jnp.zeros((b, 1), jnp.float32)
    best_ref[:, 0:1] = tmax
    best_ref[:, 1:2] = zeros
    best_ref[:, 2:3] = zeros
    best_ref[:, 3:4] = zeros - 1.0  # tri = -1
    best_ref[:, 4:5] = zeros  # hit flag
    best_ref[:, 5:6] = zeros + 1.0  # resolved (0 only if MAX_STEPS exhausted)
    best_ref[:, 6:7] = zeros  # steps taken
    done_ref[0] = 0

    col_k = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)
    col_c = jax.lax.broadcasted_iota(jnp.int32, (b, c), 1)

    def body(i, _):
        @pl.when(done_ref[0] == 0)
        def _():
            ent = entries_ref[:, :]  # [B,K]
            best_t = best_ref[:, 0:1]
            mn = jnp.min(ent, axis=-1, keepdims=True)  # [B,1]
            active = mn < best_t
            n_active = jnp.sum(active.astype(jnp.int32))

            @pl.when(n_active == 0)
            def _():
                done_ref[0] = 1

            @pl.when(n_active > 0)
            def _():
                # per-ray nearest candidate id (argmin via iota-min)
                cid = jnp.min(
                    jnp.where((ent == mn) & active, col_k, k), axis=-1, keepdims=True
                )  # [B,1]
                cstar = jnp.min(jnp.where(active, cid, k))  # scalar block pick

                dma = pltpu.make_async_copy(planes_ref.at[cstar], clus_ref, sem)
                dma.start()

                # every ray whose entry to cstar beats its best participates
                # (mask-select: Mosaic forbids dynamic lane-dim slices)
                is_cstar = col_k == cstar  # [B,K]
                e_c = jnp.min(
                    jnp.where(is_cstar, ent, jnp.inf), axis=-1, keepdims=True
                )  # [B,1]
                mine = e_c < best_t

                dma.wait()
                p0x = clus_ref[0:1, :]  # [1,C]
                p0y = clus_ref[1:2, :]
                p0z = clus_ref[2:3, :]
                e1x = clus_ref[3:4, :]
                e1y = clus_ref[4:5, :]
                e1z = clus_ref[5:6, :]
                e2x = clus_ref[6:7, :]
                e2y = clus_ref[7:8, :]
                e2z = clus_ref[8:9, :]
                tid = clus_ref[9:10, :]

                from .intersect import mt_components

                t, u, v, ok = mt_components(
                    (ox, oy, oz), (dx, dy, dz),
                    (p0x, p0y, p0z), (e1x, e1y, e1z), (e2x, e2y, e2z),
                    t_min, best_t,
                )
                ok &= mine & (tid >= 0.0)
                t = jnp.where(ok, t, jnp.inf)
                tc = jnp.min(t, axis=-1, keepdims=True)  # [B,1]
                wcol = jnp.min(
                    jnp.where(t == tc, col_c, c), axis=-1, keepdims=True
                )
                onehot = col_c == wcol
                pick = lambda x: jnp.sum(
                    jnp.where(onehot, x, 0.0), axis=-1, keepdims=True
                )
                better = tc < best_t
                best_ref[:, 0:1] = jnp.where(better, tc, best_t)
                best_ref[:, 1:2] = jnp.where(better, pick(u), best_ref[:, 1:2])
                best_ref[:, 2:3] = jnp.where(better, pick(v), best_ref[:, 2:3])
                best_ref[:, 3:4] = jnp.where(
                    better, pick(jnp.broadcast_to(tid, (b, c))), best_ref[:, 3:4]
                )
                best_ref[:, 4:5] = jnp.where(better, 1.0, best_ref[:, 4:5])
                best_ref[:, 6:7] = best_ref[:, 6:7] + 1.0

                # retire cstar for the whole block
                entries_ref[:, :] = jnp.where(is_cstar, jnp.inf, ent)

        return 0

    jax.lax.fori_loop(0, max_steps, body, 0)

    # unresolved check: any ray still having a nearer candidate than best
    ent = entries_ref[:, :]
    unresolved = jnp.min(ent, axis=-1, keepdims=True) < best_ref[:, 0:1]
    best_ref[:, 5:6] = jnp.where(unresolved, 0.0, best_ref[:, 5:6])
    out_ref[0] = best_ref[:, :]


# pl/pltpu imported lazily so CPU-only users never touch pallas at import
pl = None
pltpu = None


def _ensure_pallas():
    global pl, pltpu
    if pl is None:
        from jax.experimental import pallas as _pl
        from jax.experimental.pallas import tpu as _pltpu

        globals()["pl"] = _pl
        globals()["pltpu"] = _pltpu


@partial(jax.jit, static_argnames=("interpret", "block", "max_steps"))
def fused_traverse(
    ray_o, ray_d, t_max, fb: FusedBVH,
    interpret: bool = False, block: int = BLOCK_RAYS, max_steps: int = MAX_STEPS,
):
    """Raw kernel sweep: [N] rays -> [N,8] (t,u,v,tri,hit,resolved,steps,_)."""
    _ensure_pallas()
    n = ray_o.shape[0]
    k = fb.num_clusters
    c = fb.cluster_size
    assert n % block == 0, (n, block)
    g = n // block

    if jnp.ndim(t_max) == 0:
        t_max = jnp.full((n,), t_max, jnp.float32)
    rays = jnp.concatenate(
        [ray_o, ray_d, t_max[:, None], jnp.zeros((n, 1), jnp.float32)], axis=1
    ).reshape(g, block, 8)

    out = pl.pallas_call(
        partial(_kernel, block, k, c, max_steps),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, block, 8), lambda i: (i, 0, 0)),
            pl.BlockSpec((8, k), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec((1, block, 8), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((g, block, 8), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block, k), jnp.float32),
            pltpu.VMEM((16, c), jnp.float32),
            pltpu.VMEM((block, 8), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )(rays, fb.boxes, fb.planes)
    return out.reshape(n, 8)


@partial(jax.jit, static_argnames=("interpret", "block", "max_steps"))
def fused_closest_hit(
    ray_o, ray_d, fb: FusedBVH,
    t_min: float = m.T_MIN, t_max=m.T_MAX,
    interpret: bool = False, block: int = BLOCK_RAYS, max_steps: int = MAX_STEPS,
) -> HitRecord:
    """Exact closest hit via the fused kernel + XLA fallback for overflow."""
    n = ray_o.shape[0]
    pad = (-n) % block
    t_max_p = t_max
    if pad:
        ray_o_p = jnp.concatenate([ray_o, jnp.zeros((pad, 3), jnp.float32)])
        ray_d_p = jnp.concatenate(
            [ray_d, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (pad, 3))]
        )
        if jnp.ndim(t_max) != 0:
            t_max_p = jnp.concatenate(
                [t_max, jnp.full((pad,), m.T_MIN, jnp.float32)]
            )
    else:
        ray_o_p, ray_d_p = ray_o, ray_d
    out = fused_traverse(
        ray_o_p, ray_d_p, t_max_p, fb,
        interpret=interpret, block=block, max_steps=max_steps,
    )[:n]

    t = out[:, 0]
    hit = out[:, 4] > 0.0
    tri = jnp.where(hit, out[:, 3].astype(jnp.int32), -1)
    uv = out[:, 1:3]
    resolved = out[:, 5] > 0.0

    def with_fallback(args):
        t, tri, uv = args
        rec = cluster_closest_hit(ray_o, ray_d, fb.cluster, t_min=t_min, t_max=t_max)
        keep = resolved
        return (
            jnp.where(keep, t, rec.t),
            jnp.where(keep, tri, rec.tri),
            jnp.where(keep[:, None], uv, rec.uv),
        )

    t, tri, uv = jax.lax.cond(
        jnp.all(resolved), lambda a: a, with_fallback, (t, tri, uv)
    )
    t = jnp.where(tri >= 0, t, jnp.asarray(t_max, jnp.float32))
    return HitRecord(t=t, tri=tri, uv=uv)


def make_fused_intersector(fb: FusedBVH, **kw):
    def intersect(ray_o, ray_d):
        return fused_closest_hit(ray_o, ray_d, fb, **kw)

    return intersect


def fused_occluded(ray_o, ray_d, fb: FusedBVH, t_min=m.T_MIN, t_max=m.T_MAX):
    """Occlusion via the fused kernel (closest-hit then hit test)."""
    rec = fused_closest_hit(ray_o, ray_d, fb, t_min=t_min, t_max=t_max)
    return rec.tri >= 0
