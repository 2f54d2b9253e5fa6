"""Pallas TPU kernels for the intersection hot path.

The cluster intersector's inner step is "for each ray bin, fetch one
triangle cluster and intersect B rays against its C triangles"
(ops/cluster.py _binned_intersect).  Expressed as XLA ops the cluster fetch
is a gather; expressed in Pallas it becomes the *pipeline's own block DMA*:
``PrefetchScalarGridSpec`` prefetches the per-bin cluster ids, and the
``index_map`` of the triangle-blob input steers each grid step's automatic
double-buffered DMA straight at the right cluster -- HBM->VMEM at DMA-engine
bandwidth, overlapped with the previous bin's VPU compute.  No per-lane
control flow anywhere; the kernel body is a dense [B, C] Moller-Trumbore.

Numerics are identical to the jnp path (same op order), tested in interpret
mode on CPU and on hardware against _intersect_cluster.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import math as m

_EPS_DET = 1e-12


def _mt_kernel(c: int, b: int, cid_ref, rays_ref, blob_ref, tid_ref, out_ref, tri_ref):
    """One bin: rays_ref [1,B,8] (o,d,best_t,valid), blob_ref [1,1,C*9],
    tid_ref [1,1,C] -> out_ref [1,B,4] (t,u,v,hit), tri_ref [1,B,1]."""
    rays = rays_ref[0]  # [B,8]
    o = rays[:, 0:3][:, None, :]  # [B,1,3]
    d = rays[:, 3:6][:, None, :]
    best_t = rays[:, 6]
    valid = rays[:, 7] > 0.0

    blob = blob_ref[0, 0].reshape(c, 9)
    p0 = blob[:, 0:3][None, :, :]  # [1,C,3]
    e1 = blob[:, 3:6][None, :, :]
    e2 = blob[:, 6:9][None, :, :]
    tid = tid_ref[0, 0]  # [C]

    h = jnp.cross(d, e2)
    det = jnp.sum(e1 * h, axis=-1)  # [B,C]
    inv = 1.0 / jnp.where(jnp.abs(det) < _EPS_DET, 1.0, det)
    s = o - p0
    u = inv * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1)
    v = inv * jnp.sum(d * q, axis=-1)
    t = inv * jnp.sum(e2 * q, axis=-1)
    t_min = m.T_MIN
    ok = (
        valid[:, None]
        & (tid[None, :] >= 0)
        & (jnp.abs(det) >= _EPS_DET)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < best_t[:, None])
    )
    t = jnp.where(ok, t, jnp.inf)
    # gather-free winner selection (Mosaic can't lower per-row gathers):
    # one-hot of the argmin column, resolved by masked reductions
    j = jnp.argmin(t, axis=-1)  # [B]
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, c), 1)
    onehot = cols == j[:, None]
    tj = jnp.min(t, axis=-1)
    hit = jnp.isfinite(tj)
    pick = lambda x: jnp.sum(jnp.where(onehot, x, 0.0), axis=-1)
    out_ref[0, :, 0] = jnp.where(hit, tj, jnp.inf)
    out_ref[0, :, 1] = pick(u)
    out_ref[0, :, 2] = pick(v)
    out_ref[0, :, 3] = hit.astype(jnp.float32)
    tid_b = jnp.broadcast_to(tid[None, :], (b, c))
    tri_ref[0, :, 0] = jnp.where(
        hit, jnp.max(jnp.where(onehot, tid_b, -1), axis=-1), -1
    )


@partial(jax.jit, static_argnames=("interpret",))
def binned_mt_pallas(block_cid, rays_packed, tri_blob, tri_id, interpret=False):
    """Pallas bin sweep.

    block_cid [NB] i32; rays_packed [NB,B,8] f32; tri_blob [K,C*9];
    tri_id [K,C].  Returns (out [NB,B,4] f32, tri [NB,B] i32).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb, b, _ = rays_packed.shape
    c = tri_id.shape[1]
    k = tri_blob.shape[0]
    # Mosaic block-shape rule: each of the last two block dims must divide
    # (8, 128) or equal the full array dim -- hence the rank-3 [K,1,*] views.
    blob3 = tri_blob.reshape(k, 1, c * 9)
    tid3 = tri_id.reshape(k, 1, c)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, b, 8), lambda i, cid: (i, 0, 0)),
            pl.BlockSpec((1, 1, c * 9), lambda i, cid: (cid[i], 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, cid: (cid[i], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, b, 4), lambda i, cid: (i, 0, 0)),
            pl.BlockSpec((1, b, 1), lambda i, cid: (i, 0, 0)),
        ],
    )
    out, tri = pl.pallas_call(
        partial(_mt_kernel, c, b),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb, b, 4), jnp.float32),
            jax.ShapeDtypeStruct((nb, b, 1), jnp.int32),
        ],
        interpret=interpret,
    )(block_cid, rays_packed, blob3, tid3)
    return out, tri[..., 0]


def pallas_binned_intersect(ray_o, ray_d, cb, cid, t_min, best_t, block: int = 64, interpret: bool = False):
    """Drop-in phase-B step using the Pallas bin kernel.

    Same binning index math as _binned_intersect (ops/cluster.py); the MT
    batch itself runs in the Pallas pipeline.
    """
    n = ray_o.shape[0]
    nb = n // block + cb.num_clusters

    perm = jnp.argsort(cid)
    scid = cid[perm]
    run_start = jnp.searchsorted(scid, scid, side="left")
    within = jnp.arange(n, dtype=jnp.int32) - run_start.astype(jnp.int32)
    is_block_start = (within % block) == 0
    block_idx = jnp.cumsum(is_block_start.astype(jnp.int32)) - 1
    slot = within % block

    block_cid = jnp.zeros((nb,), jnp.int32).at[block_idx].max(scid)

    rays = jnp.concatenate(
        [ray_o, ray_d, best_t[:, None], jnp.ones((n, 1), jnp.float32)], axis=1
    )  # [N,8]
    packed = jnp.zeros((nb, block, 8), jnp.float32).at[block_idx, slot].set(rays[perm])
    # padded lanes: valid flag 0 and best_t 0 => can't hit

    out, tri = binned_mt_pallas(block_cid, packed, cb.tri_blob, cb.tri_id, interpret=interpret)

    inv_perm = jnp.argsort(perm)

    def unpack(x):
        return x[block_idx, slot][inv_perm]

    t = unpack(out[..., 0])
    u = unpack(out[..., 1])
    v = unpack(out[..., 2])
    hit = unpack(out[..., 3]) > 0.0
    tri_o = unpack(tri)
    return t, tri_o, jnp.stack([u, v], -1), hit
