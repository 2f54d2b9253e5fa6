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
    """One bin: rays_ref [1,B,8] (o,d,best_t,valid), blob_ref [1,9,C] component
    planes, tid_ref [1,1,C] -> out_ref [1,B,4] (t,u,v,hit), tri_ref [1,B,1].

    Component-form math only: every intermediate is [B,1], [1,C] or [B,C] --
    no 3-wide minor axes and no reshapes (Mosaic rejects the [C*9]->[C,9]
    shape cast and lowers 3-minor layouts poorly)."""
    rays = rays_ref[0]  # [B,8]
    ox, oy, oz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]  # [B,1]
    dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
    best_t = rays[:, 6]
    valid = rays[:, 7] > 0.0

    comp = lambda p: blob_ref[0, p : p + 1, :]  # [1,C]
    p0x, p0y, p0z = comp(0), comp(1), comp(2)
    e1x, e1y, e1z = comp(3), comp(4), comp(5)
    e2x, e2y, e2z = comp(6), comp(7), comp(8)
    tid = tid_ref[0, 0]  # [C]

    from .intersect import mt_components

    t, u, v, ok = mt_components(
        (ox, oy, oz),
        (dx, dy, dz),
        (p0x, p0y, p0z),
        (e1x, e1y, e1z),
        (e2x, e2y, e2z),
        m.T_MIN,
        best_t[:, None],
    )
    ok &= valid[:, None] & (tid[None, :] >= 0)
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
def binned_mt_pallas(block_cid, rays_packed, tri_planes, tri_id, interpret=False):
    """Pallas bin sweep.

    block_cid [NB] i32; rays_packed [NB,B,8] f32; tri_planes [K,9,C];
    tri_id [K,C].  Returns (out [NB,B,4] f32, tri [NB,B] i32).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb, b, _ = rays_packed.shape
    c = tri_id.shape[1]
    k = tri_planes.shape[0]
    # Mosaic block-shape rule: each of the last two block dims must divide
    # (8, 128) or equal the full array dim -- hence the rank-3 [K,1,C] view.
    tid3 = tri_id.reshape(k, 1, c)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, b, 8), lambda i, cid: (i, 0, 0)),
            pl.BlockSpec((1, 9, c), lambda i, cid: (cid[i], 0, 0)),
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
    )(block_cid, rays_packed, tri_planes, tid3)
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

    out, tri = binned_mt_pallas(block_cid, packed, cb.tri_planes, cb.tri_id, interpret=interpret)

    inv_perm = jnp.argsort(perm)

    def unpack(x):
        return x[block_idx, slot][inv_perm]

    t = unpack(out[..., 0])
    u = unpack(out[..., 1])
    v = unpack(out[..., 2])
    hit = unpack(out[..., 3]) > 0.0
    tri_o = unpack(tri)
    return t, tri_o, jnp.stack([u, v], -1), hit
