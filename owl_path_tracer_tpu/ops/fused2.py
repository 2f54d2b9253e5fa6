"""Fused wavefront traversal v2: fat clusters + pipelined DMA + attribute replay.

Round-1's fused kernel (ops/fused.py) retired ONE small cluster (C=128) per
iteration for a 128-ray block, serialized start/wait on every cluster DMA, and
answered shadow queries with the full closest-hit kernel; shading then paid a
separate XLA gather of the [T,24] shade blob (~tens of ms per wave on this
backend).  This kernel removes all four costs:

  * **fat clusters** (C=512 triangles by default, SAH leaves): an order of
    magnitude fewer clusters per scene, so the per-block retirement loop runs
    ~C/128x fewer iterations and phase A's dense [B,K] slab test shrinks by
    the same factor.  A 1M-triangle scene is K~2k clusters -- the [B,K] entry
    matrix stays comfortably VMEM-resident with NO second hierarchy level;
  * **double-buffered DMA**: the next needed cluster's 16xC plane block is
    prefetched while the current one is being intersected (the classic
    two-slot pipeline; see docs/PERF.md roofline);
  * **any-hit mode**: shadow rays stop at the first valid intersection and a
    block retires the moment every ray is either occluded or out of
    candidates -- the TPU equivalent of OPTIX_RAY_FLAG_TERMINATE_ON_FIRST_HIT
    (/root/reference/path_tracer/src/device/device.cu:106-107);
  * **in-loop attribute fetch**: every retirement DMAs the cluster's [16,C]
    shading payload (vertex normals, texcoords, material id) alongside its
    plane block -- the same two-slot pipeline, so the payload is already in
    VMEM when the winner update runs -- and folds the winner's payload into
    the ray state with 16 exact one-hot row selects.  The integrator needs
    NO per-ray gather at all for surface data, and there is no serial
    post-loop replay phase paying a cold DMA per distinct winner.

Same capability as the reference's OptiX hardware traversal
(owl::traceRay, device.cu:133; AS build application.cpp:131-140), re-derived
for a vector machine with explicit DMA.  Intersection math is the shared
``mt_components`` (ops/intersect.py), keeping results bit-compatible with the
XLA cluster intersector.
"""
from __future__ import annotations

from functools import partial, reduce
from typing import NamedTuple

import os

import jax
import jax.numpy as jnp
import numpy as np

from . import math as m
from .cluster import ClusterBVH, build_clusters, cluster_closest_hit
from .intersect import HitRecord, mt_components

BLOCK_RAYS = 128
# clusters retired per loop iteration (the loop is latency-bound at ~2.5 us
# per iteration; W-wide groups amortize that over W clusters -- see _kernel)
FANOUT = 2
# retirement-loop bound: a real while_loop exits as soon as a block is done,
# so a generous bound costs nothing in the typical case and keeps pathological
# (fully incoherent) blocks off the whole-wave exact-fallback path
MAX_STEPS = 512
# per-ray frontier refresh interval, in retired CLUSTERS (env-overridable so
# probes can ablate per process): smaller = tighter per-ray pruning for
# incoherent blocks, at one extra (tile-gated) slab pass per interval.
# Default 8 -> 16 in round 5: with the scene gate + per-slot chain the
# refresh slab weighs relatively more (dragon7 9.53 -> 9.80, dragon8
# 6.72 -> 7.06; real-wave probe 12.5 -> 11.7 ms)
REFRESH_CLUSTERS = int(os.environ.get("OWLPT_REFRESH_CLUSTERS", "16"))
# phase-A K-tile width (env-overridable so probes can ablate): smaller tiles
# skip more dead slab work on large-K scenes at one scalar branch per tile
PHASE_TILE_K = int(os.environ.get("OWLPT_PHASE_TILE_K", "1024"))

# attr plane row layout (32 rows x C lanes per cluster, f32 always)
#   0:3 n0.xyz   3:6 n1.xyz   6:9 n2.xyz
#   9:11 tc0.uv  11:13 tc1.uv 13:15 tc2.uv
#   15  material id (exact small-int f32)
#   16  tri id (exact f32 < 2^24) -- the winner pick rides the attr matmul,
#       removing the per-iteration [B,cc] tid pick from the retirement loop
#   17:20 p0.xyz  20:23 e1.xyz  23:26 e2.xyz -- winner GEOMETRY: the final
#       (t, u, v) are recomputed once per block from these after the loop,
#       removing the per-iteration ua/vb picks too (round-4 lean winner);
#       also what makes bf16 planes report f32-exact hit geometry
#   26:32 zero padding (f32 sublane multiple)
ATTR_ROWS = 32

# best-state column layout of the [B,16] kernel scratch / out[:, :16]
#   0 t   1 u   2 v   3 tri(f32)   4 hit   5 resolved   6 steps
#   7 winner-cluster id   8 winner slot-in-cluster


class Fused2BVH(NamedTuple):
    boxes: jnp.ndarray  # [8,K]: rows 0-2 cmin.xyz, 3-5 cmax.xyz (VMEM-resident)
    # component layout [K,16,C]: rows p0(3) e1(3) e2(3) tid(1) pad(6), or
    # MXU layout [K,16,4C]: per-triangle FEATURE matrix F such that
    # [d, oxd, o, 1] @ F = [det | u*det | v*det | t*det] column groups
    # (Moller-Trumbore as ONE matmul; tid stored in row 10 of group 0, which
    # multiplies a zero ray-feature row).  Optionally bf16 (build_fused2
    # plane_dtype): halves plane DMA bytes and runs the MT matmul at the
    # MXU's native bf16 rate; the in-loop pruning t then carries ~0.5e-2
    # relative input rounding (under spp-64 Monte-Carlo noise -- opt-in
    # throughput mode, f32 stays the exactness default), while the OUTPUT
    # t/u/v and tri id come from the f32 attrs planes (winner geometry
    # replay), so bf16 only perturbs which near-tie candidate wins, not the
    # reported hit.  bf16 closest-hit therefore requires with_attrs=True
    # (the production configuration); the in-plane tid row is only read on
    # the f32 with_attrs=False probe path.
    planes: jnp.ndarray
    attrs: jnp.ndarray  # [K,ATTR_ROWS,C]: shading payload planes (row layout above)
    attr_table: jnp.ndarray  # [T,ATTR_ROWS] same payload by tri id (fallback/grad path)
    bounds: jnp.ndarray  # [2,3] scene AABB (ray-sort key quantization)
    cluster: ClusterBVH  # exact XLA fallback path

    @property
    def num_clusters(self) -> int:
        return self.boxes.shape[1]

    @property
    def cluster_size(self) -> int:
        return self.attrs.shape[2]

    @property
    def mxu(self) -> bool:
        return self.planes.shape[2] == 4 * self.attrs.shape[2]


def _mxu_features(tri_planes: np.ndarray, tid: np.ndarray) -> np.ndarray:
    """Per-triangle Moller-Trumbore FEATURE matrix for the MXU path.

    With ray features R = [d(3), m=oxd(3), o(3), 1, 0...] ([B,16]) and per-
    triangle columns F ([16, 4C], groups [det | u*det | v*det | t*det]):

        R @ F = [d.(e2xe1) | e2.m - (e2xp0).d | -e1.m - (p0xe1).d | n.o - n.p0]

    which are exactly MT's det, u*det, v*det, t*det (scalar-triple-product
    rotations of ops/intersect.py mt_components).  The whole [B,C] triangle
    test becomes ONE [B,16]x[16,4C] f32 matmul on the (otherwise idle) MXU;
    only sign tests and the winner reduction stay on the VPU.

    tid is stashed in row 10 of the det group -- the matmul ignores it
    because ray-feature row 10 is zero.
    """
    kk, _, c = tri_planes.shape
    p0 = tri_planes[:, 0:3].transpose(0, 2, 1)  # [K,C,3]
    e1 = tri_planes[:, 3:6].transpose(0, 2, 1)
    e2 = tri_planes[:, 6:9].transpose(0, 2, 1)
    n = np.cross(e1, e2)
    f = np.zeros((kk, 16, 4 * c), np.float32)
    # group 0: det = d.(e2 x e1)
    f[:, 0:3, 0:c] = np.cross(e2, e1).transpose(0, 2, 1)
    f[:, 10, 0:c] = tid
    # group 1: u*det = e2.m - (e2 x p0).d
    f[:, 0:3, c : 2 * c] = -np.cross(e2, p0).transpose(0, 2, 1)
    f[:, 3:6, c : 2 * c] = e2.transpose(0, 2, 1)
    # group 2: v*det = -e1.m - (p0 x e1).d
    f[:, 0:3, 2 * c : 3 * c] = -np.cross(p0, e1).transpose(0, 2, 1)
    f[:, 3:6, 2 * c : 3 * c] = -e1.transpose(0, 2, 1)
    # group 3: t*det = n.o - n.p0
    f[:, 6:9, 3 * c : 4 * c] = n.transpose(0, 2, 1)
    f[:, 9, 3 * c : 4 * c] = -np.einsum("kcx,kcx->kc", n, p0)
    return f


def build_fused2(
    vertices: np.ndarray,
    tri_idx: np.ndarray,
    cluster_size: int = 512,
    normals: np.ndarray | None = None,
    texcoords: np.ndarray | None = None,
    tri_mat: np.ndarray | None = None,
    mxu: bool = True,
    plane_dtype=np.float32,
) -> Fused2BVH:
    """SAH-leaf clusters + plane re-layout + shading-attribute planes.

    ``plane_dtype=np.float32`` (default) keeps the traversal exact;
    ``jnp.bfloat16`` is the opt-in throughput mode (see Fused2BVH.planes).
    """
    vertices = np.asarray(vertices, np.float32)
    tri_idx = np.asarray(tri_idx, np.int32)
    bf16 = jnp.dtype(plane_dtype) == jnp.bfloat16
    assert not bf16 or mxu, "bf16 planes require the MXU feature layout"
    cb = build_clusters(vertices, tri_idx, cluster_size)
    k, c = cb.num_clusters, cb.cluster_size

    boxes = np.zeros((8, k), np.float32)
    boxes[0:3] = np.asarray(cb.cmin).T
    boxes[3:6] = np.asarray(cb.cmax).T

    tid = np.asarray(cb.tri_id)  # [K,C], -1 = padding
    assert tid.max() < (1 << 24), "tri ids exceed exact f32 range"
    if mxu:
        planes = _mxu_features(np.asarray(cb.tri_planes), tid.astype(np.float32))
    else:
        planes = np.zeros((k, 16, c), np.float32)
        planes[:, 0:9] = np.asarray(cb.tri_planes)
        planes[:, 9] = tid.astype(np.float32)

    # per-slot shading payload (zeros when the caller has no attributes,
    # e.g. geometry-only tests)
    t_count = tri_idx.shape[0]
    attr_table = np.zeros((t_count, ATTR_ROWS), np.float32)
    if normals is None:
        normals = np.zeros((vertices.shape[0], 3), np.float32)
    if texcoords is None:
        texcoords = np.zeros((vertices.shape[0], 2), np.float32)
    if tri_mat is None:
        tri_mat = np.zeros((t_count,), np.int32)
    nrm = np.asarray(normals, np.float32)
    tc = np.asarray(texcoords, np.float32)
    for v_i in range(3):
        attr_table[:, 3 * v_i : 3 * v_i + 3] = nrm[tri_idx[:, v_i]]
        attr_table[:, 9 + 2 * v_i : 11 + 2 * v_i] = tc[tri_idx[:, v_i]]
    attr_table[:, 15] = np.asarray(tri_mat, np.float32)
    attr_table[:, 16] = np.arange(t_count, dtype=np.float32)
    # winner-geometry rows come from the SAME plane arrays the cluster
    # intersector reads (not re-derived from vertices): the native builder's
    # p0/e1/e2 bits are the exactness contract the replay must reproduce
    tp = np.asarray(cb.tri_planes).transpose(0, 2, 1)  # [K,C,9]
    valid = tid >= 0
    attr_table[tid[valid], 17:26] = tp[valid]

    safe = np.maximum(tid, 0)
    attrs = attr_table[safe].transpose(0, 2, 1).copy()  # [K,ATTR_ROWS,C]

    bounds = np.stack([vertices.min(0), vertices.max(0)]).astype(np.float32)
    return Fused2BVH(
        boxes=jnp.asarray(boxes),
        planes=jnp.asarray(planes).astype(plane_dtype),
        attrs=jnp.asarray(attrs),
        attr_table=jnp.asarray(attr_table),
        bounds=jnp.asarray(bounds),
        cluster=cb,
    )


def build_fused2_scene(
    scene, cluster_size: int = 512, mxu: bool = True, plane_dtype=np.float32
) -> Fused2BVH:
    """Build from a compiled Scene (models/scene.py) including shading attrs."""
    return build_fused2(
        np.asarray(scene.vertices),
        np.asarray(scene.tri_idx),
        cluster_size=cluster_size,
        normals=np.asarray(scene.normals),
        texcoords=np.asarray(scene.texcoords),
        tri_mat=np.asarray(scene.tri_mat),
        mxu=mxu,
        plane_dtype=plane_dtype,
    )


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


def _default_interpret() -> bool:
    """Pallas TPU kernels need a real TPU (or the axon relay); anywhere else
    (CPU test suite, virtual-device multichip dryrun) run interpreted."""
    return jax.default_backend() not in ("tpu", "axon")


def _kernel(b, k, c, max_steps, with_attrs, any_hit, mxu, fanout, bf16, mixed,
            rays_ref, boxes_ref, planes_ref, attrs_ref, out_ref,
            bent_ref, buf_ref, abuf_ref, best_ref, attr_ref, sem, asem, ctl_ref):
    rays = rays_ref[0]  # [B,8]
    ox, oy, oz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]
    dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
    tmax = rays[:, 6:7]
    # mixed sweep (deferred-NEE): rays[:,7] > 0 marks PER-LANE any-hit
    # (shadow) rays traced in the same blocks as closest-hit rays -- shadow
    # rays share their origin with the lane's next bounce ray, so they ride
    # the block's existing cluster retirements nearly for free (the TPU
    # answer to the reference's second ray type, owl.hpp:25, device.cu:106)
    shadow = rays[:, 7:8] > 0.0 if mixed else None

    if mxu:
        # ray feature rows [B,16]: d, m = o x d, o, 1 (rows 10+ zero so the
        # tid storage row in the feature matrix drops out of the matmul)
        mx = oy * dz - oz * dy
        my = oz * dx - ox * dz
        mz = ox * dy - oy * dx
        rfeat = jnp.concatenate(
            [dx, dy, dz, mx, my, mz, ox, oy, oz,
             jnp.ones((b, 1), jnp.float32), jnp.zeros((b, 6), jnp.float32)],
            axis=1,
        )  # [B,16]
        if bf16:
            rfeat = rfeat.astype(jnp.bfloat16)

    def inv(dc):
        return 1.0 / jnp.where(
            jnp.abs(dc) < 1e-12, jnp.where(dc < 0, -1e-12, 1e-12), dc
        )

    ix, iy, iz = inv(dx), inv(dy), inv(dz)
    t_min = m.T_MIN

    # ── phase A: [B,K] slab test, reduced straight to the [1,K] block
    # frontier (min entry over the block's rays).  The per-ray entry matrix
    # never needs to persist: the MT test runs block-wide on the MXU anyway,
    # and any valid hit inside a cluster's AABB necessarily has
    # entry <= t < best, so the ``t < best`` window in the hit test subsumes
    # the old per-ray participation mask.
    # Computed in K-column TILES: the [B,K_tile] slab temps are the kernel's
    # biggest scratch, and tiling makes phase-A VMEM independent of K -- the
    # flat cluster list then scales to 1M-triangle scenes (K~2.7k at C=512
    # hit the 16 MB scoped-vmem limit with un-tiled [B,K] temps). ──
    # phase-A K-tile: [b, tile_k] slab temps are the kernel's biggest
    # scratch; halve the tile for b>256 so block-512 sweeps fit the 24MB
    # scoped-vmem budget (b=512 at tile 1024 measured 24.8MB)
    tile_k = min(k, PHASE_TILE_K if b <= 256 else 512)
    n_tiles = (k + tile_k - 1) // tile_k
    multi_tile = n_tiles > 1
    if multi_tile:
        # per-tile enclosing AABBs (pads excluded -- they sit at +inf), used
        # to GATE each tile's [B,tile_k] slab behind a whole-tile test: at
        # dragon8 scale (K=2688, 3 tiles) phase A + refreshes were ~40% of
        # an incoherent step, and a mid-frame block typically needs ONE tile
        tile_lo, tile_hi = [], []
        for k0 in range(0, k, tile_k):
            kk = min(tile_k, k - k0)
            los, his = [], []
            for a in range(3):
                bmin = boxes_ref[a : a + 1, k0 : k0 + kk]
                bmax = boxes_ref[3 + a : 4 + a, k0 : k0 + kk]
                los.append(jnp.min(jnp.where(bmin < 1e30, bmin, jnp.inf)))
                his.append(jnp.max(jnp.where(bmax < 1e30, bmax, -jnp.inf)))
            tile_lo.append(los)
            tile_hi.append(his)

    def frontier_update(cap, first=False):
        """Merge the fresh [1,K] block frontier into bent_ref: min over rays
        of box entry, counting only entries a ray still needs (entry < that
        ray's cap); already-retired (inf) clusters stay retired.  Multi-tile
        scenes skip a whole tile's slab when NO ray enters the tile's
        enclosing AABB under its cap (a dead tile then costs ~20 VPU ops +
        one scalar branch instead of the [B,tile_k] sweep).  ``first=True``
        (the phase-A init pass) skips the cap term (cap = tmax, already in
        the window test) and writes the frontier directly instead of
        merging against prior state -- bent_ref needs no prefill."""
        for ti, k0 in enumerate(range(0, k, tile_k)):
            kk = min(tile_k, k - k0)
            old = None if first else bent_ref[:, k0 : k0 + kk]

            def compute_tile(k0=k0, kk=kk, old=old):
                tn = jnp.full((b, kk), -jnp.inf, jnp.float32)
                tf = jnp.full((b, kk), jnp.inf, jnp.float32)
                for a, (ia, oa) in enumerate(((ix, ox), (iy, oy), (iz, oz))):
                    bmin = boxes_ref[a : a + 1, k0 : k0 + kk]  # [1,kk]
                    bmax = boxes_ref[3 + a : 4 + a, k0 : k0 + kk]
                    oi = oa * ia  # [B,1]
                    t0 = ia * bmin - oi  # [B,kk]
                    t1 = ia * bmax - oi
                    tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                    tf = jnp.minimum(tf, jnp.maximum(t0, t1))
                t_enter = jnp.maximum(tn, t_min)
                need = t_enter <= jnp.minimum(tf, tmax)
                if not first:
                    need &= t_enter < cap
                fresh = jnp.min(
                    jnp.where(need, t_enter, jnp.inf), axis=0, keepdims=True
                )
                if first:
                    bent_ref[:, k0 : k0 + kk] = fresh
                else:
                    bent_ref[:, k0 : k0 + kk] = jnp.where(
                        old == jnp.inf, jnp.inf, fresh
                    )

            if not multi_tile:
                compute_tile()
            else:
                lo, hi = tile_lo[ti], tile_hi[ti]
                tn1 = jnp.full((b, 1), -jnp.inf, jnp.float32)
                tf1 = jnp.full((b, 1), jnp.inf, jnp.float32)
                for a, (ia, oa) in enumerate(((ix, ox), (iy, oy), (iz, oz))):
                    t0 = ia * lo[a] - oa * ia
                    t1 = ia * hi[a] - oa * ia
                    tn1 = jnp.maximum(tn1, jnp.minimum(t0, t1))
                    tf1 = jnp.minimum(tf1, jnp.maximum(t0, t1))
                e_t = jnp.maximum(tn1, t_min)
                hit_w = e_t <= jnp.minimum(tf1, tmax)
                if not first:
                    hit_w &= e_t < cap
                tile_hit = jnp.any(hit_w)
                bent_ref[:, k0 : k0 + kk] = jnp.full((1, kk), jnp.inf)

                @pl.when(tile_hit)
                def _():
                    compute_tile()

    zeros = jnp.zeros((b, 1), jnp.float32)
    best_ref[:, 0:1] = tmax
    best_ref[:, 1:3] = jnp.zeros((b, 2), jnp.float32)
    best_ref[:, 3:4] = zeros - 1.0  # tri
    best_ref[:, 4:5] = zeros  # hit
    best_ref[:, 5:6] = zeros + 1.0  # resolved
    best_ref[:, 6:7] = zeros  # steps (clusters this ray participated in)
    best_ref[:, 7:8] = zeros - 1.0  # winner cluster
    best_ref[:, 8:9] = zeros - 1.0  # winner slot
    best_ref[:, 9:16] = jnp.zeros((b, 7), jnp.float32)
    attr_ref[:, :] = jnp.zeros((b, ATTR_ROWS), jnp.float32)
    fetch_attrs = with_attrs and not any_hit

    cc = c * fanout  # triangle columns intersected per loop iteration
    gc = (4 * c) if mxu else c  # plane columns per cluster
    col_k1 = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    col_cc = jax.lax.broadcasted_iota(jnp.int32, (b, cc), 1)
    col_c = jax.lax.broadcasted_iota(jnp.int32, (b, c), 1)

    # block prune bound: a cluster is worth visiting iff its nearest entry
    # over the block beats SOME ray's prune t (conservative block-level
    # over-approximation of the old per-ray test; coherent blocks have
    # near-identical best t's so the slack is small)
    def block_pmax():
        if any_hit:
            return jnp.max(
                jnp.where(best_ref[:, 4:5] > 0.0, -jnp.inf, best_ref[:, 0:1])
            )
        return jnp.max(best_ref[:, 0:1])

    # ── fanout>1: retire up to ``fanout`` clusters per loop iteration.  The
    # loop is LATENCY-bound (~2.5 us/iteration of pick/DMA-wait/scalar control
    # measured round 3, tools/tpu_probe3.py max_steps sweep) while the MT
    # matmul is MXU-cheap, so W-wide groups cut incoherent-block time ~W x.
    # Group members 2..W skip the prune-update a sequential retirement would
    # apply between them -- harmless when the block's rays need mostly
    # disjoint clusters (the incoherent case fanout exists for). ──
    def pick_group(bent, pmax):
        """Up to ``fanout`` nearest still-needed cluster ids (k = none)."""
        ids = []
        cur = bent
        for _ in range(fanout):
            mn = jnp.min(cur)
            cid = jnp.min(jnp.where((cur == mn) & (mn < pmax), col_k1, k))
            ids.append(cid)
            if fanout > 1:
                cur = jnp.where(col_k1 == cid, jnp.inf, cur)
        return ids

    def store_group(slot_static, ids):
        for j, cid in enumerate(ids):
            ctl_ref[1 + slot_static * fanout + j] = cid

    def load_group(slot):
        """Group ids of a TRACED slot index (select between both stores)."""
        return [
            jnp.where(
                slot == 0, ctl_ref[1 + j], ctl_ref[1 + fanout + j]
            )
            for j in range(fanout)
        ]

    def start_dmas(slot, ids):
        for j, cid in enumerate(ids):
            @pl.when(cid < k)
            def _(cid=cid, j=j):
                pltpu.make_async_copy(
                    planes_ref.at[cid],
                    buf_ref.at[slot, :, j * gc : (j + 1) * gc],
                    sem.at[slot, j],
                ).start()
                if fetch_attrs:
                    pltpu.make_async_copy(
                        attrs_ref.at[cid],
                        abuf_ref.at[slot, :, j * c : (j + 1) * c],
                        asem.at[slot, j],
                    ).start()

    def wait_dmas(slot, ids):
        for j, cid in enumerate(ids):
            @pl.when(cid < k)
            def _(cid=cid, j=j):
                pltpu.make_async_copy(
                    planes_ref.at[cid],
                    buf_ref.at[slot, :, j * gc : (j + 1) * gc],
                    sem.at[slot, j],
                ).wait()
                if fetch_attrs:
                    pltpu.make_async_copy(
                        attrs_ref.at[cid],
                        abuf_ref.at[slot, :, j * c : (j + 1) * c],
                        asem.at[slot, j],
                    ).wait()

    def group_col_mask(ids):
        """[1,cc] bool: columns whose cluster slot actually holds fresh data
        (a skipped DMA leaves STALE planes from an earlier group there)."""
        return jnp.concatenate(
            [
                jnp.broadcast_to(jnp.reshape(cid < k, (1, 1)), (1, c))
                for cid in ids
            ],
            axis=1,
        )

    # ── scene gate: a [B,1] slab test against the whole-scene AABB decides
    # whether this block does ANY traversal.  Sky-directed, parked, and
    # end-of-frame-drain blocks (a large fraction of every real frame's
    # lanes: the dragon frame is ~43% miss rays mid-frame) skip phase A,
    # the frontier init, and the loop entirely -- measured ~7 us/block of
    # pure fixed cost before this gate (round-5 parked-wave probe). ──
    if multi_tile:
        scene_lo = [reduce(jnp.minimum, [t[a] for t in tile_lo]) for a in range(3)]
        scene_hi = [reduce(jnp.maximum, [t[a] for t in tile_hi]) for a in range(3)]
    else:
        scene_lo = [
            jnp.min(jnp.where(boxes_ref[a : a + 1] < 1e30, boxes_ref[a : a + 1], jnp.inf))
            for a in range(3)
        ]
        scene_hi = [
            jnp.max(jnp.where(boxes_ref[3 + a : 4 + a] < 1e30, boxes_ref[3 + a : 4 + a], -jnp.inf))
            for a in range(3)
        ]
    gtn = jnp.full((b, 1), -jnp.inf, jnp.float32)
    gtf = jnp.full((b, 1), jnp.inf, jnp.float32)
    for a, (ia, oa) in enumerate(((ix, ox), (iy, oy), (iz, oz))):
        t0 = ia * scene_lo[a] - oa * ia
        t1 = ia * scene_hi[a] - oa * ia
        gtn = jnp.maximum(gtn, jnp.minimum(t0, t1))
        gtf = jnp.minimum(gtf, jnp.maximum(t0, t1))
    g_e = jnp.maximum(gtn, t_min)
    scene_live = jnp.any(g_e <= jnp.minimum(gtf, tmax))

    ctl_ref[0] = jnp.int32(1)  # done unless the gate opens and finds work

    @pl.when(scene_live)
    def _():
        # cap = tmax is exact: a valid hit needs t < tmax and entry <= t
        frontier_update(tmax, first=True)
        # warm-up: pick + prefetch the first group into slot 0
        g0 = pick_group(bent_ref[:, :], block_pmax())
        ctl_ref[0] = jnp.where(g0[0] < k, 0, 1)  # done flag
        store_group(0, g0)
        start_dmas(0, g0)

    # ── pipelined retirement loop: pick+prefetch next, intersect current ──
    # A real while_loop, NOT a fixed-trip fori with a skip flag: a skipped
    # fori iteration still costs a scalar-core branch, and at max_steps=256
    # the ~250 dead iterations of a coherent block dominated the whole kernel
    # (measured: 42 ms/131k-ray wave with U~2 live clusters per block).
    def loop_cond(carry):
        i, done = carry
        return (done == 0) & (i < max_steps)

    def loop_body(carry):
        i, _ = carry
        if True:  # keep the original body indentation block
            # ── periodic frontier refresh with PER-RAY caps ──
            # The block prune bound (pmax = max over rays of best t) is only
            # tight while the block's rays agree: one miss-bound ray keeps
            # pmax huge and would make the block retire every cluster ANY ray
            # merely passes through, even far behind other rays' hits.
            # Re-running the (cheap) slab test with each ray's own best t as
            # cap every 8 retirements restores per-ray pruning semantics with
            # bounded lag; already-retired clusters stay retired.
            refresh_p = max(1, REFRESH_CLUSTERS // fanout)
            @pl.when(jax.lax.rem(i, refresh_p) == refresh_p - 1)
            def _():
                if any_hit:
                    cap = jnp.where(
                        best_ref[:, 4:5] > 0.0, 0.0, best_ref[:, 0:1]
                    )
                else:
                    cap = best_ref[:, 0:1]
                frontier_update(cap)

            slot = jax.lax.rem(i, 2)
            cur_ids = load_group(slot)
            bent_x = bent_ref[:, :]
            for cid in cur_ids:  # retire the current group
                bent_x = jnp.where(col_k1 == cid, jnp.inf, bent_x)

            nxt = pick_group(bent_x, block_pmax())
            have_n = nxt[0] < k

            @pl.when(slot == 0)
            def _():
                store_group(1, nxt)

            @pl.when(slot == 1)
            def _():
                store_group(0, nxt)

            start_dmas(1 - slot, nxt)
            wait_dmas(slot, cur_ids)
            if mxu:
                # ── per-slot winner chain: the MT matmul runs ONCE over the
                # whole group (MXU-cheap) but the VPU winner chain runs PER
                # SLOT behind a cid-valid gate -- a group's dead slots (the
                # common case on coherent blocks, where U ~ 1 < fanout) cost
                # one scalar branch instead of a full-width chain, and the
                # old de-interleave concats disappear (each slot's det|u|v|t
                # groups are static slices of the matmul output).  Slots
                # update best SEQUENTIALLY, so slot j+1's window test prunes
                # against slot j's tighter best t; winner choice is unchanged
                # (strict < keeps the earlier slot on exact ties, matching
                # the old concat argmin's lowest-column tie-break).
                pb = buf_ref[slot]  # [16, fanout*4C] feature matrix
                out4 = jnp.dot(rfeat, pb, preferred_element_type=jnp.float32)
                for j, cid in enumerate(cur_ids):
                    # slot 0 is ALWAYS a valid cluster while the loop runs
                    # (the done flag is derived from it at pick time), so it
                    # gets straight-line code; only slots 1+ pay a validity
                    # branch -- and skip their whole chain when dead (the
                    # common case on coherent blocks, where U ~ 1 < fanout)
                    def slot_chain(cid=cid, j=j):
                        base = j * 4 * c
                        det = out4[:, base : base + c]
                        sgn = jnp.where(det < 0.0, -1.0, 1.0)
                        dd = det * sgn  # |det|
                        ua = out4[:, base + c : base + 2 * c] * sgn
                        vb = out4[:, base + 2 * c : base + 3 * c] * sgn
                        tcd = out4[:, base + 3 * c : base + 4 * c] * sgn
                        # NB: no tid >= 0 term -- padding slots have all-zero
                        # planes (ops/cluster.py pads) so dd >= eps excludes
                        # them
                        ok = (
                            (dd >= 1e-12)
                            & (ua >= 0.0)
                            & (vb >= 0.0)
                            & (ua + vb <= dd)
                            & (tcd > dd * t_min)
                            & (tcd < dd * best_ref[:, 0:1])
                        )
                        if any_hit:
                            got = jnp.max(
                                jnp.where(ok, 1.0, 0.0), axis=-1, keepdims=True
                            )
                            best_ref[:, 4:5] = jnp.maximum(best_ref[:, 4:5], got)
                            return
                        # winner selection on the DIVISION-FREE products:
                        # pick the smallest t = tcd/dd via the elementwise
                        # quotient (one [B,C] divide), then recover u,v with
                        # two [B,1] divides on the picked numerators --
                        # bit-identical to dividing first (same operands,
                        # same rounding)
                        dd_safe = jnp.where(dd < 1e-12, 1.0, dd)
                        t = jnp.where(ok, tcd / dd_safe, jnp.inf)
                        tc = jnp.min(t, axis=-1, keepdims=True)  # [B,1]
                        wcol = jnp.min(
                            jnp.where(t == tc, col_c, c), axis=-1, keepdims=True
                        )
                        onehot = col_c == wcol
                        better = tc < best_ref[:, 0:1]
                        best_ref[:, 0:1] = jnp.where(better, tc, best_ref[:, 0:1])
                        if not fetch_attrs:
                            # probe path: winner u/v/tid picked full-width.
                            # The production (fetch_attrs) path gets tid from
                            # the attr matmul below and (t,u,v) from the
                            # post-loop winner-geometry replay (round-4 lean
                            # winner).
                            pick = lambda x: jnp.sum(
                                jnp.where(onehot, x, 0.0), axis=-1, keepdims=True
                            )
                            tid = pb[10:11, base : base + c]
                            dd_w = pick(dd)
                            dd_w = jnp.where(dd_w < 1e-12, 1.0, dd_w)
                            u = pick(ua) / dd_w
                            v = pick(vb) / dd_w
                            best_ref[:, 1:2] = jnp.where(better, u, best_ref[:, 1:2])
                            best_ref[:, 2:3] = jnp.where(better, v, best_ref[:, 2:3])
                            best_ref[:, 3:4] = jnp.where(
                                better,
                                pick(jnp.broadcast_to(tid, (b, c))),
                                best_ref[:, 3:4],
                            )
                        best_ref[:, 4:5] = jnp.where(better, 1.0, best_ref[:, 4:5])
                        best_ref[:, 7:8] = jnp.where(
                            better, cid.astype(jnp.float32), best_ref[:, 7:8]
                        )
                        best_ref[:, 8:9] = jnp.where(
                            better, wcol.astype(jnp.float32), best_ref[:, 8:9]
                        )
                        if fetch_attrs:
                            # winner payload folded in RIGHT HERE as ONE MXU
                            # matmul: attr[b,r] = sum_c onehot[b,c]*abuf[r,c].
                            # The TPU's DEFAULT f32 matmul runs ONE bf16
                            # pass, which would round the payload (and the
                            # tri id!) to 8 mantissa bits; splitting the
                            # [ATTR_ROWS,C] operand into three exact bf16
                            # terms (f32 = hi+mid+lo) and summing three
                            # native-bf16 matmuls reconstructs every one-hot
                            # row copy EXACTLY (oh is 0/1 = bf16-exact; each
                            # product is a single exact term in the f32
                            # accumulator) at ~1/3 the cost of
                            # Precision.HIGHEST (measured -11% end to end).
                            # The slot gate guarantees abuf columns are fresh
                            # (the old full-width fold had to zero stale
                            # columns of skipped DMAs).
                            oh_b = jnp.where(onehot & better, 1.0, 0.0)  # [B,C]
                            ab = abuf_ref[slot, :, j * c : (j + 1) * c]
                            oh16 = oh_b.astype(jnp.bfloat16)
                            hi = ab.astype(jnp.bfloat16)
                            r1 = ab - hi.astype(jnp.float32)
                            md = r1.astype(jnp.bfloat16)
                            lo = (r1 - md.astype(jnp.float32)).astype(jnp.bfloat16)
                            dn = (((1,), (1,)), ((), ()))
                            val = (
                                jax.lax.dot_general(
                                    oh16, hi, dn, preferred_element_type=jnp.float32)
                                + jax.lax.dot_general(
                                    oh16, md, dn, preferred_element_type=jnp.float32)
                                + jax.lax.dot_general(
                                    oh16, lo, dn, preferred_element_type=jnp.float32)
                            )  # [B,ATTR_ROWS]
                            attr_ref[:, :] = jnp.where(better, val, attr_ref[:, :])
                            # winner tri id rides the same matmul (attr row 16)
                            best_ref[:, 3:4] = jnp.where(
                                better, val[:, 16:17], best_ref[:, 3:4]
                            )

                    if j == 0:
                        slot_chain()
                    else:
                        pl.when(cid < k)(slot_chain)
                if mixed and not any_hit:
                    # shadow lane with ANY recorded hit terminates: t -> t_min
                    # removes it from the prune bound and from further hit
                    # acceptance (TERMINATE_ON_FIRST_HIT, device.cu:106-107)
                    best_ref[:, 0:1] = jnp.where(
                        shadow & (best_ref[:, 4:5] > 0.0),
                        jnp.float32(t_min), best_ref[:, 0:1],
                    )
            else:
                # legacy component-plane path (fanout==1): full-width chain
                pb = buf_ref[slot]  # [16,C]
                fresh_cols = group_col_mask(cur_ids)  # [1,C]
                tid = pb[9:10, :]
                t, u, v, ok = mt_components(
                    (ox, oy, oz), (dx, dy, dz),
                    (pb[0:1, :], pb[1:2, :], pb[2:3, :]),
                    (pb[3:4, :], pb[4:5, :], pb[5:6, :]),
                    (pb[6:7, :], pb[7:8, :], pb[8:9, :]),
                    t_min, best_ref[:, 0:1],
                )
                ok &= (tid >= 0.0) & fresh_cols
                if any_hit:
                    got = jnp.max(
                        jnp.where(ok, 1.0, 0.0), axis=-1, keepdims=True
                    )
                    best_ref[:, 4:5] = jnp.maximum(best_ref[:, 4:5], got)
                else:
                    t = jnp.where(ok, t, jnp.inf)
                    tc = jnp.min(t, axis=-1, keepdims=True)  # [B,1]
                    wcol = jnp.min(
                        jnp.where(t == tc, col_cc, cc), axis=-1, keepdims=True
                    )
                    onehot = col_cc == wcol
                    better = tc < best_ref[:, 0:1]
                    pick = lambda x: jnp.sum(
                        jnp.where(onehot, x, 0.0), axis=-1, keepdims=True
                    )
                    best_ref[:, 0:1] = jnp.where(better, tc, best_ref[:, 0:1])
                    best_ref[:, 1:2] = jnp.where(better, pick(u), best_ref[:, 1:2])
                    best_ref[:, 2:3] = jnp.where(better, pick(v), best_ref[:, 2:3])
                    best_ref[:, 3:4] = jnp.where(
                        better, pick(jnp.broadcast_to(tid, (b, cc))), best_ref[:, 3:4]
                    )
                    best_ref[:, 4:5] = jnp.where(better, 1.0, best_ref[:, 4:5])
                    best_ref[:, 7:8] = jnp.where(
                        better, cur_ids[0].astype(jnp.float32), best_ref[:, 7:8]
                    )
                    best_ref[:, 8:9] = jnp.where(
                        better, wcol.astype(jnp.float32), best_ref[:, 8:9]
                    )
                    if fetch_attrs:
                        # full-width exact attr fold (see the mxu path's
                        # 3-term bf16 split rationale); stale columns of
                        # skipped DMAs zeroed via fresh_cols
                        oh_b = jnp.where(onehot & better, 1.0, 0.0)
                        ab = jnp.where(fresh_cols, abuf_ref[slot], 0.0)
                        oh16 = oh_b.astype(jnp.bfloat16)
                        hi = ab.astype(jnp.bfloat16)
                        r1 = ab - hi.astype(jnp.float32)
                        md = r1.astype(jnp.bfloat16)
                        lo = (r1 - md.astype(jnp.float32)).astype(jnp.bfloat16)
                        dn = (((1,), (1,)), ((), ()))
                        val = (
                            jax.lax.dot_general(
                                oh16, hi, dn, preferred_element_type=jnp.float32)
                            + jax.lax.dot_general(
                                oh16, md, dn, preferred_element_type=jnp.float32)
                            + jax.lax.dot_general(
                                oh16, lo, dn, preferred_element_type=jnp.float32)
                        )
                        attr_ref[:, :] = jnp.where(better, val, attr_ref[:, :])
                        best_ref[:, 3:4] = jnp.where(
                            better, val[:, 16:17], best_ref[:, 3:4]
                        )
                    if mixed:
                        best_ref[:, 0:1] = jnp.where(
                            shadow & (best_ref[:, 4:5] > 0.0),
                            jnp.float32(t_min), best_ref[:, 0:1],
                        )
            # block-level clusters-retired counter (diagnostic)
            n_ret = jnp.zeros((), jnp.float32)
            for cid in cur_ids:
                n_ret = n_ret + jnp.where(cid < k, 1.0, 0.0)
            best_ref[:, 6:7] = best_ref[:, 6:7] + n_ret

            bent_ref[:, :] = bent_x
        return (i + 1, jnp.where(have_n, 0, 1))

    fin_i, fin_done = jax.lax.while_loop(
        loop_cond, loop_body, (jnp.int32(0), ctl_ref[0])
    )
    ctl_ref[0] = fin_done

    # max_steps overflow exit leaves one prefetched group in flight: drain it
    @pl.when(fin_done == 0)
    def _():
        slot = jax.lax.rem(fin_i, 2)
        wait_dmas(slot, load_group(slot))

    # unresolved check (max_steps overflow only): any remaining frontier
    # candidate nearer than the block prune bound taints the WHOLE block --
    # block-granular is fine, the fallback keeps resolved lanes untouched
    nearest = jnp.min(bent_ref[:, :])
    unres = (fin_done == 0) & (nearest < block_pmax())
    best_ref[:, 5:6] = jnp.where(unres, 0.0, best_ref[:, 5:6])

    if fetch_attrs:
        # winner-geometry replay: output (t, u, v) recomputed ONCE per block
        # from the winner's p0/e1/e2 attr rows with the canonical
        # mt_components op order -- bit-equal to the XLA cluster intersector
        # for the same winner, and f32-exact even under bf16 planes.  The
        # in-loop tc (matmul-rounded) only steered pruning/winner choice.
        hitm = best_ref[:, 4:5] > 0.0
        gp = lambda i: attr_ref[:, i : i + 1]
        t3, u3, v3, ok3 = mt_components(
            (ox, oy, oz), (dx, dy, dz),
            (gp(17), gp(18), gp(19)), (gp(20), gp(21), gp(22)),
            (gp(23), gp(24), gp(25)),
            t_min, jnp.full((b, 1), jnp.inf, jnp.float32),
        )
        # the replay is AUTHORITATIVE whenever the winner's determinant is
        # non-degenerate -- gating on ok3's u/v/t window tests would make
        # the output value compilation-dependent at knife edges (the
        # in-loop fallback t is matmul-rounded, ~0.4% off the replay; the
        # window verdict itself can flip with Mosaic-vs-interpret FMA
        # fusion).  Degenerate-det winners (possible only when the replay's
        # f32 det and the in-loop matmul det disagree across the 1e-12
        # threshold -- an extreme-grazing rounding corner) keep the in-loop
        # t and report uv = (0,0) (vertex-0 barycentrics): the production
        # loop no longer writes per-iteration u/v, and for a det ~ 1e-12
        # sliver the barycentrics are ill-conditioned to O(1) anyway, so any
        # in-window value is equally defensible.
        e1x_, e1y_, e1z_ = gp(20), gp(21), gp(22)
        e2x_, e2y_, e2z_ = gp(23), gp(24), gp(25)
        hx = dy * e2z_ - dz * e2y_
        hy = dz * e2x_ - dx * e2z_
        hz = dx * e2y_ - dy * e2x_
        det3 = e1x_ * hx + e1y_ * hy + e1z_ * hz
        use3 = hitm & (jnp.abs(det3) > 1e-12)
        best_ref[:, 0:1] = jnp.where(use3, t3, best_ref[:, 0:1])
        best_ref[:, 1:2] = jnp.where(use3, u3, best_ref[:, 1:2])
        best_ref[:, 2:3] = jnp.where(use3, v3, best_ref[:, 2:3])

    out_ref[0, :, 0:16] = best_ref[:, :]
    out_ref[0, :, 16:32] = attr_ref[:, 0:16]


@partial(jax.jit, static_argnames=("interpret", "block", "max_steps", "with_attrs", "any_hit", "fanout"))
def fused2_traverse(
    ray_o, ray_d, t_max, fb: Fused2BVH,
    interpret: bool | None = None, block: int = BLOCK_RAYS, max_steps: int = MAX_STEPS,
    with_attrs: bool = True, any_hit: bool = False, fanout: int = FANOUT,
):
    """Raw kernel sweep: [N] rays -> [N,32].

    cols 0:16 best state (t,u,v,tri,hit,resolved,steps,wcid,wslot,..);
    cols 16:32 shading attr payload of the winning triangle.
    """
    rays = pack_rays(ray_o, ray_d, t_max)
    return fused2_traverse_packed(
        rays, fb, interpret=interpret, block=block, max_steps=max_steps,
        with_attrs=with_attrs, any_hit=any_hit, fanout=fanout,
    )


def pack_rays(ray_o, ray_d, t_max, shadow=None):
    """[N,8] kernel ray layout: o(3) d(3) tmax flag.  The flag column marks
    per-lane any-hit (shadow) rays in mixed sweeps; 0 otherwise.  Detached:
    traversal is not differentiable (hit records are parameter-independent
    for material/env gradients; camera/geometry gradients use the
    differentiable refit, fused2_closest_hit_diff)."""
    ray_o = jax.lax.stop_gradient(ray_o)
    ray_d = jax.lax.stop_gradient(ray_d)
    t_max = jax.lax.stop_gradient(t_max)
    n = ray_o.shape[0]
    if jnp.ndim(t_max) == 0:
        t_max = jnp.full((n,), t_max, jnp.float32)
    flag = (
        jnp.zeros((n, 1), jnp.float32)
        if shadow is None
        else jax.lax.stop_gradient(shadow).astype(jnp.float32)[:, None]
    )
    return jnp.concatenate([ray_o, ray_d, t_max[:, None], flag], axis=1)


@partial(jax.jit, static_argnames=("interpret", "block", "max_steps", "with_attrs", "any_hit", "fanout", "mixed"))
def fused2_traverse_packed(
    rays, fb: Fused2BVH,
    interpret: bool | None = None, block: int = BLOCK_RAYS, max_steps: int = MAX_STEPS,
    with_attrs: bool = True, any_hit: bool = False, fanout: int = FANOUT,
    mixed: bool = False,
):
    """Kernel sweep on pre-packed [N,8] rays (pack_rays) -> [N,32].

    The sorted path packs FIRST and permutes the packed rows with one gather
    (three separate o/d/tmax gathers measured ~1 ms/wave of pure dispatch)."""
    _ensure_pallas()
    if interpret is None:
        interpret = _default_interpret()
    mxu = fb.mxu
    if not mxu:
        fanout = 1  # legacy component layout supports single-cluster groups only
    bf16 = fb.planes.dtype == jnp.bfloat16
    # bf16 closest-hit needs the f32 attrs planes for exact tri id + winner
    # geometry; the no-attrs probe path reads the (bf16-rounded) in-plane tid
    assert not bf16 or with_attrs or any_hit, (
        "bf16 planes require with_attrs=True for closest-hit sweeps"
    )
    n = rays.shape[0]
    k = fb.num_clusters
    c = fb.cluster_size
    assert n % block == 0, (n, block)
    g = n // block
    rays = jax.lax.stop_gradient(rays).reshape(g, block, 8)

    out = pl.pallas_call(
        partial(_kernel, block, k, c, max_steps, with_attrs, any_hit, mxu,
                fanout, bf16, mixed),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, block, 8), lambda i: (i, 0, 0)),
            pl.BlockSpec((8, k), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec((1, block, 32), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((g, block, 32), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, k), jnp.float32),
            pltpu.VMEM((2, 16, (4 * c if mxu else c) * fanout), fb.planes.dtype),
            pltpu.VMEM((2, ATTR_ROWS, c * fanout), jnp.float32),
            pltpu.VMEM((block, 16), jnp.float32),
            pltpu.VMEM((block, ATTR_ROWS), jnp.float32),
            pltpu.SemaphoreType.DMA((2, fanout)),
            pltpu.SemaphoreType.DMA((2, fanout)),
            pltpu.SMEM((2 + 2 * fanout,), jnp.int32),
        ],
        interpret=interpret,
    )(rays, fb.boxes, fb.planes, fb.attrs)
    return out.reshape(n, 32)


def _morton3(x, y, z, bits: int = 4):
    key = jnp.zeros_like(x)
    for i in range(bits):
        key = (
            key
            | (((x >> i) & 1) << (3 * i + 2))
            | (((y >> i) & 1) << (3 * i + 1))
            | (((z >> i) & 1) << (3 * i))
        )
    return key


# sort-key resolution (module constants so probes can ablate per process;
# jit caches are NOT invalidated by changing these at runtime).  Measured
# full-frame (tools/tpu_probe4 round 3): o4d3 19.7s, o5d3 18.6s, o5d4 17.5s,
# o6d4 17.6s -- finer origin cells pack bounce rays from smaller surface
# patches, finer direction cones shrink the per-block cluster union; o6 adds
# nothing over o5 on this scene scale.
SORT_O_BITS = int(os.environ.get("OWLPT_SORT_O_BITS", "5"))  # origin Morton bits/axis
SORT_D_BITS = int(os.environ.get("OWLPT_SORT_D_BITS", "4"))  # direction bits/axis
# key width contract: coherence keys occupy bits [0,30); bit 30 is the mixed
# sweep's shadow-class bit; bit 31 stays clear (i32 sign).  Env-overridden
# resolutions that would overflow the morton key into the class bit are a
# silent sort corruption -- refuse at import.
assert 3 * (SORT_O_BITS + SORT_D_BITS) <= 30, (
    "OWLPT_SORT_O_BITS/OWLPT_SORT_D_BITS overflow the 30-bit key budget",
    SORT_O_BITS, SORT_D_BITS,
)
SHADOW_CLASS_BIT = 30

# wave sort mode: "cid2" sorts by the ray's first TWO candidate clusters
# (nearest slab entries) lexicographically, morton cell as the minor key;
# "morton" is the round-2..4 origin/direction key.  Measured ideal block
# unions on incoherent waves (tools/tpu_probe8.py, B=256): dragon7 28.2 ->
# 6.4, cornell 10.3 -> 1.4 -- blocks become nearly pure in cluster need.
# On real OPEN-scene frames (dragon/car) morton is already at its sort-ideal
# union (saved-wave probes, docs/PERF.md round 5) and cid2's key scan is
# pure cost; on INTERIOR frames (cornell) cid2 wins 31-46% end to end.  The
# renderers therefore resolve ``sort=True`` scene-adaptively (camera inside
# the scene AABB -> cid2, else morton; auto_sort_mode), and the env var
# forces one mode globally for probes/ablations.
SORT_MODE = os.environ.get("OWLPT_SORT_MODE", "auto")
assert SORT_MODE in ("auto", "cid2", "morton"), SORT_MODE
# candidate-scan K-chunk width (memory bound: [N,chunk] slab temps)
CID_CHUNK = 512
# candidate coarsening: the key scan runs over META-boxes (each the union of
# CID_META SAH-consecutive clusters), cutting the [N,K] scan cost by the
# same factor.  Measured union degradation is mild (dragon7 B=256: 6.56 ->
# 7.2 at meta=4; dragon8 12.1 -> 13.0) because SAH-adjacent clusters are
# spatially adjacent, so rays grouped by meta-candidates still share leaf
# clusters (tools-level meta probe, round 5).
CID_META = int(os.environ.get("OWLPT_CID_META", "4"))


def ray_sort_keys(ray_o, ray_d, bounds) -> jnp.ndarray:
    """Coherence key: origin Morton cell (major) + direction cell (minor).

    Sorting a wave by this key (STABLY, so spawn-order coherence survives
    ties) packs rays that will walk the same clusters into the same 128-ray
    kernel block -- the block-dedup retirement loop then runs ~union-of-
    clusters-per-block times, which coherence makes small.
    """
    ob, db = SORT_O_BITS, SORT_D_BITS
    lo = bounds[0]
    ext = jnp.maximum(bounds[1] - bounds[0], 1e-6)
    cells = float(1 << ob)
    q = jnp.clip(((ray_o - lo) / ext) * cells, 0.0, cells - 1.0).astype(jnp.int32)
    mk = _morton3(q[:, 0], q[:, 1], q[:, 2], bits=ob)
    dcells = float(1 << db)
    dq = jnp.clip((ray_d * 0.5 + 0.5) * dcells, 0.0, dcells - 1.0).astype(jnp.int32)
    dk = (dq[:, 0] << (2 * db)) | (dq[:, 1] << db) | dq[:, 2]
    return (mk << (3 * db)) | dk


def _top2_candidates(ray_o, ray_d, t_max, boxes, k: int):
    """Per-ray ids of the two nearest candidate clusters (slab entry order).

    Entry = max(slab t_near, T_MIN), valid iff entry <= min(t_far, t_max).
    Rays with no (or one) candidate get the sentinel id ``k`` -- they sort
    last, forming blocks that retire after zero (or one) clusters.  Computed
    as a lax.scan over K-chunks so memory stays [N, CID_CHUNK] at any K.

    This mirrors the kernel's phase-A slab test but runs OUTSIDE the kernel,
    pre-sort: the ids are only an ordering key, so slab rounding is
    irrelevant to correctness (the kernel re-derives its own frontier).
    """
    n = ray_o.shape[0]
    ch = min(CID_CHUNK, k)
    kp = (k + ch - 1) // ch * ch
    bx = boxes
    if kp != k:
        # pad with far point-boxes (cmin = cmax = 3e37, the ops/cluster.py
        # pad convention): the slab test yields tn = tf = +-3e37 per sign,
        # never a valid [T_MIN, t_max] entry.  NB inverted boxes (cmin >
        # cmax) do NOT work -- per-axis min/max reorders the planes and the
        # "impossible" box matches everything at T_MIN.
        pad = jnp.concatenate(
            [
                jnp.full((6, kp - k), 3e37, jnp.float32),
                jnp.zeros((2, kp - k), jnp.float32),
            ]
        )
        bx = jnp.concatenate([boxes, pad], 1)
    bx = bx.reshape(8, kp // ch, ch).transpose(1, 0, 2)  # [nchunk,8,ch]

    def inv(dc):
        return 1.0 / jnp.where(
            jnp.abs(dc) < 1e-12, jnp.where(dc < 0, -1e-12, 1e-12), dc
        )

    ia = [inv(ray_d[:, a : a + 1]) for a in range(3)]
    oa = [ray_o[:, a : a + 1] for a in range(3)]
    tmax_col = (
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))[:, None]
        if jnp.ndim(t_max) == 0 else t_max[:, None]
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (n, ch), 1)

    def body(carry, args):
        e1, i1, e2, i2 = carry
        cb, k0 = args
        tn = jnp.full((n, ch), -jnp.inf)
        tf = jnp.full((n, ch), jnp.inf)
        for a in range(3):
            t0 = ia[a] * cb[a : a + 1] - oa[a] * ia[a]
            t1 = ia[a] * cb[3 + a : 4 + a] - oa[a] * ia[a]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        enter = jnp.maximum(tn, m.T_MIN)
        ent = jnp.where(
            (enter <= jnp.minimum(tf, tmax_col)), enter, jnp.inf
        )
        c1 = jnp.min(ent, axis=1, keepdims=True)
        a1 = jnp.min(jnp.where(ent == c1, col, ch), axis=1, keepdims=True)
        ent2 = jnp.where(col == a1, jnp.inf, ent)
        c2 = jnp.min(ent2, axis=1, keepdims=True)
        a2 = jnp.min(jnp.where(ent2 == c2, col, ch), axis=1, keepdims=True)
        g1, g2 = a1 + k0, a2 + k0
        # merge {(e1,i1),(e2,i2)} with {(c1,g1),(c2,g2)} (each pair ordered):
        # ties break toward the EARLIER chunk (carry), matching entry-order
        # traversal's stable id order
        take_c = c1 < e1
        ne1 = jnp.where(take_c, c1, e1)
        ni1 = jnp.where(take_c, g1, i1)
        lo2 = jnp.where(take_c, e1, c1)  # loser of the first merge
        li2 = jnp.where(take_c, i1, g1)
        take_c2 = jnp.minimum(e2, c2) < lo2
        use_e2 = e2 <= c2
        ne2 = jnp.where(take_c2, jnp.minimum(e2, c2), lo2)
        ni2 = jnp.where(take_c2, jnp.where(use_e2, i2, g2), li2)
        return (ne1, ni1, ne2, ni2), None

    inf1 = jnp.full((n, 1), jnp.inf)
    sent = jnp.full((n, 1), kp, jnp.int32)
    (e1, i1, e2, i2), _ = jax.lax.scan(
        body, (inf1, sent, inf1, sent),
        (bx, jnp.arange(0, kp, ch, dtype=jnp.int32)),
    )
    first = jnp.where(jnp.isinf(e1[:, 0]), k, jnp.minimum(i1[:, 0], k))
    second = jnp.where(jnp.isinf(e2[:, 0]), k, jnp.minimum(i2[:, 0], k))
    return first, second


def _meta_boxes(boxes, k: int, meta: int):
    """[8,K] cluster AABBs -> [8,KM] unions of ``meta`` consecutive clusters
    (SAH build order is spatially coherent, so unions stay tight).  Pad
    clusters (cmin >= 1e30) are excluded; all-pad groups become far point
    boxes (the never-hit convention)."""
    if meta <= 1:
        return boxes, k
    km = (k + meta - 1) // meta
    kp = km * meta
    bx = boxes
    if kp != k:
        bx = jnp.concatenate(
            [boxes, jnp.full((8, kp - k), 3e37, jnp.float32)], 1
        )
    real = bx[0:1] < 1e30  # [1,kp]
    lo = jnp.min(
        jnp.where(real, bx[0:3], jnp.inf).reshape(3, km, meta), axis=-1
    )
    hi = jnp.max(
        jnp.where(real, bx[3:6], -jnp.inf).reshape(3, km, meta), axis=-1
    )
    none = ~jnp.any(real.reshape(1, km, meta), axis=-1)
    lo = jnp.where(none, 3e37, lo)
    hi = jnp.where(none, 3e37, hi)
    return jnp.concatenate([lo, hi, jnp.zeros((2, km), jnp.float32)]), km


def auto_sort_mode(scene) -> str:
    """Scene-adaptive sort mode for ``sort=True`` (resolved OUTSIDE jit:
    needs concrete vertex arrays).  ENCLOSED scenes -- geometry tiles the
    scene AABB's faces, so bounce rays cannot escape and morton block unions
    blow up (cornell: walls in every direction) -- get the candidate-cluster
    key (measured +31-46% end to end there); open scenes keep morton
    (measured already at its sort-ideal union, so cid2's key scan is pure
    cost).  Enclosure proxy: total triangle area vs AABB surface area --
    cornell ~1.0+, dragon/car/mitsuba ~0.35 (pure numpy, build-time)."""
    if SORT_MODE != "auto":
        return SORT_MODE
    v = np.asarray(scene.vertices)
    tri = np.asarray(scene.tri_idx)
    p0 = v[tri[:, 0]]
    e1 = v[tri[:, 1]] - p0
    e2 = v[tri[:, 2]] - p0
    tri_area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1).sum()
    ext = np.maximum(v.max(0) - v.min(0), 1e-6)
    aabb_area = 2.0 * (ext[0] * ext[1] + ext[1] * ext[2] + ext[0] * ext[2])
    return "cid2" if tri_area / aabb_area > 0.6 else "morton"


def resolve_sort(sort) -> str | None:
    """Normalize a ``sort`` static arg: False -> None, True -> "morton"
    (legacy spelling; renderers resolve True via auto_sort_mode before jit),
    else the mode string.  The env override wins everywhere."""
    if not sort:
        return None
    mode = "morton" if sort is True else sort
    if SORT_MODE != "auto":
        mode = SORT_MODE
    assert mode in ("cid2", "morton"), mode
    return mode


def wave_sort_keys(ray_o, ray_d, t_max, fb: "Fused2BVH", mode: str = "morton") -> jnp.ndarray:
    """Coherence key for ``mode`` (< 2^30; bit 30 reserved for the shadow
    class).  ``cid2``: (first candidate meta-cluster, second candidate,
    coarse morton) lexicographic; ``morton``: the round-2..4 key.
    """
    if mode == "morton":
        return ray_sort_keys(ray_o, ray_d, fb.bounds)
    boxes, k = _meta_boxes(fb.boxes, fb.num_clusters, CID_META)
    first, second = _top2_candidates(ray_o, ray_d, t_max, boxes, k)
    kb = max(1, (k + 1).bit_length())  # bits for ids in [0, k]
    mb = 30 - 2 * kb  # leftover minor-key bits
    if mb < 0:  # K beyond ~23k clusters: first candidate only
        kb = min(kb, 30)
        return (first << (30 - kb)).astype(jnp.int32)
    key = (first << (kb + mb)) | (second << mb)
    if mb > 0:
        morton = ray_sort_keys(ray_o, ray_d, fb.bounds)
        mshift = max(0, 3 * (SORT_O_BITS + SORT_D_BITS) - mb)
        key = key | (morton >> mshift)
    return key.astype(jnp.int32)


def _inverse_perm(perm):
    """inv[perm[i]] = i via ONE scatter -- argsort(perm) re-runs the full
    O(N log^2 N) bitonic sort per wave just to invert a permutation."""
    n = perm.shape[0]
    return jnp.zeros((n,), perm.dtype).at[perm].set(
        jnp.arange(n, dtype=perm.dtype), unique_indices=True,
        indices_are_sorted=False,
    )


def _pad_rays(ray_o, ray_d, t_max, block):
    n = ray_o.shape[0]
    pad = (-n) % block
    if jnp.ndim(t_max) == 0:
        t_max = jnp.full((n,), t_max, jnp.float32)
    if not pad:
        return ray_o, ray_d, t_max, n
    ray_o = jnp.concatenate([ray_o, jnp.zeros((pad, 3), jnp.float32)])
    ray_d = jnp.concatenate(
        [ray_d, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (pad, 3))]
    )
    t_max = jnp.concatenate([t_max, jnp.full((pad,), m.T_MIN, jnp.float32)])
    return ray_o, ray_d, t_max, n


@partial(jax.jit, static_argnames=("sort", "interpret", "block", "max_steps", "with_attrs", "fanout"))
def fused2_closest_hit(
    ray_o, ray_d, fb: Fused2BVH,
    t_min: float = m.T_MIN, t_max=m.T_MAX,
    sort: bool = False, interpret: bool | None = None,
    block: int = BLOCK_RAYS, max_steps: int = MAX_STEPS,
    with_attrs: bool = True, fanout: int = FANOUT,
):
    """Exact closest hit + shading payload.

    Returns (HitRecord, attr_blob [N,16]).  ``sort=True`` stably sorts rays
    by a spatial-directional coherence key before the kernel and unsorts
    after -- measured WORTH IT only for externally shuffled rays; the
    renderer's pool order (pixel-major work ids) is already block-coherent
    and the argsort+gathers cost ~3 ms/wave, so the default is off
    (docs/PERF.md round-2 probes).  The rare unresolved ray (kernel step
    overflow) falls back to the exact XLA cluster intersector + an
    attr-table gather.
    """
    n0 = ray_o.shape[0]
    ray_o_p, ray_d_p, t_max_p, _ = _pad_rays(ray_o, ray_d, t_max, block)

    mode = resolve_sort(sort)
    if mode:
        keys = wave_sort_keys(ray_o_p, ray_d_p, t_max_p, fb, mode=mode)
        perm = jnp.argsort(keys, stable=True)
        rays = pack_rays(ray_o_p, ray_d_p, t_max_p)[perm]  # ONE row gather
        out = fused2_traverse_packed(
            rays, fb,
            interpret=interpret, block=block, max_steps=max_steps,
            with_attrs=with_attrs, fanout=fanout,
        )
        out = out[_inverse_perm(perm)]
    else:
        out = fused2_traverse(
            ray_o_p, ray_d_p, t_max_p, fb,
            interpret=interpret, block=block, max_steps=max_steps,
            with_attrs=with_attrs, fanout=fanout,
        )
    out = out[:n0]

    t = out[:, 0]
    hit = out[:, 4] > 0.0
    tri = jnp.where(hit, out[:, 3].astype(jnp.int32), -1)
    uv = out[:, 1:3]
    blob = out[:, 16:32]
    resolved = out[:, 5] > 0.0

    def with_fallback(args):
        t, tri, uv, blob = args
        rec = cluster_closest_hit(
            ray_o, ray_d, fb.cluster, t_min=t_min, t_max=t_max
        )
        fb_blob = fb.attr_table[jnp.maximum(rec.tri, 0)][:, :16]
        keep = resolved
        return (
            jnp.where(keep, t, rec.t),
            jnp.where(keep, tri, rec.tri),
            jnp.where(keep[:, None], uv, rec.uv),
            jnp.where(keep[:, None], blob, fb_blob),
        )

    t, tri, uv, blob = jax.lax.cond(
        jnp.all(resolved), lambda a: a, with_fallback, (t, tri, uv, blob)
    )
    t = jnp.where(tri >= 0, t, jnp.asarray(t_max, jnp.float32))
    # uniform semantics with the kernel path: hit records are detached even
    # when the (differentiable) XLA fallback produced them
    t, uv, blob = jax.lax.stop_gradient((t, uv, blob))
    return HitRecord(t=t, tri=tri, uv=uv), blob


@partial(jax.jit, static_argnames=("sort", "interpret", "block", "max_steps", "fanout"))
def fused2_occluded(
    ray_o, ray_d, fb: Fused2BVH, t_min: float = m.T_MIN, t_max=m.T_MAX,
    sort: bool = False, interpret: bool | None = None,
    block: int = BLOCK_RAYS, max_steps: int = MAX_STEPS, fanout: int = FANOUT,
):
    """True any-hit occlusion: first valid hit retires the ray
    (TERMINATE_ON_FIRST_HIT semantics, device.cu:106-107)."""
    n0 = ray_o.shape[0]
    ray_o_p, ray_d_p, t_max_p, _ = _pad_rays(ray_o, ray_d, t_max, block)

    mode = resolve_sort(sort)
    if mode:
        keys = wave_sort_keys(ray_o_p, ray_d_p, t_max_p, fb, mode=mode)
        perm = jnp.argsort(keys, stable=True)
        rays = pack_rays(ray_o_p, ray_d_p, t_max_p)[perm]  # ONE row gather
        out = fused2_traverse_packed(
            rays, fb,
            interpret=interpret, block=block, max_steps=max_steps,
            with_attrs=False, any_hit=True, fanout=fanout,
        )
        out = out[_inverse_perm(perm)]
    else:
        out = fused2_traverse(
            ray_o_p, ray_d_p, t_max_p, fb,
            interpret=interpret, block=block, max_steps=max_steps,
            with_attrs=False, any_hit=True, fanout=fanout,
        )
    out = out[:n0]
    hit = out[:, 4] > 0.0
    resolved = out[:, 5] > 0.0

    def with_fallback(hit):
        from .cluster import cluster_occluded

        occ = cluster_occluded(ray_o, ray_d, fb.cluster, t_min=t_min, t_max=t_max)
        return jnp.where(resolved, hit, occ)

    return jax.lax.cond(jnp.all(resolved), lambda h: h, with_fallback, hit)


@partial(jax.jit, static_argnames=("sort", "interpret", "block", "max_steps", "fanout"))
def fused2_sweep_mixed(
    ray_o, ray_d, t_max, shadow, fb: Fused2BVH,
    t_min: float = m.T_MIN,
    sort: bool = False, interpret: bool | None = None,
    block: int = BLOCK_RAYS, max_steps: int = MAX_STEPS, fanout: int = FANOUT,
):
    """ONE kernel sweep over mixed closest-hit + any-hit lanes.

    ``shadow`` [N] bool marks per-lane any-hit (occlusion) rays.  Returns
    (HitRecord, attr_blob, occluded): hit record/blob are meaningful for
    non-shadow lanes, ``occluded`` for shadow lanes.  The deferred-NEE
    wavefront pairs each lane's bounce ray with the PREVIOUS vertex's shadow
    ray -- both start at the same point, so the coherence sort packs them
    into the same blocks and the shadow rays reuse the blocks' cluster
    retirements (VERDICT r3 #8; replaces the separate fused2_occluded sweep
    == the reference's second ray type, owl.hpp:25).
    """
    n0 = ray_o.shape[0]
    ray_o_p, ray_d_p, t_max_p, _ = _pad_rays(ray_o, ray_d, t_max, block)
    shadow_p = shadow
    pad = ray_o_p.shape[0] - n0
    if pad:
        shadow_p = jnp.concatenate([shadow, jnp.zeros((pad,), bool)])

    rays = pack_rays(ray_o_p, ray_d_p, t_max_p, shadow=shadow_p)
    mode = resolve_sort(sort)
    if mode:
        # shadow flag is the TOP key bit: blocks stay PURE bounce or pure
        # shadow, preserving the any-hit early exit (an occluded shadow
        # block retires immediately; mixed blocks would pin shadow lanes to
        # their bounce neighbors' full closest-hit duration -- measured 33%
        # slower on cornell NEE).  Within each class the usual coherence
        # key applies, so shadow rays from one cell still share blocks.
        keys = wave_sort_keys(ray_o_p, ray_d_p, t_max_p, fb, mode=mode)
        keys = keys | jnp.where(shadow_p, jnp.int32(1) << SHADOW_CLASS_BIT, 0)
        perm = jnp.argsort(keys, stable=True)
        out = fused2_traverse_packed(
            rays[perm], fb, interpret=interpret, block=block,
            max_steps=max_steps, with_attrs=True, mixed=True, fanout=fanout,
        )[_inverse_perm(perm)]
    else:
        out = fused2_traverse_packed(
            rays, fb, interpret=interpret, block=block, max_steps=max_steps,
            with_attrs=True, mixed=True, fanout=fanout,
        )
    out = out[:n0]

    t = out[:, 0]
    hit = out[:, 4] > 0.0
    tri = jnp.where(hit, out[:, 3].astype(jnp.int32), -1)
    uv = out[:, 1:3]
    blob = out[:, 16:32]
    resolved = out[:, 5] > 0.0
    occluded = hit

    def with_fallback(args):
        t, tri, uv, blob, occluded = args
        from .cluster import cluster_occluded

        rec = cluster_closest_hit(
            ray_o, ray_d, fb.cluster, t_min=t_min, t_max=t_max
        )
        occ = cluster_occluded(ray_o, ray_d, fb.cluster, t_min=t_min, t_max=t_max)
        fb_blob = fb.attr_table[jnp.maximum(rec.tri, 0)][:, :16]
        keep = resolved
        return (
            jnp.where(keep, t, rec.t),
            jnp.where(keep, tri, rec.tri),
            jnp.where(keep[:, None], uv, rec.uv),
            jnp.where(keep[:, None], blob, fb_blob),
            jnp.where(keep, occluded, occ),
        )

    t, tri, uv, blob, occluded = jax.lax.cond(
        jnp.all(resolved), lambda a: a, with_fallback,
        (t, tri, uv, blob, occluded),
    )
    t = jnp.where(tri >= 0, t, jnp.asarray(m.T_MAX, jnp.float32))
    t, uv, blob = jax.lax.stop_gradient((t, uv, blob))
    return HitRecord(t=t, tri=tri, uv=uv), blob, occluded


def make_fused2_intersector(fb: Fused2BVH, **kw):
    """Intersector returning (HitRecord, attr_blob) -- the integrator uses the
    blob instead of gathering scene.shade_blob."""

    def intersect(ray_o, ray_d):
        return fused2_closest_hit(ray_o, ray_d, fb, **kw)

    return intersect


def fused2_closest_hit_diff(
    ray_o, ray_d, fb: Fused2BVH, vertices, tri_idx, **kw
):
    """fused2 traversal with DIFFERENTIABLE hit geometry (VERDICT r3 #6).

    The kernel finds the winning triangle with detached rays (hit TOPOLOGY is
    a discrete choice -- correctly non-differentiable); (t, u, v) are then
    re-derived in plain JAX from the live ray and the winner's vertices, so
    camera-basis (and, if ``vertices`` is traced, geometry) gradients flow
    through hit positions and interpolated normals without falling back to
    the slow cluster/brute traversal (the round-3 caveat in render/diff.py).

    Same split as OptiX-era differentiable renderers: reuse the forward
    BVH winner, recompute the intersection differentiably.  Reference
    traversal being replaced: owl::traceRay, device.cu:133.

    The refit uses the classic pvec/qvec Moller-Trumbore (within rounding of
    the kernel's scalar-triple-product form; tests pin the agreement), so the
    forward VALUE changes only at ulp scale vs ``fused2_closest_hit``.
    """
    rec, blob = fused2_closest_hit(ray_o, ray_d, fb, **kw)
    hit = rec.tri >= 0
    safe = jnp.maximum(rec.tri, 0)
    tri = tri_idx[safe]  # [N,3]
    p0 = vertices[tri[:, 0]]
    e1 = vertices[tri[:, 1]] - p0
    e2 = vertices[tri[:, 2]] - p0
    pvec = jnp.cross(ray_d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    det_ok = jnp.abs(det) > 1e-12
    inv = 1.0 / jnp.where(det_ok, det, 1.0)
    tvec = ray_o - p0
    u = jnp.sum(tvec * pvec, axis=-1) * inv
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(ray_d * qvec, axis=-1) * inv
    t = jnp.sum(e2 * qvec, axis=-1) * inv
    use = hit & det_ok
    t = jnp.where(use, t, rec.t)
    uv = jnp.where(use[:, None], jnp.stack([u, v], axis=-1), rec.uv)
    return HitRecord(t=t, tri=rec.tri, uv=uv), blob


def make_fused2_intersector_diff(fb: Fused2BVH, vertices, tri_idx, **kw):
    """Differentiable-hit-geometry variant of make_fused2_intersector."""

    def intersect(ray_o, ray_d):
        return fused2_closest_hit_diff(ray_o, ray_d, fb, vertices, tri_idx, **kw)

    return intersect
