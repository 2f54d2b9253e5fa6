"""Fused traversal v2 (ops/fused2.py): interpret-mode correctness vs the
exact intersectors, attribute-replay payloads, any-hit semantics."""
import numpy as np
import jax.numpy as jnp
import pytest

from owl_path_tracer_tpu.ops import cluster as cl
from owl_path_tracer_tpu.ops import fused2 as f2
from owl_path_tracer_tpu.ops.intersect import closest_hit_brute


def _soup(n_tris=3000, seed=0, spread=4.0):
    r = np.random.default_rng(seed)
    base = r.uniform(-spread, spread, (n_tris, 1, 3))
    tri = base + r.normal(0, 0.4, (n_tris, 3, 3))
    verts = tri.reshape(-1, 3).astype(np.float32)
    idx = np.arange(3 * n_tris, dtype=np.int32).reshape(n_tris, 3)
    return verts, idx, r


@pytest.fixture(scope="module")
def setup():
    verts, idx, r = _soup()
    normals = r.normal(size=verts.shape).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    texcoords = r.uniform(0, 1, (len(verts), 2)).astype(np.float32)
    tri_mat = r.integers(0, 5, len(idx)).astype(np.int32)
    fb = f2.build_fused2(
        verts, idx, cluster_size=64,
        normals=normals, texcoords=texcoords, tri_mat=tri_mat, mxu=False,
    )
    n = 512
    o = jnp.asarray(r.uniform(-6, 6, (n, 3)).astype(np.float32))
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return fb, verts, idx, o, jnp.asarray(d), r


def test_matches_cluster_exact(setup):
    """Same winners as the XLA cluster intersector; t/uv to 1-2 ulp.

    Round 4: the kernel's output (t,u,v) come from the post-loop
    winner-geometry REPLAY (same mt_components formula, same plane bits as
    the cluster path), but XLA fuses the triple-product FMAs differently for
    [B,1]-shaped operands than for the cluster path's [B,C] sweep, so the
    last float ulp can differ -- exact-equality across differently-shaped
    evaluations of the same expression is not a guarantee XLA makes.  Winner
    CHOICE (tri) must still match exactly."""
    fb, verts, idx, o, d, r = setup
    ref = cl.cluster_closest_hit(o, d, fb.cluster)
    rec, _ = f2.fused2_closest_hit(o, d, fb, interpret=True, sort=False)
    np.testing.assert_array_equal(np.asarray(rec.tri), np.asarray(ref.tri))
    np.testing.assert_allclose(
        np.asarray(rec.t), np.asarray(ref.t), rtol=5e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(rec.uv), np.asarray(ref.uv), rtol=5e-6, atol=1e-6
    )


def test_sorted_equals_unsorted(setup):
    fb, verts, idx, o, d, r = setup
    a, blob_a = f2.fused2_closest_hit(o, d, fb, interpret=True, sort=False)
    b, blob_b = f2.fused2_closest_hit(o, d, fb, interpret=True, sort=True)
    np.testing.assert_array_equal(np.asarray(a.tri), np.asarray(b.tri))
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    np.testing.assert_array_equal(np.asarray(blob_a), np.asarray(blob_b))


def test_cid2_sorted_equals_unsorted(setup):
    """The candidate-cluster (cid2) sort -- production for enclosed scenes
    since round 5 -- must only permute block composition, never results.
    Covers closest-hit, occlusion, and the mixed sweep under a forced
    OWLPT_SORT_MODE=cid2 (auto_sort_mode would pick per scene)."""
    fb, verts, idx, o, d, r = setup
    old = f2.SORT_MODE
    try:
        f2.SORT_MODE = "cid2"
        a, blob_a = f2.fused2_closest_hit(o, d, fb, interpret=True, sort=False)
        b, blob_b = f2.fused2_closest_hit(o, d, fb, interpret=True, sort=True)
        np.testing.assert_array_equal(np.asarray(a.tri), np.asarray(b.tri))
        np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
        np.testing.assert_array_equal(np.asarray(blob_a), np.asarray(blob_b))
        occ_a = f2.fused2_occluded(o, d, fb, t_max=2.0, interpret=True, sort=False)
        occ_b = f2.fused2_occluded(o, d, fb, t_max=2.0, interpret=True, sort=True)
        np.testing.assert_array_equal(np.asarray(occ_a), np.asarray(occ_b))
        n = o.shape[0]
        shadow = np.zeros((n,), bool)
        shadow[::3] = True
        tmax = jnp.full((n,), 1e10, jnp.float32)
        ra, ba, oa = f2.fused2_sweep_mixed(
            o, d, tmax, jnp.asarray(shadow), fb, interpret=True, sort=False)
        rb, bb, ob = f2.fused2_sweep_mixed(
            o, d, tmax, jnp.asarray(shadow), fb, interpret=True, sort=True)
        np.testing.assert_array_equal(
            np.asarray(ra.tri)[~shadow], np.asarray(rb.tri)[~shadow])
        np.testing.assert_array_equal(
            np.asarray(oa)[shadow], np.asarray(ob)[shadow])
    finally:
        f2.SORT_MODE = old


def test_matches_brute(setup):
    fb, verts, idx, o, d, r = setup
    ref = closest_hit_brute(o, d, jnp.asarray(verts), jnp.asarray(idx))
    rec, _ = f2.fused2_closest_hit(o, d, fb, interpret=True)
    np.testing.assert_array_equal(np.asarray(rec.tri), np.asarray(ref.tri))
    hit = np.asarray(ref.tri) >= 0
    np.testing.assert_allclose(
        np.asarray(rec.t)[hit], np.asarray(ref.t)[hit], rtol=5e-6
    )


def test_attr_blob_matches_table(setup):
    fb, verts, idx, o, d, r = setup
    rec, blob = f2.fused2_closest_hit(o, d, fb, interpret=True)
    hit = np.asarray(rec.tri) >= 0
    want = np.asarray(fb.attr_table)[:, :16][np.asarray(rec.tri)[hit]]
    np.testing.assert_array_equal(np.asarray(blob)[hit], want)
    # misses keep a zero payload
    assert (np.asarray(blob)[~hit] == 0.0).all()


def test_any_hit_occlusion(setup):
    fb, verts, idx, o, d, r = setup
    ref = cl.cluster_occluded(o, d, fb.cluster)
    occ = f2.fused2_occluded(o, d, fb, interpret=True)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref))


def test_per_ray_tmax(setup):
    fb, verts, idx, o, d, r = setup
    rec, _ = f2.fused2_closest_hit(o, d, fb, interpret=True)
    hit = np.asarray(rec.tri) >= 0
    # cap t_max just below each ray's closest hit: ray must now miss it
    tm = np.where(hit, np.asarray(rec.t) * 0.99, 1e10).astype(np.float32)
    rec2, _ = f2.fused2_closest_hit(o, d, fb, t_max=jnp.asarray(tm), interpret=True)
    t2 = np.asarray(rec2.t)
    assert ((t2[hit] < np.asarray(rec.t)[hit] * 0.99) | (np.asarray(rec2.tri)[hit] < 0)).all()
    occ = f2.fused2_occluded(o, d, fb, t_max=jnp.asarray(tm), interpret=True)
    occ_ref = cl.cluster_occluded(o, d, fb.cluster, t_max=jnp.asarray(tm))
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(occ_ref))


def test_small_scene_and_padding():
    # fewer tris than one cluster + ray count not a block multiple
    verts, idx, r = _soup(n_tris=10, seed=3)
    fb = f2.build_fused2(verts, idx, cluster_size=64, mxu=False)
    n = 37
    o = jnp.asarray(r.uniform(-6, 6, (n, 3)).astype(np.float32))
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    ref = closest_hit_brute(o, d, jnp.asarray(verts), jnp.asarray(idx))
    rec, _ = f2.fused2_closest_hit(o, d, fb, interpret=True)
    np.testing.assert_array_equal(np.asarray(rec.tri), np.asarray(ref.tri))


def test_overflow_fallback_is_exact(setup):
    """max_steps=1 forces unresolved rays through the XLA fallback."""
    fb, verts, idx, o, d, r = setup
    ref = cl.cluster_closest_hit(o, d, fb.cluster)
    rec, blob = f2.fused2_closest_hit(o, d, fb, interpret=True, max_steps=1)
    np.testing.assert_array_equal(np.asarray(rec.tri), np.asarray(ref.tri))
    hit = np.asarray(rec.tri) >= 0
    want = np.asarray(fb.attr_table)[:, :16][np.asarray(rec.tri)[hit]]
    np.testing.assert_array_equal(np.asarray(blob)[hit], want)


def test_mxu_variant_matches_component(setup):
    """MXU Moller-Trumbore (one [B,16]x[16,4C] matmul) agrees with the
    component-form kernel: identical winner triangles (up to rounding at
    shared edges) and t within 1e-5 relative."""
    fb, verts, idx, o, d, r = setup  # component layout (mxu=False in setup)
    fbm = f2.build_fused2(verts, idx, cluster_size=64, mxu=True)
    a, _ = f2.fused2_closest_hit(o, d, fb, interpret=True)
    b, _ = f2.fused2_closest_hit(o, d, fbm, interpret=True)
    same_tri = np.asarray(a.tri) == np.asarray(b.tri)
    assert same_tri.mean() > 0.995, same_tri.mean()
    hit = (np.asarray(a.tri) >= 0) & same_tri
    np.testing.assert_allclose(
        np.asarray(b.t)[hit], np.asarray(a.t)[hit], rtol=1e-5, atol=1e-6
    )
    occ_a = f2.fused2_occluded(o, d, fb, interpret=True)
    occ_b = f2.fused2_occluded(o, d, fbm, interpret=True)
    assert (np.asarray(occ_a) == np.asarray(occ_b)).mean() > 0.995


@pytest.mark.parametrize("fanout", [1, 2, 4])
def test_fanout_widths_agree(setup, fanout):
    """W-wide retirement groups (fanout) are an efficiency knob only: winner
    triangles, t, payloads, and occlusion must not depend on W."""
    fb, verts, idx, o, d, r = setup
    normals = np.asarray(fb.attr_table)[:, :16][:, 0:3]  # unused; rebuild with attrs
    fbm = f2.build_fused2(
        verts, idx, cluster_size=64, mxu=True,
        tri_mat=r.integers(0, 5, len(idx)).astype(np.int32),
    )
    base, blob_base = f2.fused2_closest_hit(o, d, fbm, interpret=True, fanout=1)
    rec, blob = f2.fused2_closest_hit(o, d, fbm, interpret=True, fanout=fanout)
    np.testing.assert_array_equal(np.asarray(rec.tri), np.asarray(base.tri))
    np.testing.assert_array_equal(np.asarray(rec.t), np.asarray(base.t))
    np.testing.assert_array_equal(np.asarray(blob), np.asarray(blob_base))
    occ1 = f2.fused2_occluded(o, d, fbm, interpret=True, fanout=1)
    occw = f2.fused2_occluded(o, d, fbm, interpret=True, fanout=fanout)
    np.testing.assert_array_equal(np.asarray(occ1), np.asarray(occw))


def test_mixed_sweep_matches_separate(setup):
    """ONE mixed sweep (per-lane any-hit, round 4) == the separate
    closest-hit and occlusion sweeps, including the shadow lanes' t_max
    (light-distance) semantics."""
    fb, verts, idx, o, d, r = setup
    n = o.shape[0]
    shadow = jnp.asarray(r.random(n) < 0.5)
    tmax = jnp.where(shadow, jnp.asarray(r.uniform(2.0, 20.0, n), jnp.float32), 1e10)
    rec_m, blob_m, occ_m = f2.fused2_sweep_mixed(
        o, d, tmax, shadow, fb, interpret=True
    )
    rec_s, blob_s = f2.fused2_closest_hit(o, d, fb, t_max=tmax, interpret=True)
    occ_s = f2.fused2_occluded(o, d, fb, t_max=tmax, interpret=True)
    ns = ~np.asarray(shadow)
    np.testing.assert_array_equal(np.asarray(rec_m.tri)[ns], np.asarray(rec_s.tri)[ns])
    np.testing.assert_allclose(
        np.asarray(rec_m.t)[ns], np.asarray(rec_s.t)[ns], rtol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(blob_m)[ns], np.asarray(blob_s)[ns])
    sh = np.asarray(shadow)
    np.testing.assert_array_equal(np.asarray(occ_m)[sh], np.asarray(occ_s)[sh])
    # sorted path too (the production configuration)
    rec_m2, _, occ_m2 = f2.fused2_sweep_mixed(
        o, d, tmax, shadow, fb, interpret=True, sort=True
    )
    np.testing.assert_array_equal(np.asarray(rec_m2.tri)[ns], np.asarray(rec_s.tri)[ns])
    np.testing.assert_array_equal(np.asarray(occ_m2)[sh], np.asarray(occ_s)[sh])


def test_bf16_planes_mode(setup):
    """fused2-bf16 (production default on hardware): tri ids and hit
    geometry come from the f32 attrs planes, so winners agree with the f32
    build except at near-ties, and agreed winners report IDENTICAL f32
    (t,u,v) and payload (the winner-geometry replay reads the same f32
    rows).  On hardware the two modes are bit-identical end-to-end
    (docs/PERF.md bf16_quality probe); on CPU the f32 MT matmul is exact, so
    near-tie winners can differ -- the contract here is agreement + exact
    replay for agreed winners."""
    fb, verts, idx, o, d, r = setup
    fb32 = f2.build_fused2(verts, idx, cluster_size=64, mxu=True)
    fb16 = f2.build_fused2(verts, idx, cluster_size=64, mxu=True,
                           plane_dtype=jnp.bfloat16)
    a, blob_a = f2.fused2_closest_hit(o, d, fb32, interpret=True)
    b, blob_b = f2.fused2_closest_hit(o, d, fb16, interpret=True)
    same = np.asarray(a.tri) == np.asarray(b.tri)
    # the random soup is adversarial: bf16-rounded pruning products reject
    # ~5% of its edge-grazing hits (the next soup intersection is then far
    # away, so these are NOT near-ties).  On hardware this is NOT a bf16
    # regression -- the f32 mode's default-precision matmul rounds the same
    # products identically (bit-identical images, docs/PERF.md); the CPU f32
    # path is simply more exact than either hardware mode.  Closed meshes
    # barely show it: see the sphere check below.
    assert same.mean() > 0.9, same.mean()
    hit = (np.asarray(a.tri) >= 0) & same
    np.testing.assert_array_equal(np.asarray(b.t)[hit], np.asarray(a.t)[hit])
    np.testing.assert_array_equal(np.asarray(b.uv)[hit], np.asarray(a.uv)[hit])
    np.testing.assert_array_equal(np.asarray(blob_b)[hit], np.asarray(blob_a)[hit])
    # any-hit occlusion agrees (no attrs involved)
    occ_a = f2.fused2_occluded(o, d, fb32, interpret=True)
    occ_b = f2.fused2_occluded(o, d, fb16, interpret=True)
    assert (np.asarray(occ_a) == np.asarray(occ_b)).mean() > 0.98

    # closed mesh (the realistic geometry class): near-total agreement
    from test_integrator import sphere_scene
    from owl_path_tracer_tpu.models import material as material_mod

    sc = sphere_scene(material_mod.single())
    sv, si = np.asarray(sc.vertices), np.asarray(sc.tri_idx)
    s32 = f2.build_fused2(sv, si, cluster_size=64, mxu=True)
    s16 = f2.build_fused2(sv, si, cluster_size=64, mxu=True,
                          plane_dtype=jnp.bfloat16)
    ns = 512
    os_ = jnp.asarray(r.uniform(-3, 3, (ns, 3)).astype(np.float32))
    ds_ = r.normal(size=(ns, 3)).astype(np.float32)
    ds_ /= np.linalg.norm(ds_, axis=-1, keepdims=True)
    ds_ = jnp.asarray(ds_)
    ra, _ = f2.fused2_closest_hit(os_, ds_, s32, interpret=True)
    rb, _ = f2.fused2_closest_hit(os_, ds_, s16, interpret=True)
    agree = np.asarray(ra.tri) == np.asarray(rb.tri)
    assert agree.mean() > 0.99, agree.mean()


def test_multi_tile_phase_a():
    """K > tile_k engages the gated multi-tile phase A (round 4: whole-tile
    AABB tests skip dead [B,tile_k] slabs for dragon8-scale scenes).  Must
    stay exact vs the cluster intersector across init AND refresh paths."""
    verts, idx, r = _soup(n_tris=20000, seed=7, spread=8.0)
    fb = f2.build_fused2(verts, idx, cluster_size=16, mxu=True)
    assert fb.num_clusters > 1024, fb.num_clusters  # really multi-tile
    n = 512
    o = jnp.asarray(r.uniform(-10, 10, (n, 3)).astype(np.float32))
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    ref = cl.cluster_closest_hit(o, d, fb.cluster)
    rec, _ = f2.fused2_closest_hit(o, d, fb, interpret=True)
    np.testing.assert_array_equal(np.asarray(rec.tri), np.asarray(ref.tri))
    occ = f2.fused2_occluded(o, d, fb, interpret=True)
    occ_ref = cl.cluster_occluded(o, d, fb.cluster)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(occ_ref))


def test_make_accel_adaptive_cluster_size():
    """make_accel picks the fat-cluster size per scene: small OPEN scenes
    halve C until K >= 64 (morton-sort pruning granularity; measured +14%
    on round-4 cornell), large scenes keep C=512 -- and ENCLOSED scenes
    (auto_sort_mode -> cid2) keep C=512 at ANY size since round 5 (the
    candidate sort restores per-ray-scale pruning; cornell 10.87 -> 11.20).
    The random soup used here is area-dense (enclosure proxy fires), so the
    morton branch is pinned via the env override."""
    import os as _os

    from owl_path_tracer_tpu.ops import fused2 as _f2
    import jax.numpy as _jnp

    from owl_path_tracer_tpu.render import film as film_mod

    class _S:  # minimal stand-in with the fields make_accel touches
        pass

    def fake_scene(n_tris):
        verts, idx, r = _soup(n_tris=n_tris, seed=1)
        import types

        from owl_path_tracer_tpu.models import material as material_mod
        from test_integrator import sphere_scene  # reuse a real Scene shell

        sc = sphere_scene(material_mod.single())
        return sc._replace(
            vertices=_jnp.asarray(verts), tri_idx=_jnp.asarray(idx),
            normals=_jnp.zeros((len(verts), 3), _jnp.float32),
            texcoords=_jnp.zeros((len(verts), 2), _jnp.float32),
            tri_mat=_jnp.zeros((n_tris,), _jnp.int32),
        )

    old = _f2.SORT_MODE
    try:
        _f2.SORT_MODE = "morton"  # open-scene branch: the K >= 64 halving
        small = film_mod.make_accel(fake_scene(2000), "fused2")
        assert small.cluster_size == 128, small.cluster_size
        mid = film_mod.make_accel(fake_scene(20000), "fused2")
        assert mid.cluster_size == 256, mid.cluster_size
        big = film_mod.make_accel(fake_scene(40000), "fused2")
        assert big.cluster_size == 512, big.cluster_size
        _f2.SORT_MODE = "cid2"  # enclosed branch: C stays 512 at any size
        small2 = film_mod.make_accel(fake_scene(2000), "fused2")
        assert small2.cluster_size == 512, small2.cluster_size
    finally:
        _f2.SORT_MODE = old
