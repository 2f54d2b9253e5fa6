"""Pallas kernel tests (interpret mode on CPU; hardware path exercised by
tools/tpu_probe.py on the real chip)."""
import numpy as np
import jax.numpy as jnp
import pytest

from owl_path_tracer_tpu.ops import cluster as cl
from owl_path_tracer_tpu.ops import pallas_kernels as pk


@pytest.fixture(scope="module")
def setup():
    r = np.random.default_rng(0)
    base = r.uniform(-4, 4, (2000, 1, 3))
    tri = base + r.normal(0, 0.4, (2000, 3, 3))
    verts = tri.reshape(-1, 3).astype(np.float32)
    idx = np.arange(6000, dtype=np.int32).reshape(2000, 3)
    cb = cl.build_clusters(verts, idx, cluster_size=64)
    n = 1024
    o = jnp.asarray(r.uniform(-6, 6, (n, 3)).astype(np.float32))
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return cb, o, jnp.asarray(d), r


def test_pallas_binned_matches_reference(setup):
    cb, o, d, r = setup
    n = o.shape[0]
    cid = jnp.asarray(r.integers(0, cb.num_clusters, n).astype(np.int32))
    bt = jnp.full((n,), 1e10, jnp.float32)
    at, atri, auv, ah = cl._intersect_cluster(o, d, cb, cid, 1e-3, bt)
    pt, ptri, puv, ph = pk.pallas_binned_intersect(o, d, cb, cid, 1e-3, bt, interpret=True)
    np.testing.assert_array_equal(np.asarray(atri), np.asarray(ptri))
    np.testing.assert_array_equal(np.asarray(ah), np.asarray(ph))
    hit = np.asarray(ah)
    # interpret-mode fusion order differs by ~1 ulp from the jnp path
    np.testing.assert_allclose(np.asarray(pt)[hit], np.asarray(at)[hit], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(puv)[hit], np.asarray(auv)[hit], atol=1e-5)


def test_pallas_binned_respects_best_t(setup):
    cb, o, d, r = setup
    n = o.shape[0]
    cid = jnp.asarray(r.integers(0, cb.num_clusters, n).astype(np.int32))
    # a tiny best_t culls everything
    bt = jnp.full((n,), 1e-2, jnp.float32)
    _, tri, _, hit = pk.pallas_binned_intersect(o, d, cb, cid, 1e-3, bt, interpret=True)
    assert not np.asarray(hit).any()
    assert (np.asarray(tri) == -1).all()


# ── fused single-kernel traversal (ops/fused.py) ──


def test_fused_matches_cluster_reference(setup):
    from owl_path_tracer_tpu.ops import fused as fu

    cb, o, d, r = setup
    fb = fu.build_fused(cb)
    ref = cl.cluster_closest_hit(o, d, cb)
    got = fu.fused_closest_hit(o, d, fb, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.tri), np.asarray(got.tri))
    hit = np.asarray(ref.tri) >= 0
    np.testing.assert_allclose(
        np.asarray(got.t)[hit], np.asarray(ref.t)[hit], rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.uv)[hit], np.asarray(ref.uv)[hit], atol=1e-5
    )


def test_fused_overflow_falls_back_exact(setup):
    from owl_path_tracer_tpu.ops import fused as fu

    cb, o, d, r = setup
    fb = fu.build_fused(cb)
    ref = cl.cluster_closest_hit(o, d, cb)
    # max_steps=1 guarantees unresolved rays -> exact XLA fallback kicks in
    got = fu.fused_closest_hit(o, d, fb, interpret=True, max_steps=1)
    np.testing.assert_array_equal(np.asarray(ref.tri), np.asarray(got.tri))


def test_fused_padding_and_per_ray_tmax(setup):
    from owl_path_tracer_tpu.ops import fused as fu

    cb, o, d, r = setup
    fb = fu.build_fused(cb)
    n = 100  # not a multiple of the 128-ray block
    o, d = o[:n], d[:n]
    ref = cl.cluster_closest_hit(o, d, cb)
    tm = np.full((n,), 1e10, np.float32)
    tm[::2] = np.maximum(np.asarray(ref.t)[::2] * 0.5, 1e-2)  # cull half
    got = fu.fused_closest_hit(o, d, fb, t_max=jnp.asarray(tm), interpret=True)
    gtri = np.asarray(got.tri)
    assert (gtri[::2] == -1).all()
    np.testing.assert_array_equal(gtri[1::2], np.asarray(ref.tri)[1::2])
