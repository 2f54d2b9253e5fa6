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
