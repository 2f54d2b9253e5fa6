"""Round-5 headroom measurement: block-union U vs per-ray cluster need.

The fused2 retirement loop runs at its VPU compute floor (tpu_probe6), and
its work is U x C triangle columns per block, where U = |union of clusters
any ray in the block needs|.  The candidate round-5 design (finer-than-block
dedup: rays stop paying for clusters only their block-neighbors need) is
bounded by the ratio U_block / mean(u_ray), where u_ray = clusters a ray
needs under PERFECT per-ray pruning (entry <= that ray's true closest t).

This probe measures both on real ray populations:
  u_ray   : #clusters with entry(r, k) <= t_true(r)  (computed in XLA from
            the cluster boxes + a ground-truth closest-hit)
  U_block : union over each SORTED 256-ray block (the production blocking)

Usage: python tools/tpu_probe7.py [--sub 7] [--n 131072] [--kinds primary,bounce]
"""
import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "assets"))

import numpy as np

from tpu_probe2 import load, make_rays


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sub", type=int, default=7)
    ap.add_argument("--c", type=int, default=512)
    ap.add_argument("--n", type=int, default=131072)
    ap.add_argument("--b", type=int, default=256)
    ap.add_argument("--kinds", default="primary,bounce")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from owl_path_tracer_tpu.ops import fused2 as f2
    from owl_path_tracer_tpu.ops import math as m

    scene, settings = load(args.sub)
    fb = f2.build_fused2_scene(scene, cluster_size=args.c)
    k = fb.num_clusters
    boxes = fb.boxes  # [8,K]

    @jax.jit
    def entry_counts(o, d, t_true):
        """per-ray #clusters with slab entry <= t_true, + the need mask."""
        def inv(dc):
            return 1.0 / jnp.where(jnp.abs(dc) < 1e-12,
                                   jnp.where(dc < 0, -1e-12, 1e-12), dc)

        ia = [inv(d[:, a:a + 1]) for a in range(3)]
        tn = jnp.full((o.shape[0], k), -jnp.inf)
        tf = jnp.full((o.shape[0], k), jnp.inf)
        for a in range(3):
            t0 = ia[a] * boxes[a:a + 1] - o[:, a:a + 1] * ia[a]
            t1 = ia[a] * boxes[3 + a:4 + a] - o[:, a:a + 1] * ia[a]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        enter = jnp.maximum(tn, m.T_MIN)
        need = (enter <= tf) & (enter <= t_true[:, None])
        return need.sum(-1), need

    for kind in args.kinds.split(","):
        o, d = make_rays(scene, args.n, kind)
        rec, _ = f2.fused2_closest_hit(o, d, fb, sort=True)
        t_true = jnp.where(rec.tri >= 0, rec.t, 1e10)

        u_ray, need = entry_counts(o, d, t_true)
        u_ray = np.asarray(u_ray)

        # production blocking: sorted by the coherence key
        keys = np.asarray(f2.ray_sort_keys(o, d, fb.bounds))
        perm = np.argsort(keys, kind="stable")
        need_s = np.asarray(need)[perm]
        nb = args.n // args.b
        union = need_s.reshape(nb, args.b, k).any(axis=1).sum(-1)

        print(json.dumps({
            "probe": "dedup_headroom", "kind": kind, "k": k, "b": args.b,
            "u_ray_mean": round(float(u_ray.mean()), 2),
            "u_ray_p90": int(np.percentile(u_ray, 90)),
            "U_block_mean": round(float(union.mean()), 2),
            "U_block_p90": int(np.percentile(union, 90)),
            "headroom_ratio": round(float(union.mean() / max(u_ray.mean(), 1e-9)), 2),
        }), flush=True)


if __name__ == "__main__":
    main()
