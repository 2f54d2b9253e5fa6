"""Round-5 design probe: block union U under CANDIDATE-CLUSTER sorting.

tpu_probe7 measured the headroom (bounce rays need 0.76 clusters, the
Morton-sorted block union pays 28.2).  The cheapest design that could
capture it keeps the fused2 kernel unchanged and re-sorts each wave by the
ray's PREDICTED FIRST CLUSTER (argmin slab entry under t_max) as the major
key -- blocks then become nearly pure in cluster need, so the block-dedup
union approaches the per-ray need.

This probe computes, from the same ground-truth need masks as probe7, the
ideal block union U for each candidate ordering:

  morton      : production ray_sort_keys (origin Morton + direction cell)
  cid         : first-candidate cluster id major, morton minor
  cid2        : first-candidate id major, SECOND-candidate id minor

Usage: python tools/tpu_probe8.py [--sub 7] [--n 131072] [--scene dragon|cornell-box]
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
    ap.add_argument("--c", type=int, default=0, help="0 = adaptive default")
    ap.add_argument("--n", type=int, default=131072)
    ap.add_argument("--scene", default="dragon")
    ap.add_argument("--kinds", default="primary,bounce")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from owl_path_tracer_tpu.ops import fused2 as f2
    from owl_path_tracer_tpu.ops import math as m

    if args.scene == "dragon":
        scene, settings = load(args.sub)
    else:
        from owl_path_tracer_tpu.models.scene import compile_scene

        scene = compile_scene("assets", args.scene, (1024, 1024))
    c = args.c
    if not c:  # mirror film.make_accel's adaptive choice
        c = 512
        while scene.tri_idx.shape[0] // c < 64 and c > 128:
            c //= 2
    fb = f2.build_fused2_scene(scene, cluster_size=c)
    k = fb.num_clusters
    boxes = fb.boxes  # [8,K]

    @jax.jit
    def entries(o, d):
        """[N,K] slab entry (inf where the slab test fails)."""
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
        return jnp.where(enter <= tf, enter, jnp.inf)

    for kind in args.kinds.split(","):
        o, d = make_rays(scene, args.n, kind)
        rec, _ = f2.fused2_closest_hit(o, d, fb, sort=True)
        t_true = np.where(np.asarray(rec.tri) >= 0, np.asarray(rec.t), 1e10)

        ent = np.asarray(entries(o, d))  # [N,K]
        need = ent <= t_true[:, None]
        u_ray = need.sum(-1)

        # candidate keys (pre-traversal knowledge only: t_max, not t_true)
        order = np.argsort(np.where(np.isinf(ent), np.inf, ent), axis=1)
        rr = np.arange(args.n)
        cand = [order[:, j].astype(np.int64) for j in range(3)]
        for j in range(3):
            noj = np.isinf(ent[rr, order[:, j]])
            cand[j][noj] = k
            if j:  # candidates are cumulative: no j-th without (j-1)-th
                cand[j] = np.maximum(cand[j], (cand[j - 1] == k) * k)
        first, second, third = cand

        morton = np.asarray(f2.ray_sort_keys(o, d, fb.bounds)).astype(np.int64)
        keys = {
            "morton": morton,
            "cid": (first << 32) | morton,
            "cid2": (first << 44) | (second << 32) | morton,
            "cid2nm": (first << 12) | second,
            "cid3": (first << 52) | (second << 40) | (third << 28),
        }
        for b in (128, 256):
            row = {"probe": "cid_sort_union", "scene": args.scene, "kind": kind,
                   "k": k, "c": c, "b": b,
                   "u_ray_mean": round(float(u_ray.mean()), 2)}
            for name, key in keys.items():
                perm = np.argsort(key, kind="stable")
                ns = need[perm]
                nb = args.n // b
                union = ns.reshape(nb, b, k).any(axis=1).sum(-1)
                row[f"U_{name}"] = round(float(union.mean()), 2)
                row[f"U_{name}_p90"] = int(np.percentile(union, 90))
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
