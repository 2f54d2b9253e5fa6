"""Fused2 kernel ablation probes: where does a wave's time actually go?

Chained-scan timing (dispatch-free deltas) of kernel variants:
  * max_steps=N sweep  -> per-retirement-iteration fixed cost
  * with_attrs on/off  -> attribute-replay cost
  * any_hit            -> winner-selection cost (any-hit skips it)
  * block size sweep   -> per-block fixed cost amortization

Usage: python tools/tpu_probe3.py [--sub 7] [--c 512] [--n 131072]
"""
import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "assets"))

import numpy as np

from tpu_probe2 import load, make_rays, sync, timeit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sub", type=int, default=7)
    ap.add_argument("--c", type=int, default=512)
    ap.add_argument("--n", type=int, default=131072)
    ap.add_argument("--kind", default="primary")
    ap.add_argument("--blocks", default="128")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from owl_path_tracer_tpu.ops import fused2 as f2

    scene, settings = load(args.sub)
    fb = f2.build_fused2_scene(scene, cluster_size=args.c)
    o, d = make_rays(scene, args.n, args.kind)
    tmax = jnp.full((args.n,), 1e10, jnp.float32)

    def chained_ms(fn, reps=6):
        def mk(length):
            @jax.jit
            def run(o, d):
                def body(carry, _):
                    o, d = carry
                    s = fn(o, d)
                    return (o + s * 0.0, d), None

                (o2, _), _ = jax.lax.scan(body, (o, d), None, length=length)
                return o2

            return run

        r1, rN = mk(1), mk(reps)
        sync(r1(o, d)); sync(rN(o, d))
        d1 = timeit(lambda: sync(r1(o, d)))
        dN = timeit(lambda: sync(rN(o, d)))
        return (dN - d1) / (reps - 1) * 1e3

    for block in [int(b) for b in args.blocks.split(",")]:
        # iteration-count sweep: marginal cost of one retirement iteration
        for ms_cap in (0, 1, 2, 4, 8, 512):
            def tv(o, d, _cap=ms_cap, _blk=block):
                out = f2.fused2_traverse(
                    o, d, tmax, fb, block=_blk, max_steps=_cap, with_attrs=False)
                return jnp.sum(out[:, 0])

            ms = chained_ms(tv)
            out = f2.fused2_traverse(o, d, tmax, fb, block=block, max_steps=ms_cap,
                                     with_attrs=False)
            steps = float(np.asarray(out[:, 6]).mean())
            print(json.dumps({
                "probe": "ablate", "block": block, "max_steps": ms_cap,
                "kind": args.kind, "k": fb.num_clusters,
                "ms": round(ms, 2), "mean_block_iters": round(steps, 2),
            }), flush=True)

        # attrs and any-hit variants at full steps
        for name, kw in (
            ("attrs_on", dict(with_attrs=True)),
            ("any_hit", dict(with_attrs=False, any_hit=True)),
        ):
            def tv2(o, d, _kw=kw, _blk=block):
                out = f2.fused2_traverse(o, d, tmax, fb, block=_blk,
                                         max_steps=512, **_kw)
                return jnp.sum(out[:, 0])

            ms = chained_ms(tv2)
            print(json.dumps({
                "probe": "ablate", "block": block, "variant": name,
                "kind": args.kind, "ms": round(ms, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
