"""Hardware-vs-interpret parity artifact for the fused2 Pallas kernel.

VERDICT r2 weak #4: all fused2 correctness tests run interpret=True on CPU; a
silent Mosaic lowering miscompile would ship.  This tool runs the SAME ray
sets through the Mosaic-lowered kernel on the real TPU and through interpret
mode, compares, and writes HWPARITY_r{N}.json with content hashes.

Comparison policy: winner TRIANGLE ids and occlusion bits must match exactly
where both sides resolve (they derive from the same f32 matmul math -- the
MXU f32 path is bit-stable for these operands); t/u/v and attr payloads are
compared allclose (1e-5) to absorb any accumulation-order differences, with
the observed max deltas recorded in the artifact.

Usage: python tools/hw_parity.py [--sub 6] [--n 8192] [--out HWPARITY_r03.json]
"""
import argparse
import hashlib
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "assets"))

import numpy as np


def digest(a: np.ndarray) -> str:
    return hashlib.sha256(np.ascontiguousarray(a).tobytes()).hexdigest()[:16]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sub", type=int, default=6)
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--c", type=int, default=512)
    ap.add_argument("--block", type=int, default=256)
    ap.add_argument("--out", default="HWPARITY_r03.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    assert jax.default_backend() in ("tpu", "axon"), (
        "hw_parity must run on the real TPU backend"
    )

    from tpu_probe2 import load, make_rays

    from owl_path_tracer_tpu.ops import fused2 as f2

    scene, settings = load(args.sub)
    fb = f2.build_fused2_scene(scene, cluster_size=args.c)

    report = {"sub": args.sub, "n": args.n, "c": args.c, "block": args.block,
              "fanout": f2.FANOUT, "cases": []}
    ok_all = True
    for kind in ("primary", "bounce"):
        o, d = make_rays(scene, args.n, kind)
        tmax = jnp.full((args.n,), 1e10, jnp.float32)
        for any_hit in (False, True):
            kw = dict(block=args.block, max_steps=512,
                      with_attrs=not any_hit, any_hit=any_hit)
            hw = np.asarray(f2.fused2_traverse(o, d, tmax, fb, interpret=False, **kw))
            it = np.asarray(f2.fused2_traverse(o, d, tmax, fb, interpret=True, **kw))
            res = (hw[:, 5] > 0) & (it[:, 5] > 0)
            if any_hit:
                exact = bool((hw[res, 4] == it[res, 4]).all())
                tdelta = 0.0
                adelta = 0.0
            else:
                exact = bool((hw[res, 3] == it[res, 3]).all()
                             and (hw[res, 4] == it[res, 4]).all())
                tdelta = float(np.abs(hw[res, 0] - it[res, 0]).max(initial=0.0))
                adelta = float(np.abs(hw[res, 16:] - it[res, 16:]).max(initial=0.0))
            case = {
                "kind": kind, "any_hit": any_hit,
                "resolved_frac": float(res.mean()),
                "winner_bits_exact": exact,
                "max_t_delta": tdelta,
                "max_attr_delta": adelta,
                "hash_hw": digest(hw[res]),
                "hash_interpret": digest(it[res]),
            }
            case["equal"] = exact and tdelta <= 1e-5 and adelta <= 1e-5
            ok_all &= case["equal"]
            report["cases"].append(case)
            print(json.dumps(case), flush=True)

    report["ok"] = ok_all
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out} ok={ok_all}")
    if not ok_all:
        sys.exit(1)


if __name__ == "__main__":
    main()
