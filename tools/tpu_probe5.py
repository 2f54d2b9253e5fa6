"""Round-3 micro-probes: first-launch anomaly + end-of-frame readback cost.

The frame series (tpu_probe4 frame) shows launch 1 of every fresh pool at
~2.0 s vs the 153 ms steady state, with compilation already cached and a
warm-up chunk of IDENTICAL static shape synced beforehand.  This isolates:

  A  launch-time series after a pool reset, repeated: does launch 1 stay
     slow on the second reset (systematic) or not (one-off warm-up)?
  B  np.asarray(film) readback (12 MB over the relay) -- bench.py's timed
     section includes it via render_image_wavefront.
  C  dispatch floor: status-only readback of an already-computed launch.

Usage: python tools/tpu_probe5.py [--iters 16] [--launches 4] [--resets 3]
"""
import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "assets"))

import numpy as np

from tpu_probe4 import bench_setup


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--launches", type=int, default=4)
    ap.add_argument("--resets", type=int, default=3)
    ap.add_argument("--block", type=int, default=256)
    args = ap.parse_args()

    import jax.numpy as jnp

    from owl_path_tracer_tpu.render import wavefront as wf

    scene, settings, fb = bench_setup()
    total_work = settings.width * settings.height * settings.max_samples

    def launch(st):
        return wf._run_chunk(
            scene, settings, st, fb, False, jnp.int32(total_work), args.iters,
            None, None, fused2_block=args.block, fused2_sort=True,
        )

    # compile warm-up
    st = wf.new_pool(settings, 131072)
    st, status = launch(st)
    np.asarray(status)

    # A: reset series
    for r in range(args.resets):
        st = wf.new_pool(settings, 131072)
        times = []
        for _ in range(args.launches):
            t0 = time.time()
            st, status = launch(st)
            np.asarray(status)
            times.append(round((time.time() - t0) * 1e3, 1))
        print(json.dumps({"probe": "reset_series", "reset": r, "launch_ms": times}), flush=True)

    # B: film readback
    t0 = time.time()
    acc = np.asarray(st.acc)
    print(json.dumps({
        "probe": "film_readback", "bytes": int(acc.nbytes),
        "ms": round((time.time() - t0) * 1e3, 1),
    }), flush=True)

    # C: dispatch floor -- sync an already-materialized tiny array
    t0 = time.time()
    np.asarray(status)
    print(json.dumps({"probe": "status_resync_ms", "ms": round((time.time() - t0) * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
