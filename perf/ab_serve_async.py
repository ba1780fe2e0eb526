"""A/B the batched serving readback: synchronous vs copy_to_host_async.

build_features_batched runs a 1-deep pipeline (dispatch batch t+1 before
reading back batch t), but the readback itself is a blocking np.asarray
inside drain().  `copy_to_host_async()` at dispatch time should start the
device->host transfer of batch t's output while the host packs and
dispatches batch t+1 — on the axon tunnel (~163 ms readback per 3.3 MB
batch, docs/PERFORMANCE.md round 5 serving) that is the largest
remaining per-batch cost.

The toggle is read per generator call (CPC_SERVE_ASYNC_READBACK), so one
process can interleave both arms round-robin against the same compiled
forward — service-load drift cancels (perf/ab_scope.py methodology).

Usage: python perf/ab_serve_async.py [--n_files 24] [--lanes 8] [--reps 4]
Prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from perf.sustained_epoch import DB, build_db  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_files", type=int, default=24)
    p.add_argument("--lanes", type=int, default=8)
    p.add_argument("--max_size_seq", type=int, default=64000)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--per_file", action="store_true",
                   help="A/B build_feature's per-chunk readbacks instead "
                        "of the batched generator's")
    args = p.parse_args()

    import jax
    import numpy as np

    from cpc_audio_tpu.config import CPCConfig
    from cpc_audio_tpu.data.dataset import find_all_seqs
    from cpc_audio_tpu.feature_loader import (FeatureModule, build_feature,
                                              build_features_batched)
    from cpc_audio_tpu.models import build_model

    config = CPCConfig(hiddenEncoder=256, hiddenGar=256, arMode="LSTM")
    model = build_model(config)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           np.zeros((2, 1, args.max_size_seq), np.float32))

    build_db()
    seqs, _ = find_all_seqs(DB, extension=".wav", load_cache=False)
    paths = [os.path.join(DB, p) for _, p in seqs][:args.n_files]
    fm = FeatureModule(model, variables, keep_hidden=True)

    def run_batched():
        t0 = time.perf_counter()
        n = 0
        for _, f in build_features_batched(fm, paths, n_lanes=args.lanes,
                                           max_size_seq=args.max_size_seq):
            n += f.shape[1]
        return time.perf_counter() - t0, n

    def run_per_file():
        t0 = time.perf_counter()
        n = 0
        for path in paths:
            n += build_feature(fm, path,
                               max_size_seq=args.max_size_seq).shape[1]
        return time.perf_counter() - t0, n

    run = run_per_file if args.per_file else run_batched
    run()  # warm the compile outside timing

    times = {"0": [], "1": []}
    frames = None
    for _ in range(args.reps):
        for arm in ("0", "1"):
            os.environ["CPC_SERVE_ASYNC_READBACK"] = arm
            t, n = run()
            times[arm].append(t)
            assert frames is None or frames == n
            frames = n
    os.environ.pop("CPC_SERVE_ASYNC_READBACK", None)

    sync_t, async_t = min(times["0"]), min(times["1"])
    print(json.dumps({
        "metric": "serve_async_readback_speedup"
                  + ("_per_file" if args.per_file else ""),
        "value": round(sync_t / async_t, 3),
        "n_files": len(paths), "lanes": args.lanes, "frames_total": frames,
        "sync": {"best_sec": round(sync_t, 2),
                 "all_sec": [round(t, 2) for t in times["0"]]},
        "async": {"best_sec": round(async_t, 2),
                  "all_sec": [round(t, 2) for t in times["1"]]},
    }))


if __name__ == "__main__":
    main()
