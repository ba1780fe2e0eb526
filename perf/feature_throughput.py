"""Feature-extraction (serving) throughput: per-file vs lane-packed batched.

The reference extracts eval features one file at a time
(/root/reference/cpc/eval/ABX.py:174-177 -> feature_loader.py:228-269):
B=1 chunks, one dispatch + one readback per chunk.  ABX/zerospeech runs
spend most of their wall clock here.  build_features_batched packs
``n_lanes`` files per batch (one compiled shape, per-lane hidden carry
with file-boundary resets); this instrument measures both paths on the
same synthetic 16 kHz corpus (perf/sustained_epoch.py's generator) with
the default 256-dim CPC model, ABX-style (keep_hidden=True, context
features).

Wall-clock is honest here: every chunk batch ends in a host readback
(np.asarray), so the axon tunnel's early-return hazard (CLAUDE.md) does
not apply.  NOTE the tunnel's ~12-28 MB/s host<->device path caps both
modes well below production PCIe rates; the per-dispatch savings of the
batched path is what transfers.

Usage: python perf/feature_throughput.py [--n_files 24] [--lanes 8]
Prints one JSON line with files/s, frames/s and the batched speedup.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from perf.sustained_epoch import DB, build_db  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_files", type=int, default=24)
    p.add_argument("--lanes", type=int, default=8)
    p.add_argument("--max_size_seq", type=int, default=64000)
    p.add_argument("--hiddenEncoder", type=int, default=256)
    p.add_argument("--arMode", default="LSTM")
    args = p.parse_args()

    build_db()

    import jax
    from cpc_audio_tpu.config import CPCConfig
    from cpc_audio_tpu.data.dataset import find_all_seqs
    from cpc_audio_tpu.feature_loader import (FeatureModule, build_feature,
                                              build_features_batched)
    from cpc_audio_tpu.models import build_model

    seqs, _ = find_all_seqs(DB, extension=".wav", load_cache=False)
    paths = [os.path.join(DB, p) for _, p in seqs][:args.n_files]

    config = CPCConfig(hiddenEncoder=args.hiddenEncoder,
                       hiddenGar=args.hiddenEncoder, arMode=args.arMode)
    model = build_model(config)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           np.zeros((2, 1, args.max_size_seq), np.float32))
    fm = FeatureModule(model, variables, keep_hidden=True)

    # warm both compiled shapes (B=1 and B=lanes) outside the timing
    build_feature(fm, paths[0], max_size_seq=args.max_size_seq)
    for _ in build_features_batched(fm, paths[:args.lanes],
                                    n_lanes=args.lanes,
                                    max_size_seq=args.max_size_seq):
        pass

    t0 = time.perf_counter()
    n_frames = 0
    for path in paths:
        f = build_feature(fm, path, max_size_seq=args.max_size_seq)
        n_frames += f.shape[1]
    t_per_file = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_frames_b = 0
    for _, f in build_features_batched(fm, paths, n_lanes=args.lanes,
                                       max_size_seq=args.max_size_seq):
        n_frames_b += f.shape[1]
    t_batched = time.perf_counter() - t0

    assert n_frames_b == n_frames, (n_frames_b, n_frames)
    print(json.dumps({
        "metric": "feature_extraction_speedup_batched_vs_per_file",
        "value": round(t_per_file / t_batched, 3),
        "n_files": len(paths), "lanes": args.lanes,
        "frames_total": n_frames,
        "per_file": {"sec": round(t_per_file, 2),
                     "files_per_sec": round(len(paths) / t_per_file, 3),
                     "frames_per_sec": round(n_frames / t_per_file, 1)},
        "batched": {"sec": round(t_batched, 2),
                    "files_per_sec": round(len(paths) / t_batched, 3),
                    "frames_per_sec": round(n_frames / t_batched, 1)},
    }))


if __name__ == "__main__":
    main()
