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


def device_rate(model, variables, batch_size, max_size_seq,
                k1=200, k2=600):
    """Device-bound inference rate (frames/s) at a given batch size:
    slope between two chained run lengths (bench.py methodology — one
    dispatch per run, forced readback, slope cancels RPC/transfer).

    The chained forward carries the recurrent hidden state and perturbs
    the input per iteration (x * (1 + i*1e-6)) so XLA cannot hoist the
    loop body as loop-invariant (the constant-input microbench trap,
    docs/PERFORMANCE.md round 3)."""
    import jax
    import jax.numpy as jnp

    ds = 160
    frames = max_size_seq // ds
    x = jnp.asarray(np.random.RandomState(0).randn(
        batch_size, 1, max_size_seq).astype(np.float32))
    hidden0 = (model.zero_state(batch_size)
               if hasattr(model, "zero_state") else None)

    @jax.jit
    def run_k(k):
        def body(i, carry):
            acc, hidden = carry
            c, _, _, hidden = model.apply(
                variables, x * (1.0 + 1e-6 * i), None, hidden, train=False)
            return acc + jnp.sum(c.astype(jnp.float32)), hidden
        acc, _ = jax.lax.fori_loop(0, k, body, (jnp.zeros(()), hidden0))
        return acc

    _ = np.asarray(run_k(2))  # compile + warm
    times = []
    for k in (k1, k2):
        t0 = time.perf_counter()
        _ = np.asarray(run_k(k))
        times.append(time.perf_counter() - t0)
    sec_per_chunk = (times[1] - times[0]) / (k2 - k1)
    return batch_size * frames / sec_per_chunk, sec_per_chunk


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_files", type=int, default=24)
    p.add_argument("--lanes", type=int, default=8)
    p.add_argument("--max_size_seq", type=int, default=64000)
    p.add_argument("--hiddenEncoder", type=int, default=256)
    p.add_argument("--arMode", default="LSTM")
    p.add_argument("--device_rate", action="store_true",
                   help="measure the device-bound chained-forward rate at "
                        "B=1 vs B=lanes instead of the wall-clock "
                        "end-to-end paths (separates the framework from "
                        "the remote tunnel's transfer behavior)")
    args = p.parse_args()

    import jax
    from cpc_audio_tpu.config import CPCConfig
    from cpc_audio_tpu.data.dataset import find_all_seqs
    from cpc_audio_tpu.feature_loader import (FeatureModule, build_feature,
                                              build_features_batched)
    from cpc_audio_tpu.models import build_model

    config = CPCConfig(hiddenEncoder=args.hiddenEncoder,
                       hiddenGar=args.hiddenEncoder, arMode=args.arMode)
    model = build_model(config)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           np.zeros((2, 1, args.max_size_seq), np.float32))

    if args.device_rate:
        fps1, spc1 = device_rate(model, variables, 1, args.max_size_seq)
        fpsN, spcN = device_rate(model, variables, args.lanes,
                                 args.max_size_seq)
        print(json.dumps({
            "metric": "feature_extraction_device_frames_per_sec",
            "b1": {"frames_per_sec": round(fps1, 1),
                   "ms_per_chunk": round(spc1 * 1e3, 3)},
            "lanes": {"n": args.lanes, "frames_per_sec": round(fpsN, 1),
                      "ms_per_chunk_batch": round(spcN * 1e3, 3)},
            "batched_speedup_device": round(fpsN / fps1, 3),
        }))
        return

    build_db()
    seqs, _ = find_all_seqs(DB, extension=".wav", load_cache=False)
    paths = [os.path.join(DB, p) for _, p in seqs][:args.n_files]
    fm = FeatureModule(model, variables, keep_hidden=True)

    # warm both compiled shapes (B=1 and B=lanes) outside the timing
    build_feature(fm, paths[0], max_size_seq=args.max_size_seq)
    for _ in build_features_batched(fm, paths[:args.lanes],
                                    n_lanes=args.lanes,
                                    max_size_seq=args.max_size_seq):
        pass

    # Interleave A/B passes and keep the best of each: the remote
    # service's load varies enough between minutes to invert a
    # back-to-back comparison (measured; CLAUDE.md's variance caveat).
    def run_per_file():
        t0 = time.perf_counter()
        n = 0
        for path in paths:
            f = build_feature(fm, path, max_size_seq=args.max_size_seq)
            n += f.shape[1]
        return time.perf_counter() - t0, n

    def run_batched():
        t0 = time.perf_counter()
        n = 0
        for _, f in build_features_batched(fm, paths, n_lanes=args.lanes,
                                           max_size_seq=args.max_size_seq):
            n += f.shape[1]
        return time.perf_counter() - t0, n

    times_p, times_b = [], []
    for _ in range(3):
        tp, n_frames = run_per_file()
        tb, n_frames_b = run_batched()
        assert n_frames_b == n_frames, (n_frames_b, n_frames)
        times_p.append(tp)
        times_b.append(tb)
    t_per_file, t_batched = min(times_p), min(times_b)
    print(json.dumps({
        "metric": "feature_extraction_speedup_batched_vs_per_file",
        "value": round(t_per_file / t_batched, 3),
        "n_files": len(paths), "lanes": args.lanes,
        "frames_total": n_frames,
        "per_file": {"sec": round(t_per_file, 2),
                     "files_per_sec": round(len(paths) / t_per_file, 3),
                     "frames_per_sec": round(n_frames / t_per_file, 1),
                     "all_passes_sec": [round(t, 2) for t in times_p]},
        "batched": {"sec": round(t_batched, 2),
                    "files_per_sec": round(len(paths) / t_batched, 3),
                    "frames_per_sec": round(n_frames / t_batched, 1),
                    "all_passes_sec": [round(t, 2) for t in times_b]},
    }))


if __name__ == "__main__":
    main()
