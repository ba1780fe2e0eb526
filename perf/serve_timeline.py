"""Per-phase timeline of the serving (feature-extraction) paths.

Round-4 contradiction (docs/PERFORMANCE.md round 4 serving section):
lane-packed batched extraction is 3.12x faster device-bound, but through
the axon remote tunnel its WALL clock measured 2.3x SLOWER than per-file
— despite equal total bytes and a transfer profile (perf/probe_tunnel.py:
fixed ~40 ms latency, ~25-40 MB/s) that should favor fewer, larger
transfers.  This instrument attributes the gap: it runs both paths over
the same files and logs, per dispatch,

  t_host     host-side batch assembly + decode wait
  t_dispatch time for the jitted call to RETURN (async enqueue)
  t_ready    block_until_ready on the returned device array
  t_read     np.asarray readback (device -> host through the tunnel)

and for the batched path additionally separates the 1-deep pipeline's
overlap (dispatch t+1 before reading back t).

Usage: python perf/serve_timeline.py [--n_files 16] [--lanes 8]
Prints one JSON line per mode plus a summary attribution.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from perf.sustained_epoch import DB, build_db  # noqa: E402


def timeline_per_file(fm, paths, max_size_seq):
    from cpc_audio_tpu.data.audio_io import decode_file
    import jax.numpy as jnp

    ds = fm.get_downsampling_factor()
    rows = []
    t_wall0 = time.perf_counter()
    for path in paths:
        fm.reset()
        t0 = time.perf_counter()
        seq = decode_file(path)
        start = 0
        while start < len(seq):
            chunk = seq[start:start + max_size_seq]
            valid = len(chunk) // ds
            if len(chunk) < max_size_seq:
                chunk = np.pad(chunk, (0, max_size_seq - len(chunk)))
            t1 = time.perf_counter()
            feats, h = fm._fwd(fm.variables,
                               jnp.asarray(chunk[None, None, :]), fm.hidden)
            fm.hidden = h
            t2 = time.perf_counter()
            feats.block_until_ready()
            t3 = time.perf_counter()
            _ = np.asarray(feats[:, :valid])
            t4 = time.perf_counter()
            rows.append({"host": t1 - t0, "dispatch": t2 - t1,
                         "ready": t3 - t2, "read": t4 - t3})
            start += max_size_seq
            t0 = time.perf_counter()
    wall = time.perf_counter() - t_wall0
    return rows, wall


def timeline_batched(fm, paths, n_lanes, max_size_seq, pipeline=True):
    """Reimplements build_features_batched's loop with phase timers
    (same dispatch order and 1-deep pipeline; bookkeeping elided)."""
    from cpc_audio_tpu.data.audio_io import decode_file
    import jax
    import jax.numpy as jnp

    model, variables = fm.model, fm.variables

    def fwd(variables, batch, hidden, keep):
        hidden = jax.tree_util.tree_map(
            lambda h: h * keep[:, None].astype(h.dtype), hidden)
        c, z, _, h = model.apply(variables, batch, None, hidden,
                                 train=False)
        return c.astype(jnp.float32), h

    fwd = jax.jit(fwd)
    hidden = model.zero_state(n_lanes)

    # pre-decode everything (decode is not what we are attributing here)
    waves = [np.asarray(decode_file(p), np.float32) for p in paths]
    # lane plan: round-robin files into lanes, chunk cursors
    lanes = [[] for _ in range(n_lanes)]
    for i, w in enumerate(waves):
        lanes[i % n_lanes].append(w)
    cursors = [(0, 0) for _ in range(n_lanes)]  # (file idx in lane, offset)

    def next_batch():
        batch = np.zeros((n_lanes, 1, max_size_seq), np.float32)
        keep = np.ones((n_lanes,), np.float32)
        any_work = False
        for lane in range(n_lanes):
            fi, off = cursors[lane]
            if fi >= len(lanes[lane]):
                keep[lane] = 0.0
                continue
            any_work = True
            w = lanes[lane][fi]
            if off == 0:
                keep[lane] = 0.0
            chunk = w[off:off + max_size_seq]
            batch[lane, 0, :len(chunk)] = chunk
            off += max_size_seq
            cursors[lane] = (fi + 1, 0) if off >= len(w) else (fi, off)
        return (batch, keep) if any_work else None

    rows = []
    t_wall0 = time.perf_counter()
    inflight = None
    while True:
        t0 = time.perf_counter()
        nb = next_batch()
        t1 = time.perf_counter()
        if nb is not None:
            dbatch = jax.device_put(nb[0])
            dkeep = jax.device_put(nb[1])
            t1b = time.perf_counter()
            feats, hidden = fwd(variables, dbatch, hidden, dkeep)
        else:
            feats = None
            t1b = t1
        t2 = time.perf_counter()
        row = {"host": t1 - t0, "put": t1b - t1, "dispatch": t2 - t1b}
        if not pipeline and feats is not None:
            feats.block_until_ready()
        t3 = time.perf_counter()
        row["ready_new"] = t3 - t2
        if inflight is not None:
            inflight.block_until_ready()
            t4 = time.perf_counter()
            _ = np.asarray(inflight)
            t5 = time.perf_counter()
            row["ready_prev"] = t4 - t3
            row["read_prev"] = t5 - t4
        rows.append(row)
        if feats is None:
            break
        inflight = feats
    wall = time.perf_counter() - t_wall0
    return rows, wall


def summarize(rows):
    out = {}
    keys = sorted({k for r in rows for k in r})
    for k in keys:
        vals = [r[k] for r in rows if k in r]
        out[k] = {"sum_s": round(sum(vals), 3),
                  "med_ms": round(1e3 * sorted(vals)[len(vals) // 2], 2),
                  "max_ms": round(1e3 * max(vals), 1),
                  "n": len(vals)}
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_files", type=int, default=16)
    p.add_argument("--lanes", type=int, default=8)
    p.add_argument("--max_size_seq", type=int, default=64000)
    p.add_argument("--no_pipeline", action="store_true")
    args = p.parse_args()

    import jax
    from cpc_audio_tpu.config import CPCConfig
    from cpc_audio_tpu.data.dataset import find_all_seqs
    from cpc_audio_tpu.feature_loader import FeatureModule
    from cpc_audio_tpu.models import build_model

    build_db()
    seqs, _ = find_all_seqs(DB, extension=".wav", load_cache=False)
    paths = [os.path.join(DB, p) for _, p in seqs][:args.n_files]

    config = CPCConfig(hiddenEncoder=256, hiddenGar=256, arMode="LSTM")
    model = build_model(config)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           np.zeros((2, 1, args.max_size_seq), np.float32))
    fm = FeatureModule(model, variables, keep_hidden=True)

    # warm both shapes
    timeline_per_file(fm, paths[:1], args.max_size_seq)
    timeline_batched(fm, paths[:args.lanes], args.lanes, args.max_size_seq)

    rows_p, wall_p = timeline_per_file(fm, paths, args.max_size_seq)
    rows_b, wall_b = timeline_batched(fm, paths, args.lanes,
                                      args.max_size_seq,
                                      pipeline=not args.no_pipeline)
    print(json.dumps({"metric": "serve_timeline",
                      "backend": jax.default_backend(),
                      "n_files": len(paths), "lanes": args.lanes,
                      "per_file": {"wall_s": round(wall_p, 3),
                                   "n_chunks": len(rows_p),
                                   "phases": summarize(rows_p)},
                      "batched": {"wall_s": round(wall_b, 3),
                                  "n_batches": len(rows_b),
                                  "pipeline": not args.no_pipeline,
                                  "phases": summarize(rows_b)}}))


if __name__ == "__main__":
    main()
