"""Data-pipeline scale soak (VERDICT round-3 item 4).

The reference's design point for pack streaming is multi-pack multi-GB
corpora with async decode hiding behind training
(/root/reference/cpc/dataset.py:91-137); the repo's golden tests only
exercise the bundled 2-pack/9-file fixture.  This harness generates a
synthetic multi-speaker WAV tree big enough for several packs, then:

  soak mode (default): iterates a full multi-pack epoch through
  AudioBatchData on the host, measuring (i) decode prefetch stall per
  pack swap (AudioBatchData.stall_log), (ii) host-side batch-gather
  throughput, and asserting integrity at scale — samespeaker batch
  purity and window<->speaker consistency (each file's samples encode
  its speaker id as a DC offset, so every gathered window can be
  validated against its label without bookkeeping).

  --train mode: launches a real training epoch over the tree via the
  training CLI (real TPU), so the printed `epoch throughput` /
  `loader stalls` lines measure prefetch overlap against real step
  compute.  Compare w/s against perf/sustained_epoch.py --resident.

Usage:
    python perf/soak_loader.py [--root /tmp/cpc_soak_db] [--n_files 1200]
        [--max_size_loaded 48000000] [--train]

Results recorded in docs/PERFORMANCE.md (round 4).
"""

import argparse
import json
import os
import sys
import time
import wave

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 16000


def make_tree(root: str, n_files: int, n_speakers: int,
              min_s: float = 8.0, max_s: float = 14.0, seed: int = 0,
              quiet: bool = False, tone: bool = False) -> None:
    """Synthetic <root>/<speaker>/<file>.wav tree (16-bit PCM mono 16 kHz).

    Each file's samples are speaker_id/100 DC plus low-amplitude noise, so
    any window gathered from the flat buffer identifies its true speaker:
    round(100 * mean(window)) == speaker id.

    tone=True additionally mixes in a speaker-specific sinusoid
    (150 + 55*spk Hz, random phase per file).  The DC code is stripped by
    the encoder's ChannelNorm (a per-channel mean over time), so the DC
    tree is useless for LEARNING experiments; the tone survives
    normalization and makes the tree usable as a second dataset point
    for objective comparisons (speaker linear-separability probe,
    perf/validate_soak_speaker.py)."""
    if os.path.exists(os.path.join(root, ".soak_done")):
        return
    rng = np.random.RandomState(seed)
    t0 = time.perf_counter()
    for i in range(n_files):
        spk = i % n_speakers
        d = os.path.join(root, f"spk{spk:04d}")
        os.makedirs(d, exist_ok=True)
        n = int(SR * rng.uniform(min_s, max_s))
        dc = spk / 100.0
        x = dc + 0.003 * rng.randn(n)
        if tone:
            t = np.arange(n) / SR
            f = 150.0 + 55.0 * spk
            x = x + 0.05 * np.sin(2 * np.pi * f * t
                                  + rng.uniform(0, 2 * np.pi)) \
                + 0.05 * rng.randn(n)
        pcm = np.clip(x * 32767.0, -32768, 32767).astype("<i2")
        with wave.open(os.path.join(d, f"f{i:05d}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(SR)
            w.writeframes(pcm.tobytes())
    open(os.path.join(root, ".soak_done"), "w").close()
    if not quiet:
        print(f"generated {n_files} wavs / {n_speakers} speakers "
              f"in {time.perf_counter() - t0:.1f}s")


def soak_epoch(root: str, max_size_loaded: int, size_window: int = 20480,
               batch_size: int = 32, n_process_loader: int = 8) -> dict:
    from cpc_audio_tpu.data.dataset import AudioBatchData, find_all_seqs

    seqs, speakers = find_all_seqs(root, extension=".wav")
    n_speakers = len(speakers)
    t0 = time.perf_counter()
    ds = AudioBatchData(root, size_window, seqs, None, n_speakers,
                        n_process_loader=n_process_loader,
                        max_size_loaded=max_size_loaded, seed=7)
    cold = time.perf_counter() - t0
    n_packs = ds.get_n_loads_per_epoch()

    loader = ds.get_data_loader(batch_size, "samespeaker", True)
    n_batches = n_windows = 0
    impure = mislabeled = 0
    t0 = time.perf_counter()
    for windows, labels in loader:
        n_batches += 1
        n_windows += windows.shape[0]
        if not (labels == labels[0]).all():
            impure += 1
        # the DC encoding makes every window self-identifying
        got = np.round(100.0 * windows.mean(axis=(1, 2))).astype(np.int64)
        mislabeled += int((got != labels).sum())
        # seq table integrity, checked once per pack via sampler preconds
        assert (np.diff(ds.seq_label) > 0).all()
    wall = time.perf_counter() - t0
    swaps = ds.stall_log[1:]
    return {
        "n_files": len(seqs), "n_speakers": n_speakers, "n_packs": n_packs,
        "cold_start_s": round(cold, 2),
        "n_batches": n_batches, "n_windows": n_windows,
        "host_epoch_s": round(wall, 2),
        "host_windows_per_s": round(n_windows / wall, 1),
        "pack_swaps": len(swaps),
        "stall_total_s": round(sum(swaps), 3),
        "stall_max_s": round(max(swaps), 3) if swaps else 0.0,
        "impure_batches": impure, "mislabeled_windows": mislabeled,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/cpc_soak_db")
    p.add_argument("--n_files", type=int, default=1200)
    p.add_argument("--n_speakers", type=int, default=40)
    p.add_argument("--max_size_loaded", type=int, default=48_000_000,
                   help="samples per pack (48M -> ~4 packs at defaults)")
    p.add_argument("--n_process_loader", type=int, default=8)
    p.add_argument("--batchSizeGPU", type=int, default=32)
    p.add_argument("--train", action="store_true",
                   help="run a real training epoch over the tree (TPU)")
    args = p.parse_args()

    make_tree(args.root, args.n_files, args.n_speakers)

    if args.train:
        from cpc_audio_tpu.train import main as train_main
        rc = train_main([
            "--pathDB", args.root, "--file_extension", ".wav",
            "--pathCheckpoint", "/tmp/cpc_soak_ckpt",
            "--nEpoch", "1", "--batchSizeGPU", str(args.batchSizeGPU),
            "--compute_dtype", "bfloat16",
            "--max_size_loaded", str(args.max_size_loaded),
            "--n_process_loader", str(args.n_process_loader),
            "--ignore_cache", "--samplingType", "samespeaker"])
        return rc

    print(json.dumps(soak_epoch(args.root, args.max_size_loaded,
                                n_process_loader=args.n_process_loader)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
