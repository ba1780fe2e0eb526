"""Second-dataset objective comparison: exact vs stratified on the soak
tree with a SPEAKER probe (VERDICT r4 item 4b).

The fixture-db validation matrix (perf/validate_objectives.py,
docs/PERFORMANCE.md rounds 4-5) is 9 files / 1 labelled probe file; this
harness adds a structurally different point: a multi-pack synthetic
corpus (perf/soak_loader.make_tree with tone=True — per-speaker
sinusoids that survive ChannelNorm; the DC-only soak tree is
information-theoretically USELESS for learning, the encoder's first
ChannelNorm strips a constant offset) with a held-out-file speaker
linear-separability probe (eval/linear_separability.py default mode,
reference linear_separability.py speaker branch).

For each objective variant: train CPC (default 256-dim / 12-head /
128-negative config, bf16, batch 32 — M = 32*128 = 4096 pow-2, so
'stratified' and 'auto' engage the fused path), then run the frozen
speaker probe on trained AND random-init features.

Training uses ``--samplingType uniform`` (NOT the samespeaker
default): each speaker's signal is one stationary tone, so a
samespeaker batch makes every in-batch negative the anchor's own tone
— InfoNCE is degenerate by construction and a 6-epoch samespeaker run
measurably DESTROYS the random-init features' speaker separability
(probe 0.053 trained vs 0.109 random; loss flat at 4.85).  Uniform
batches put other speakers' tones in the negative pool, making the
objective (and therefore the exact-vs-stratified comparison)
informative on this corpus.

Usage (TPU):
    python perf/validate_soak_speaker.py [--n_files 300] [--n_speakers 20]
        [--nEpoch 6] [--workdir /tmp/cpc_soak_speaker]
Prints one JSON line per arm and a final comparison verdict.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from perf.soak_loader import make_tree  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/cpc_soak_speaker")
    p.add_argument("--root", default=None,
                   help="tone-tree root (default <workdir>/db)")
    p.add_argument("--n_files", type=int, default=300)
    p.add_argument("--n_speakers", type=int, default=20)
    p.add_argument("--nEpoch", type=int, default=10)
    p.add_argument("--nEpochProbe", type=int, default=5)
    p.add_argument("--batchSizeGPU", type=int, default=32)
    p.add_argument("--max_size_loaded", type=int, default=20_000_000,
                   help="samples per pack (20M -> ~3 packs at defaults)")
    p.add_argument("--train_seed", type=int, default=1)
    p.add_argument("--probe_seeds", default="0,1")
    p.add_argument("--variants", default="exact,stratified")
    args = p.parse_args()

    from cpc_audio_tpu.eval.linear_separability import main as probe_main
    from cpc_audio_tpu.train import main as train_main

    os.makedirs(args.workdir, exist_ok=True)
    root = args.root or os.path.join(args.workdir, "db")
    make_tree(root, args.n_files, args.n_speakers, tone=True)

    # held-out-file split: last fifth of each speaker's files -> val
    per_spk = {}
    for i in range(args.n_files):
        per_spk.setdefault(i % args.n_speakers, []).append(f"f{i:05d}")
    train_ids, val_ids = [], []
    for spk, ids in per_spk.items():
        k = max(1, len(ids) // 5)
        train_ids += ids[:-k]
        val_ids += ids[-k:]
    train_list = os.path.join(args.workdir, "probe_train.txt")
    val_list = os.path.join(args.workdir, "probe_val.txt")
    with open(train_list, "w") as f:
        f.write("\n".join(train_ids) + "\n")
    with open(val_list, "w") as f:
        f.write("\n".join(val_ids) + "\n")

    probe_seeds = [int(s) for s in args.probe_seeds.split(",") if s.strip()]
    results = {}
    for variant in [v.strip() for v in args.variants.split(",") if v.strip()]:
        ckpt_dir = os.path.join(args.workdir, f"cpc_{variant}")
        rc = train_main([
            "--nGPU", "1",
            "--pathDB", root, "--file_extension", ".wav",
            "--pathCheckpoint", ckpt_dir,
            "--nEpoch", str(args.nEpoch),
            "--save_step", str(max(args.nEpoch - 1, 1)),
            "--batchSizeGPU", str(args.batchSizeGPU),
            "--compute_dtype", "bfloat16",
            "--random_seed", str(args.train_seed),
            "--negativeSamplingMode", variant,
            "--samplingType", "uniform",  # see module docstring
            "--max_size_loaded", str(args.max_size_loaded),
            "--n_process_loader", "8", "--ignore_cache"])
        if rc != 0:
            print(json.dumps({"variant": variant, "ok": False,
                              "error": "training failed"}))
            return 1
        with open(os.path.join(ckpt_dir, "checkpoint_logs.json")) as f:
            logs = json.load(f)
        loss = [float(np.mean(v)) for v in logs["locLoss_train"]]
        acc1 = [float(v[0]) for v in logs["locAcc_train"]]
        ckpt = os.path.join(ckpt_dir, f"checkpoint_{args.nEpoch - 1}.pt")

        accs = {"trained": [], "random": []}
        for tag, extra in (("trained", []), ("random", ["--no_pretraining"])):
            for pseed in probe_seeds:
                out = os.path.join(args.workdir,
                                   f"probe_{variant}_{tag}_s{pseed}")
                rc = probe_main([root, train_list, val_list, ckpt,
                                 "--pathCheckpoint", out,
                                 "--file_extension", ".wav",
                                 "--n_epoch", str(args.nEpochProbe),
                                 "--nGPU", "1", "--batchSizeGPU", "32",
                                 "--random_seed", str(pseed),
                                 "--ignore_cache"] + extra)
                if rc != 0:
                    print(json.dumps({"variant": variant, "ok": False,
                                      "error": f"probe {tag}/{pseed}"}))
                    return 1
                with open(os.path.join(out, "checkpoint_logs.json")) as f:
                    plogs = json.load(f)
                accs[tag].append(max(float(v[0])
                                     for v in plogs["locAcc_val"]))
        results[variant] = {
            "variant": variant,
            "train_loss": [round(x, 4) for x in loss],
            "train_acc1_final": round(acc1[-1], 4),
            "probe_trained": [round(a, 5) for a in accs["trained"]],
            "probe_random": [round(a, 5) for a in accs["random"]],
            "probe_trained_mean": round(float(np.mean(accs["trained"])), 5),
            "probe_random_mean": round(float(np.mean(accs["random"])), 5),
        }
        print(json.dumps(results[variant]), flush=True)

    names = list(results)
    verdict = {"chance": round(1.0 / args.n_speakers, 4)}
    if "exact" in results and "stratified" in results:
        verdict["probe_deficit_vs_exact"] = round(
            results["exact"]["probe_trained_mean"]
            - results["stratified"]["probe_trained_mean"], 5)
        verdict["train_loss_gap_final"] = round(
            results["stratified"]["train_loss"][-1]
            - results["exact"]["train_loss"][-1], 4)
    print(json.dumps({"verdict": verdict, "arms": names,
                      "n_files": args.n_files,
                      "n_speakers": args.n_speakers,
                      "nEpoch": args.nEpoch}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
