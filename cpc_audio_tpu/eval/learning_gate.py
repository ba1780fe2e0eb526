"""Automated learning-quality gate.

Trains the CPC model briefly on a (fixture-sized) database, then runs the
frozen phone linear-separability probe twice — once on the trained
checkpoint and once on a random-init model of the same architecture
(``--no_pretraining``) — and asserts the trained features beat the random
features by a margin.  This guards the whole stack (data pipeline,
model, criterion backward, optimizer) against silent learning
regressions that unit tests cannot catch: a sign error that still
decreases loss, a shuffled-label bug, a dead gradient path.

The comparison metric is the probe's best validation accuracy
(``locAcc_val``, reference /root/reference/cpc/eval/linear_separability.py:99
— the reference's own headline number for this eval).

One command, one asserted margin:

    python -m cpc_audio_tpu.eval.learning_gate            # CPU-runnable
    python -m cpc_audio_tpu.eval.learning_gate --nEpochCPC 40   # stronger

Exit code 0 iff trained - random >= --margin.  Prints one JSON line with
both accuracies so CI can archive the numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

REF_DATA = "/root/reference/cpc/test_data"

# Only two fixture sequences carry phone labels (phone_labels.txt);
# CPC pre-training still uses the full 9-file db.
PROBE_TRAIN = ["4051-11218-0044"]
PROBE_VAL = ["2911-12359-0007"]


def _best_val_acc(probe_dir: str) -> float:
    with open(os.path.join(probe_dir, "checkpoint_logs.json")) as f:
        logs = json.load(f)
    return max(float(v[0]) for v in logs["locAcc_val"])


def parse_args(argv):
    p = argparse.ArgumentParser(description="CPC learning-quality gate")
    p.add_argument("--pathDB", default=os.path.join(REF_DATA, "test_db"))
    p.add_argument("--pathPhone",
                   default=os.path.join(REF_DATA, "phone_labels.txt"))
    p.add_argument("--workdir", default=None,
                   help="output root (default: fresh temp dir)")
    p.add_argument("--nEpochCPC", type=int, default=10)
    p.add_argument("--nEpochProbe", type=int, default=6)
    p.add_argument("--margin", type=float, default=0.02,
                   help="required (trained - random) val-accuracy margin")
    p.add_argument("--hiddenEncoder", type=int, default=64)
    p.add_argument("--hiddenGar", type=int, default=64)
    p.add_argument("--nPredicts", type=int, default=4)
    p.add_argument("--negativeSamplingExt", type=int, default=16)
    # 5120 (32-frame windows, M = batch 8 x 32 = 256, a power of two) so
    # the default `auto` sampling mode resolves to the SHIPPED fused
    # stratified objective — the gate exercises what users run.  2560 is
    # a dead end (probe cannot discriminate at 16-frame windows) and at
    # 3200 auto falls back to exact (M=160 not pow-2); both
    # docs/PERFORMANCE.md round 4.
    p.add_argument("--sizeWindow", type=int, default=5120)
    p.add_argument("--rnnMode", default="linear")
    p.add_argument("--arMode", default="GRU")
    p.add_argument("--batchSizeGPU", type=int, default=8)
    # Seed 1, not 0: the 91-window fixture db has a documented seed-0
    # optimization basin (a deterministic plateau-at-chance attractor
    # that ANY bit-level change in the step can tip into or out of —
    # docs/PERFORMANCE.md round 3/4); fixture-scale harnesses avoid it
    # (perf/validate_objectives.py likewise defaults to seed 1).
    p.add_argument("--random_seed", type=int, default=1)
    p.add_argument("--negativeSamplingMode", default="auto",
                   choices=["auto", "exact", "stratified", "rolled"],
                   help="objective variant to gate; matches the shipped "
                        "config default 'auto', which at the gate's "
                        "default shapes (sizeWindow 5120, batch 8 -> "
                        "M=256 pow-2) resolves to the fused STRATIFIED "
                        "objective — the shipped default path. Pass "
                        "'exact' for the reference-parity objective "
                        "(both arms pass at these shapes, "
                        "docs/PERFORMANCE.md round 4)")
    p.add_argument("--cpc_extra", nargs="*", default=[],
                   help="extra flags forwarded to the CPC trainer "
                        "(e.g. --cpc_extra --stopGradNegatives)")
    return p.parse_args(argv)


def main(argv=None) -> int:
    from cpc_audio_tpu.eval.linear_separability import main as probe_main
    from cpc_audio_tpu.train import main as train_main

    args = parse_args(argv if argv is not None else sys.argv[1:])
    work = args.workdir or tempfile.mkdtemp(prefix="cpc_gate_")
    os.makedirs(work, exist_ok=True)
    train_list = os.path.join(work, "probe_train.txt")
    val_list = os.path.join(work, "probe_val.txt")
    with open(train_list, "w") as f:
        f.write("\n".join(PROBE_TRAIN) + "\n")
    with open(val_list, "w") as f:
        f.write("\n".join(PROBE_VAL) + "\n")

    ckpt_dir = os.path.join(work, "cpc")
    # --nGPU 1 everywhere: the gate's calibrated accuracies (and its
    # deterministic runtime) assume a fixed global batch, independent of
    # how many (virtual) devices the host happens to expose.
    rc = train_main([
        "--nGPU", "1",
        "--pathDB", args.pathDB, "--pathCheckpoint", ckpt_dir,
        "--hiddenEncoder", str(args.hiddenEncoder),
        "--hiddenGar", str(args.hiddenGar),
        "--nPredicts", str(args.nPredicts),
        "--negativeSamplingExt", str(args.negativeSamplingExt),
        "--sizeWindow", str(args.sizeWindow),
        "--rnnMode", args.rnnMode, "--arMode", args.arMode,
        "--batchSizeGPU", str(args.batchSizeGPU),
        "--nEpoch", str(args.nEpochCPC),
        "--save_step", str(max(args.nEpochCPC - 1, 1)),
        "--random_seed", str(args.random_seed),
        "--negativeSamplingMode", args.negativeSamplingMode,
        "--n_process_loader", "2", "--ignore_cache"] + args.cpc_extra)
    if rc != 0:
        print(json.dumps({"gate": "learning", "ok": False,
                          "error": "cpc training failed"}))
        return 1
    ckpt = os.path.join(ckpt_dir, f"checkpoint_{args.nEpochCPC - 1}.pt")

    accs = {}
    for tag, extra in (("trained", []), ("random", ["--no_pretraining"])):
        out = os.path.join(work, f"probe_{tag}")
        # --nGPU 1: the val split is ONE file; a multi-device mesh would
        # inflate the batch past the split and yield zero val batches
        # (fixed-shape batching drops ragged tails).
        rc = probe_main([args.pathDB, train_list, val_list, ckpt,
                         "--pathPhone", args.pathPhone,
                         "--pathCheckpoint", out,
                         "--n_epoch", str(args.nEpochProbe),
                         "--nGPU", "1", "--batchSizeGPU", "4",
                         "--size_window", str(args.sizeWindow),
                         "--random_seed", str(args.random_seed),
                         "--ignore_cache"] + extra)
        if rc != 0:
            print(json.dumps({"gate": "learning", "ok": False,
                              "error": f"{tag} probe failed"}))
            return 1
        accs[tag] = _best_val_acc(out)

    delta = accs["trained"] - accs["random"]
    ok = delta >= args.margin
    print(json.dumps({"gate": "learning", "ok": bool(ok),
                      "acc_trained": round(accs["trained"], 5),
                      "acc_random": round(accs["random"], 5),
                      "delta": round(delta, 5),
                      "margin": args.margin,
                      "nEpochCPC": args.nEpochCPC,
                      "negativeSamplingMode": args.negativeSamplingMode,
                      "workdir": work}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
