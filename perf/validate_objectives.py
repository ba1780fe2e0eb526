"""Validate (or demote) the fast InfoNCE variants against the exact one.

VERDICT round-2 item 4: ``--stopGradNegatives`` (3.26x throughput) and
``--negativeSamplingMode rolled`` ship as opt-in flags with no evidence
about learning quality.  This harness runs MATCHED trainings — identical
seed, data, architecture (the bench/default config: 256-dim encoder,
transformer prediction heads, 128 negatives, bf16) — on the fixture db
for each objective variant, then scores each checkpoint with the frozen
phone linear-separability probe (metric ``locAcc_val``, reference
/root/reference/cpc/eval/linear_separability.py:99) under two probe
seeds, and prints one JSON line per variant plus a verdict.

Fixture-scale caveat: the db is the bundled 9-file tree with ONE
phone-labelled file per probe split — this is the strongest proxy
available in this environment (no LibriSpeech), so the verdict is about
gross degradation, not 1%-level parity.

Usage (TPU or CPU backend):
    python perf/validate_objectives.py [--nEpoch 40] [--workdir DIR]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_DATA = "/root/reference/cpc/test_data"
PROBE_TRAIN = ["4051-11218-0044"]
PROBE_VAL = ["2911-12359-0007"]

VARIANTS = {
    "exact": [],
    "stopgrad": ["--stopGradNegatives"],
    "rolled": ["--negativeSamplingMode", "rolled"],
    "stratified": ["--negativeSamplingMode", "stratified"],
}


def train_curve(ckpt_dir):
    with open(os.path.join(ckpt_dir, "checkpoint_logs.json")) as f:
        logs = json.load(f)
    loss = [float(sum(v) / len(v)) for v in logs["locLoss_train"]]
    acc1 = [float(v[0]) for v in logs["locAcc_train"]]
    return loss, acc1


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/cpc_objectives")
    p.add_argument("--nEpoch", type=int, default=40)
    p.add_argument("--nEpochProbe", type=int, default=10)
    p.add_argument("--batchSizeGPU", type=int, default=8)
    p.add_argument("--random_seed", type=int, default=1,
                   help="training seed; the default avoids a verified "
                        "seed-0 optimization basin at fixture scale "
                        "(docs/PERFORMANCE.md round 3)")
    p.add_argument("--margin", type=float, default=0.02,
                   help="max tolerated probe-accuracy deficit vs exact")
    p.add_argument("--variants", default=",".join(VARIANTS),
                   help="comma list; must include 'exact' (the baseline)")
    args = p.parse_args()
    names = [t.strip() for t in args.variants.split(",") if t.strip()]
    unknown = [n for n in names if n not in VARIANTS]
    if unknown:
        p.error(f"unknown variant(s) {unknown}; known: {sorted(VARIANTS)}")
    if "exact" not in names:
        p.error("--variants must include 'exact' (the comparison baseline)")
    variants = {k: VARIANTS[k] for k in names}

    from cpc_audio_tpu.eval.linear_separability import main as probe_main
    from cpc_audio_tpu.train import main as train_main

    os.makedirs(args.workdir, exist_ok=True)
    train_list = os.path.join(args.workdir, "probe_train.txt")
    val_list = os.path.join(args.workdir, "probe_val.txt")
    with open(train_list, "w") as f:
        f.write("\n".join(PROBE_TRAIN) + "\n")
    with open(val_list, "w") as f:
        f.write("\n".join(PROBE_VAL) + "\n")

    results = {}
    for name, extra in variants.items():
        ckpt_dir = os.path.join(args.workdir, name)
        rc = train_main([
            "--nGPU", "1",
            "--pathDB", os.path.join(REF_DATA, "test_db"),
            "--pathCheckpoint", ckpt_dir,
            "--nEpoch", str(args.nEpoch),
            "--save_step", str(max(args.nEpoch - 1, 1)),
            "--batchSizeGPU", str(args.batchSizeGPU),
            "--compute_dtype", "bfloat16",
            "--random_seed", str(args.random_seed),
            "--n_process_loader", "2", "--ignore_cache"] + extra)
        if rc != 0:
            print(json.dumps({"variant": name, "ok": False,
                              "error": "training failed"}))
            return 1
        ckpt = os.path.join(ckpt_dir, f"checkpoint_{args.nEpoch - 1}.pt")
        loss, acc1 = train_curve(ckpt_dir)

        probe_accs = []
        for seed in (0, 1):
            out = os.path.join(args.workdir, f"probe_{name}_s{seed}")
            # --size_window 3200: the probe's val split is ONE fixture
            # file (~81k samples) — at the training window (20480) it
            # yields fewer windows than a batch and locAcc_val degenerates
            # to zero batches; 3200-sample probe windows give ~25.
            rc = probe_main([os.path.join(REF_DATA, "test_db"),
                             train_list, val_list, ckpt,
                             "--pathPhone",
                             os.path.join(REF_DATA, "phone_labels.txt"),
                             "--pathCheckpoint", out,
                             "--n_epoch", str(args.nEpochProbe),
                             "--nGPU", "1", "--batchSizeGPU", "4",
                             "--size_window", "3200",
                             "--random_seed", str(seed),
                             "--ignore_cache"])
            if rc != 0:
                print(json.dumps({"variant": name, "ok": False,
                                  "error": f"probe seed {seed} failed"}))
                return 1
            with open(os.path.join(out, "checkpoint_logs.json")) as f:
                logs = json.load(f)
            probe_accs.append(max(float(v[0]) for v in logs["locAcc_val"]))

        results[name] = {
            "variant": name,
            "loss_first": round(loss[0], 4), "loss_last": round(loss[-1], 4),
            "acc1_first": round(acc1[0], 4), "acc1_last": round(acc1[-1], 4),
            "probe_acc_mean": round(sum(probe_accs) / len(probe_accs), 5),
            "probe_accs": [round(a, 5) for a in probe_accs],
        }
        print(json.dumps(results[name]))

    base = results["exact"]["probe_acc_mean"]
    verdict = {v: ("ok" if results[v]["probe_acc_mean"] >= base - args.margin
                   else "degrades")
               for v in variants if v != "exact"}
    print(json.dumps({"verdict": verdict, "exact_probe_acc": base,
                      "margin": args.margin, "nEpoch": args.nEpoch}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
