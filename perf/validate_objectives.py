"""Validate (or demote) the fast InfoNCE variants against the exact one.

VERDICT round-2 item 4 / round-3 item 6: objective variants
(``--stopGradNegatives``, ``--negativeSamplingMode rolled|stratified``)
must not ship as defaults without learning evidence.  This harness runs
MATCHED trainings — identical seed, data, architecture (the bench/default
config: 256-dim encoder, transformer prediction heads, 128 negatives,
bf16) — on the fixture db for each objective variant over a seed MATRIX
(>=2 training seeds x >=4 probe seeds), then scores each checkpoint with
the frozen phone linear-separability probe (metric ``locAcc_val``,
reference /root/reference/cpc/eval/linear_separability.py:99), compares
the TRAINING curves as well as the probe, and prints one JSON line per
variant plus a variance-aware verdict.

Fixture-scale caveat: the db is the bundled 9-file tree with ONE
phone-labelled file per probe split — this is the strongest proxy
available in this environment (no LibriSpeech), so the verdict is about
gross degradation, not 1%-level parity.  A variant whose probe deficit
is within the cross-seed spread is reported 'ok-noisy', not 'ok'.

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

# Every variant pins its sampling mode EXPLICITLY: since the config
# default became 'auto' (round 4), an unflagged run resolves to
# stratified at this harness's pow-2 shapes — an "exact" baseline
# relying on the default silently trains the very variant under test
# (caught in round 5: both arms came back bit-identical).
VARIANTS = {
    "exact": ["--negativeSamplingMode", "exact"],
    "stopgrad": ["--negativeSamplingMode", "exact", "--stopGradNegatives"],
    "rolled": ["--negativeSamplingMode", "rolled"],
    "stratified": ["--negativeSamplingMode", "stratified"],
}


def train_curve(ckpt_dir):
    with open(os.path.join(ckpt_dir, "checkpoint_logs.json")) as f:
        logs = json.load(f)
    loss = [float(sum(v) / len(v)) for v in logs["locLoss_train"]]
    acc1 = [float(v[0]) for v in logs["locAcc_train"]]
    return loss, acc1


def _mean(xs):
    return sum(xs) / len(xs)


def _std(xs):
    m = _mean(xs)
    return (sum((x - m) ** 2 for x in xs) / max(len(xs) - 1, 1)) ** 0.5


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/cpc_objectives")
    p.add_argument("--nEpoch", type=int, default=40)
    p.add_argument("--nEpochProbe", type=int, default=10)
    p.add_argument("--batchSizeGPU", type=int, default=8)
    p.add_argument("--train_seeds", default="1,2",
                   help="comma list of training seeds; the default avoids "
                        "a verified seed-0 optimization basin at fixture "
                        "scale (docs/PERFORMANCE.md round 3)")
    p.add_argument("--probe_seeds", default="0,1,2,3",
                   help="comma list of probe seeds (per trained checkpoint)")
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
    train_seeds = [int(s) for s in args.train_seeds.split(",") if s.strip()]
    probe_seeds = [int(s) for s in args.probe_seeds.split(",") if s.strip()]

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
        probe_accs = []           # one entry per (train_seed, probe_seed)
        per_cell = {}
        losses_last5, accs_last5 = [], []
        curves = {}
        for tseed in train_seeds:
            ckpt_dir = os.path.join(args.workdir, f"{name}_t{tseed}")
            rc = train_main([
                "--nGPU", "1",
                "--pathDB", os.path.join(REF_DATA, "test_db"),
                "--pathCheckpoint", ckpt_dir,
                "--nEpoch", str(args.nEpoch),
                "--save_step", str(max(args.nEpoch - 1, 1)),
                "--batchSizeGPU", str(args.batchSizeGPU),
                "--compute_dtype", "bfloat16",
                "--random_seed", str(tseed),
                "--n_process_loader", "2", "--ignore_cache"] + extra)
            if rc != 0:
                print(json.dumps({"variant": name, "ok": False,
                                  "error": f"training seed {tseed} failed"}))
                return 1
            ckpt = os.path.join(ckpt_dir, f"checkpoint_{args.nEpoch - 1}.pt")
            loss, acc1 = train_curve(ckpt_dir)
            k = max(len(loss) - 5, 0)
            losses_last5.append(_mean(loss[k:]))
            accs_last5.append(_mean(acc1[k:]))
            curves[tseed] = {"loss": [round(x, 4) for x in loss],
                             "acc1": [round(x, 4) for x in acc1]}

            for pseed in probe_seeds:
                out = os.path.join(args.workdir,
                                   f"probe_{name}_t{tseed}_s{pseed}")
                # --size_window 3200: the probe's val split is ONE fixture
                # file (~81k samples) — at the training window (20480) it
                # yields fewer windows than a batch and locAcc_val
                # degenerates to zero batches; 3200-sample probe windows
                # give ~25.
                rc = probe_main([os.path.join(REF_DATA, "test_db"),
                                 train_list, val_list, ckpt,
                                 "--pathPhone",
                                 os.path.join(REF_DATA, "phone_labels.txt"),
                                 "--pathCheckpoint", out,
                                 "--n_epoch", str(args.nEpochProbe),
                                 "--nGPU", "1", "--batchSizeGPU", "4",
                                 "--size_window", "3200",
                                 "--random_seed", str(pseed),
                                 "--ignore_cache"])
                if rc != 0:
                    print(json.dumps(
                        {"variant": name, "ok": False,
                         "error": f"probe t{tseed}/s{pseed} failed"}))
                    return 1
                with open(os.path.join(out, "checkpoint_logs.json")) as f:
                    logs = json.load(f)
                acc = max(float(v[0]) for v in logs["locAcc_val"])
                probe_accs.append(acc)
                per_cell[f"t{tseed}_s{pseed}"] = round(acc, 5)

        results[name] = {
            "variant": name,
            "train_loss_last5_mean": round(_mean(losses_last5), 4),
            "train_acc1_last5_mean": round(_mean(accs_last5), 4),
            "probe_acc_mean": round(_mean(probe_accs), 5),
            "probe_acc_std": round(_std(probe_accs), 5),
            "probe_accs": per_cell,
            "curves": curves,
        }
        print(json.dumps(results[name]))

    base = results["exact"]
    verdict = {}
    for v in variants:
        if v == "exact":
            continue
        r = results[v]
        deficit = base["probe_acc_mean"] - r["probe_acc_mean"]
        spread = max(base["probe_acc_std"], r["probe_acc_std"])
        train_gap = (r["train_loss_last5_mean"]
                     - base["train_loss_last5_mean"])
        if deficit <= args.margin:
            status = "ok" if spread <= args.margin else "ok-noisy"
        else:
            status = "degrades" if deficit > spread else "inconclusive"
        verdict[v] = {"status": status, "probe_deficit": round(deficit, 5),
                      "probe_spread": round(spread, 5),
                      "train_loss_gap_last5": round(train_gap, 4)}
    print(json.dumps({"verdict": verdict,
                      "exact_probe_acc": base["probe_acc_mean"],
                      "exact_probe_std": base["probe_acc_std"],
                      "margin": args.margin, "nEpoch": args.nEpoch,
                      "train_seeds": train_seeds,
                      "probe_seeds": probe_seeds}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
