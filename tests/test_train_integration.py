"""End-to-end training slice on the bundled fixtures (SURVEY.md §7 stage 4):
loss decreases, accuracies beat chance, checkpoints round-trip, resume works.
Runs on the 8-device CPU mesh.
"""

import json
import os

import numpy as np
import pytest

from cpc_audio_tpu.ops import native

REF_DATA = "/root/reference/cpc/test_data"
DB = os.path.join(REF_DATA, "test_db")

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(DB) and native.available()),
    reason="fixtures or native decoder unavailable")

SMALL = ["--hiddenEncoder", "32", "--hiddenGar", "24", "--nPredicts", "3",
         "--negativeSamplingExt", "8", "--sizeWindow", "3200",
         "--rnnMode", "linear", "--arMode", "GRU",
         "--batchSizeGPU", "2", "--nGPU", "4",
         "--learningRate", "2e-3", "--random_seed", "7",
         "--n_process_loader", "2", "--ignore_cache"]


def _run_main(argv):
    from cpc_audio_tpu.train import main
    return main(argv)


def test_train_end_to_end(tmp_path):
    out = str(tmp_path / "ckpt")
    rc = _run_main(SMALL + ["--pathDB", DB, "--nEpoch", "3",
                            "--save_step", "1", "--pathCheckpoint", out])
    assert rc == 0
    # checkpoints + sidecars written
    files = os.listdir(out)
    assert "checkpoint_logs.json" in files
    assert "checkpoint_args.json" in files
    assert any(f.startswith("checkpoint_") and f.endswith(".pt")
               for f in files)
    with open(os.path.join(out, "checkpoint_logs.json")) as f:
        logs = json.load(f)
    assert logs["epoch"] == [0, 1, 2]
    first = np.mean(logs["locLoss_train"][0])
    last = np.mean(logs["locLoss_train"][-1])
    assert last < first, (first, last)
    # sidecar args round-trip into a config
    with open(os.path.join(out, "checkpoint_args.json")) as f:
        args = json.load(f)
    assert args["hiddenEncoder"] == 32
    assert args["nPredicts"] == 3

    # resume: two more epochs continue the logs
    rc = _run_main(SMALL + ["--pathDB", DB, "--nEpoch", "5",
                            "--save_step", "1", "--pathCheckpoint", out])
    assert rc == 0
    with open(os.path.join(out, "checkpoint_logs.json")) as f:
        logs2 = json.load(f)
    assert logs2["epoch"] == [0, 1, 2, 3, 4]
    assert logs2["locLoss_train"][:3] == logs["locLoss_train"]


def test_checkpoint_feature_roundtrip(tmp_path):
    out = str(tmp_path / "ckpt")
    rc = _run_main(SMALL + ["--pathDB", DB, "--nEpoch", "1",
                            "--save_step", "1", "--pathCheckpoint", out])
    assert rc == 0
    from cpc_audio_tpu.feature_loader import (FeatureModule, build_feature,
                                              load_model)
    path = os.path.join(out, "checkpoint_0.pt")
    model, variables, hg, he = load_model([path])
    assert hg == 24 and he == 32
    fm = FeatureModule(model, variables)
    flac = os.path.join(DB, "2911/12359/2911-12359-0007.flac")
    feats = build_feature(fm, flac, max_size_seq=32000)
    assert feats.shape[0] == 1 and feats.shape[2] == 24
    assert feats.shape[1] == 81520 // 160  # every 10 ms
    assert np.isfinite(feats).all()
    # encoder features
    fm_enc = FeatureModule(model, variables, get_encoded=True)
    feats_enc = build_feature(fm_enc, flac, max_size_seq=32000)
    assert feats_enc.shape[2] == 32
    # strict mode: same frame count
    feats_strict = build_feature(fm, flac, strict=True, max_size_seq=32000)
    assert feats_strict.shape[1] == feats.shape[1]
    # seqNorm produces ~zero mean per chunk
    feats_norm = build_feature(fm, flac, seq_norm=True, max_size_seq=32000)
    assert abs(np.asarray(feats_norm).mean()) < 0.2


def test_supervised_phone_training(tmp_path):
    out = str(tmp_path / "ckpt_phone")
    # only two fixture sequences have phone labels
    split = tmp_path / "labeled.txt"
    split.write_text("4051-11218-0044\n2911-12359-0007\n")
    rc = _run_main(SMALL + [
        "--pathDB", DB, "--nEpoch", "2", "--save_step", "1",
        "--pathTrain", str(split),
        "--pathCheckpoint", out, "--supervised",
        "--pathPhone", os.path.join(REF_DATA, "phone_labels.txt")])
    assert rc == 0
    with open(os.path.join(out, "checkpoint_logs.json")) as f:
        logs = json.load(f)
    assert np.mean(logs["locLoss_train"][-1]) \
        < np.mean(logs["locLoss_train"][0])


def test_auto_default_trains_stratified_under_shard_map(tmp_path,
                                                        monkeypatch):
    """The shipped default (--negativeSamplingMode auto) resolves to the
    FUSED stratified objective at power-of-two shapes inside the 8-device
    shard_map train step, and training behaves (finite, decreasing loss).

    Guards the default fast path end-to-end in CI: the other integration
    tests use sizeWindow=3200 (20 frames -> batch*frames not a power of
    two), where auto falls back to the reference's exact sampler."""
    from cpc_audio_tpu.criterion import infonce

    calls = []
    orig = infonce._stratified_score_pair

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(infonce, "_stratified_score_pair", spy)
    out = str(tmp_path / "ckpt_auto")
    # per-device batch 4 x 16 frames = 64 (pow2), 8 negatives (pow2)
    args = [a for a in SMALL]
    args[args.index("--sizeWindow") + 1] = "2560"
    args[args.index("--batchSizeGPU") + 1] = "4"
    rc = _run_main(args + ["--pathDB", DB, "--nEpoch", "2",
                           "--save_step", "1", "--pathCheckpoint", out])
    assert rc == 0
    assert calls, "auto did not route through the fused stratified path"
    with open(os.path.join(out, "checkpoint_logs.json")) as f:
        logs = json.load(f)
    assert np.all(np.isfinite(np.asarray(logs["locLoss_train"])))
    assert np.mean(logs["locLoss_train"][-1]) \
        < np.mean(logs["locLoss_train"][0])


def test_sequential_sampling_hidden_carry(tmp_path):
    """samplingType=sequential trains with hidden state carried across
    batches (reference keepHidden, feature_loader.py:150)."""
    out = str(tmp_path / "ckpt_seq")
    rc = _run_main(SMALL + ["--pathDB", DB, "--nEpoch", "2",
                            "--save_step", "1", "--samplingType",
                            "sequential", "--pathCheckpoint", out])
    assert rc == 0
    with open(os.path.join(out, "checkpoint_logs.json")) as f:
        logs = json.load(f)
    assert np.mean(logs["locLoss_train"][-1]) \
        < np.mean(logs["locLoss_train"][0])


def test_abx_cli_from_checkpoint(tmp_path):
    """ABX CLI end-to-end on a synthetic .item file over the fixtures."""
    out = str(tmp_path / "ckpt_abx")
    rc = _run_main(SMALL + ["--pathDB", DB, "--nEpoch", "1",
                            "--save_step", "1", "--pathCheckpoint", out])
    assert rc == 0
    # two phones, several segments per file, one speaker per file
    item = tmp_path / "test.item"
    lines = ["#file onset offset #phone prev next speaker"]
    files = [("2911-12359-0007", "2911"), ("4051-11218-0044", "4051")]
    for name, spk in files:
        for i in range(3):
            t0 = 0.3 + 0.5 * i
            lines.append(f"{name} {t0:.2f} {t0+0.2:.2f} a x y {spk}")
            lines.append(f"{name} {t0+0.25:.2f} {t0+0.45:.2f} b x y {spk}")
    item.write_text("\n".join(lines) + "\n")
    from cpc_audio_tpu.eval.abx_cli import main as abx_main
    abx_out = str(tmp_path / "abx_out")
    rc = abx_main(["from_checkpoint", os.path.join(out, "checkpoint_0.pt"),
                   str(item), DB, "--file_extension", ".flac",
                   "--max_size_seq", "32000", "--out", abx_out])
    assert rc == 0
    with open(os.path.join(abx_out, "ABX_scores.json")) as f:
        scores = json.load(f)
    assert "within" in scores
    assert 0.0 <= scores["within"] <= 1.0
    assert os.path.exists(os.path.join(abx_out, "ABX_args.json"))


def test_restart_flag_ignores_checkpoint(tmp_path):
    """--restart starts from scratch even with checkpoints present
    (reference train.py:449-451)."""
    out = str(tmp_path / "ckpt_restart")
    rc = _run_main(SMALL + ["--pathDB", DB, "--nEpoch", "1",
                            "--save_step", "1", "--pathCheckpoint", out])
    assert rc == 0
    rc = _run_main(SMALL + ["--pathDB", DB, "--nEpoch", "1",
                            "--save_step", "1", "--restart",
                            "--pathCheckpoint", out])
    assert rc == 0
    with open(os.path.join(out, "checkpoint_logs.json")) as f:
        logs = json.load(f)
    assert logs["epoch"] == [0]  # fresh run, not resumed to epoch 2


def test_load_model_multi_checkpoint_concatenated(tmp_path):
    """loadModel with several checkpoints builds a ConcatenatedModel whose
    features are the per-model concatenation (reference
    feature_loader.py:156-199), end-to-end through build_feature."""
    import glob

    from cpc_audio_tpu.feature_loader import (FeatureModule, build_feature,
                                              load_model)
    outs = []
    for seed in (3, 4):
        out = str(tmp_path / f"ckpt{seed}")
        rc = _run_main(SMALL + ["--pathDB", DB, "--nEpoch", "1",
                                "--save_step", "1", "--random_seed",
                                str(seed), "--pathCheckpoint", out])
        assert rc == 0
        outs.append(os.path.join(out, "checkpoint_0.pt"))

    model, variables, hidden_gar, hidden_encoder = load_model(outs)
    m0, v0, hg0, he0 = load_model([outs[0]])
    assert hidden_gar == 2 * hg0 and hidden_encoder == 2 * he0

    flac = glob.glob(os.path.join(DB, "*", "*", "*.flac"))[0]
    f_cat = build_feature(FeatureModule(model, variables), flac)
    f_one = build_feature(FeatureModule(m0, v0), flac)
    assert f_cat.shape[2] == 2 * f_one.shape[2]
    # first half of the concatenated features == the first model's features
    np.testing.assert_allclose(np.asarray(f_cat[..., :f_one.shape[2]]),
                               np.asarray(f_one), atol=1e-5)


def test_train_with_empty_validation_split(tmp_path):
    """A validation split smaller than one fixed-shape batch yields ZERO
    val batches; training must warn and complete, tracking best on train
    accuracy (regression: KeyError 'locAcc_val' crashed after epoch 0)."""
    out = str(tmp_path / "ckpt")
    # big windows + batch on the tiny fixture db -> val gets 0 batches
    rc = _run_main(["--hiddenEncoder", "32", "--hiddenGar", "24",
                    "--nPredicts", "3", "--negativeSamplingExt", "8",
                    "--sizeWindow", "12800", "--rnnMode", "linear",
                    "--arMode", "GRU", "--batchSizeGPU", "2",
                    "--nGPU", "4", "--n_process_loader", "2",
                    "--ignore_cache", "--pathDB", DB, "--nEpoch", "1",
                    "--save_step", "1", "--pathCheckpoint", out])
    assert rc == 0
    files = os.listdir(out)
    assert "checkpoint_0.pt" in files and "checkpoint_logs.json" in files
