"""Linear separability probe tests: frozen/unfrozen speaker + phone probes
on the fixtures, starting from a CLI-pretrained checkpoint."""

import json
import os

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
         "--batchSizeGPU", "2", "--nGPU", "4", "--random_seed", "7",
         "--n_process_loader", "2", "--ignore_cache", "--nEpoch", "1",
         "--save_step", "1"]


@pytest.fixture(scope="module")
def cpc_checkpoint(tmp_path_factory):
    from cpc_audio_tpu.train import main
    out = str(tmp_path_factory.mktemp("cpc") / "ckpt")
    assert main(SMALL + ["--pathDB", DB, "--pathCheckpoint", out]) == 0
    return os.path.join(out, "checkpoint_0.pt")


@pytest.fixture(scope="module")
def split_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("splits")
    train = d / "train.txt"
    val = d / "val.txt"
    train.write_text("6476-57446-0019\n5678-43303-0032\n5678-43303-0024\n"
                     "5678-43301-0021\n5393-19218-0024\n")
    val.write_text("4397-15668-0007\n4397-15668-0003\n")
    return str(train), str(val)


def _probe(args):
    from cpc_audio_tpu.eval.linear_separability import main
    return main(args)


def test_speaker_probe_frozen(tmp_path, cpc_checkpoint, split_files):
    train, val = split_files
    out = str(tmp_path / "probe")
    rc = _probe([DB, train, val, cpc_checkpoint,
                 "--pathCheckpoint", out, "--n_epoch", "2",
                 "--batchSizeGPU", "2", "--nGPU", "4",
                 "--size_window", "3200", "--ignore_cache"])
    assert rc == 0
    with open(os.path.join(out, "checkpoint_logs.json")) as f:
        logs = json.load(f)
    assert logs["epoch"] == [0, 1]
    assert logs["locLoss_train"][1][0] < logs["locLoss_train"][0][0]
    assert "locAcc_val" in logs
    # args sidecar written with the load chain
    with open(os.path.join(out, "checkpoint_args.json")) as f:
        args = json.load(f)
    assert args["load"] == [cpc_checkpoint]
    assert args["hiddenGar"] == 24


def test_phone_probe_frozen(tmp_path, cpc_checkpoint):
    labeled = tmp_path / "labeled.txt"
    labeled.write_text("4051-11218-0044\n")
    val = tmp_path / "val.txt"
    val.write_text("2911-12359-0007\n")
    out = str(tmp_path / "probe_phone")
    rc = _probe([DB, str(labeled), str(val), cpc_checkpoint,
                 "--pathPhone", os.path.join(REF_DATA, "phone_labels.txt"),
                 "--pathCheckpoint", out, "--n_epoch", "2",
                 "--batchSizeGPU", "2", "--nGPU", "2",
                 "--size_window", "3200", "--ignore_cache"])
    assert rc == 0
    with open(os.path.join(out, "checkpoint_logs.json")) as f:
        logs = json.load(f)
    assert logs["locLoss_train"][1][0] < logs["locLoss_train"][0][0]


def test_speaker_probe_unfrozen_and_ctc(tmp_path, cpc_checkpoint):
    labeled = tmp_path / "labeled.txt"
    labeled.write_text("4051-11218-0044\n")
    val = tmp_path / "val.txt"
    val.write_text("2911-12359-0007\n")
    out = str(tmp_path / "probe_ctc")
    rc = _probe([DB, str(labeled), str(val), cpc_checkpoint,
                 "--pathPhone", os.path.join(REF_DATA, "phone_labels.txt"),
                 "--CTC", "--unfrozen",
                 "--pathCheckpoint", out, "--n_epoch", "2",
                 "--batchSizeGPU", "2", "--nGPU", "2",
                 "--size_window", "3200", "--ignore_cache"])
    assert rc == 0
    with open(os.path.join(out, "checkpoint_logs.json")) as f:
        logs = json.load(f)
    assert logs["locLoss_train"][1][0] < logs["locLoss_train"][0][0]


def test_no_pretraining_probe(tmp_path, cpc_checkpoint, split_files):
    train, val = split_files
    out = str(tmp_path / "probe_rand")
    rc = _probe([DB, train, val, cpc_checkpoint, "--no_pretraining",
                 "--pathCheckpoint", out, "--n_epoch", "1",
                 "--batchSizeGPU", "2", "--nGPU", "4",
                 "--size_window", "3200", "--ignore_cache"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "checkpoint_0.pt"))
