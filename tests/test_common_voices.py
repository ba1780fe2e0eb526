"""Common Voice transfer eval tests: CTC training + beam-search PER
end-to-end on the fixtures."""

import json
import os

import numpy as np
import pytest

from cpc_audio_tpu.ops import native

REF_DATA = "/root/reference/cpc/test_data"
DB = os.path.join(REF_DATA, "test_db")
PHONES = os.path.join(REF_DATA, "phone_labels.txt")

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(DB) and native.available()),
    reason="fixtures or native decoder unavailable")


@pytest.fixture(scope="module")
def cpc_checkpoint(tmp_path_factory):
    from cpc_audio_tpu.train import main
    out = str(tmp_path_factory.mktemp("cpc") / "ckpt")
    args = ["--hiddenEncoder", "32", "--hiddenGar", "24", "--nPredicts", "3",
            "--negativeSamplingExt", "8", "--sizeWindow", "3200",
            "--rnnMode", "linear", "--arMode", "GRU",
            "--batchSizeGPU", "2", "--nGPU", "2", "--random_seed", "7",
            "--n_process_loader", "2", "--ignore_cache", "--nEpoch", "1",
            "--save_step", "1", "--pathDB", DB, "--pathCheckpoint", out]
    assert main(args) == 0
    return os.path.join(out, "checkpoint_0.pt")


def test_train_and_per(tmp_path, cpc_checkpoint):
    from cpc_audio_tpu.eval.common_voices import main
    train_list = tmp_path / "train.txt"
    train_list.write_text("4051-11218-0044\n")
    val_list = tmp_path / "val.txt"
    val_list.write_text("2911-12359-0007\n")
    out = str(tmp_path / "cv_out")
    rc = main(["train", DB, PHONES, cpc_checkpoint,
               "--pathTrain", str(train_list), "--pathVal", str(val_list),
               "--file_extension", ".flac", "--batchSize", "1",
               "--nEpochs", "2", "--freeze", "-o", out])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "checkpoint.pt"))
    with open(os.path.join(out, "args_training.json")) as f:
        targs = json.load(f)
    assert targs["pathDB"] == DB

    rc = main(["per", out, "--batchSize", "1"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "args_validation_0.json"))


def test_seqnorm_lstm_variant(tmp_path, cpc_checkpoint):
    from cpc_audio_tpu.eval.common_voices import main
    val_list = tmp_path / "val.txt"
    val_list.write_text("2911-12359-0007\n")
    train_list = tmp_path / "train.txt"
    train_list.write_text("4051-11218-0044\n")
    out = str(tmp_path / "cv_out2")
    rc = main(["train", DB, PHONES, cpc_checkpoint,
               "--pathTrain", str(train_list), "--pathVal", str(val_list),
               "--file_extension", ".flac", "--batchSize", "1",
               "--nEpochs", "1", "--LSTM", "--seqNorm", "-o", out])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "checkpoint.pt"))
