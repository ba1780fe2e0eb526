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


def test_train_and_per_on_mp3(tmp_path, cpc_checkpoint):
    """BASELINE config #5 end-to-end from real mp3 input: fixture FLACs are
    transcoded with lame, then the CTC transfer train + beam-search PER
    pipeline consumes them via --file_extension .mp3."""
    from mp3_util import encode_mp3, lame_available
    if not lame_available():
        pytest.skip("libmp3lame unavailable")
    from cpc_audio_tpu.data.audio_io import decode_file
    from cpc_audio_tpu.eval.common_voices import main

    names = ["4051-11218-0044", "2911-12359-0007"]
    db = tmp_path / "mp3db"
    db.mkdir()
    for name in names:
        spk = name.split("-")[0]
        src = None
        for root, _, files in os.walk(DB):
            if name + ".flac" in files:
                src = os.path.join(root, name + ".flac")
        assert src, name
        pcm = decode_file(src, target_rate=16000)
        encode_mp3(pcm, 16000, str(db / f"{name}.mp3"))

    train_list = tmp_path / "train.txt"
    train_list.write_text(names[0] + "\n")
    val_list = tmp_path / "val.txt"
    val_list.write_text(names[1] + "\n")
    out = str(tmp_path / "cv_mp3_out")
    rc = main(["train", str(db), PHONES, cpc_checkpoint,
               "--pathTrain", str(train_list), "--pathVal", str(val_list),
               "--file_extension", ".mp3", "--batchSize", "1",
               "--nEpochs", "1", "--freeze", "-o", out])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "checkpoint.pt"))
    rc = main(["per", out, "--batchSize", "1"])
    assert rc == 0
