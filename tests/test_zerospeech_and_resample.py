"""ZeroSpeech feature export + sample-rate adjuster tests."""

import os
import wave

import numpy as np
import pytest

from cpc_audio_tpu.ops import native

REF_DATA = "/root/reference/cpc/test_data"
DB = os.path.join(REF_DATA, "test_db")

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


def test_build_zerospeech_features(tmp_path, cpc_checkpoint):
    from cpc_audio_tpu.eval.build_zerospeech_features import main
    # use a small sub-tree to keep it fast
    out = str(tmp_path / "feats")
    rc = main([os.path.join(DB, "2911"), out, cpc_checkpoint,
               "--extension", ".flac", "--format", "npz",
               "--maxSizeSeq", "32000"])
    assert rc == 0
    files = [f for f in os.listdir(out) if f.endswith(".npz")]
    assert files
    blob = np.load(os.path.join(out, files[0]))
    assert blob["features"].shape[1] == 24
    assert blob["features"].shape[0] == len(blob["time"])
    # 10 ms steps starting at 5 ms
    assert abs(blob["time"][0] - 0.005) < 1e-6
    assert abs(blob["time"][1] - blob["time"][0] - 0.01) < 1e-6

    # fea text format
    out2 = str(tmp_path / "feats_fea")
    rc = main([os.path.join(DB, "2911"), out2, cpc_checkpoint,
               "--extension", ".flac", "--format", "fea",
               "--maxSizeSeq", "32000"])
    assert rc == 0
    fea = [f for f in os.listdir(out2) if f.endswith(".fea")][0]
    with open(os.path.join(out2, fea)) as f:
        first = f.readline().split()
    assert len(first) == 25  # time + 24 dims


def test_build_features_with_phone_criterion(tmp_path, cpc_checkpoint):
    """--addCriterion path: probe checkpoint -> phone posteriors."""
    from cpc_audio_tpu.eval.linear_separability import main as probe_main
    labeled = tmp_path / "labeled.txt"
    labeled.write_text("4051-11218-0044\n")
    val = tmp_path / "val.txt"
    val.write_text("2911-12359-0007\n")
    probe_out = str(tmp_path / "probe")
    rc = probe_main([DB, str(labeled), str(val), cpc_checkpoint,
                     "--pathPhone",
                     os.path.join(REF_DATA, "phone_labels.txt"),
                     "--pathCheckpoint", probe_out, "--n_epoch", "1",
                     "--batchSizeGPU", "2", "--nGPU", "2",
                     "--size_window", "3200", "--ignore_cache"])
    assert rc == 0
    ckpt = [f for f in os.listdir(probe_out) if f.endswith(".pt")][0]
    from cpc_audio_tpu.eval.build_zerospeech_features import main
    out = str(tmp_path / "posteriors")
    rc = main([os.path.join(DB, "2911"), out,
               os.path.join(probe_out, ckpt),
               "--extension", ".flac", "--format", "npy",
               "--addCriterion", "--maxSizeSeq", "32000"])
    assert rc == 0
    f = [f for f in os.listdir(out) if f.endswith(".npy")][0]
    post = np.load(os.path.join(out, f))
    assert post.shape[1] == 41  # phone posteriors
    np.testing.assert_allclose(post.sum(axis=1), 1.0, atol=1e-4)


def test_adjust_sample_rate(tmp_path):
    from cpc_audio_tpu.eval.adjust_sample_rate import main
    src = os.path.join(DB, "2911", "12359")
    phone_list = tmp_path / "phones.txt"
    phone_list.write_text("2911-12359-0007 0 0 0\n")
    out = str(tmp_path / "resampled")
    rc = main([src, str(phone_list), out, "--out_sample_rate", "8000",
               "--file_extension", ".flac"])
    assert rc == 0
    with wave.open(os.path.join(out, "2911-12359-0007.wav"), "rb") as w:
        assert w.getframerate() == 8000
        assert abs(w.getnframes() - 81520 // 2) <= 2


def test_adjust_sample_rate_from_mp3(tmp_path):
    """mp3 in -> resampled wav out (the reference's Common Voice ingest:
    adjust_sample_rate.py:63-90)."""
    from mp3_util import encode_mp3, lame_available
    if not lame_available():
        import pytest
        pytest.skip("libmp3lame unavailable")
    from cpc_audio_tpu.eval.adjust_sample_rate import main
    sr = 32000
    t = np.arange(sr) / sr
    sig = (0.4 * np.sin(2 * np.pi * 523 * t)).astype(np.float32)
    db = tmp_path / "mp3db"
    db.mkdir()
    encode_mp3(sig, sr, str(db / "clip-0.mp3"))
    phone_list = tmp_path / "phones.txt"
    phone_list.write_text("clip-0 0 0 0\n")
    out = str(tmp_path / "resampled")
    rc = main([str(db), str(phone_list), out, "--out_sample_rate", "16000",
               "--file_extension", ".mp3"])
    assert rc == 0
    with wave.open(os.path.join(out, "clip-0.wav"), "rb") as w:
        assert w.getframerate() == 16000
        data = np.frombuffer(w.readframes(w.getnframes()),
                             "<i2").astype(np.float32) / 32768.0
    # resampled output still correlates with the source tone
    ref = (0.4 * np.sin(2 * np.pi * 523 * np.arange(16000) / 16000)
           ).astype(np.float32)
    corr = np.correlate(data[:8000], ref[:4000], "valid")
    off = int(np.argmax(corr))
    c = np.corrcoef(data[off:off + 8000], ref[:8000])[0, 1]
    assert c > 0.95, (off, c)


def test_load_model_compute_dtype_override(cpc_checkpoint):
    """load_model(compute_dtype=...) switches the activation compute path
    (bf16 serving) while keeping the public f32 feature contract."""
    from cpc_audio_tpu.feature_loader import (FeatureModule, build_feature,
                                              load_model)
    path = os.path.join(DB, "2911", "12359", "2911-12359-0007.flac")
    m32, v32, _, _ = load_model([cpc_checkpoint])
    mbf, vbf, _, _ = load_model([cpc_checkpoint], compute_dtype="bfloat16")
    f32 = np.asarray(build_feature(FeatureModule(m32, v32), path,
                                   max_size_seq=32000))
    fbf = np.asarray(build_feature(FeatureModule(mbf, vbf), path,
                                   max_size_seq=32000))
    assert fbf.dtype == np.float32
    assert fbf.shape == f32.shape
    # bf16 actually engaged (not a silent no-op)...
    assert not np.array_equal(f32, fbf)
    # ...and stays numerically close to the f32 path
    rel = np.abs(f32 - fbf).max() / (np.abs(f32).max() + 1e-9)
    assert rel < 0.15, rel
