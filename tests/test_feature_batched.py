"""Equivalence tests for the lane-packed batched feature extractor.

build_features_batched must reproduce the per-file build_feature path
(reference feature_loader.py:228-269 semantics) exactly: same chunking,
same per-file hidden reset, same tail padding and valid-frame slicing,
same per-chunk seq_norm — only the batching (and therefore the dispatch
count) differs.
"""

import os

import jax
import numpy as np
import pytest

from cpc_audio_tpu.config import CPCConfig
from cpc_audio_tpu.data.dataset import find_all_seqs
from cpc_audio_tpu.feature_loader import (FeatureModule, build_feature,
                                          build_features_batched)
from cpc_audio_tpu.models import build_model
from cpc_audio_tpu.ops import native

REF_DATA = "/root/reference/cpc/test_data"
DB = os.path.join(REF_DATA, "test_db")

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(DB) and native.available()),
    reason="fixtures or native decoder unavailable")

CHUNK = 20480


def _fixture_paths():
    seqs, _ = find_all_seqs(DB, extension=".flac", load_cache=False)
    return [os.path.join(DB, p) for _, p in seqs]


def _make_feature_module(ar_mode, get_encoded=False, keep_hidden=True):
    config = CPCConfig(hiddenEncoder=32, hiddenGar=24, arMode=ar_mode,
                       sizeWindow=CHUNK)
    model = build_model(config)
    variables = model.init({"params": jax.random.PRNGKey(11)},
                           np.zeros((2, 1, CHUNK), np.float32))
    return FeatureModule(model, variables, get_encoded=get_encoded,
                         keep_hidden=keep_hidden)


def _reference_features(fm, paths, seq_norm=False):
    return [np.asarray(build_feature(fm, p, max_size_seq=CHUNK,
                                     seq_norm=seq_norm)) for p in paths]


def _batched_features(fm, paths, n_lanes, seq_norm=False):
    out = [None] * len(paths)
    for i, f in build_features_batched(fm, paths, n_lanes=n_lanes,
                                       max_size_seq=CHUNK,
                                       seq_norm=seq_norm):
        assert out[i] is None, "file yielded twice"
        out[i] = f
    assert all(f is not None for f in out), "missing files"
    return out


@pytest.mark.parametrize("ar_mode", ["LSTM", "GRU", "no_ar"])
def test_batched_matches_per_file(ar_mode):
    paths = _fixture_paths()
    assert len(paths) >= 5
    fm = _make_feature_module(ar_mode)
    expected = _reference_features(fm, paths)
    got = _batched_features(fm, paths, n_lanes=4)
    for e, g in zip(expected, got):
        assert e.shape == g.shape
        np.testing.assert_allclose(g, e, rtol=1e-5, atol=1e-5)


def test_batched_more_lanes_than_files():
    paths = _fixture_paths()[:3]
    fm = _make_feature_module("LSTM")
    expected = _reference_features(fm, paths)
    got = _batched_features(fm, paths, n_lanes=8)  # 5 dead lanes
    for e, g in zip(expected, got):
        np.testing.assert_allclose(g, e, rtol=1e-5, atol=1e-5)


def test_batched_encoded_and_seq_norm():
    paths = _fixture_paths()[:5]
    fm = _make_feature_module("GRU", get_encoded=True)
    expected = _reference_features(fm, paths, seq_norm=True)
    got = _batched_features(fm, paths, n_lanes=3, seq_norm=True)
    for e, g in zip(expected, got):
        np.testing.assert_allclose(g, e, rtol=1e-4, atol=1e-5)


def test_batched_no_keep_hidden():
    # keep_hidden=False resets the recurrent state every chunk in the
    # per-file path; the batched path must do the same (keep mask 0).
    paths = _fixture_paths()[:4]
    fm = _make_feature_module("LSTM", keep_hidden=False)
    expected = _reference_features(fm, paths)
    got = _batched_features(fm, paths, n_lanes=2)
    for e, g in zip(expected, got):
        np.testing.assert_allclose(g, e, rtol=1e-5, atol=1e-5)


def test_async_readback_bit_identical(monkeypatch):
    # CPC_SERVE_ASYNC_READBACK only changes WHEN the device->host copy
    # starts (dispatch time vs drain time); outputs must be bit-identical
    # on both paths, batched and per-file.
    paths = _fixture_paths()[:4]
    fm = _make_feature_module("LSTM")
    monkeypatch.setenv("CPC_SERVE_ASYNC_READBACK", "0")
    sync_b = _batched_features(fm, paths, n_lanes=2, seq_norm=True)
    sync_p = _reference_features(fm, paths, seq_norm=True)
    monkeypatch.setenv("CPC_SERVE_ASYNC_READBACK", "1")
    async_b = _batched_features(fm, paths, n_lanes=2, seq_norm=True)
    async_p = _reference_features(fm, paths, seq_norm=True)
    for s, a in zip(sync_b + sync_p, async_b + async_p):
        np.testing.assert_array_equal(s, a)


def test_batched_hidden_isolation_between_lane_neighbours():
    # A file's features must not depend on which files share the batch:
    # extract one file alone vs packed after a different file set.
    paths = _fixture_paths()
    fm = _make_feature_module("LSTM")
    solo = _batched_features(fm, paths[:1], n_lanes=1)[0]
    packed = _batched_features(fm, paths, n_lanes=2)[0]
    np.testing.assert_allclose(packed, solo, rtol=1e-5, atol=1e-5)


def test_seq_norm_one_frame_chunk_is_finite(tmp_path):
    # A chunk producing exactly one output frame has no unbiased
    # (ddof=1) variance; the reference emits NaN there.  Both our paths
    # return centered zeros instead (DESIGN.md deviations) and agree.
    import wave

    rng = np.random.RandomState(7)
    # 160 samples -> a 1-frame file; CHUNK+160 -> a 1-frame tail chunk.
    paths = []
    for i, n in enumerate([160, CHUNK + 160]):
        p = str(tmp_path / f"f{i}.wav")
        pcm = (np.clip(rng.randn(n), -1, 1) * 20000).astype("<i2")
        with wave.open(p, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())
        paths.append(p)
    fm = _make_feature_module("LSTM")
    expected = _reference_features(fm, paths, seq_norm=True)
    got = _batched_features(fm, paths, n_lanes=2, seq_norm=True)
    assert expected[0].shape[1] == 1 and expected[1].shape[1] == 129
    for e, g in zip(expected, got):
        assert np.isfinite(e).all()
        assert np.isfinite(g).all()
        np.testing.assert_allclose(g, e, rtol=1e-4, atol=1e-5)
    # single-frame chunks normalize to exact zeros (x - mean of itself)
    assert np.abs(expected[0]).max() == 0.0
    assert np.abs(expected[1][0, -1]).max() == 0.0


def test_batched_short_and_tiny_files(tmp_path):
    # files shorter than one chunk, and shorter than one frame (0 frames),
    # mixed with multi-chunk files — per-file equivalence must hold.
    import wave

    rng = np.random.RandomState(3)
    lens = [100, 4000, 19999, 20480, 50000]  # samples; CHUNK=20480
    paths = []
    for i, n in enumerate(lens):
        p = str(tmp_path / f"f{i}.wav")
        pcm = (np.clip(rng.randn(n), -1, 1) * 20000).astype("<i2")
        with wave.open(p, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())
        paths.append(p)
    fm = _make_feature_module("LSTM")
    expected = _reference_features(fm, paths)
    got = _batched_features(fm, paths, n_lanes=2)
    assert expected[0].shape[1] == 0  # 100 samples -> 0 frames
    for e, g in zip(expected, got):
        assert e.shape == g.shape
        np.testing.assert_allclose(g, e, rtol=1e-5, atol=1e-5)
