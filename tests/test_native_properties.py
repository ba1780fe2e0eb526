"""Property tests for the native kernels.

- Beam search with a full-width beam must equal the EXACT CTC posterior
  argmax computed by brute-force enumeration of all alignments.
- The WAV decoder must round-trip all PCM widths and float32.
"""

import itertools
import os
import struct

import numpy as np
import pytest

from cpc_audio_tpu.criterion.seq_alignment import beam_search_py
from cpc_audio_tpu.ops import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def _exact_ctc_posteriors(preds, blank):
    """Brute force: enumerate all alignments, collapse, sum probabilities."""
    T, P = preds.shape
    out = {}
    for path in itertools.product(range(P), repeat=T):
        prob = 1.0
        for t, c in enumerate(path):
            prob *= preds[t, c]
        # collapse repeats then remove blanks
        collapsed = []
        prev = None
        for c in path:
            if c != prev:
                collapsed.append(c)
            prev = c
        label = tuple(c for c in collapsed if c != blank)
        out[label] = out.get(label, 0.0) + prob
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_beam_search_exact_against_bruteforce(seed):
    rng = np.random.RandomState(seed)
    T, P = 5, 3
    preds = rng.rand(T, P).astype(np.float32)
    preds /= preds.sum(1, keepdims=True)
    blank = P - 1
    exact = _exact_ctc_posteriors(preds, blank)
    # beam wide enough to be exhaustive
    for impl in (beam_search_py,
                 lambda p, k, b: native.beam_search(p, k, b)):
        results = impl(preds, 1000, blank)
        got = {tuple(seq): score for score, seq in results}
        for label, prob in exact.items():
            assert label in got, label
            assert abs(got[label] - prob) < 1e-5, (label, got[label], prob)
        # top-1 matches exact argmax
        best_exact = max(exact.items(), key=lambda kv: kv[1])[0]
        assert tuple(results[0][1]) == best_exact


def _write_wav_raw(path, fmt, bps, rate, pcm_bytes, channels=1):
    data_len = len(pcm_bytes)
    hdr = b"RIFF" + struct.pack("<I", 36 + data_len) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, fmt, channels, rate,
                                 rate * channels * bps // 8,
                                 channels * bps // 8, bps)
    hdr += b"data" + struct.pack("<I", data_len)
    with open(path, "wb") as f:
        f.write(hdr + pcm_bytes)


def test_wav_24bit_and_float(tmp_path):
    rng = np.random.RandomState(0)
    vals = (rng.rand(64) * 2 - 1).astype(np.float32) * 0.9

    # 24-bit PCM
    ints = (vals * 8388607).astype(np.int32)
    raw = b"".join(struct.pack("<i", v)[:3] for v in ints)
    p = str(tmp_path / "t24.wav")
    _write_wav_raw(p, 1, 24, 16000, raw)
    data, sr = native.decode_audio(p)
    assert sr == 16000
    np.testing.assert_allclose(data[:, 0], ints / 8388608.0, atol=2e-7)

    # float32
    raw = vals.tobytes()
    p = str(tmp_path / "tf32.wav")
    _write_wav_raw(p, 3, 32, 22050, raw)
    data, sr = native.decode_audio(p)
    assert sr == 22050
    np.testing.assert_allclose(data[:, 0], vals, atol=1e-7)

    # 32-bit PCM
    ints32 = (vals * 2147483000).astype(np.int32)
    p = str(tmp_path / "t32.wav")
    _write_wav_raw(p, 1, 32, 8000, ints32.tobytes())
    data, sr = native.decode_audio(p)
    np.testing.assert_allclose(data[:, 0], ints32 / 2147483648.0, atol=1e-7)

    # 8-bit unsigned PCM
    u8 = ((vals * 127) + 128).clip(0, 255).astype(np.uint8)
    p = str(tmp_path / "t8.wav")
    _write_wav_raw(p, 1, 8, 16000, u8.tobytes())
    data, sr = native.decode_audio(p)
    np.testing.assert_allclose(data[:, 0], (u8.astype(int) - 128) / 128.0,
                               atol=1e-7)


def test_decode_rejects_garbage(tmp_path):
    p = str(tmp_path / "junk.flac")
    with open(p, "wb") as f:
        f.write(b"not audio at all" * 10)
    with pytest.raises(IOError):
        native.decode_audio(p)


def test_dtw_monotonic_property():
    """DTW cost of identical sequences is 0; adding noise increases it."""
    rng = np.random.RandomState(0)
    S, D = 12, 4
    a = rng.rand(S, D).astype(np.float32)
    from cpc_audio_tpu.eval.abx import get_euclidian_distance_batch
    d_same = get_euclidian_distance_batch(a[None], a[None])  # (1,1,S,S)
    out = native.dtw_batch(d_same, np.array([S]), np.array([S]), False)
    assert out[0, 0] < 1e-3  # f32 sqrt noise
    b = a + rng.rand(S, D).astype(np.float32) * 0.5
    d_noise = get_euclidian_distance_batch(a[None], b[None])
    out2 = native.dtw_batch(d_noise, np.array([S]), np.array([S]), False)
    assert out2[0, 0] > out[0, 0]
