"""Native C++ kernel tests: FLAC/WAV decode, DTW, beam search, NW.

DTW goldens ported from the reference ABX tests
(cpc/eval/ABX/unit_tests.py:17-53).
"""

import glob
import os
import wave

import numpy as np
import pytest

from cpc_audio_tpu.criterion.seq_alignment import (beam_search_py,
                                                   needleman_wunsch_align_score)
from cpc_audio_tpu.ops import native

REF_DB = "/root/reference/cpc/test_data/test_db"

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_flac_decode_md5_bitexact():
    """Every test fixture decodes with a STREAMINFO-MD5 match."""
    import ctypes
    lib = ctypes.CDLL(next(p for p in native._LIB_CANDIDATES
                           if __import__("os").path.exists(p)))
    lib.cpc_decode_verify.restype = ctypes.c_int
    lib.cpc_decode_verify.argtypes = [ctypes.c_char_p]
    files = sorted(glob.glob(os.path.join(REF_DB, "*", "*", "*.flac")))
    assert len(files) == 9
    for f in files:
        assert lib.cpc_decode_verify(f.encode()) == 1, f
        data, sr = native.decode_audio(f)
        assert sr == 16000
        assert data.shape[1] == 1
        assert np.abs(data).max() <= 1.0
        n, sr2, ch = native.audio_info(f)
        assert (n, sr2, ch) == (len(data), 16000, 1)


def test_wav_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    pcm = (rng.randn(1600, 2) * 8000).astype(np.int16)
    path = str(tmp_path / "t.wav")
    with wave.open(path, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    data, sr = native.decode_audio(path)
    assert sr == 16000 and data.shape == (1600, 2)
    np.testing.assert_allclose(data, pcm / 32768.0, atol=1e-6)


def _dtw_py(dist, N, M):
    cost = np.zeros((N, M), np.float32)
    cost[0, 0] = dist[0, 0]
    for i in range(1, N):
        cost[i, 0] = dist[i, 0] + cost[i - 1, 0]
    for j in range(1, M):
        cost[0, j] = dist[0, j] + cost[0, j - 1]
    for i in range(1, N):
        for j in range(1, M):
            cost[i, j] = dist[i, j] + min(cost[i - 1, j], cost[i - 1, j - 1],
                                          cost[i, j - 1])
    i, j, plen = N - 1, M - 1, 1
    while i > 0 and j > 0:
        up, left, diag = cost[i - 1, j], cost[i, j - 1], cost[i - 1, j - 1]
        if diag <= left and diag <= up:
            i, j = i - 1, j - 1
        elif left <= up:
            j -= 1
        else:
            i -= 1
        plen += 1
    if i == 0:
        plen += j
    if j == 0:
        plen += i
    return cost[N - 1, M - 1] / plen


def test_dtw_batch_matches_python_reference():
    rng = np.random.RandomState(1)
    N1, N2, S1, S2 = 4, 5, 7, 9
    dist = rng.rand(N1, N2, S1, S2).astype(np.float32)
    sx = np.array([7, 5, 6, 7], np.int64)
    sy = np.array([9, 4, 8, 9, 3], np.int64)
    out = native.dtw_batch(dist, sx, sy, symmetric=False)
    for i in range(N1):
        for j in range(N2):
            exp = _dtw_py(dist[i, j], sx[i], sy[j])
            assert abs(out[i, j] - exp) < 1e-5, (i, j)


def test_dtw_batch_symmetric():
    rng = np.random.RandomState(2)
    N, S = 4, 6
    dist = rng.rand(N, N, S, S).astype(np.float32)
    dist = (dist + dist.transpose(1, 0, 3, 2)) / 2
    sx = np.full(N, S, np.int64)
    out = native.dtw_batch(dist, sx, sx, symmetric=True)
    np.testing.assert_allclose(out, out.T, atol=1e-6)
    assert np.all(np.diag(out) == 0)  # diagonal skipped


def test_dtw_golden_diag():
    """DTW over an identity-like distance matrix: straight diagonal path."""
    S = 5
    dist = np.ones((1, 1, S, S), np.float32)
    for i in range(S):
        dist[0, 0, i, i] = 0.0
    out = native.dtw_batch(dist, np.array([S], np.int64),
                           np.array([S], np.int64), symmetric=False)
    assert abs(out[0, 0]) < 1e-6


def test_native_beam_search_matches_python():
    rng = np.random.RandomState(3)
    for _ in range(5):
        T, P = rng.randint(3, 10), rng.randint(3, 7)
        preds = rng.rand(T, P).astype(np.float32)
        preds /= preds.sum(1, keepdims=True)
        blank = P - 1
        mine = native.beam_search(preds, 8, blank)
        ref = beam_search_py(preds, 8, blank)
        for (s1, l1), (s2, l2) in zip(mine, ref):
            assert abs(s1 - s2) < 1e-6
            assert l1 == l2


def test_native_nw_matches_python():
    rng = np.random.RandomState(4)
    for _ in range(10):
        a = rng.randint(0, 5, rng.randint(2, 12))
        b = rng.randint(0, 5, rng.randint(2, 12))
        v1 = native.needleman_wunsch(a, b)
        v2 = needleman_wunsch_align_score(a, b, -1, -1, 0)
        assert abs(v1 - v2) < 1e-9


def test_mp3_decode_correlates_with_source():
    """mp3 decode (libmpg123 behind native/audio.cc) reproduces a
    lame-encoded test signal up to codec error and encoder delay."""
    import tempfile

    from mp3_util import encode_mp3, lame_available
    if not lame_available():
        pytest.skip("libmp3lame unavailable")
    sr = 16000
    t = np.arange(sr * 2) / sr
    src = (0.5 * np.sin(2 * np.pi * 440 * t)
           + 0.2 * np.sin(2 * np.pi * 1313 * t)).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "sig.mp3")
        encode_mp3(src, sr, path)
        data, rate = native.decode_audio(path)
    assert rate == sr
    dec = data.reshape(-1)
    # align past the lame encoder + mpg123 decoder delay
    corr = np.correlate(dec[:8000], src[:4000], "valid")
    off = int(np.argmax(corr))
    c = np.corrcoef(dec[off:off + sr], src[:sr])[0, 1]
    assert c > 0.99, (off, c)


def test_mp3_decode_through_audio_io():
    """decode_file routes mp3 by content and returns mono float32."""
    import tempfile

    from mp3_util import encode_mp3, lame_available
    if not lame_available():
        pytest.skip("libmp3lame unavailable")
    from cpc_audio_tpu.data.audio_io import decode_file, file_length
    sr = 16000
    src = np.sin(2 * np.pi * 220 * np.arange(sr) / sr).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "sig.mp3")
        encode_mp3(src, sr, path)
        data = decode_file(path, target_rate=sr)
        n = file_length(path)
    assert data.ndim == 1 and data.dtype == np.float32
    assert n == len(data)


def test_native_load_is_thread_safe(monkeypatch):
    """available() must never report False while a load is in progress.

    The first native use in a process is often a thread pool
    (AudioBatchData's length scan); before the load lock, a thread
    arriving mid-load saw `_TRIED and _LIB is None`, silently took the
    python WAV fallback, and crashed on FLAC corpora."""
    import time
    from concurrent.futures import ThreadPoolExecutor

    from cpc_audio_tpu.ops import native as nat

    monkeypatch.setattr(nat, "_LIB", None)
    monkeypatch.setattr(nat, "_TRIED", False)
    orig_attempt = nat._load_attempt

    def slow_attempt():
        time.sleep(0.25)  # widen the race window
        return orig_attempt()

    monkeypatch.setattr(nat, "_load_attempt", slow_attempt)
    with ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(lambda _: nat.available(), range(16)))
    assert all(results), results
