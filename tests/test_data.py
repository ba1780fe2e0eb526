"""Data pipeline tests against the reference audio fixtures.

Ports the reference's fixture-driven tests (cpc/unit_tests.py:32-205):
discovery/speaker indexing, split filtering, samespeaker batching, pack
streaming, and phone-label windows.
"""

import os

import numpy as np
import pytest

from cpc_audio_tpu.data import (AudioBatchData, filter_seqs, find_all_seqs,
                                parse_seq_labels)
from cpc_audio_tpu.ops import native

REF_DATA = "/root/reference/cpc/test_data"
DB = os.path.join(REF_DATA, "test_db")
SEQ_LIST = os.path.join(REF_DATA, "seq_list.txt")
PHONES = os.path.join(REF_DATA, "phone_labels.txt")
SIZE_WINDOW = 20480

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(DB) and native.available()),
    reason="reference fixtures or native decoder unavailable")


@pytest.fixture(autouse=True)
def _no_cache():
    cache = os.path.join(DB, "_seqs_cache.json")
    if os.path.exists(cache):
        os.remove(cache)
    yield
    if os.path.exists(cache):
        os.remove(cache)


def test_find_all_seqs():
    """unit_tests.py:32-69 semantics: 9 files, 6 speakers."""
    seqs, speakers = find_all_seqs(DB, extension=".flac")
    assert len(seqs) == 9
    assert sorted(speakers) == ["2911", "4051", "4397", "5393", "5678",
                                "6476"]
    # every file's path starts with its speaker's directory
    for spk_idx, rel in seqs:
        assert rel.split(os.sep)[0] == speakers[spk_idx]


def test_find_all_seqs_speaker_level2():
    seqs, speakers = find_all_seqs(DB, extension=".flac", speaker_level=2)
    assert len(speakers) == 7  # 7 chapter dirs in the fixture tree
    for spk_idx, rel in seqs:
        assert os.sep.join(rel.split(os.sep)[:2]) == speakers[spk_idx]


def test_find_all_seqs_no_speaker():
    seqs, speakers = find_all_seqs(DB, extension=".flac", speaker_level=0)
    assert speakers == [""]
    assert all(s == 0 for s, _ in seqs)


def test_filter_seqs():
    """unit_tests.py:110-122: the 7-file split list."""
    seqs, speakers = find_all_seqs(DB, extension=".flac")
    kept = filter_seqs(SEQ_LIST, seqs)
    names = sorted(os.path.basename(p) for _, p in kept)
    assert len(kept) == 7
    assert "4051-11218-0044.flac" not in names
    assert "2911-12359-0007.flac" not in names


def test_load_data_counts():
    seqs, speakers = find_all_seqs(DB, extension=".flac")
    seqs = filter_seqs(SEQ_LIST, seqs)
    data = AudioBatchData(DB, SIZE_WINDOW, seqs, None, 9)
    assert data.get_n_speakers() == 9
    assert data.get_n_seqs() == 7


def test_samespeaker_batches_single_speaker():
    """Every samespeaker batch holds one speaker (unit_tests.py:130-148)."""
    seqs, speakers = find_all_seqs(DB, extension=".flac")
    seqs = filter_seqs(SEQ_LIST, seqs)
    data = AudioBatchData(DB, SIZE_WINDOW, seqs, None, len(speakers), seed=0)
    loader = data.get_data_loader(2, "samespeaker", True)
    visited = set()
    n = 0
    for windows, labels in loader:
        assert windows.shape == (2, 1, SIZE_WINDOW)
        assert (labels == labels[0]).all()
        visited.add(int(labels[0]))
        n += 1
    assert len(visited) == 4  # speakers with >= 1 full window
    assert n > 0


def test_partial_loader_two_packs():
    """MAX_SIZE_LOADED=1e6 -> 2 packs (unit_tests.py:150-170)."""
    seqs, speakers = find_all_seqs(DB, extension=".flac")
    seqs = filter_seqs(SEQ_LIST, seqs)
    data = AudioBatchData(DB, SIZE_WINDOW, seqs, None, len(speakers),
                          max_size_loaded=1_000_000, seed=0)
    assert data.get_n_loads_per_epoch() == 2
    loader = data.get_data_loader(16, "samespeaker", True)
    visited = set()
    for windows, labels in loader:
        assert (labels == labels[0]).all()
        visited.add(int(labels[0]))
    assert len(visited) == 4


def test_parse_seq_labels():
    """unit_tests.py:182-188 goldens."""
    phone_data, n_phones = parse_seq_labels(PHONES)
    assert len(phone_data) == 7  # 6 seqs + step
    assert phone_data["step"] == 160
    assert phone_data["4051-11218-0044"][43] == 14
    assert len(phone_data["4051-11218-0044"]) == 1119
    assert n_phones == 41


def test_phone_label_windows():
    """unit_tests.py:190-200 goldens for getPhonem windows."""
    size_window = 640
    seqs = [(0, "2911/12359/2911-12359-0007.flac"),
            (1, "4051/11218/4051-11218-0044.flac")]
    phone_data, _ = parse_seq_labels(PHONES)
    data = AudioBatchData(DB, size_window, seqs, phone_data, 2)
    for start, expected in [(81280, [0, 0, 0, 0]),
                            (84841, [0, 0, 0, 18]),
                            (88201, [14, 14, 14, 14])]:
        _, labels = data.gather_batch(np.array([start]))
        assert labels[0].tolist() == expected


def test_sequential_loader_contiguous():
    seqs, speakers = find_all_seqs(DB, extension=".flac")
    seqs = filter_seqs(SEQ_LIST, seqs)
    data = AudioBatchData(DB, SIZE_WINDOW, seqs, None, len(speakers), seed=0)
    loader = data.get_data_loader(2, "sequential", False)
    prev = None
    for windows, labels in loader:
        if prev is not None:
            # lane 0 windows are contiguous across batches
            np.testing.assert_array_equal(
                prev[0, 0, -1],
                data.data[np.where(data.data == prev[0, 0, -1])[0][0]])
        prev = windows
    assert prev is not None


def test_uniform_loader_shapes():
    seqs, speakers = find_all_seqs(DB, extension=".flac")
    seqs = filter_seqs(SEQ_LIST, seqs)
    data = AudioBatchData(DB, SIZE_WINDOW, seqs, None, len(speakers), seed=0)
    loader = data.get_data_loader(4, "uniform", True)
    count = 0
    for windows, labels in loader:
        assert windows.shape == (4, 1, SIZE_WINDOW)
        assert windows.dtype == np.float32
        count += 1
    assert count == len(loader) or count == len(loader) - 1


def test_same_speaker_plan_tail_resampling_stats():
    """The samespeaker plan completes ragged tail batches by re-sampling
    within the SAME interval (docs/DESIGN.md deviation): every window is
    covered at least once per epoch, duplicates are bounded by the tail
    padding, and no batch mixes intervals."""
    import random as pyrandom

    from cpc_audio_tpu.data.dataset import same_speaker_batch_plan
    rng = pyrandom.Random(0)
    size_window, batch_size = 10, 4
    # intervals: speaker sizes 7, 9, 2 windows (all ragged), one empty
    intervals = np.array([0, 70, 160, 180, 180])
    plan = same_speaker_batch_plan(intervals, size_window, batch_size, 0,
                                   rng)
    assert plan.shape[1] == batch_size
    starts = plan.reshape(-1)
    window_ids = starts // size_window
    # batch -> interval containment: all windows of a row share an interval
    for row in plan:
        owner = np.searchsorted(intervals, row, side="right")
        assert len(set(owner.tolist())) == 1, row
    # full coverage: every window of every nonempty interval appears
    expected = set()
    for i in range(len(intervals) - 1):
        n = (intervals[i + 1] - intervals[i]) // size_window
        expected |= {intervals[i] // size_window + j for j in range(int(n))}
    assert set(window_ids.tolist()) == expected
    # duplication bounded: total emitted windows <= windows + padding
    n_windows = sum((np.diff(intervals) // size_window).astype(int))
    n_batches_expected = sum(
        -(-int(n) // batch_size)
        for n in (np.diff(intervals) // size_window) if n > 0)
    assert plan.shape[0] == n_batches_expected
    assert len(starts) - n_windows < n_batches_expected * batch_size \
        - n_windows + 1
    # duplicates only appear in tail-completed batches: for intervals with
    # >= batch_size windows the tail draws WITHOUT replacement (max 2 uses
    # per window); tiny intervals (< batch_size) may repeat further
    unique, counts = np.unique(window_ids, return_counts=True)
    big = np.isin(unique, [j for i in range(len(intervals) - 1)
                           if (intervals[i + 1] - intervals[i])
                           // size_window >= batch_size
                           for j in range(intervals[i] // size_window,
                                          intervals[i + 1] // size_window)])
    assert counts[big].max() <= 2
    assert counts.max() <= batch_size
