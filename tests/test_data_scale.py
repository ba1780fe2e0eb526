"""Multi-pack pack-streaming regression at (scaled-down) corpus scale.

The golden data tests pin the 2-pack/9-file fixture; this module guards
the reference's actual design point — many files, several packs, async
prefetch — with a synthetic WAV tree whose samples encode the speaker id
as a DC offset, so every gathered window is self-identifying (reference
behavior being matched: /root/reference/cpc/dataset.py:91-137).

Thresholds are functional, not timed (CI hosts vary); the timed
full-scale soak lives in perf/soak_loader.py with results in
docs/PERFORMANCE.md round 4.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "soak_loader", os.path.join(_REPO, "perf", "soak_loader.py"))
soak_loader = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(soak_loader)


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("soak_db"))
    # 72 files x ~1.2s x 8 speakers (~1.4M samples); 400k-sample packs
    # -> >=3 packs with enough windows per speaker per pack for batching
    soak_loader.make_tree(root, n_files=72, n_speakers=8,
                          min_s=1.0, max_s=1.4, seed=3, quiet=True)
    return root


def test_multi_pack_epoch_integrity(tree):
    res = soak_loader.soak_epoch(tree, max_size_loaded=400_000,
                                 size_window=3200, batch_size=4,
                                 n_process_loader=2)
    assert res["n_packs"] >= 3
    assert res["pack_swaps"] == res["n_packs"] - 1
    assert res["impure_batches"] == 0, "samespeaker batch purity violated"
    assert res["mislabeled_windows"] == 0, \
        "window content does not match its speaker label"
    # every pack produced batches: the epoch must cover roughly the corpus
    # (ragged per-pack tails are dropped by design, so allow slack)
    assert res["n_windows"] * 3200 > 0.8 * 72 * 1.0 * 16000


def test_second_epoch_reshuffles_and_stays_pure(tree):
    from cpc_audio_tpu.data.dataset import AudioBatchData, find_all_seqs

    seqs, speakers = find_all_seqs(tree, extension=".wav")
    ds = AudioBatchData(tree, 3200, seqs, None, len(speakers),
                        n_process_loader=2, max_size_loaded=400_000,
                        seed=11)
    n_packs = ds.get_n_loads_per_epoch()
    assert n_packs >= 3

    def epoch_sig():
        loader = ds.get_data_loader(4, "samespeaker", True)
        sig, n = [], 0
        for windows, labels in loader:
            assert (labels == labels[0]).all()
            got = np.round(100 * windows.mean(axis=(1, 2))).astype(np.int64)
            np.testing.assert_array_equal(got, labels)
            sig.append(float(windows.sum()))
            n += windows.shape[0]
        return sig, n

    sig1, n1 = epoch_sig()
    sig2, n2 = epoch_sig()
    # pack reshuffle between epochs: same corpus, different batch content
    assert abs(n1 - n2) < max(n1, n2) * 0.5
    assert sig1 != sig2
    # prefetch really ran: one stall entry per pack load across both epochs
    assert len(ds.stall_log) >= 2 * n_packs - 1
