"""ABX evaluation tests, goldens ported from the reference
(cpc/eval/ABX/unit_tests.py)."""

import math
import os

import numpy as np
import pytest

from cpc_audio_tpu.eval.abx import (ABXFeatureLoader, get_cosine_distance_batch,
                                    get_distance_group_dtw,
                                    get_euclidian_distance_batch,
                                    get_features_group, get_theta_group_dtw,
                                    load_item_file,
                                    normalize_with_singularity)

REF_TD = "/root/reference/cpc/eval/ABX/test_data"

needs_ref = pytest.mark.skipif(not os.path.isdir(REF_TD),
                               reason="reference ABX fixtures unavailable")


def test_dtw_distance_goldens():
    """unit_tests.py:17-36: hand-computed normalized DTW distances."""
    X = np.array([[[0, 1], [0, 0], [1, 1], [42, 42]],
                  [[0, 2], [0, 1], [1, 1], [-1, 0]],
                  [[0, 0], [0, 1], [0, 0], [21, 211]]], np.float32)
    X_size = np.array([3, 4, 2])
    Y = np.array([[[0, 1], [1, 2], [0, 0]]], np.float32)
    Y_size = np.array([3])
    dist = get_distance_group_dtw(
        X, Y, X_size, Y_size,
        distance_function=get_euclidian_distance_batch)
    assert dist.shape == (3, 1)
    expected = [math.sqrt(2) / 2, 3 / 4, (2 + math.sqrt(2)) / 3]
    for i in range(3):
        assert abs(dist[i, 0] - expected[i]) < 1e-4


def test_theta_dtw_symmetric_golden():
    """unit_tests.py:38-53: theta == 0.5."""
    A = np.array([[[0, 1], [0, 0], [1, 1], [42, 42]],
                  [[0, 2], [0, 1], [1, 1], [-1, 0]],
                  [[0, 0], [0, 1], [0, 0], [21, 211]]], np.float32)
    A_size = np.array([3, 4, 2])
    B = np.array([[[0, 1], [1, 2], [0, 0]]], np.float32)
    B_size = np.array([3])
    theta = get_theta_group_dtw(A, B, A, A_size, B_size, A_size,
                                get_euclidian_distance_batch, True)
    assert theta == 0.5


def test_singularity_normalization_goldens():
    """unit_tests.py:56-82: cosine distances with null-vector extension."""
    x = np.array([[[1., 0., 0., 0.], [0., 0., 0., 0.]],
                  [[0., 0., -1., 0.], [0.5, -0.5, 0.5, -0.5]]], np.float32)
    y = np.array([[[-0.5, -0.5, -0.5, 0.5], [0., 0., 0., 0.],
                   [0., 1., 0., 0.]]], np.float32)
    dist = get_cosine_distance_batch(normalize_with_singularity(x),
                                     normalize_with_singularity(y))
    assert dist.shape == (2, 1, 2, 3)
    golden = {(0, 0, 0, 0): 0.6667, (0, 0, 0, 1): 1.0, (0, 0, 0, 2): 0.5,
              (0, 0, 1, 0): 1.0, (0, 0, 1, 1): 0.0, (0, 0, 1, 2): 1.0,
              (1, 0, 0, 0): 0.3333, (1, 0, 0, 1): 1.0, (1, 0, 0, 2): 0.5,
              (1, 0, 1, 0): 0.6667, (1, 0, 1, 1): 1.0, (1, 0, 1, 2): 0.6667}
    for idx, val in golden.items():
        assert abs(dist[idx] - val) < 1e-4, (idx, dist[idx], val)


def test_group_maker_1d():
    data = [[0], [1], [2], [3], [4], [2], [2], [2]]
    out_index, out_data = get_features_group(data, [0])
    assert out_index == [0, 1, 2, 5, 6, 7, 3, 4]
    assert out_data == [(0, 1), (1, 2), (2, 6), (6, 7), (7, 8)]


def test_group_maker_2d():
    data = [[0, 1], [1, 2], [2, 3], [3, 3],
            [4, 0], [2, 2], [4, 2], [2, 2], [0, 3]]
    out_index, out_data = get_features_group(data, [1, 0])
    assert out_index == [4, 0, 1, 5, 7, 6, 8, 2, 3]
    assert out_data == [[(0, 1)], [(1, 2)], [(2, 3), (3, 5), (5, 6)],
                        [(6, 7), (7, 8), (8, 9)]]


def test_group_maker_3d():
    data = [[0, 0, 0, 1], [41, 1, 0, 2], [-23, 0, 3, 1],
            [220, 1, -2, 3], [40, 2, 1, 0], [200, 0, 0, 1]]
    out_index, out_data = get_features_group(data, [1, 3, 2])
    assert out_index == [0, 5, 2, 1, 3, 4]
    assert out_data == [[[(0, 2), (2, 3)]], [[(3, 4)], [(4, 5)]],
                        [[(5, 6)]]]


@needs_ref
def test_load_item_file_goldens():
    """unit_tests.py:139-168."""
    out, context_match, phone_match, speaker_match = load_item_file(
        os.path.join(REF_TD, "dummy_item_file.item"))
    assert len(out) == 4
    assert phone_match == {"n": 0, "d": 1, "ih": 2, "s": 3, "dh": 4}
    assert speaker_match == {"8193": 0, "2222": 1, "12": 2}
    assert context_match == {"ae+d": 0, "n+l": 1, "l+n": 2, "ih+s": 3,
                             "n+ax": 4, "ax+dh": 5, "s+ax": 6}
    assert out["2107"] == [[0.3225, 0.5225, 0, 0, 0],
                           [0.4225, 0.5925, 1, 1, 1],
                           [1.1025, 1.2925, 6, 4, 2]]
    assert out["407"] == [[0.8725, 1.2425, 5, 3, 1]]


def _dummy_feature_maker(path_file):
    data = np.load(path_file)
    assert data.ndim == 1
    return data.reshape(1, -1, 1)


@needs_ref
def test_abx_feature_loader_goldens():
    """unit_tests.py:205-227."""
    seq_list = [("2107", os.path.join(REF_TD, "2107.npy")),
                ("42", os.path.join(REF_TD, "42.npy")),
                ("23", os.path.join(REF_TD, "23.npy")),
                ("407", os.path.join(REF_TD, "407.npy"))]
    dataset = ABXFeatureLoader(
        os.path.join(REF_TD, "dummy_item_file.item"), seq_list,
        _dummy_feature_maker, 10, False)
    assert dataset.feature_dim == 1
    assert len(dataset) == 9
    assert len(dataset.data) == 16
    data, size, coords = dataset[0]
    assert size == 1 and coords == (0, 0, 0)
    assert data.tolist() == [[3]]
    data, size, coords = dataset[3]
    assert size == 1 and coords == (1, 1, 1)
    assert data.tolist() == [[5]]


@needs_ref
def test_within_iterator_goldens():
    """unit_tests.py:229-250."""
    seq_list = [("2107", os.path.join(REF_TD, "2107.npy")),
                ("42", os.path.join(REF_TD, "42.npy"))]
    dataset = ABXFeatureLoader(
        os.path.join(REF_TD, "dummy_item_within.item"), seq_list,
        _dummy_feature_maker, 10, False)
    iterator = dataset.get_iterator("within", 40)
    assert iterator.index_csp == [0, 1, 2, 6, 3, 4, 5, 8, 7]
    assert iterator.groups_csp == [[[(0, 1)]], [[(1, 3)]],
                                   [[(3, 4)], [(4, 6), (6, 7)]],
                                   [[(7, 8)], [(8, 9)]]]
    assert len(iterator) == 1
    it = iter(iterator)
    c1, a_01, b_01, x_01 = next(it)
    assert c1 == (1, 1, 2, 2)
    a_1, s_a = a_01
    assert s_a.tolist() == [1, 1]
    assert a_1.tolist() == [[[4.]], [[5.]]]
    assert x_01[0].tolist() == a_1.tolist()
    assert b_01[0].tolist() == [[[1.]]]
    assert next(it, False) is False
    assert iterator.get_board_size() == (2, 3, 3, 4)


@needs_ref
def test_abx_end_to_end_from_precomputed(tmp_path):
    """Whole pipeline through the abx() entry on the .npy fixtures."""
    from cpc_audio_tpu.eval.abx_cli import abx
    seq_list = [("2107", os.path.join(REF_TD, "2107.npy")),
                ("42", os.path.join(REF_TD, "42.npy")),
                ("23", os.path.join(REF_TD, "23.npy")),
                ("407", os.path.join(REF_TD, "407.npy"))]

    def feature_function(path):
        return np.load(path).reshape(1, -1, 1)

    scores = abx(feature_function,
                 os.path.join(REF_TD, "dummy_item_file.item"),
                 seq_list, "cosine", 10, ["within", "across"])
    assert set(scores) <= {"within", "across"}
    for v in scores.values():
        assert 0.0 <= v <= 1.0

    # the within item file has a valid within group (golden iterator above)
    seq_list_w = seq_list[:2]
    scores_w = abx(feature_function,
                   os.path.join(REF_TD, "dummy_item_within.item"),
                   seq_list_w, "cosine", 10, ["within"])
    assert "within" in scores_w
    assert 0.0 <= scores_w["within"] <= 1.0


@needs_ref
def test_abx_on_device_matches_host_dtw(tmp_path):
    """--on_device (wavefront-scan DTW on the JAX device) must reproduce
    the native host kernel's scores through the full abx() pipeline."""
    from cpc_audio_tpu.eval.abx_cli import abx
    seq_list = [("2107", os.path.join(REF_TD, "2107.npy")),
                ("42", os.path.join(REF_TD, "42.npy"))]

    def feature_function(path):
        return np.load(path).reshape(1, -1, 1)

    kwargs = dict(path_item_file=os.path.join(REF_TD,
                                              "dummy_item_within.item"),
                  seq_list=seq_list, distance_mode="cosine",
                  step_feature=10, modes=["within", "across"])
    host = abx(feature_function, **kwargs)
    dev = abx(feature_function, on_device=True, **kwargs)
    assert host.keys() == dev.keys() and host
    for k in host:
        assert abs(host[k] - dev[k]) < 1e-5, (k, host[k], dev[k])


@needs_ref
def test_feature_loader_streaming_matches_sequential():
    """ABXFeatureLoader.from_features_iter (any arrival order, segments
    only — the batched-extraction memory fix) must reproduce the
    sequential constructor's layout and scores bit-for-bit."""
    from cpc_audio_tpu.eval.abx_cli import abx

    seq_list = [("2107", os.path.join(REF_TD, "2107.npy")),
                ("42", os.path.join(REF_TD, "42.npy")),
                ("23", os.path.join(REF_TD, "23.npy")),
                ("407", os.path.join(REF_TD, "407.npy"))]
    item = os.path.join(REF_TD, "dummy_item_file.item")

    def feature_function(path):
        return np.load(path).reshape(1, -1, 1)

    seq = ABXFeatureLoader(item, seq_list, feature_function, 10, True)

    # completion order != seq_list order, as build_features_batched yields
    shuffled = [seq_list[2], seq_list[0], seq_list[3], seq_list[1]]
    stream = ABXFeatureLoader.from_features_iter(
        item, [fid for fid, _ in seq_list],
        ((fid, feature_function(p)) for fid, p in shuffled), 10, True)

    assert stream.features == seq.features
    np.testing.assert_array_equal(stream.data, seq.data)

    # score equivalence on the item file that has a valid within group
    seq_list_w = seq_list[:2]
    kwargs = dict(path_item_file=os.path.join(REF_TD,
                                              "dummy_item_within.item"),
                  seq_list=seq_list_w, distance_mode="cosine",
                  step_feature=10, modes=["within"])
    base = abx(feature_function, **kwargs)
    streamed = abx(None, features_iter=(
        (fid, feature_function(p)) for fid, p in reversed(seq_list_w)),
        file_order=[fid for fid, _ in seq_list_w], **kwargs)
    assert base == streamed and base
