"""ABX item parsing, feature slicing, and triplet group iterators.

Reference: /root/reference/cpc/eval/ABX/abx_iterators.py (434 LoC).
Numpy host-side re-implementation: group structures are small and irregular
(max_size_group ~10), so the host orchestrates while distances/DTW run in
vectorized kernels.
"""

from __future__ import annotations

import math
import random
from typing import Callable, Dict, List, Sequence, Tuple

import numpy as np


def normalize_with_singularity(x: np.ndarray) -> np.ndarray:
    """L2-normalize (S, H) (or (N, S, H)) across channels; append an extra
    coordinate that puts null vectors at maximal cosine distance from any
    non-null vector (abx_iterators.py:11-27)."""
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    x = np.array(x, np.float32)
    N, S, H = x.shape
    norm_x = (x ** 2).sum(axis=2, keepdims=True)
    zero_vals = (norm_x == 0)[..., 0]
    with np.errstate(divide="ignore", invalid="ignore"):
        x = x / np.sqrt(norm_x)
    x[zero_vals] = 1.0 / math.sqrt(H)
    border = np.full((N, S, 1), 1e-12, np.float32)
    border[zero_vals] = -2e12
    out = np.concatenate([x, border], axis=2)
    return out[0] if squeeze else out


def load_item_file(path_item_file: str):
    """Parse a ZeroSpeech .item file (abx_iterators.py:30-78).

    Line format: ``#file onset offset #phone prev next speaker``.
    Returns (files_data, context_match, phone_match, speaker_match) with
    interned id maps; files_data[fileID] = [[onset, offset, context_id,
    phone_id, speaker_id], ...].
    """
    with open(path_item_file) as f:
        lines = [l.strip() for l in f.readlines()[1:] if l.strip()]
    out: Dict[str, list] = {}
    phone_match: Dict[str, int] = {}
    speaker_match: Dict[str, int] = {}
    context_match: Dict[str, int] = {}
    for line in lines:
        items = line.split()
        assert len(items) == 7, line
        file_id = items[0]
        out.setdefault(file_id, [])
        onset, offset = float(items[1]), float(items[2])
        context = "+".join([items[4], items[5]])
        phone, speaker = items[3], items[6]
        phone_id = phone_match.setdefault(phone, len(phone_match))
        context_id = context_match.setdefault(context, len(context_match))
        speaker_id = speaker_match.setdefault(speaker, len(speaker_match))
        out[file_id].append([onset, offset, context_id, phone_id, speaker_id])
    return out, context_match, phone_match, speaker_match


def get_features_group(in_data: Sequence, index_order: Sequence[int]):
    """Sort item indices by the given id columns and nest ranges per level
    (abx_iterators.py:81-112).  Returns (sorted_index, nested_groups)."""
    in_index = sorted(range(len(in_data)),
                      key=lambda x: [in_data[x][i] for i in index_order])
    out_groups: list = []
    last_values = [in_data[in_index[0]][i] for i in index_order]
    i_s = 0
    curr_group: List[list] = [[] for _ in index_order]
    n_orders = len(index_order) - 1
    tmp = [in_data[i] for i in in_index]
    for index, item in enumerate(tmp):
        for order_index, order in enumerate(index_order):
            if item[order] != last_values[order_index]:
                curr_group[-1].append((i_s, index))
                for i in range(n_orders, order_index, -1):
                    curr_group[i - 1].append(curr_group[i])
                    curr_group[i] = []
                if order_index == 0:
                    out_groups += curr_group[0]
                    curr_group[0] = []
                last_values = [item[i] for i in index_order]
                i_s = index
                break
    if i_s < len(in_data):
        curr_group[-1].append((i_s, len(in_data)))
        for i in range(n_orders, 0, -1):
            curr_group[i - 1].append(curr_group[i])
        out_groups += curr_group[0]
    return in_index, out_groups


class ABXFeatureLoader:
    """Extract per-phone feature segments into one flat array
    (abx_iterators.py:115-246).

    feature_maker(path) -> (1, S, H) or (S, H) features for a file.
    """

    INDEX_CONTEXT = 2
    INDEX_PHONE = 3
    INDEX_SPEAKER = 4

    def __init__(self, path_item_file: str,
                 seq_list: Sequence[Tuple[str, str]],
                 feature_maker: Callable[[str], np.ndarray],
                 step_feature: float, normalize: bool):
        files_data, self.context_match, self.phone_match, \
            self.speaker_match = load_item_file(path_item_file)
        self.seq_norm = True
        self.step_feature = step_feature
        self._load(files_data, seq_list, feature_maker, normalize)

    def _load(self, files_data, seq_list, feature_maker, normalize):
        self.features: List[list] = []
        data = []
        tot_size = 0
        for file_id, file_path in seq_list:
            if file_id not in files_data:
                continue
            features = np.asarray(feature_maker(file_path))
            if features.ndim == 3:
                features = features.reshape(features.shape[1],
                                            features.shape[2])
            if normalize:
                features = normalize_with_singularity(features)
            n_frames = features.shape[0]
            for start, end, context_id, phone_id, speaker_id \
                    in files_data[file_id]:
                index_start = max(
                    0, int(math.ceil(self.step_feature * start - 0.5)))
                index_end = min(
                    n_frames, int(math.floor(self.step_feature * end - 0.5)))
                if index_start >= n_frames or index_end <= index_start:
                    continue
                loc_size = index_end - index_start
                self.features.append([tot_size, loc_size, context_id,
                                      phone_id, speaker_id])
                data.append(features[index_start:index_end])
                tot_size += loc_size
        self.data = np.concatenate(data, axis=0) if data \
            else np.zeros((0, 1), np.float32)
        self.feature_dim = self.data.shape[1]

    def get_ids(self, index: int):
        return tuple(self.features[index][2:])

    def __getitem__(self, index: int):
        i_data, out_size, context_id, phone_id, speaker_id = \
            self.features[index]
        return (self.data[i_data:i_data + out_size], out_size,
                (context_id, phone_id, speaker_id))

    def __len__(self) -> int:
        return len(self.features)

    def get_n_speakers(self) -> int:
        return len(self.speaker_match)

    def get_n_context(self) -> int:
        return len(self.context_match)

    def get_n_phone(self) -> int:
        return len(self.phone_match)

    def get_iterator(self, mode: str, max_size_group: int):
        if mode == "within":
            return ABXWithinGroupIterator(self, max_size_group)
        if mode == "across":
            return ABXAcrossGroupIterator(self, max_size_group)
        raise ValueError(f"Invalid mode: {mode}")


class ABXIterator:
    """Base triplet iterator (abx_iterators.py:249-297)."""

    def __init__(self, abx_dataset: ABXFeatureLoader, max_size_group: int,
                 seed: int = 0):
        self.max_size_group = max_size_group
        self.dataset = abx_dataset
        self.len = 0
        self.rng = random.Random(seed)
        self.index_csp, self.groups_csp = get_features_group(
            abx_dataset.features,
            [abx_dataset.INDEX_CONTEXT, abx_dataset.INDEX_SPEAKER,
             abx_dataset.INDEX_PHONE])

    def get_group(self, i_start: int, i_end: int):
        """Pack one group into (N, max_size, H) + sizes, subsampled to
        max_size_group (abx_iterators.py:265-288)."""
        data = []
        max_size = 0
        to_take = list(range(i_start, i_end))
        if i_end - i_start > self.max_size_group:
            to_take = self.rng.sample(to_take, k=self.max_size_group)
        loc_id = (0, 0, 0)
        for i in to_take:
            loc_data, loc_size, loc_id = self.dataset[self.index_csp[i]]
            max_size = max(loc_size, max_size)
            data.append(loc_data)
        N = len(to_take)
        out_data = np.zeros((N, max_size, self.dataset.feature_dim),
                            np.float32)
        out_size = np.zeros(N, np.int64)
        for i, d in enumerate(data):
            out_data[i, :len(d)] = d
            out_size[i] = len(d)
        return out_data, out_size, loc_id

    def __len__(self) -> int:
        return self.len

    def get_board_size(self):
        raise NotImplementedError


class ABXWithinGroupIterator(ABXIterator):
    """Triplets for the within-speaker score (abx_iterators.py:300-349):
    same context+speaker, phone a != b, X drawn from A's group."""

    def __init__(self, abx_dataset, max_size_group, seed: int = 0):
        super().__init__(abx_dataset, max_size_group, seed)
        self.symmetric = True
        for context_group in self.groups_csp:
            for speaker_group in context_group:
                if len(speaker_group) > 1:
                    for i_start, i_end in speaker_group:
                        if i_end - i_start > 1:
                            self.len += len(speaker_group) - 1

    def __iter__(self):
        for i_c, context_group in enumerate(self.groups_csp):
            for i_s, speaker_group in enumerate(context_group):
                n_phones = len(speaker_group)
                if n_phones == 1:
                    continue
                for i_a in range(n_phones):
                    i_start_a, i_end_a = speaker_group[i_a]
                    if i_end_a - i_start_a == 1:
                        continue
                    for i_b in range(n_phones):
                        if i_b == i_a:
                            continue
                        i_start_b, i_end_b = speaker_group[i_b]
                        data_b, size_b, id_b = self.get_group(i_start_b,
                                                              i_end_b)
                        data_a, size_a, id_a = self.get_group(i_start_a,
                                                              i_end_a)
                        out_coords = (id_a[2], id_a[1], id_b[1], id_a[0])
                        yield (out_coords, (data_a, size_a),
                               (data_b, size_b), (data_a, size_a))

    def get_board_size(self):
        return (self.dataset.get_n_speakers(), self.dataset.get_n_phone(),
                self.dataset.get_n_phone(), self.dataset.get_n_context())


class ABXAcrossGroupIterator(ABXIterator):
    """Triplets for the across-speaker score (abx_iterators.py:352-434):
    X = same context+phone as A from up to max_x other speakers."""

    def __init__(self, abx_dataset, max_size_group, max_x: int = 5,
                 seed: int = 0):
        super().__init__(abx_dataset, max_size_group, seed)
        self.symmetric = False
        self.max_x = max_x
        self.get_speakers_from_cp: Dict[int, Dict[int, Dict[int, tuple]]] = {}
        for context_group in self.groups_csp:
            for speaker_group in context_group:
                for i_start, i_end in speaker_group:
                    c_id, p_id, s_id = self.dataset.get_ids(
                        self.index_csp[i_start])
                    self.get_speakers_from_cp.setdefault(c_id, {}) \
                        .setdefault(p_id, {})[s_id] = (i_start, i_end)
        for context_group in self.groups_csp:
            for speaker_group in context_group:
                if len(speaker_group) > 1:
                    for i_start, i_end in speaker_group:
                        c_id, p_id, s_id = self.dataset.get_ids(
                            self.index_csp[i_start])
                        self.len += (len(speaker_group) - 1) * min(
                            self.max_x,
                            len(self.get_speakers_from_cp[c_id][p_id]) - 1)

    def _other_speakers(self, i_start_group: int):
        c_id, p_id, s_id = self.dataset.get_ids(
            self.index_csp[i_start_group])
        return [v for k, v in self.get_speakers_from_cp[c_id][p_id].items()
                if k != s_id]

    def __iter__(self):
        for i_c, context_group in enumerate(self.groups_csp):
            for i_s, speaker_group in enumerate(context_group):
                n_phones = len(speaker_group)
                if n_phones == 1:
                    continue
                for i_a in range(n_phones):
                    i_start_a, i_end_a = speaker_group[i_a]
                    ref = self._other_speakers(i_start_a)
                    if len(ref) > self.max_x:
                        speakers_a = self.rng.sample(ref, k=self.max_x)
                    else:
                        speakers_a = ref
                    for i_start_x, i_end_x in speakers_a:
                        for i_b in range(n_phones):
                            if i_b == i_a:
                                continue
                            i_start_b, i_end_b = speaker_group[i_b]
                            data_a, size_a, id_a = self.get_group(i_start_a,
                                                                  i_end_a)
                            data_b, size_b, id_b = self.get_group(i_start_b,
                                                                  i_end_b)
                            data_x, size_x, id_x = self.get_group(i_start_x,
                                                                  i_end_x)
                            out_coords = (id_a[2], id_a[1], id_b[1],
                                          id_a[0], id_x[2])
                            yield (out_coords, (data_a, size_a),
                                   (data_b, size_b), (data_x, size_x))

    def get_board_size(self):
        return (self.dataset.get_n_speakers(), self.dataset.get_n_phone(),
                self.dataset.get_n_phone(), self.dataset.get_n_context(),
                self.dataset.get_n_speakers())
