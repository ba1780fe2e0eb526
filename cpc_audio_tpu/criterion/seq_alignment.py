"""CTC prefix beam search, label-chain collapsing, and PER alignment.

Reference: /root/reference/cpc/criterion/seq_alignment.py:11-164.

The hot paths (beam search, Needleman-Wunsch) route through the native C++
kernel library (native/beam_search.cc via cpc_audio_tpu.ops.native) when it
is built, with pure-Python fallbacks kept for portability and as the golden
semantics; ``collapse_label_chain_padded`` is a static-shape on-device
variant feeding optax's CTC loss.
"""

from __future__ import annotations

import multiprocessing
from concurrent.futures import ProcessPoolExecutor
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Label-chain collapsing
# ---------------------------------------------------------------------------

def collapse_label_chain(labels: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Remove consecutive repeats per row (seq_alignment.py:64-86).

    labels: (N, T) int array.  Returns (padded (N, maxSize), sizes (N,)).
    """
    labels = np.asarray(labels)
    N, T = labels.shape
    keep = np.concatenate(
        [np.ones((N, 1), bool), labels[:, 1:] != labels[:, :-1]], axis=1)
    sizes = keep.sum(axis=1).astype(np.int64)
    max_size = int(sizes.max()) if N else 0
    out = np.zeros((N, max_size), np.int64)
    for i in range(N):
        out[i, :sizes[i]] = labels[i][keep[i]]
    return out, sizes


def collapse_label_chain_padded(labels: jax.Array
                                ) -> Tuple[jax.Array, jax.Array]:
    """On-device static-shape collapse for CTC: returns (targets (B, T),
    target_paddings (B, T)) with collapsed labels left-packed."""
    B, T = labels.shape
    keep = jnp.concatenate(
        [jnp.ones((B, 1), bool), labels[:, 1:] != labels[:, :-1]], axis=1)
    pos = jnp.cumsum(keep, axis=1) - 1                  # destination slot
    pos = jnp.where(keep, pos, T)                       # dump removed -> T
    targets = jnp.zeros((B, T + 1), labels.dtype)
    batch_idx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, T))
    targets = targets.at[batch_idx.reshape(-1),
                         pos.reshape(-1)].set(labels.reshape(-1))[:, :T]
    sizes = jnp.sum(keep, axis=1)
    paddings = (jnp.arange(T)[None, :] >= sizes[:, None]).astype(jnp.float32)
    return targets, paddings


# ---------------------------------------------------------------------------
# CTC prefix beam search
# ---------------------------------------------------------------------------

def beam_search_py(score_preds: np.ndarray, n_keep: int, blank_label: int
                   ) -> List[Tuple[float, List[int]]]:
    """Pure-Python CTC prefix beam search (seq_alignment.py:11-61 semantics).

    score_preds: (T, P) posterior probabilities.  Returns the n_keep best
    (score, label-sequence) pairs, best first.
    """
    T, P = score_preds.shape
    beams: Sequence[Tuple[int, ...]] = [()]
    pb_prev = {(): 1.0}
    pnb_prev = {(): 0.0}
    all_preds: List[Tuple[float, Tuple[int, ...]]] = [(1.0, ())]

    for t in range(T):
        pb_t: dict = {}
        pnb_t: dict = {}
        row = score_preds[t]
        for b in beams:
            pb_t.setdefault(b, 0.0)
            pnb_t.setdefault(b, 0.0)
            if b:
                pnb_t[b] += pnb_prev[b] * row[b[-1]]
            pb_t[b] = (pnb_prev[b] + pb_prev[b]) * row[blank_label]
            pbb, pnbb = pb_prev[b], pnb_prev[b]
            for c in range(P):
                if c == blank_label:
                    continue
                b_ = b + (c,)
                if b_ not in pb_t:
                    pb_t[b_] = 0.0
                    pnb_t[b_] = 0.0
                if b and b[-1] == c:
                    pnb_t[b_] += pbb * row[c]
                else:
                    pnb_t[b_] += (pbb + pnbb) * row[c]
        all_preds = sorted(((pb_t[b] + pnb_t[b], b) for b in pb_t),
                           key=lambda x: (x[0], x[1]), reverse=True)
        beams = [b for _, b in all_preds[:n_keep]]
        pb_prev, pnb_prev = pb_t, pnb_t

    return [(s, list(b)) for s, b in all_preds[:n_keep]]


def beam_search(score_preds: np.ndarray, n_keep: int, blank_label: int
                ) -> List[Tuple[float, List[int]]]:
    """Native C++ beam search when available, python fallback otherwise."""
    from ..ops import native
    if native.available():
        return native.beam_search(np.ascontiguousarray(score_preds,
                                                       np.float32),
                                  n_keep, blank_label)
    return beam_search_py(score_preds, n_keep, blank_label)


# ---------------------------------------------------------------------------
# Needleman-Wunsch PER
# ---------------------------------------------------------------------------

def needleman_wunsch_align_score(seq1, seq2, d: float, m: float, r: float,
                                 normalize: bool = True) -> float:
    """O(N1*N2) global alignment score (seq_alignment.py:89-113),
    vectorized over rows with numpy."""
    seq1 = np.asarray(seq1)
    seq2 = np.asarray(seq2)
    N1, N2 = len(seq1), len(seq2)
    prev = np.arange(N2 + 1, dtype=np.float64) * d
    for i in range(N1):
        match = np.where(seq2 == seq1[i], r, m)
        cur = np.empty(N2 + 1, np.float64)
        cur[0] = (i + 1) * d
        diag = prev[:-1] + match
        # cur[j+1] = max(diag[j], prev[j+1]+d, cur[j]+d): the cur[j]+d term
        # is a serial prefix recurrence -> running max trick
        best = np.maximum(diag, prev[1:] + d)
        for j in range(N2):
            cur[j + 1] = max(best[j], cur[j] + d)
        prev = cur
    res = -prev[N2]
    if normalize:
        res /= float(N1)
    return res


def get_seq_per(seq_labels, detected_labels) -> float:
    """PER = normalized NW score with d=m=-1, r=0 (seq_alignment.py:116)."""
    from ..ops import native
    if native.available():
        return native.needleman_wunsch(
            np.ascontiguousarray(seq_labels, np.int32),
            np.ascontiguousarray(detected_labels, np.int32))
    return needleman_wunsch_align_score(seq_labels, detected_labels,
                                        -1, -1, 0, normalize=True)


def _per_one(args):
    posterior, labels, blank_label, n_keep = args
    preds = beam_search(posterior, n_keep, blank_label)[0][1]
    return get_seq_per(labels, preds)


def get_per(data_iter, feature_fn, blank_label: int,
            n_keep_beam_search: int = 100, pool_size: int = 8) -> float:
    """Mean PER over a data iterator (seq_alignment.py:121-164).

    feature_fn(batch) -> (B, S, P) posterior probabilities (numpy).
    data_iter yields (batch, frame_labels).
    """
    total, n_items = 0.0, 0
    for data, labels in data_iter:
        posteriors = np.asarray(feature_fn(data))
        labels_np, sizes = collapse_label_chain(np.asarray(labels))
        jobs = [(posteriors[i], labels_np[i, :sizes[i]], blank_label,
                 n_keep_beam_search) for i in range(posteriors.shape[0])]
        if pool_size > 1 and len(jobs) > 1:
            # spawn, not fork: forking a JAX-initialized multithreaded
            # process can deadlock (reference precedent train.py:492)
            ctx = multiprocessing.get_context("spawn")
            with ProcessPoolExecutor(max_workers=pool_size,
                                     mp_context=ctx) as ex:
                values = list(ex.map(_per_one, jobs))
        else:
            values = [_per_one(j) for j in jobs]
        total += float(np.sum(values))
        n_items += len(jobs)
    return total / max(n_items, 1)
