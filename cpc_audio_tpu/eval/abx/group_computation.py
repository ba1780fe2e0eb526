"""ABX distance kernels + group scoring.

Reference: /root/reference/cpc/eval/ABX/abx_group_computation.py (129 LoC).
Distances are vectorized numpy einsums; the DP runs in the native C++ DTW
kernel (native/dtw.cc) with a pure-python fallback, replacing the
reference's Cython extension.
"""

from __future__ import annotations

import math
from typing import Callable, List, Tuple

import numpy as np

from ...ops import native


def get_distance_function_from_name(name: str) -> Callable:
    if name == "euclidian":
        return get_euclidian_distance_batch
    if name == "cosine":
        return get_cosine_distance_batch
    raise ValueError("Invalid distance mode")


def get_cosine_distance_batch(a1: np.ndarray, a2: np.ndarray,
                              epsilon: float = 1e-8) -> np.ndarray:
    """Angular distance acos(<a1,a2>)/pi; inputs pre-normalized
    (abx_group_computation.py:26-35).  Returns (N1, N2, S1, S2)."""
    prod = np.einsum("nsd,mtd->nmst", a1, a2, optimize=True)
    return (np.arccos(np.clip(prod, -1.0, 1.0)) / math.pi).astype(np.float32)


def get_euclidian_distance_batch(a1: np.ndarray, a2: np.ndarray) -> np.ndarray:
    """(N1, N2, S1, S2) pairwise frame euclidean distances
    (abx_group_computation.py:38-42)."""
    n1 = (a1 ** 2).sum(axis=2)  # (N1, S1)
    n2 = (a2 ** 2).sum(axis=2)  # (N2, S2)
    prod = np.einsum("nsd,mtd->nmst", a1, a2, optimize=True)
    sq = n1[:, None, :, None] + n2[None, :, None, :] - 2 * prod
    return np.sqrt(np.maximum(sq, 0.0)).astype(np.float32)


def _dtw_py(dist: np.ndarray, N: int, M: int) -> float:
    """Pure-python DTW fallback (dtw.pyx:40-77 semantics)."""
    cost = np.empty((N, M), np.float32)
    cost[0, 0] = dist[0, 0]
    for i in range(1, N):
        cost[i, 0] = dist[i, 0] + cost[i - 1, 0]
    for j in range(1, M):
        cost[0, j] = dist[0, j] + cost[0, j - 1]
    for i in range(1, N):
        for j in range(1, M):
            cost[i, j] = dist[i, j] + min(cost[i - 1, j], cost[i - 1, j - 1],
                                          cost[i, j - 1])
    i, j, path_len = N - 1, M - 1, 1
    while i > 0 and j > 0:
        up, left, diag = cost[i - 1, j], cost[i, j - 1], cost[i - 1, j - 1]
        if diag <= left and diag <= up:
            i, j = i - 1, j - 1
        elif left <= up:
            j -= 1
        else:
            i -= 1
        path_len += 1
    if i == 0:
        path_len += j
    if j == 0:
        path_len += i
    return float(cost[N - 1, M - 1]) / path_len


def dtw_batch(dist_mat: np.ndarray, sx: np.ndarray, sy: np.ndarray,
              symmetric: bool, on_device: bool = False) -> np.ndarray:
    """Batched normalized DTW; ignore_diag==symmetric as at the reference
    call sites (abx_group_computation.py:56-58).

    on_device=True runs the anti-diagonal wavefront scan (ops/dtw_jax.py)
    on the default JAX device instead of the native host kernel."""
    if on_device:
        import jax.numpy as jnp

        from ...ops.dtw_jax import dtw_pairwise_device
        # writable copy: get_theta_group_dtw fills the diagonal in place
        return np.array(dtw_pairwise_device(
            jnp.asarray(dist_mat), np.asarray(sx), np.asarray(sy),
            symmetric))
    if native.available():
        return native.dtw_batch(dist_mat, sx, sy, symmetric)
    N1, N2 = dist_mat.shape[:2]
    out = np.zeros((N1, N2), np.float32)
    for i in range(N1):
        start = i if symmetric else 0
        for j in range(start, N2):
            if symmetric and i == j:
                continue
            out[i, j] = _dtw_py(dist_mat[i, j], sx[i], sy[j])
            if symmetric and i != j:
                out[j, i] = out[i, j]
    return out


def get_distance_group_dtw(a1, a2, size1, size2, ignore_diag=False,
                           symmetric=False,
                           distance_function=get_cosine_distance_batch,
                           on_device=False) -> np.ndarray:
    """Frame distances -> per-pair DTW costs (abx_group_computation.py:45-60).
    ignore_diag must equal symmetric (enforced by dtw_batch)."""
    distance_mat = distance_function(a1, a2)
    return dtw_batch(distance_mat, np.asarray(size1), np.asarray(size2),
                     symmetric, on_device=on_device)


def get_theta_group_dtw(a, b, x, sa, sb, sx, distance_function, symmetric,
                        on_device=False) -> float:
    """theta = P[d(x,a) < d(x,b)] + 0.5 P[=] over all pairs
    (abx_group_computation.py:63-90)."""
    assert a.shape[2] == b.shape[2] == x.shape[2]
    dxb = get_distance_group_dtw(x, b, sx, sb,
                                 distance_function=distance_function,
                                 on_device=on_device)
    dxa = get_distance_group_dtw(x, a, sx, sa, ignore_diag=symmetric,
                                 symmetric=symmetric,
                                 distance_function=distance_function,
                                 on_device=on_device)
    Nx, Na = dxa.shape
    _, Nb = dxb.shape
    if symmetric:
        n_pos = Na * (Na - 1)
        max_val = dxb.max()
        np.fill_diagonal(dxa, max_val + 1)
    else:
        n_pos = Na * Nx
    dxb_e = dxb[:, None, :]
    dxa_e = dxa[:, :, None]
    sc = (dxa_e < dxb_e).sum() + 0.5 * (dxa_e == dxb_e).sum()
    return float(sc) / (n_pos * Nb)


def loc_dtw(data, distance_function, symmetric, on_device=False):
    coords, (a_data, a_size), (b_data, b_size), (x_data, x_size) = data
    theta = get_theta_group_dtw(a_data, b_data, x_data, a_size, b_size,
                                x_size, distance_function, symmetric,
                                on_device=on_device)
    return coords, 1.0 - theta


def get_abx_scores_dtw_on_group(group_iterator, distance_function, symmetric,
                                on_device=False
                                ) -> Tuple[List[tuple], List[float], tuple]:
    """Score every group (abx_group_computation.py:110-129).

    Returns (coords_list, values_list, board_size) — the dense aggregation
    happens in abx_cli.reduce_scores (the reference used a torch sparse
    tensor for the same bookkeeping)."""
    coords_list, values_list = [], []
    for group in group_iterator:
        coords, abx = loc_dtw(group, distance_function, symmetric,
                              on_device=on_device)
        coords_list.append(coords)
        values_list.append(abx)
    return coords_list, values_list, group_iterator.get_board_size()
