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
    tensor for the same bookkeeping).

    on_device=True scores groups in shape-bucketed BATCHES on the JAX
    device (see _scores_on_device): a real .item file yields thousands of
    groups, and one tunnel dispatch per group is launch-bound."""
    if on_device:
        return _scores_on_device(group_iterator, distance_function,
                                 symmetric)
    coords_list, values_list = [], []
    for group in group_iterator:
        coords, abx = loc_dtw(group, distance_function, symmetric,
                              on_device=False)
        coords_list.append(coords)
        values_list.append(abx)
    return coords_list, values_list, group_iterator.get_board_size()


# --------------------------------------------------------------------------
# Batched on-device scoring
# --------------------------------------------------------------------------

def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _score_bucket_device(A, B, X, sa, sb, sx, symmetric: bool,
                         cosine: bool):
    """Jitted bucket scorer: A (G,Na,S,D), B (G,Nb,S,D), X (G,Nx,S,D)
    f32 (padded; item validity = size > 0); returns (G,) ABX error rates
    1 - theta, with theta as in get_theta_group_dtw."""
    import jax.numpy as jnp

    from ...ops.dtw_jax import dtw_batch_device

    def dist(u, v):
        if cosine:
            prod = jnp.einsum("gnsd,gmtd->gnmst", u, v)
            return jnp.arccos(jnp.clip(prod, -1.0, 1.0)) / math.pi
        nu = jnp.sum(u * u, axis=3)                    # (G, N, S)
        nv = jnp.sum(v * v, axis=3)
        prod = jnp.einsum("gnsd,gmtd->gnmst", u, v)
        sq = (nu[:, :, None, :, None] + nv[:, None, :, None, :]
              - 2.0 * prod)
        return jnp.sqrt(jnp.maximum(sq, 0.0))

    def pair_dtw(u, v, su, sv):
        G, Nu, S, _ = u.shape
        Nv = v.shape[1]
        dm = dist(u, v).reshape(G * Nu * Nv, S, S)
        # clamp padded items to size 1 so the final-cell gather stays in
        # bounds; their scores are masked out of the count below
        suf = jnp.maximum(su[:, :, None], 1)
        svf = jnp.maximum(sv[:, None, :], 1)
        out = dtw_batch_device(dm,
                               jnp.broadcast_to(suf, (G, Nu, Nv)).reshape(-1),
                               jnp.broadcast_to(svf, (G, Nu, Nv)).reshape(-1))
        return out.reshape(G, Nu, Nv)

    dxa = pair_dtw(X, A, sx, sa)                       # (G, Nx, Na)
    dxb = pair_dtw(X, B, sx, sb)                       # (G, Nx, Nb)

    vx = (sx > 0)
    va = (sa > 0)
    vb = (sb > 0)
    wxa = vx[:, :, None] & va[:, None, :]              # (G, Nx, Na)
    if symmetric:                                      # x set == a set
        Nx = dxa.shape[1]
        eye = jnp.eye(Nx, dxa.shape[2], dtype=bool)
        wxa = wxa & ~eye[None]
    cmp_lt = (dxa[:, :, :, None] < dxb[:, :, None, :])
    cmp_eq = (dxa[:, :, :, None] == dxb[:, :, None, :])
    w = wxa[:, :, :, None] & vb[:, None, None, :]
    sc = jnp.sum(jnp.where(w, cmp_lt.astype(jnp.float32)
                           + 0.5 * cmp_eq.astype(jnp.float32), 0.0),
                 axis=(1, 2, 3))
    na_v = jnp.sum(va, axis=1)
    nb_v = jnp.sum(vb, axis=1)
    nx_v = jnp.sum(vx, axis=1)
    n_pos = jnp.where(symmetric, na_v * (na_v - 1), na_v * nx_v)
    denom = jnp.maximum(n_pos * nb_v, 1).astype(jnp.float32)
    return 1.0 - sc / denom


def _scores_on_device(group_iterator, distance_function, symmetric
                      ) -> Tuple[List[tuple], List[float], tuple]:
    """Shape-bucketed batched scoring on the JAX device.

    Groups are padded to bucketed shapes (item counts to multiples of 4,
    frame counts to multiples of 8) and scored up to _MAX_CELLS distance
    cells per dispatch, so a 2k-group .item file costs tens of device
    dispatches instead of 4k (docs/PERFORMANCE.md, ABX at scale)."""
    import jax

    cosine = distance_function is get_cosine_distance_batch
    groups = list(group_iterator)
    coords_list = [g[0] for g in groups]
    values: List[float] = [0.0] * len(groups)

    # ONE item-count tier per group (max over the three roles, padded to a
    # multiple of 4) instead of per-role rounding: on the synthetic 2k
    # population this is ~6 distinct dispatch shapes instead of 27 — each
    # distinct shape costs a remote compile through the tunnel, which
    # dwarfs the padded-lane compute it saves.  The chunk count G is
    # padded to a power of two for the same reason.
    buckets = {}
    for gi, (_, (a, sa), (b, sb), (x, sx)) in enumerate(groups):
        nt = _round_up(max(a.shape[0], b.shape[0], x.shape[0]), 4)
        key = (nt, _round_up(max(a.shape[1], b.shape[1], x.shape[1]), 8),
               a.shape[2])
        buckets.setdefault(key, []).append(gi)

    score = jax.jit(_score_bucket_device, static_argnums=(6, 7))
    _MAX_CELLS = 64 * 1024 * 1024  # f32 distance cells per dispatch

    for (N, S, D), idxs in buckets.items():
        cells = N * N * S * S
        gmax = max(1, _MAX_CELLS // max(cells, 1))
        for lo in range(0, len(idxs), gmax):
            chunk = idxs[lo:lo + gmax]
            G = len(chunk)
            Gp = G if G == gmax else 1 << (G - 1).bit_length()
            A = np.zeros((Gp, N, S, D), np.float32)
            Bb = np.zeros((Gp, N, S, D), np.float32)
            Xx = np.zeros((Gp, N, S, D), np.float32)
            sA = np.zeros((Gp, N), np.int32)
            sB = np.zeros((Gp, N), np.int32)
            sX = np.zeros((Gp, N), np.int32)
            for ci, gi in enumerate(chunk):
                _, (a, sa), (b, sb), (x, sx) = groups[gi]
                A[ci, :a.shape[0], :a.shape[1]] = a
                Bb[ci, :b.shape[0], :b.shape[1]] = b
                Xx[ci, :x.shape[0], :x.shape[1]] = x
                sA[ci, :a.shape[0]] = np.asarray(sa)
                sB[ci, :b.shape[0]] = np.asarray(sb)
                sX[ci, :x.shape[0]] = np.asarray(sx)
            out = np.asarray(score(A, Bb, Xx, sA, sB, sX, symmetric,
                                   cosine))
            for ci, gi in enumerate(chunk):
                values[gi] = float(out[ci])
    return coords_list, values, group_iterator.get_board_size()
