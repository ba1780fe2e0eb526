"""On-device batched DTW via anti-diagonal wavefront ``lax.scan``.

Complements the native host kernel (native/dtw.cc): for large ABX batches
the (P, S1, S2) distance tensor can stay on the TPU and all P pairs advance
one anti-diagonal per scan step, vectorized across pairs and diagonal cells.

The path-length normalization (reference dtw.pyx:55-75 backtracks the
warping path) is computed FORWARD: the backtrack's predecessor choice is a
deterministic function of the cost cells (diag preferred, then left, else
up), so carrying ``plen[i,j] = 1 + plen[pred(i,j)]`` through the same DP
reproduces the backtracked length exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INF = jnp.float32(jnp.inf)


@functools.partial(jax.jit, static_argnames=())
def dtw_batch_device(dist: jax.Array, sx: jax.Array, sy: jax.Array
                     ) -> jax.Array:
    """dist (P, S1, S2) f32; sx, sy (P,) valid lengths.
    Returns (P,) normalized DTW costs."""
    P, S1, S2 = dist.shape
    D = S1 + S2 - 1
    i_idx = jnp.arange(S1)                      # cell row within a diagonal

    def step(carry, d):
        prev_cost, prev2_cost, prev_plen, prev2_plen = carry
        j_idx = d - i_idx                        # (S1,)
        valid = (j_idx >= 0) & (j_idx < S2)
        # distance values on this diagonal: dist[p, i, d-i]
        jc = jnp.clip(j_idx, 0, S2 - 1)
        d_diag = jnp.take_along_axis(
            dist, jnp.broadcast_to(jc[None, :, None], (P, S1, 1)),
            axis=2)[:, :, 0]                     # (P, S1)

        def shift(x):  # x[i-1] aligned at i
            return jnp.concatenate(
                [jnp.full((P, 1), _INF, x.dtype), x[:, :-1]], axis=1)

        up = shift(prev_cost)        # cost[i-1, j]
        left = prev_cost             # cost[i, j-1]
        diag = shift(prev2_cost)     # cost[i-1, j-1]
        up_l = shift(prev_plen)
        left_l = prev_plen
        diag_l = shift(prev2_plen)

        # start cell (0,0) has no predecessor
        is_start = (i_idx == 0) & (j_idx == 0)
        best = jnp.minimum(jnp.minimum(up, left), diag)
        best = jnp.where(is_start[None, :], 0.0, best)
        cost = d_diag + best

        take_diag = (diag <= left) & (diag <= up)
        plen = jnp.where(take_diag, diag_l,
                         jnp.where(left <= up, left_l, up_l)) + 1.0
        plen = jnp.where(is_start[None, :], 1.0, plen)

        cost = jnp.where(valid[None, :], cost, _INF)
        plen = jnp.where(valid[None, :], plen, 0.0)
        return (cost, prev_cost, plen, prev_plen), (cost, plen)

    init = (jnp.full((P, S1), _INF), jnp.full((P, S1), _INF),
            jnp.zeros((P, S1)), jnp.zeros((P, S1)))
    _, (costs, plens) = jax.lax.scan(step, init, jnp.arange(D))
    # costs: (D, P, S1); final cell of pair p is diagonal sx+sy-2, row sx-1
    d_final = sx + sy - 2
    p_idx = jnp.arange(P)
    final_cost = costs[d_final, p_idx, sx - 1]
    final_plen = plens[d_final, p_idx, sx - 1]
    return final_cost / final_plen


def dtw_pairwise_device(dist_mat: jax.Array, sx: jax.Array, sy: jax.Array,
                        symmetric: bool) -> jax.Array:
    """(N1, N2, S1, S2) distances -> (N1, N2) normalized DTW; same contract
    as native.dtw_batch (diag skipped + mirrored when symmetric)."""
    N1, N2, S1, S2 = dist_mat.shape
    flat = dist_mat.reshape(N1 * N2, S1, S2)
    sxx = jnp.repeat(jnp.asarray(sx), N2)
    syy = jnp.tile(jnp.asarray(sy), N1)
    out = dtw_batch_device(flat, sxx, syy).reshape(N1, N2)
    if symmetric:
        iu = jnp.triu(jnp.ones((N1, N2), bool), k=1)
        out = jnp.where(iu, out, 0.0)
        out = out + out.T
    return out
