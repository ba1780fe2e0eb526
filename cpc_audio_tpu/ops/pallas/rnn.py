"""Pallas fused recurrent scans (LSTM / GRU) with custom VJP.

The `lax.scan` recurrence dispatches ~8 small ops per timestep; at 128
timesteps the AR network is launch-latency-bound, not compute-bound
(measured ~3 ms fwd at B=32 on v5e vs ~0.1 ms of actual matmul work).
These kernels keep the hidden state in VMEM scratch and run TC timesteps
per grid step, streaming the precomputed input projections
(x @ W_ih + b_ih, one large MXU matmul done in XLA) through double-buffered
blocks — the whole window's recurrence becomes ONE kernel launch.

Backward passes are mirrored reverse-scan kernels producing per-step
pre-activation gate gradients; the weight gradients reduce to two dense
matmuls in XLA (dW_hh = h_prev^T @ dgates).

Semantics are exactly torch's LSTM/GRU equations (models/ar.py), verified
against the lax.scan path in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _vmem_chunk_cap(B: int, G: int, H: int) -> int:
    """Max timesteps per block keeping the kernel's double-buffered VMEM
    footprint (~12 bytes per (b, t) element of gate width + hidden width)
    under budget with headroom for weights and scratch.  No lower floor:
    a batch too large for even one 8-step chunk must return < 8 so callers
    fall back to lax.scan (B=128 at the default config OOMs scoped VMEM
    otherwise — observed 23 MB vs the 16 MB limit)."""
    bytes_per_tc = 12 * B * (G + H)
    return int(10e6) // max(bytes_per_tc, 1)


def _pick_chunk(T: int, B: int = 32, G: int = 1024, H: int = 256) -> int:
    """Timestep chunk satisfying Mosaic's block constraint: the block's
    second-to-last dim (TC) must be a multiple of 8 OR equal the full T —
    and the VMEM budget.  Returns 0 when no valid tiling exists (callers
    fall back to lax.scan)."""
    cap = _vmem_chunk_cap(B, G, H)
    for tc in range(min(cap, T), 7, -1):
        if tc % 8 == 0 and T % tc == 0:
            return tc
    if T <= min(64, cap):  # single block covers the whole sequence
        return T
    return 0


def pallas_rnn_supported(T: int, B: int = 32, G: int = 1024,
                         H: int = 256) -> bool:
    return _pick_chunk(T, B, G, H) > 0


def _sigmoid(x):
    return jax.nn.sigmoid(x)


# ===========================================================================
# LSTM
# ===========================================================================

def _lstm_fwd_kernel(xp_ref, w_ref, h0_ref, c0_ref,
                     ys_ref, cs_ref, g_ref, h_scr, c_scr):
    H = h0_ref.shape[1]
    TC = xp_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        h_scr[:] = h0_ref[:].astype(jnp.float32)
        c_scr[:] = c0_ref[:].astype(jnp.float32)

    w = w_ref[:].astype(jnp.float32)
    for t in range(TC):
        g = xp_ref[:, t].astype(jnp.float32) + jnp.dot(
            h_scr[:], w, preferred_element_type=jnp.float32)
        i = _sigmoid(g[:, :H])
        f = _sigmoid(g[:, H:2 * H])
        gg = jnp.tanh(g[:, 2 * H:3 * H])
        o = _sigmoid(g[:, 3 * H:])
        c = f * c_scr[:] + i * gg
        h = o * jnp.tanh(c)
        ys_ref[:, t] = h.astype(ys_ref.dtype)
        cs_ref[:, t] = c.astype(cs_ref.dtype)
        g_ref[:, t, :H] = i.astype(g_ref.dtype)
        g_ref[:, t, H:2 * H] = f.astype(g_ref.dtype)
        g_ref[:, t, 2 * H:3 * H] = gg.astype(g_ref.dtype)
        g_ref[:, t, 3 * H:] = o.astype(g_ref.dtype)
        h_scr[:] = h
        c_scr[:] = c


def _lstm_bwd_kernel(g_ref, cprev_ref, dys_ref, w_ref, dhT_ref, dcT_ref,
                     dg_ref, dh0_ref, dc0_ref, dh_scr, dc_scr):
    H = dhT_ref.shape[1]
    TC = g_ref.shape[1]
    n_chunks = pl.num_programs(0)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dh_scr[:] = dhT_ref[:].astype(jnp.float32)
        dc_scr[:] = dcT_ref[:].astype(jnp.float32)

    wT = w_ref[:].astype(jnp.float32).T  # (4H, H)
    for t in range(TC - 1, -1, -1):
        i = g_ref[:, t, :H].astype(jnp.float32)
        f = g_ref[:, t, H:2 * H].astype(jnp.float32)
        gg = g_ref[:, t, 2 * H:3 * H].astype(jnp.float32)
        o = g_ref[:, t, 3 * H:].astype(jnp.float32)
        c_prev = cprev_ref[:, t].astype(jnp.float32)
        c = f * c_prev + i * gg
        tc_ = jnp.tanh(c)
        dh = dys_ref[:, t].astype(jnp.float32) + dh_scr[:]
        do_pre = dh * tc_ * o * (1.0 - o)
        dc = dc_scr[:] + dh * o * (1.0 - tc_ * tc_)
        di_pre = dc * gg * i * (1.0 - i)
        df_pre = dc * c_prev * f * (1.0 - f)
        dg_pre = dc * i * (1.0 - gg * gg)
        dg_ref[:, t, :H] = di_pre.astype(dg_ref.dtype)
        dg_ref[:, t, H:2 * H] = df_pre.astype(dg_ref.dtype)
        dg_ref[:, t, 2 * H:3 * H] = dg_pre.astype(dg_ref.dtype)
        dg_ref[:, t, 3 * H:] = do_pre.astype(dg_ref.dtype)
        dgates = jnp.concatenate([di_pre, df_pre, dg_pre, do_pre], axis=1)
        dh_scr[:] = jnp.dot(dgates, wT, preferred_element_type=jnp.float32)
        dc_scr[:] = dc * f

    @pl.when(pl.program_id(0) == n_chunks - 1)
    def _():
        dh0_ref[:] = dh_scr[:].astype(dh0_ref.dtype)
        dc0_ref[:] = dc_scr[:].astype(dc0_ref.dtype)


def _lstm_pallas_fwd_impl(x_proj, w_hh_t, h0, c0, interpret=False):
    B, T, G = x_proj.shape
    H = G // 4
    TC = _pick_chunk(T, B, G, H)
    n_chunks = T // TC
    dtype = x_proj.dtype
    ys, cs, gates = pl.pallas_call(
        _lstm_fwd_kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((B, TC, G), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, TC, H), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, TC, H), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, TC, G), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, H), dtype),
            jax.ShapeDtypeStruct((B, T, H), jnp.float32),
            jax.ShapeDtypeStruct((B, T, G), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                        pltpu.VMEM((B, H), jnp.float32)],
        interpret=interpret,
    )(x_proj, w_hh_t, h0, c0)
    return ys, cs, gates


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def lstm_scan_pallas(x_proj, w_hh_t, h0, c0, interpret=False):
    """x_proj (B,T,4H) = x @ W_ih^T + b_ih + b_hh; w_hh_t (H,4H) = W_hh^T.
    Returns (ys (B,T,H), hT (B,H), cT (B,H)) with torch LSTM semantics."""
    ys, cs, _ = _lstm_pallas_fwd_impl(x_proj, w_hh_t, h0, c0, interpret)
    return ys, ys[:, -1].astype(h0.dtype), cs[:, -1].astype(c0.dtype)


def _lstm_fwd(x_proj, w_hh_t, h0, c0, interpret=False):
    ys, cs, gates = _lstm_pallas_fwd_impl(x_proj, w_hh_t, h0, c0, interpret)
    out = (ys, ys[:, -1].astype(h0.dtype), cs[:, -1].astype(c0.dtype))
    return out, (gates, cs, ys, w_hh_t, h0, c0)


def _lstm_bwd(interpret, res, grads):
    gates, cs, ys, w_hh_t, h0, c0 = res
    dys, dhT, dcT = grads
    B, T, H = ys.shape
    G = 4 * H
    TC = _pick_chunk(T, B, G, H)
    n_chunks = T // TC
    c_prev = jnp.concatenate(
        [c0[:, None].astype(cs.dtype), cs[:, :-1]], axis=1)
    rev = lambda t: (0, n_chunks - 1 - t, 0)  # noqa: E731
    dgates, dh0, dc0 = pl.pallas_call(
        _lstm_bwd_kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((B, TC, G), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, TC, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, TC, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, TC, G), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, G), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                        pltpu.VMEM((B, H), jnp.float32)],
        interpret=interpret,
    )(gates, c_prev, dys.astype(jnp.float32), w_hh_t,
      dhT.astype(jnp.float32), dcT.astype(jnp.float32))
    h_prev = jnp.concatenate(
        [h0[:, None].astype(ys.dtype), ys[:, :-1]], axis=1)
    dw = jnp.einsum("bth,btg->hg", h_prev.astype(jnp.float32), dgates,
                    preferred_element_type=jnp.float32)
    return (dgates, dw.astype(w_hh_t.dtype), dh0.astype(h0.dtype),
            dc0.astype(c0.dtype))


lstm_scan_pallas.defvjp(_lstm_fwd, _lstm_bwd)


# ===========================================================================
# GRU
# ===========================================================================

def _gru_fwd_kernel(xp_ref, w_ref, b_ref, h0_ref,
                    ys_ref, g_ref, ghn_ref, h_scr):
    H = h0_ref.shape[1]
    TC = xp_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        h_scr[:] = h0_ref[:].astype(jnp.float32)

    w = w_ref[:].astype(jnp.float32)
    b = b_ref[:].astype(jnp.float32)
    for t in range(TC):
        gh = jnp.dot(h_scr[:], w, preferred_element_type=jnp.float32) + b
        xp = xp_ref[:, t].astype(jnp.float32)
        r = _sigmoid(xp[:, :H] + gh[:, :H])
        z = _sigmoid(xp[:, H:2 * H] + gh[:, H:2 * H])
        ghn = gh[:, 2 * H:]
        n = jnp.tanh(xp[:, 2 * H:] + r * ghn)
        h = (1.0 - z) * n + z * h_scr[:]
        ys_ref[:, t] = h.astype(ys_ref.dtype)
        g_ref[:, t, :H] = r.astype(g_ref.dtype)
        g_ref[:, t, H:2 * H] = z.astype(g_ref.dtype)
        g_ref[:, t, 2 * H:] = n.astype(g_ref.dtype)
        ghn_ref[:, t] = ghn.astype(ghn_ref.dtype)
        h_scr[:] = h


def _gru_bwd_kernel(g_ref, ghn_ref, hprev_ref, dys_ref, w_ref, dhT_ref,
                    dx_ref, dgh_ref, dh0_ref, dh_scr):
    H = dhT_ref.shape[1]
    TC = g_ref.shape[1]
    n_chunks = pl.num_programs(0)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dh_scr[:] = dhT_ref[:].astype(jnp.float32)

    wT = w_ref[:].astype(jnp.float32).T  # (3H, H)
    for t in range(TC - 1, -1, -1):
        r = g_ref[:, t, :H].astype(jnp.float32)
        z = g_ref[:, t, H:2 * H].astype(jnp.float32)
        n = g_ref[:, t, 2 * H:].astype(jnp.float32)
        ghn = ghn_ref[:, t].astype(jnp.float32)
        h_prev = hprev_ref[:, t].astype(jnp.float32)
        dh = dys_ref[:, t].astype(jnp.float32) + dh_scr[:]
        dz_pre = dh * (h_prev - n) * z * (1.0 - z)
        dn_pre = dh * (1.0 - z) * (1.0 - n * n)
        dghn = dn_pre * r
        dr_pre = dn_pre * ghn * r * (1.0 - r)
        dx = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=1)
        dgh = jnp.concatenate([dr_pre, dz_pre, dghn], axis=1)
        dx_ref[:, t] = dx.astype(dx_ref.dtype)
        dgh_ref[:, t] = dgh.astype(dgh_ref.dtype)
        dh_scr[:] = dh * z + jnp.dot(dgh, wT,
                                     preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(0) == n_chunks - 1)
    def _():
        dh0_ref[:] = dh_scr[:].astype(dh0_ref.dtype)


def _gru_pallas_fwd_impl(x_proj, w_hh_t, b_hh, h0, interpret=False):
    B, T, G = x_proj.shape
    H = G // 3
    TC = _pick_chunk(T, B, G, H)
    n_chunks = T // TC
    ys, gates, ghn = pl.pallas_call(
        _gru_fwd_kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((B, TC, G), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, TC, H), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, TC, G), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, TC, H), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, H), x_proj.dtype),
            jax.ShapeDtypeStruct((B, T, G), jnp.float32),
            jax.ShapeDtypeStruct((B, T, H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=interpret,
    )(x_proj, w_hh_t, b_hh.reshape(1, -1), h0)
    return ys, gates, ghn


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def gru_scan_pallas(x_proj, w_hh_t, b_hh, h0, interpret=False):
    """x_proj (B,T,3H) = x @ W_ih^T + b_ih; w_hh_t (H,3H) = W_hh^T;
    b_hh (3H,).  Returns (ys (B,T,H), hT (B,H)); torch GRU semantics."""
    ys, _, _ = _gru_pallas_fwd_impl(x_proj, w_hh_t, b_hh, h0, interpret)
    return ys, ys[:, -1].astype(h0.dtype)


def _gru_fwd(x_proj, w_hh_t, b_hh, h0, interpret=False):
    ys, gates, ghn = _gru_pallas_fwd_impl(x_proj, w_hh_t, b_hh, h0,
                                          interpret)
    out = (ys, ys[:, -1].astype(h0.dtype))
    return out, (gates, ghn, ys, w_hh_t, h0)


def _gru_bwd(interpret, res, grads):
    gates, ghn, ys, w_hh_t, h0 = res
    dys, dhT = grads
    B, T, H = ys.shape
    G = 3 * H
    TC = _pick_chunk(T, B, G, H)
    n_chunks = T // TC
    h_prev = jnp.concatenate(
        [h0[:, None].astype(ys.dtype), ys[:, :-1]], axis=1)
    rev = lambda t: (0, n_chunks - 1 - t, 0)  # noqa: E731
    dx, dgh, dh0 = pl.pallas_call(
        _gru_bwd_kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((B, TC, G), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, TC, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, TC, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, TC, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, TC, G), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, TC, G), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, G), jnp.float32),
            jax.ShapeDtypeStruct((B, T, G), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=interpret,
    )(gates, ghn, h_prev.astype(jnp.float32), dys.astype(jnp.float32),
      w_hh_t, dhT.astype(jnp.float32))
    dw = jnp.einsum("bth,btg->hg", h_prev.astype(jnp.float32), dgh,
                    preferred_element_type=jnp.float32)
    db = jnp.sum(dgh, axis=(0, 1))
    return dx, dw.astype(w_hh_t.dtype), db, dh0.astype(h0.dtype)


gru_scan_pallas.defvjp(_gru_fwd, _gru_bwd)
