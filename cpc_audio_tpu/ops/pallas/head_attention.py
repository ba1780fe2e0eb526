"""Fused relative-position attention for the stacked prediction heads.

Second-generation attention kernel (supersedes ops/pallas/attention.py for
the K-stacked transformer heads).  Differences that matter on v5e
(docs/PERFORMANCE.md round 2):

  * q/k/v stay in their NATURAL layout (K, B*S, D=h*dk) — the direct
    output of the K-batched projection matmuls.  The old kernel wanted
    (K*B*h, S, dk), which cost ~1.5 ms/step of pure transpose/split/copy
    HBM traffic in fwd+bwd at the bench config.
  * The Shaw relative-position bias is computed IN-KERNEL from Krelpos:
    bias[i, j] = q[i] . krel[:, j - i + S - 1], realized as a per-row
    rotate (`pltpu.roll(qp, 1, axis, stride=1, stride_axis=rows)`), which
    reproduces the reference's zero-pad/reshape skew
    (/root/reference/cpc/transformers.py:23-26,42-47) exactly on the
    causal (j <= i) region; the wrapped garbage lands only on masked
    entries.  The old design materialized the (K,B,h,S,S) bias (and its
    gradient) in HBM — ~160 MB of traffic per step.
  * dKrelpos is accumulated across the batch grid inside the backward
    kernel (output-block revisiting), so the whole rel-pos path never
    touches XLA.

Semantics covered: ScaledDotProductAttention + MultiHeadAttention with
relpos (transformers.py:10-83): softmax((q k^T + skew)/sqrt(dk)) with a
causal mask, optional attention dropout, then @ v.  Dropout uses the TPU
per-core PRNG exactly like ops/pallas/attention.py (statistically
equivalent to flax's stream; deterministic in (seed, k, absolute 8-row
batch granule, head) — _dropout_mask_rows — so the backward regenerates
the identical mask even when its batch tile differs from the forward's).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import _dropout_mask

_NEG = -1e30


def _causal_mask(S: int):
    row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    return col <= row


def _skew(qp, interpret: bool):
    """skew[t, i, j] = qp[t, i, (j - i - 1) mod S]  == the reference's
    zero-pad/reshape trick on the causal region (wrap-around entries are
    all at j > i, where the mask kills them)."""
    if interpret:
        S = qp.shape[-1]
        i = jax.lax.broadcasted_iota(jnp.int32, qp.shape, 1)
        j = jax.lax.broadcasted_iota(jnp.int32, qp.shape, 2)
        idx = (j - i - 1) % S
        return jnp.take_along_axis(qp, idx, axis=2)
    return pltpu.roll(qp, 1, 2, stride=1, stride_axis=1)


def _dropout_mask_rows(tb, S, rate, seed, h, nheads, interpret):
    """Dropout mask for a (tb, S, S) probability tile whose stream depends
    only on the ABSOLUTE (k, batch row, head) — NOT on the tile size — so
    the forward and backward pallas_calls may use different batch tiles.

    This fixed a silent training-breaker: the masks used to be keyed by
    (program id, head) with the mask drawn in one (tb, S, S) block, so
    when the fwd/bwd tiles split (fwd 16 / bwd 32 after the round-3
    sweep) the backward regenerated a DIFFERENT mask than the forward
    applied — gradients through every dropout site were multiplied by the
    wrong mask, and default-config training silently plateaued at chance
    (fixture A/B: kernels-off learns 4.85->4.48, kernels-on stuck at
    4.847; the first 5 epochs matched exactly, so only a long horizon or
    a mask-consistency test catches it).

    Rows are keyed in granules of 8 (every real tile is a multiple of 8;
    _pick_tb pins bwd == fwd when dropout is active and either tile is
    not), and each granule's stream is seeded by its absolute index."""
    k_id = pl.program_id(0)
    row0 = pl.program_id(1) * tb
    n_rows = pl.num_programs(1) * tb
    gr = 8 if tb % 8 == 0 else tb
    parts = []
    for g0 in range(0, tb, gr):
        gi = (row0 + g0) // gr                 # absolute granule index
        pid = (k_id * (n_rows // gr) + gi) * nheads + h
        parts.append(_dropout_mask((gr, S, S), rate, seed, pid, interpret))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _attend_fwd(q, k, krel, mask, inv_sqrt, interpret):
    """q, k: (TB, S, dk); krel: (dk, S) -> softmax probs (TB, S, S) f32.

    Dots run in the INPUT dtype (bf16 in training) with f32 MXU
    accumulation — casting operands to f32 first would run the MXU at
    f32 rate (~3x slower on v5e) for no accuracy gain."""
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    qp = jax.lax.dot_general(q, krel.astype(q.dtype),
                             (((2,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    s = (s + _skew(qp, interpret)) * inv_sqrt
    s = jnp.where(mask[None], s, _NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, krel_ref, o_ref, *,
                rate: float, nheads: int, tb: int, interpret: bool):
    M, D = q_ref.shape[1:]
    S = M // tb
    dk = D // nheads
    inv_sqrt = 1.0 / math.sqrt(dk)
    mask = _causal_mask(S)
    f32 = jnp.float32
    pid = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    krel = krel_ref[0]
    for h in range(nheads):
        sl = slice(h * dk, (h + 1) * dk)
        qh = q_ref[0, :, sl].reshape(tb, S, dk)
        kh = k_ref[0, :, sl].reshape(tb, S, dk)
        vh = v_ref[0, :, sl].reshape(tb, S, dk)
        p = _attend_fwd(qh, kh, krel, mask, inv_sqrt, interpret)
        if rate > 0.0:
            p = p * _dropout_mask_rows(tb, S, rate, seed_ref[0, 0], h,
                                       nheads, interpret)
        o = jax.lax.dot_general(p.astype(vh.dtype), vh,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=f32)
        o_ref[0, :, sl] = o.reshape(M, dk).astype(o_ref.dtype)


def _unskew(ds):
    """Adjoint of the skew as ONE in-kernel lane gather:
    dqp[t, i, r] = ds[t, i, (r + i + 1) mod S].

    The roll-based skew is a per-row lane BIJECTION, so its adjoint is the
    inverse permutation — equal to the linear_transpose of the reference's
    pad/reshape skew wherever ds is nonzero (ds == 0 on the masked j > i
    region, where the two skews differ).  Mosaic rejects `rev` and
    negative roll strides, but per-row dynamic lane gather lowers fine
    (perf/probe_gather.py / probe_unskew.py, v5e)."""
    T, S, _ = ds.shape
    i = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    r = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    idx = (r + i + 1) % S
    # Mosaic supports only 2-D gathers: unroll the (small) batch-tile dim.
    return jnp.stack([jnp.take_along_axis(ds[t], idx, axis=1)
                      for t in range(T)])


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, krel_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dkrel_ref, *,
                rate: float, nheads: int, tb: int, interpret: bool):
    """Recompute-style backward.  The WHOLE rel-pos adjoint now stays
    in-kernel: dqp = unskew(ds) is contracted immediately into
    dq += dqp @ krel^T (per head) and into the (dk, S) dKrelpos
    accumulator (revisited across the b-tile axis, flushed per k).
    Earlier revisions emitted dqp to HBM — a (K,B,h,S,S) bf16 tensor is
    402 MB at the bench config, and the two XLA einsums consuming it
    re-read it twice (~1.2 GB of pure dqp traffic per step)."""
    M, D = q_ref.shape[1:]
    S = M // tb
    dk = D // nheads
    inv_sqrt = 1.0 / math.sqrt(dk)
    mask = _causal_mask(S)
    f32 = jnp.float32
    pid = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    krel = krel_ref[0]

    @pl.when(pl.program_id(1) == 0)
    def _():
        dkrel_ref[0] = jnp.zeros_like(dkrel_ref[0])

    for h in range(nheads):
        sl = slice(h * dk, (h + 1) * dk)
        # operands stay in the input dtype (bf16 in training): MXU does
        # bf16 multiplies with f32 accumulation; softmax math is f32.
        qh = q_ref[0, :, sl].reshape(tb, S, dk)
        kh = k_ref[0, :, sl].reshape(tb, S, dk)
        vh = v_ref[0, :, sl].reshape(tb, S, dk)
        do = do_ref[0, :, sl].reshape(tb, S, dk)
        p = _attend_fwd(qh, kh, krel, mask, inv_sqrt, interpret)
        if rate > 0.0:
            drop = _dropout_mask_rows(tb, S, rate, seed_ref[0, 0], h,
                                      nheads, interpret)
            pd = p * drop
        else:
            pd = p
        pd_c = pd.astype(do.dtype)
        # dv[t,j,d] = sum_i pd[t,i,j] do[t,i,d]
        dvh = jax.lax.dot_general(pd_c, do, (((1,), (1,)), ((0,), (0,))),
                                  preferred_element_type=f32)
        # dpd[t,i,j] = sum_d do[t,i,d] v[t,j,d]
        dpd = jax.lax.dot_general(do, vh, (((2,), (2,)), ((0,), (0,))),
                                  preferred_element_type=f32)
        dp = dpd * drop if rate > 0.0 else dpd
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = ds * inv_sqrt  # masked entries have p == 0 -> ds == 0
        ds_c = ds.astype(do.dtype)
        # QK^T backward
        dqh = jax.lax.dot_general(ds_c, kh, (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=f32)
        dkh = jax.lax.dot_general(ds_c, qh, (((1,), (1,)), ((0,), (0,))),
                                  preferred_element_type=f32)
        dk_ref[0, :, sl] = dkh.reshape(M, dk).astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dvh.reshape(M, dk).astype(dv_ref.dtype)
        # rel-pos adjoint, fully in-kernel: bias[t,i,j] contributes
        # qp[t,i,r] = q[t,i,:] . krel[:,r] through the skew, so
        # dq += dqp @ krel^T and dkrel += sum_{t,i} q[t,i,:]^T dqp[t,i,:]
        # (ds already carries the inv_sqrt factor, like the fwd bias).
        dqp = _unskew(ds).astype(do.dtype)                  # (tb, S, S)
        dq_rel = jax.lax.dot_general(dqp, krel, (((2,), (1,)), ((), ())),
                                     preferred_element_type=f32)
        dq_ref[0, :, sl] = (dqh + dq_rel).reshape(M, dk) \
            .astype(dq_ref.dtype)
        # single contracting dim (Mosaic rejects multi-dim contractions):
        # flatten (t, i) into one axis on both operands
        dkrel_ref[0] += jax.lax.dot_general(
            qh.reshape(M, dk), dqp.reshape(M, S),
            (((0,), (0,)), ((), ())),
            preferred_element_type=f32)                     # (dk, S)


def _pick_tb(n_b: int, bwd: bool = False, rate: float = 0.0) -> int:
    """Batch rows per grid program, chosen separately for fwd and bwd
    (they are independent pallas_calls).  v5e sweep at the bench config
    (fwd / bwd ms): tb=8 0.90/1.66, tb=16 0.81/1.65, tb=32 0.91/1.51 —
    the fwd likes 16 (pipeline overlap across programs), the backward's
    larger per-program working set amortizes best at 32.  CPC_ATTN_TB /
    CPC_ATTN_TB_BWD override for tuning.

    With dropout active the fwd/bwd masks must regenerate identically;
    the streams are keyed by absolute 8-row granules
    (_dropout_mask_rows), so differing tiles are fine as long as BOTH
    are multiples of 8 — otherwise the backward is pinned to the
    forward's tile."""
    import os
    pref = int(os.environ.get("CPC_ATTN_TB_BWD" if bwd else "CPC_ATTN_TB",
                              "32" if bwd else "16"))
    tb = 1
    for cand in (pref, 8, 4, 2, 1):
        if cand <= n_b and n_b % cand == 0:
            tb = cand
            break
    if bwd and rate > 0.0:
        tb_f = _pick_tb(n_b, bwd=False, rate=rate)
        if (tb % 8 != 0 or tb_f % 8 != 0) and tb != tb_f:
            return tb_f
    return tb


def _compiler_params():
    """Raise Mosaic's 16 MB default scoped-vmem budget so tb=16/32 tiles
    compile (the v5e physical VMEM is far larger); CPC_ATTN_VMEM_LIMIT
    overrides for tuning."""
    import os
    limit = int(float(os.environ.get("CPC_ATTN_VMEM_LIMIT", "80e6")))
    return pltpu.CompilerParams(vmem_limit_bytes=limit)


def _specs(K, n_tiles, tb, S, D, dk, interpret):
    mem = {} if interpret else {"memory_space": pltpu.VMEM}
    row = pl.BlockSpec((1, tb * S, D), lambda k, b: (k, b, 0), **mem)
    krel_spec = pl.BlockSpec((1, dk, S), lambda k, b: (k, 0, 0), **mem)
    seed_spec = pl.BlockSpec((1, 128), lambda k, b: (0, 0), **mem)
    return row, krel_spec, seed_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_relpos_attention(q, k, v, krel, seed, n_batch: int,
                           nheads: int = 8, rate: float = 0.0,
                           interpret: bool = False):
    """q, k, v: (K, n_batch*S, D) with D = nheads*dk; krel: (K, dk, S);
    seed: (1,) float32 (integer-valued dropout seed).  Returns (K, M, D):
    per (k, batch, head) causal softmax((qk^T + shaw_skew)/sqrt(dk))
    [dropout] @ v.  S must be a multiple of 8 (pad upstream)."""
    out, _ = _fr_fwd(q, k, v, krel, seed, n_batch, nheads, rate, interpret)
    return out


def _fr_fwd(q, k, v, krel, seed, n_batch, nheads, rate, interpret):
    K, M, D = q.shape
    S = M // n_batch
    dk = D // nheads
    tb = _pick_tb(n_batch, rate=rate)
    row, krel_spec, seed_spec = _specs(K, n_batch // tb, tb, S, D, dk,
                                       interpret)
    seed_row = jnp.broadcast_to(seed.reshape(-1)[:1, None], (1, 128))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, rate=rate, nheads=nheads, tb=tb,
                          interpret=interpret),
        grid=(K, n_batch // tb),
        in_specs=[seed_spec, row, row, row, krel_spec],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((K, M, D), q.dtype),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(seed_row, q, k, v, krel)
    return out, (q, k, v, krel, seed)


def _fr_bwd(n_batch, nheads, rate, interpret, res, dout):
    q, k, v, krel, seed = res
    K, M, D = q.shape
    S = M // n_batch
    dk = D // nheads
    tb = _pick_tb(n_batch, bwd=True, rate=rate)
    row, krel_spec, seed_spec = _specs(K, n_batch // tb, tb, S, D, dk,
                                       interpret)
    mem = {} if interpret else {"memory_space": pltpu.VMEM}
    # dKrelpos accumulator: block index constant in b -> VMEM resident
    # across the batch tiles, flushed once per k (16 KB f32).
    dkrel_spec = pl.BlockSpec((1, dk, S), lambda k, b: (k, 0, 0), **mem)
    seed_row = jnp.broadcast_to(seed.reshape(-1)[:1, None], (1, 128))
    dq, dkk, dv, dkrel = pl.pallas_call(
        functools.partial(_bwd_kernel, rate=rate, nheads=nheads, tb=tb,
                          interpret=interpret),
        grid=(K, n_batch // tb),
        in_specs=[seed_spec, row, row, row, krel_spec, row],
        out_specs=(row, row, row, dkrel_spec),
        out_shape=(jax.ShapeDtypeStruct((K, M, D), q.dtype),
                   jax.ShapeDtypeStruct((K, M, D), k.dtype),
                   jax.ShapeDtypeStruct((K, M, D), v.dtype),
                   jax.ShapeDtypeStruct((K, dk, S), jnp.float32)),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(seed_row, q, k, v, krel, dout)
    return dq, dkk, dv, dkrel.astype(krel.dtype), jnp.zeros_like(seed)


def _fr_fwd_rule(q, k, v, krel, seed, n_batch, nheads, rate, interpret):
    return _fr_fwd(q, k, v, krel, seed, n_batch, nheads, rate, interpret)


fused_relpos_attention.defvjp(_fr_fwd_rule, _fr_bwd)


def relpos_attention_supported(S: int, dk: int, nheads: int,
                               n_batch: int) -> bool:
    """S must fill whole 128-lane registers: Mosaic's tpu.dynamic_rotate
    (the in-kernel skew) rejects lane-padded operands (verified on v5e:
    S=16 fails, S=128 compiles).  dk lane-friendly; working set in VMEM."""
    import os
    tb = max(_pick_tb(n_batch), _pick_tb(n_batch, bwd=True))
    vmem = (4 * tb * S * nheads * dk * 4        # q/k/v/o one head f32-ish
            + 6 * tb * S * S * 4)               # p/ds/dqp/... f32 temps
    # the estimate must stay inside the scoped-vmem budget passed to the
    # compiler (_compiler_params), with headroom for pipeline buffers
    limit = float(os.environ.get("CPC_ATTN_VMEM_LIMIT", "40e6"))
    cap = float(os.environ.get("CPC_ATTN_VMEM_CAP", str(0.8 * limit)))
    return S % 128 == 0 and dk % 8 == 0 and S <= 512 and vmem < cap


# --------------------------------------------------------------------------
# Fourth-generation kernel: the whole attention BLOCK in-kernel.
#
# fused_relpos_attention still leaves four (K, M, D) tensors in HBM per
# direction: the q/k/v projections feeding it and the attention output y
# consumed by the Wo projection and the residual add.  This op moves the
# projections, Wo and the residual into the kernel: c -> x = c + att@Wo
# with NOTHING intermediate touching HBM.  The weight gradients
# (dWq/dWk/dWv/dWo, f32 (D, D) blocks) accumulate across the batch-tile
# axis exactly like dKrelpos; the input gradient is emitted per head
# stack (dcp) and reduced over K together with the residual cotangent by
# the XLA epilogue in _fb_bwd.
# --------------------------------------------------------------------------


def _dot_cast(a, b):
    """a @ b with f32 MXU accumulation (Mosaic requires a 32-bit acc for
    bf16 operands), rounded back to a's dtype — the semantics of the XLA
    path's compute-dtype einsums."""
    out = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return out.astype(a.dtype)


def _block_fwd_kernel(seed_ref, c_ref, wq_ref, wk_ref, wv_ref, wo_ref,
                      krel_ref, x_ref, *,
                      rate: float, nheads: int, tb: int, interpret: bool):
    Mp, D = c_ref.shape
    S = Mp // tb
    dk = D // nheads
    inv_sqrt = 1.0 / math.sqrt(dk)
    mask = _causal_mask(S)
    f32 = jnp.float32
    pid = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    krel = krel_ref[0]
    c = c_ref[:]
    # projections: bf16 operands, f32 MXU accumulation (Mosaic requires a
    # 32-bit acc), rounded back to the input dtype like the XLA einsums
    q = _dot_cast(c, wq_ref[0])
    k = _dot_cast(c, wk_ref[0])
    v = _dot_cast(c, wv_ref[0])
    outs = []
    for h in range(nheads):
        sl = slice(h * dk, (h + 1) * dk)
        qh = q[:, sl].reshape(tb, S, dk)
        kh = k[:, sl].reshape(tb, S, dk)
        vh = v[:, sl].reshape(tb, S, dk)
        p = _attend_fwd(qh, kh, krel, mask, inv_sqrt, interpret)
        if rate > 0.0:
            p = p * _dropout_mask_rows(tb, S, rate, seed_ref[0, 0], h,
                                       nheads, interpret)
        o = jax.lax.dot_general(p.astype(vh.dtype), vh,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=f32)
        outs.append(o.reshape(Mp, dk).astype(c.dtype))
    y = jnp.concatenate(outs, axis=1)
    att = _dot_cast(y, wo_ref[0])
    x_ref[0] = (c + att).astype(x_ref.dtype)


def _block_bwd_kernel(seed_ref, c_ref, wq_ref, wk_ref, wv_ref, wo_ref,
                      krel_ref, wqt_ref, wkt_ref, wvt_ref, wot_ref, dx_ref,
                      dcp_ref, dwq_ref, dwk_ref, dwv_ref, dwo_ref,
                      dkrel_ref, *,
                      rate: float, nheads: int, tb: int, interpret: bool):
    Mp, D = c_ref.shape
    S = Mp // tb
    dk = D // nheads
    inv_sqrt = 1.0 / math.sqrt(dk)
    mask = _causal_mask(S)
    f32 = jnp.float32
    pid = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    krel = krel_ref[0]

    @pl.when(pl.program_id(1) == 0)
    def _():
        dwq_ref[0] = jnp.zeros_like(dwq_ref[0])
        dwk_ref[0] = jnp.zeros_like(dwk_ref[0])
        dwv_ref[0] = jnp.zeros_like(dwv_ref[0])
        dwo_ref[0] = jnp.zeros_like(dwo_ref[0])
        dkrel_ref[0] = jnp.zeros_like(dkrel_ref[0])

    c = c_ref[:]
    q = _dot_cast(c, wq_ref[0])
    k = _dot_cast(c, wk_ref[0])
    v = _dot_cast(c, wv_ref[0])
    dx = dx_ref[0]
    # Wo backward: dy = dx @ Wo^T (pre-transposed input for the fast
    # contract-last-with-first orientation)
    dy = _dot_cast(dx, wot_ref[0])
    dq_parts, dk_parts, dv_parts, y_parts = [], [], [], []
    for h in range(nheads):
        sl = slice(h * dk, (h + 1) * dk)
        qh = q[:, sl].reshape(tb, S, dk)
        kh = k[:, sl].reshape(tb, S, dk)
        vh = v[:, sl].reshape(tb, S, dk)
        do = dy[:, sl].reshape(tb, S, dk)
        p = _attend_fwd(qh, kh, krel, mask, inv_sqrt, interpret)
        if rate > 0.0:
            drop = _dropout_mask_rows(tb, S, rate, seed_ref[0, 0], h,
                                      nheads, interpret)
            pd = p * drop
        else:
            pd = p
        pd_c = pd.astype(do.dtype)
        y_parts.append(jax.lax.dot_general(
            pd_c, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32).reshape(Mp, dk).astype(c.dtype))
        dvh = jax.lax.dot_general(pd_c, do, (((1,), (1,)), ((0,), (0,))),
                                  preferred_element_type=f32)
        dpd = jax.lax.dot_general(do, vh, (((2,), (2,)), ((0,), (0,))),
                                  preferred_element_type=f32)
        dp = dpd * drop if rate > 0.0 else dpd
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = ds * inv_sqrt
        ds_c = ds.astype(do.dtype)
        dqh = jax.lax.dot_general(ds_c, kh, (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=f32)
        dkh = jax.lax.dot_general(ds_c, qh, (((1,), (1,)), ((0,), (0,))),
                                  preferred_element_type=f32)
        dqp = _unskew(ds).astype(do.dtype)
        dq_rel = jax.lax.dot_general(dqp, krel, (((2,), (1,)), ((), ())),
                                     preferred_element_type=f32)
        dq_parts.append((dqh + dq_rel).reshape(Mp, dk).astype(c.dtype))
        dk_parts.append(dkh.reshape(Mp, dk).astype(c.dtype))
        dv_parts.append(dvh.reshape(Mp, dk).astype(c.dtype))
        dkrel_ref[0] += jax.lax.dot_general(
            qh.reshape(Mp, dk), dqp.reshape(Mp, S),
            (((0,), (0,)), ((), ())), preferred_element_type=f32)
    dq = jnp.concatenate(dq_parts, axis=1)
    dkk = jnp.concatenate(dk_parts, axis=1)
    dv = jnp.concatenate(dv_parts, axis=1)
    y = jnp.concatenate(y_parts, axis=1)
    # weight gradients, f32-accumulated across the batch tiles
    dwq_ref[0] += jax.lax.dot_general(c, dq, (((0,), (0,)), ((), ())),
                                      preferred_element_type=f32)
    dwk_ref[0] += jax.lax.dot_general(c, dkk, (((0,), (0,)), ((), ())),
                                      preferred_element_type=f32)
    dwv_ref[0] += jax.lax.dot_general(c, dv, (((0,), (0,)), ((), ())),
                                      preferred_element_type=f32)
    dwo_ref[0] += jax.lax.dot_general(y, dx.astype(c.dtype),
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=f32)
    # projection input gradient for this head stack (the residual part
    # and the sum over k happen in the XLA epilogue)
    dcp = jax.lax.dot_general(dq, wqt_ref[0], (((1,), (0,)), ((), ())),
                              preferred_element_type=f32)
    dcp += jax.lax.dot_general(dkk, wkt_ref[0], (((1,), (0,)), ((), ())),
                               preferred_element_type=f32)
    dcp += jax.lax.dot_general(dv, wvt_ref[0], (((1,), (0,)), ((), ())),
                               preferred_element_type=f32)
    dcp_ref[0] = dcp.astype(dcp_ref.dtype)


def _block_specs(K, tb, S, D, dk, interpret):
    mem = {} if interpret else {"memory_space": pltpu.VMEM}
    c_spec = pl.BlockSpec((tb * S, D), lambda k, b: (b, 0), **mem)
    x_spec = pl.BlockSpec((1, tb * S, D), lambda k, b: (k, b, 0), **mem)
    w_spec = pl.BlockSpec((1, D, D), lambda k, b: (k, 0, 0), **mem)
    krel_spec = pl.BlockSpec((1, dk, S), lambda k, b: (k, 0, 0), **mem)
    seed_spec = pl.BlockSpec((1, 128), lambda k, b: (0, 0), **mem)
    return c_spec, x_spec, w_spec, krel_spec, seed_spec, mem


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def fused_attention_block(c, wq, wk, wv, wo, krel, seed, n_batch: int,
                          nheads: int = 8, rate: float = 0.0,
                          interpret: bool = False):
    """c: (n_batch*S, D); wq/wk/wv/wo: (K, D, D); krel: (K, dk, S);
    seed: (1,) f32.  Returns x = c[None] + causal_relpos_attention@Wo,
    shape (K, n_batch*S, D) — the full pre-LN attention block of the
    stacked prediction heads (reference transformers.py:52-96 without
    the trailing LN, which the tail kernel owns)."""
    out, _ = _fb_fwd(c, wq, wk, wv, wo, krel, seed, n_batch, nheads, rate,
                     interpret)
    return out


def _fb_fwd(c, wq, wk, wv, wo, krel, seed, n_batch, nheads, rate,
            interpret):
    M, D = c.shape
    K = wq.shape[0]
    S = M // n_batch
    dk = D // nheads
    tb = _pick_tb(n_batch, rate=rate)
    c_spec, x_spec, w_spec, krel_spec, seed_spec, _ = _block_specs(
        K, tb, S, D, dk, interpret)
    seed_row = jnp.broadcast_to(seed.reshape(-1)[:1, None], (1, 128))
    out = pl.pallas_call(
        functools.partial(_block_fwd_kernel, rate=rate, nheads=nheads,
                          tb=tb, interpret=interpret),
        grid=(K, n_batch // tb),
        in_specs=[seed_spec, c_spec, w_spec, w_spec, w_spec, w_spec,
                  krel_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((K, M, D), c.dtype),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(seed_row, c, wq, wk, wv, wo, krel)
    return out, (c, wq, wk, wv, wo, krel, seed)


def _fb_bwd(n_batch, nheads, rate, interpret, res, dout):
    c, wq, wk, wv, wo, krel, seed = res
    M, D = c.shape
    K = wq.shape[0]
    S = M // n_batch
    dk = D // nheads
    tb = _pick_tb(n_batch, bwd=True, rate=rate)
    c_spec, x_spec, w_spec, krel_spec, seed_spec, mem = _block_specs(
        K, tb, S, D, dk, interpret)
    dw_spec = pl.BlockSpec((1, D, D), lambda k, b: (k, 0, 0), **mem)
    dkrel_spec = pl.BlockSpec((1, dk, S), lambda k, b: (k, 0, 0), **mem)
    seed_row = jnp.broadcast_to(seed.reshape(-1)[:1, None], (1, 128))
    f32 = jnp.float32
    wqt = jnp.swapaxes(wq, 1, 2)
    wkt = jnp.swapaxes(wk, 1, 2)
    wvt = jnp.swapaxes(wv, 1, 2)
    wot = jnp.swapaxes(wo, 1, 2)
    dcp, dwq, dwk, dwv, dwo, dkrel = pl.pallas_call(
        functools.partial(_block_bwd_kernel, rate=rate, nheads=nheads,
                          tb=tb, interpret=interpret),
        grid=(K, n_batch // tb),
        in_specs=[seed_spec, c_spec, w_spec, w_spec, w_spec, w_spec,
                  krel_spec, w_spec, w_spec, w_spec, w_spec, x_spec],
        out_specs=(x_spec, dw_spec, dw_spec, dw_spec, dw_spec, dkrel_spec),
        out_shape=(jax.ShapeDtypeStruct((K, M, D), c.dtype),
                   jax.ShapeDtypeStruct((K, D, D), f32),
                   jax.ShapeDtypeStruct((K, D, D), f32),
                   jax.ShapeDtypeStruct((K, D, D), f32),
                   jax.ShapeDtypeStruct((K, D, D), f32),
                   jax.ShapeDtypeStruct((K, dk, S), f32)),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(seed_row, c, wq, wk, wv, wo, krel, wqt, wkt, wvt, wot, dout)
    # epilogue: projection input grads + the residual cotangent, summed
    # over the K head stacks (c broadcasts into every stack)
    dc = jnp.sum(dcp + dout, axis=0).astype(c.dtype)
    return (dc, dwq.astype(wq.dtype), dwk.astype(wk.dtype),
            dwv.astype(wv.dtype), dwo.astype(wo.dtype),
            dkrel.astype(krel.dtype), jnp.zeros_like(seed))


def _fb_fwd_rule(c, wq, wk, wv, wo, krel, seed, n_batch, nheads, rate,
                 interpret):
    return _fb_fwd(c, wq, wk, wv, wo, krel, seed, n_batch, nheads, rate,
                   interpret)


fused_attention_block.defvjp(_fb_fwd_rule, _fb_bwd)


def attention_block_supported(S: int, dk: int, nheads: int, n_batch: int,
                              K: int) -> bool:
    """Gate for the whole-block kernel: the gen-3 constraints (the skew's
    tpu.dynamic_rotate needs lane-filling S) plus the block's extra VMEM
    residents — 4 (D, D) weights (+ their transposes and f32 dW
    accumulators in the backward) and the projected q/k/v tiles.

    OPT-IN (CPC_ATTN_BLOCK=1): on v5e the whole-block kernel measured a
    ~0.2 ms/step REGRESSION vs fused_relpos_attention + XLA projections
    at the bench config (17.44 vs 17.21 ms full-step device trace,
    tb=4/8/16 all equal): the in-kernel (tile, D)x(D, D) projections run
    at lower MXU efficiency than XLA's batched einsums and serialize
    with the per-head softmax, outweighing the ~0.5 GB/step of q/k/v/y
    HBM traffic it removes."""
    import os
    if os.environ.get("CPC_ATTN_BLOCK", "0") != "1":
        return False
    if not relpos_attention_supported(S, dk, nheads, n_batch):
        return False
    D = nheads * dk
    tb = _pick_tb(n_batch)
    vmem = (8 * D * D * 4            # wq/wk/wv/wo + transposes + f32 dW
            + 10 * tb * S * D * 4    # c/q/k/v/dq/dk/dv/dy/dcp/x tiles
            + 6 * tb * S * S * 4)    # p/ds/dqp/... f32 temps (per head)
    limit = float(os.environ.get("CPC_ATTN_VMEM_LIMIT", "40e6"))
    cap = float(os.environ.get("CPC_ATTN_VMEM_CAP", str(0.8 * limit)))
    return vmem < cap
