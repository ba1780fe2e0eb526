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
equivalent to flax's stream; deterministic in (seed, program, head), so
the backward regenerates the identical mask).
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
            p = p * _dropout_mask(p.shape, rate, seed_ref[0, 0],
                                  pid * nheads + h, interpret)
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
                dq_ref, dk_ref, dv_ref, ds_ref, *,
                rate: float, nheads: int, tb: int, interpret: bool):
    """Recompute-style backward.  Emits dq/dk/dv for the QK^T (+AV) part
    plus dqp = unskew(ds), the rel-pos logits gradient, already
    permuted IN-KERNEL (the XLA pad/reshape unskew of the (K,B,h,S,S)
    tensor measured ~1 ms/step of pure relayout).  The remaining rel-pos
    contributions (dq += dqp @ krel^T, dKrelpos) are two XLA einsums on
    dqp outside the kernel (see _fr_bwd)."""
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
        # operands stay in the input dtype (bf16 in training): MXU does
        # bf16 multiplies with f32 accumulation; softmax math is f32.
        qh = q_ref[0, :, sl].reshape(tb, S, dk)
        kh = k_ref[0, :, sl].reshape(tb, S, dk)
        vh = v_ref[0, :, sl].reshape(tb, S, dk)
        do = do_ref[0, :, sl].reshape(tb, S, dk)
        p = _attend_fwd(qh, kh, krel, mask, inv_sqrt, interpret)
        if rate > 0.0:
            drop = _dropout_mask(p.shape, rate, seed_ref[0, 0],
                                 pid * nheads + h, interpret)
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
        dq_ref[0, :, sl] = dqh.reshape(M, dk).astype(dq_ref.dtype)
        dk_ref[0, :, sl] = dkh.reshape(M, dk).astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dvh.reshape(M, dk).astype(dv_ref.dtype)
        ds_ref[0, :, h] = _unskew(ds).astype(ds_ref.dtype)


def _pick_tb(n_b: int) -> int:
    """Batch rows per grid program.  8 beats 4 on v5e (attention device
    time 2.98 -> 2.43 ms/step at the bench config: fewer program launches,
    better MXU occupancy); CPC_ATTN_TB overrides for tuning."""
    import os
    pref = int(os.environ.get("CPC_ATTN_TB", "8"))
    for tb in (pref, 8, 4, 2, 1):
        if tb <= n_b and n_b % tb == 0:
            return tb
    return 1


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
    tb = _pick_tb(n_batch)
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
    )(seed_row, q, k, v, krel)
    return out, (q, k, v, krel, seed)


def _fr_bwd(n_batch, nheads, rate, interpret, res, dout):
    q, k, v, krel, seed = res
    K, M, D = q.shape
    S = M // n_batch
    dk = D // nheads
    tb = _pick_tb(n_batch)
    row, krel_spec, seed_spec = _specs(K, n_batch // tb, tb, S, D, dk,
                                       interpret)
    mem = {} if interpret else {"memory_space": pltpu.VMEM}
    ds_spec = pl.BlockSpec((1, tb, nheads, S, S),
                           lambda k, b: (k, b, 0, 0, 0), **mem)
    seed_row = jnp.broadcast_to(seed.reshape(-1)[:1, None], (1, 128))
    dq, dkk, dv, dqp = pl.pallas_call(
        functools.partial(_bwd_kernel, rate=rate, nheads=nheads, tb=tb,
                          interpret=interpret),
        grid=(K, n_batch // tb),
        in_specs=[seed_spec, row, row, row, krel_spec, row],
        out_specs=(row, row, row, ds_spec),
        out_shape=(jax.ShapeDtypeStruct((K, M, D), q.dtype),
                   jax.ShapeDtypeStruct((K, M, D), k.dtype),
                   jax.ShapeDtypeStruct((K, M, D), v.dtype),
                   jax.ShapeDtypeStruct((K, n_batch, nheads, S, S),
                                        q.dtype)),
        interpret=interpret,
    )(seed_row, q, k, v, krel, dout)
    # dqp = unskew(ds) comes pre-permuted from the kernel (see _unskew).
    # dq += dqp @ krel^T, per head; dkrel = sum over (b, i, heads) q^T dqp
    q4 = q.reshape(K, n_batch, S, nheads, dk)
    dq_rel = jnp.einsum("kbhir,kdr->kbihd", dqp, krel.astype(dqp.dtype))
    dq = dq + dq_rel.reshape(K, M, D).astype(dq.dtype)
    dkrel = jnp.einsum("kbihd,kbhir->kdr", q4.astype(dqp.dtype), dqp)
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
    tb = _pick_tb(n_batch)
    vmem = (4 * tb * S * nheads * dk * 4        # q/k/v/o one head f32-ish
            + 6 * tb * S * S * 4)               # p/ds/dqp/... f32 temps
    # tb=8 (7.3 MB estimate) compiles; tb=16 (14.7 MB) dies in Mosaic
    # VMEM allocation on v5e — the cap keeps oversized tiles on the
    # XLA fallback instead of failing the compile.
    cap = float(os.environ.get("CPC_ATTN_VMEM_CAP", "8e6"))
    return S % 128 == 0 and dk % 8 == 0 and S <= 512 and vmem < cap
