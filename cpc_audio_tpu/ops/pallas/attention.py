"""Fused causal attention (QK -> +bias -> mask -> softmax -> dropout -> AV)
as one Pallas kernel with a recompute (flash-style) custom VJP.

Motivation (docs/PERFORMANCE.md item 2): the 12 transformer prediction
heads run attention at S=116, dk=32 — the (K,B,h,S,S) logits/attn/dropout
tensors round-trip HBM several times per step under XLA (~160-330 MB each
way) while the matmuls are tiny.  The whole attention for one (b,h) row
fits VMEM, so a single kernel does QK, bias add, causal mask, softmax,
dropout and AV with NO intermediate leaving the chip; the backward kernel
recomputes the softmax instead of storing it.

Semantics notes:
  * `bias` carries the Shaw rel-pos skew term (models/transformer.py:84-96);
    it stays a kernel INPUT so its construction (and gradient flow back to
    q and Krelpos) remains ordinary XLA autodiff.
  * Dropout uses the TPU per-core PRNG (pltpu.prng_random_bits) seeded per
    grid program — statistically equivalent to, but not bit-identical
    with, flax's `nn.Dropout` stream (documented deviation; eval paths are
    deterministic).  The backward regenerates the identical mask from the
    same seed.
  * Scaling matches the reference: (q@k^T + bias) / sqrt(dk)
    (transformers.py:30-50; mask then softmax).

Reference behavior covered: ScaledDotProductAttention + MultiHeadAttention
(/root/reference/cpc/transformers.py:10-83).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _causal_mask(S: int):
    row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    return col <= row  # (S, S) bool


def _dropout_mask(shape, rate: float, seed, pid, interpret: bool):
    """Keep mask scaled by 1/keep. Compiled path: TPU core PRNG (seeded
    from (seed, program_id)). Interpret path: a splitmix-style integer
    hash (the TPU PRNG primitive has no CPU lowering) — both are
    deterministic in (seed, pid), so fwd and bwd regenerate identically."""
    threshold = jnp.uint32(min(int(rate * 4294967296.0), 4294967295))
    if interpret:
        n = 1
        for d in shape:
            n *= d
        idx = jax.lax.broadcasted_iota(jnp.uint32, (n, 1), 0).reshape(shape)
        x = idx + seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9) \
            + jnp.uint32(pid) * jnp.uint32(0x85EBCA6B)
        x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
        x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
        bits = x ^ (x >> 16)
    else:
        pltpu.prng_seed(seed.astype(jnp.int32), pid)
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    keep = bits >= threshold
    return keep.astype(jnp.float32) / (1.0 - rate)


def _softmax_fwd(q, k, bias, inv_sqrt, mask):
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s = (s + bias.astype(jnp.float32)) * inv_sqrt
    s = jnp.where(mask[None], s, _NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    return p


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                rate: float, inv_sqrt: float, interpret: bool):
    TB, S, dk = q_ref.shape
    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    p = _softmax_fwd(q, k, bias_ref[:], inv_sqrt, _causal_mask(S))
    if rate > 0.0:
        p = p * _dropout_mask(p.shape, rate, seed_ref[0, 0],
                              pl.program_id(0), interpret)
    o = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[:],
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[:] = o.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref, *,
                rate: float, inv_sqrt: float, interpret: bool):
    TB, S, dk = q_ref.shape
    f32 = jnp.float32
    q = q_ref[:].astype(f32)
    k = k_ref[:].astype(f32)
    v = v_ref[:].astype(f32)
    do = do_ref[:].astype(f32)
    p = _softmax_fwd(q, k, bias_ref[:], inv_sqrt, _causal_mask(S))
    if rate > 0.0:
        drop = _dropout_mask(p.shape, rate, seed_ref[0, 0],
                             pl.program_id(0), interpret)
        pd = p * drop
    else:
        pd = p
    # dv[t,j,d] = sum_i pd[t,i,j] * do[t,i,d]
    dv = jax.lax.dot_general(pd, do, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=f32)
    # dpd[t,i,j] = sum_d do[t,i,d] * v[t,j,d]
    dpd = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                              preferred_element_type=f32)
    dp = dpd * drop if rate > 0.0 else dpd
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = ds * inv_sqrt
    dbias_ref[:] = ds.astype(dbias_ref.dtype)
    # dq[t,i,d] = sum_j ds[t,i,j] * k[t,j,d]
    dq = jax.lax.dot_general(ds, k, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=f32)
    # dk[t,j,d] = sum_i ds[t,i,j] * q[t,i,d]
    dkk = jax.lax.dot_general(ds, q, (((1,), (1,)), ((0,), (0,))),
                              preferred_element_type=f32)
    dq_ref[:] = dq.astype(dq_ref.dtype)
    dk_ref[:] = dkk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _pad_to(x, S):
    pad = S - x.shape[-2]
    if pad == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[-2] = (0, pad)
    return jnp.pad(x, cfg)


def _pad_bias(b, S):
    pad = S - b.shape[-1]
    if pad == 0:
        return b
    return jnp.pad(b, [(0, 0)] * (b.ndim - 2) + [(0, pad), (0, pad)])


_TB = 8  # (b,h) rows per grid program


def _specs(n_io, TB, S, dk, interpret):
    del n_io
    mem = {} if interpret else {"memory_space": pltpu.VMEM}
    row = pl.BlockSpec((TB, S, dk), lambda i: (i, 0, 0), **mem)
    sq = pl.BlockSpec((TB, S, S), lambda i: (i, 0, 0), **mem)
    # seed rides as a (1, 128) VMEM row: a last-two-dims-equal block shape
    # stays legal when jax.vmap prepends a batch dim (an SMEM scalar spec
    # does not survive that batching on the TPU lowering)
    seed_spec = pl.BlockSpec((1, 128), lambda i: (0, 0), **mem)
    return row, sq, seed_spec


def _padded_len(S0: int) -> int:
    return max(8 * ((S0 + 7) // 8), 128 if S0 > 64 else 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_causal_attention(q, k, v, bias, seed, rate: float = 0.0,
                           interpret: bool = False):
    """q, k, v: (N, S, dk); bias: (N, S, S); seed: (1,) float32 (integer
    value; dropout stream seed).  Returns (N, S, dk).

    Computes softmax((q@k^T + bias)/sqrt(dk) + causal_mask) [dropout] @ v
    in one Pallas kernel. S is padded to a multiple of 8 internally.
    """
    out, _ = _fused_fwd(q, k, v, bias, seed, rate, interpret)
    return out


def _fused_fwd(q, k, v, bias, seed, rate, interpret):
    N, S0, dk = q.shape
    S = _padded_len(S0)
    assert N % _TB == 0, N
    qp, kp, vp = (_pad_to(t, S) for t in (q, k, v))
    bp = _pad_bias(bias, S)
    inv_sqrt = 1.0 / math.sqrt(dk)
    row, sq, seed_spec = _specs(4, _TB, S, dk, interpret)
    seed_row = jnp.broadcast_to(seed.reshape(-1)[:1, None], (1, 128))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, rate=rate, inv_sqrt=inv_sqrt,
                          interpret=interpret),
        grid=(N // _TB,),
        in_specs=[seed_spec, row, row, row, sq],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((N, S, dk), q.dtype),
        interpret=interpret,
    )(seed_row, qp, kp, vp, bp)
    return out[:, :S0], (q, k, v, bias, seed)


def _fused_bwd(rate, interpret, res, dout):
    q, k, v, bias, seed = res
    N, S0, dk = q.shape
    S = _padded_len(S0)
    qp, kp, vp, dop = (_pad_to(t, S) for t in (q, k, v, dout))
    bp = _pad_bias(bias, S)
    inv_sqrt = 1.0 / math.sqrt(dk)
    row, sq, seed_spec = _specs(5, _TB, S, dk, interpret)
    seed_row = jnp.broadcast_to(seed.reshape(-1)[:1, None], (1, 128))
    dq, dkk, dv, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, rate=rate, inv_sqrt=inv_sqrt,
                          interpret=interpret),
        grid=(N // _TB,),
        in_specs=[seed_spec, row, row, row, sq, row],
        out_specs=(row, row, row, sq),
        out_shape=(jax.ShapeDtypeStruct((N, S, dk), q.dtype),
                   jax.ShapeDtypeStruct((N, S, dk), k.dtype),
                   jax.ShapeDtypeStruct((N, S, dk), v.dtype),
                   jax.ShapeDtypeStruct((N, S, S), bias.dtype)),
        interpret=interpret,
    )(seed_row, qp, kp, vp, bp, dop)
    return (dq[:, :S0], dkk[:, :S0], dv[:, :S0],
            dbias[:, :S0, :S0], jnp.zeros_like(seed))


def _fused_fwd_rule(q, k, v, bias, seed, rate, interpret):
    return _fused_fwd(q, k, v, bias, seed, rate, interpret)


fused_causal_attention.defvjp(_fused_fwd_rule, _fused_bwd)


def use_fused_attention() -> bool:
    """Fused attention on real TPUs; XLA path elsewhere.
    Override with CPC_PALLAS_ATTN=0/1."""
    import os
    flag = os.environ.get("CPC_PALLAS_ATTN", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def interpret_mode() -> bool:
    """CPC_PALLAS_ATTN_INTERPRET=1 runs the kernel interpreted (tests on
    CPU exercise the exact kernel code path)."""
    import os
    return os.environ.get("CPC_PALLAS_ATTN_INTERPRET", "0") == "1"


def fused_attention_supported(S: int, dk: int, n_rows: int) -> bool:
    """VMEM sanity: a (TB, Sp, Sp) f32 logits block plus operands must fit
    comfortably; dk must be lane-friendly."""
    Sp = _padded_len(S)
    vmem = _TB * Sp * Sp * 4 * 3 + 4 * _TB * Sp * dk * 4
    return (n_rows % _TB == 0 and dk % 8 == 0 and 8 <= Sp <= 512
            and vmem < 12e6)
