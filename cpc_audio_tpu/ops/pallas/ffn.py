"""Fused transformer-layer tail: LN -> FFN -> residual -> LN in one kernel.

Third-generation head kernel (joins ops/pallas/head_attention.py).  After
the attention block produces x = c + att, the XLA path runs FIVE separate
passes over HBM-resident tensors:

    y  = LN1(x)                 (stats + affine, 2 passes over 23 MB)
    h  = relu(dropout(y @ W1 + b1))   (the (K*B*W, 2048) hidden: 182 MB
                                       written + read back by lin2, plus a
                                       91 MB u8 dropout-bits tensor)
    f  = h @ W2 + b2
    out = LN2(y + f)

and the backward re-reads/writes the 182 MB hidden twice more (dh, and h
again for dW2).  Device traces at the bench config put the FFN at 2.7 ms
and the norms at 1.2 ms of an 18.4 ms step (docs/PERFORMANCE.md).

This kernel runs the whole tail per (k, row-tile) with the hidden living
ONLY in VMEM: one read of x, one write of out in the forward; the
backward recomputes the tail flash-style (no residuals beyond x), so the
2048-wide hidden NEVER touches HBM in either direction.  Dropout bits
come from the TPU per-core PRNG in-kernel (statistically equivalent to
the u8-threshold stream of criterion/stacked_heads.py, deterministic in
(seed, program) so fwd and bwd regenerate the identical mask — same
convention as ops/pallas/attention.py).

Grid layout: (K, M//tm) with the row-tile axis INNER, so each head's
W1/W2 (and the transposed copies the backward's dy/dh matmuls need in
the fast contract-last-with-first orientation, docs/PERFORMANCE.md) stay
resident in VMEM across the row tiles, and the dW/db/dLN accumulators are
revisited consecutively and flushed once per head.

Reference semantics covered: TransformerLayer's post-LN residual FFN
(/root/reference/cpc/transformers.py:85-111: LayerNorm -> FFNetwork
(Linear/ReLU/Dropout/Linear) -> residual -> LayerNorm) as instantiated
for the CPC prediction heads (criterion.py:82-88).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import _dropout_mask


def _ln_fwd(x32, eps):
    """LayerNorm over the last axis, f32 stats (ddof=0, flax convention —
    matches criterion/stacked_heads._StackedLN)."""
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    yhat = xc * inv
    return yhat, inv


def _ln_bwd(dout32, yhat, inv, w):
    """Standard LayerNorm input gradient; (dw, db) reduce outside."""
    dy = dout32 * w
    m1 = jnp.mean(dy, axis=-1, keepdims=True)
    m2 = jnp.mean(dy * yhat, axis=-1, keepdims=True)
    return (dy - m1 - yhat * m2) * inv


def _ffn_dropout_rows(tm, F, rate, seed, k, t, M, gr, interpret):
    """Dropout mask for a (tm, F) hidden tile keyed by the ABSOLUTE row
    granule — not the grid program — so the forward and backward
    pallas_calls may use different row tiles (the same convention as
    head_attention._dropout_mask_rows, and the same class of bug it
    fixed: program-id-keyed masks silently diverge between fwd and bwd
    once their grids differ).  ``gr`` (the granule) must divide every
    tile in use — _mask_granule computes the gcd of the fwd/bwd picks."""
    row0 = t * tm
    n_gr = M // gr
    parts = []
    for g0 in range(0, tm, gr):
        pid = k * n_gr + (row0 + g0) // gr
        parts.append(_dropout_mask((gr, F), rate, seed, pid, interpret))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _tail_fwd_kernel(seed_ref, x_ref, ln1w_ref, ln1b_ref, w1_ref, b1_ref,
                     w2_ref, b2_ref, ln2w_ref, ln2b_ref, out_ref, *,
                     rate: float, eps: float, M: int, gr: int,
                     interpret: bool):
    f32 = jnp.float32
    x = x_ref[0]
    cdt = x.dtype
    # The (K, D)/(K, F) vectors are whole-array VMEM blocks (Mosaic
    # rejects 1-sublane blocks of a K-row array); row k is this program's.
    k = pl.program_id(0)
    ln1w = ln1w_ref[k].astype(f32)
    ln1b = ln1b_ref[k].astype(f32)
    yhat1, _ = _ln_fwd(x.astype(f32), eps)
    y = (yhat1 * ln1w + ln1b).astype(cdt)
    hp = jax.lax.dot_general(y, w1_ref[0], (((1,), (0,)), ((), ())),
                             preferred_element_type=f32)
    hp = hp + b1_ref[k].astype(f32)
    h = jnp.maximum(hp, 0.0)
    if rate > 0.0:
        h = h * _ffn_dropout_rows(h.shape[0], h.shape[1], rate,
                                  seed_ref[0, 0], k, pl.program_id(1),
                                  M, gr, interpret)
    h = h.astype(cdt)
    f = jax.lax.dot_general(h, w2_ref[0], (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)
    f = f + b2_ref[k].astype(f32)
    y2 = y.astype(f32) + f
    ln2w = ln2w_ref[k].astype(f32)
    yhat2, _ = _ln_fwd(y2, eps)
    out = yhat2 * ln2w + ln2b_ref[k].astype(f32)
    out_ref[0] = out.astype(out_ref.dtype)


def _tail_bwd_kernel(seed_ref, x_ref, ln1w_ref, ln1b_ref, w1_ref, b1_ref,
                     w2_ref, b2_ref, ln2w_ref, ln2b_ref, w1t_ref, w2t_ref,
                     do_ref,
                     dx_ref, dln1w_ref, dln1b_ref, dw1_ref, db1_ref,
                     dw2_ref, db2_ref, dln2w_ref, dln2b_ref, *,
                     rate: float, eps: float, M: int, gr: int,
                     interpret: bool):
    f32 = jnp.float32
    x = x_ref[0]
    cdt = x.dtype
    k = pl.program_id(0)
    t = pl.program_id(1)

    # ---- recompute the forward (flash-style: x is the only residual) ----
    ln1w = ln1w_ref[k].astype(f32)
    ln1b = ln1b_ref[k].astype(f32)
    yhat1, inv1 = _ln_fwd(x.astype(f32), eps)
    y = (yhat1 * ln1w + ln1b).astype(cdt)
    hp = jax.lax.dot_general(y, w1_ref[0], (((1,), (0,)), ((), ())),
                             preferred_element_type=f32)
    hp = hp + b1_ref[k].astype(f32)
    h32 = jnp.maximum(hp, 0.0)
    if rate > 0.0:
        drop = _ffn_dropout_rows(h32.shape[0], h32.shape[1], rate,
                                 seed_ref[0, 0], k, t, M, gr, interpret)
        h32 = h32 * drop
    # kept-AND-positive mask, sign-recovered from the f32 value (Mosaic
    # has no bf16 vector compare on v5e)
    live = h32 > 0.0
    h = h32.astype(cdt)
    f = jax.lax.dot_general(h, w2_ref[0], (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)
    f = f + b2_ref[k].astype(f32)
    y2 = y.astype(f32) + f
    ln2w = ln2w_ref[k].astype(f32)
    yhat2, inv2 = _ln_fwd(y2, eps)

    # ---- backward chain ----
    do = do_ref[0].astype(f32)
    dy2 = _ln_bwd(do, yhat2, inv2, ln2w)                    # d(y + f)
    df = dy2.astype(cdt)
    # lin2: dh = df @ W2^T (via the pre-transposed W2T input so the MXU
    # contracts last-with-first, the fast orientation on v5e)
    dh = jax.lax.dot_general(df, w2t_ref[0], (((1,), (0,)), ((), ())),
                             preferred_element_type=f32)
    # relu+dropout: the kept-AND-positive mask (``live``, recovered from
    # the recomputed f32 hidden), like the _relu_dropout custom VJP in
    # criterion/stacked_heads.py.
    if rate > 0.0:
        dhp = jnp.where(live, dh * (1.0 / (1.0 - rate)), 0.0)
    else:
        dhp = jnp.where(live, dh, 0.0)
    dhp = dhp.astype(cdt)
    # lin1: dy_ffn = dhp @ W1^T
    dyf = jax.lax.dot_general(dhp, w1t_ref[0], (((1,), (0,)), ((), ())),
                              preferred_element_type=f32)
    dy = dy2 + dyf                                           # residual + ffn
    dx = _ln_bwd(dy, yhat1, inv1, ln1w)
    dx_ref[0] = dx.astype(dx_ref.dtype)

    # ---- parameter-gradient accumulators.  The (K, D)/(K, F) vector
    # grads are whole-array VMEM blocks resident across the entire grid
    # (zeroed once, row k accumulated during k's row tiles, flushed at
    # the end); the dW blocks are per-k and flushed when k advances. ----
    @pl.when(jnp.logical_and(k == 0, t == 0))
    def _():
        dln1w_ref[:] = jnp.zeros_like(dln1w_ref[:])
        dln1b_ref[:] = jnp.zeros_like(dln1b_ref[:])
        db1_ref[:] = jnp.zeros_like(db1_ref[:])
        db2_ref[:] = jnp.zeros_like(db2_ref[:])
        dln2w_ref[:] = jnp.zeros_like(dln2w_ref[:])
        dln2b_ref[:] = jnp.zeros_like(dln2b_ref[:])

    @pl.when(t == 0)
    def _():
        dw1_ref[0] = jnp.zeros_like(dw1_ref[0])
        dw2_ref[0] = jnp.zeros_like(dw2_ref[0])

    dln2w_ref[k] += jnp.sum(do * yhat2, axis=0)
    dln2b_ref[k] += jnp.sum(do, axis=0)
    dw2_ref[0] += jax.lax.dot_general(h, df, (((0,), (0,)), ((), ())),
                                      preferred_element_type=f32)
    db2_ref[k] += jnp.sum(df.astype(f32), axis=0)
    dw1_ref[0] += jax.lax.dot_general(y, dhp, (((0,), (0,)), ((), ())),
                                      preferred_element_type=f32)
    db1_ref[k] += jnp.sum(dhp.astype(f32), axis=0)
    dln1w_ref[k] += jnp.sum(dy * yhat1, axis=0)
    dln1b_ref[k] += jnp.sum(dy, axis=0)


def _compiler_params():
    """The backward's working set (hidden tile + resident dW accumulators
    + W transposes) overflows the 16 MB default scoped-vmem budget by a
    hair at tm=128; raise the cap (v5e VMEM is far larger — the tm=928
    backward tile needs ~33 MB).  CPC_FFN_VMEM_LIMIT overrides for
    tuning."""
    limit = int(float(os.environ.get("CPC_FFN_VMEM_LIMIT", "48e6")))
    return pltpu.CompilerParams(vmem_limit_bytes=limit)


def _pick_tm(M: int, bwd: bool = False) -> int:
    """Rows per grid program: the largest divisor of M that is a multiple
    of 8 and <= 512 (forward) / <= 1024 (backward).  Bigger tiles
    amortize per-program overhead (v5e sweeps at the bench config
    M=3712: fwd tm=128 2.95, 232 2.78, 464 2.64 ms fwd+bwd; bwd-only
    464 1.67, 928 1.63 ms) and the raised scoped-vmem budget
    (_compiler_params) fits them.  The fwd and bwd grids may differ
    freely: the in-kernel dropout stream is keyed by ABSOLUTE row
    granule (_ffn_dropout_rows), not program id.  CPC_FFN_TM overrides
    for tuning, CPC_FFN_TM_BWD additionally for the backward."""
    pref = os.environ.get("CPC_FFN_TM_BWD" if bwd else "CPC_FFN_TM") \
        or os.environ.get("CPC_FFN_TM")
    if pref is not None:
        tm = int(pref)
        if tm <= M and M % tm == 0:
            return tm
    best = 0
    for tm in range(8, min(1024 if bwd else 512, M) + 1, 8):
        if M % tm == 0:
            best = tm
    return best or M


def _mask_granule(M: int) -> int:
    """Dropout-stream granule: the gcd of the fwd and bwd row tiles, so
    one granule's mask never straddles a tile boundary in either grid.
    Both kernels compute this from the same deterministic picks."""
    import math as _math
    return _math.gcd(_pick_tm(M), _pick_tm(M, bwd=True))


def fused_tail_supported(M: int, D: int, F: int) -> bool:
    """Lane-aligned feature dims, sublane-aligned row tiles, and the
    working set (hidden tile + W1/W2 + their transposes + dW accumulators)
    inside VMEM."""
    if D % 128 != 0 or F % 128 != 0 or M % 8 != 0:
        return False
    tm = max(_pick_tm(M), _pick_tm(M, bwd=True))
    vmem = (tm * F * 10              # hp/h f32+bf16, dh/dhp, drop mask
            + 4 * D * F * 2          # W1/W2 + transposes (bf16)
            + 2 * D * F * 4          # dW1/dW2 f32 accumulators
            + 6 * tm * D * 4)        # x/y/dy/dx/yhat tiles
    # keep the estimate inside the limit passed to the compiler
    # (_compiler_params), with headroom for Mosaic's pipeline buffers
    limit = float(os.environ.get("CPC_FFN_VMEM_LIMIT", "48e6"))
    cap = float(os.environ.get("CPC_FFN_VMEM_CAP", str(0.8 * limit)))
    return vmem < cap


def use_fused_ffn() -> bool:
    """Fused tail on real TPUs; XLA path elsewhere.
    Override with CPC_PALLAS_FFN=0/1."""
    flag = os.environ.get("CPC_PALLAS_FFN", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def ffn_interpret_mode() -> bool:
    """CPC_PALLAS_FFN_INTERPRET=1 runs the kernel interpreted (tests on
    CPU exercise the exact kernel code path)."""
    return os.environ.get("CPC_PALLAS_FFN_INTERPRET", "0") == "1"


def _specs(K, tm, D, F, interpret):
    mem = {} if interpret else {"memory_space": pltpu.VMEM}
    row = pl.BlockSpec((1, tm, D), lambda k, t: (k, t, 0), **mem)
    # (K, D)/(K, F) vectors ride whole (they are KBs; Mosaic rejects
    # 1-sublane blocks of a K-row array) — kernels index row k.
    vecD = pl.BlockSpec((K, D), lambda k, t: (0, 0), **mem)
    vecF = pl.BlockSpec((K, F), lambda k, t: (0, 0), **mem)
    w1s = pl.BlockSpec((1, D, F), lambda k, t: (k, 0, 0), **mem)
    w2s = pl.BlockSpec((1, F, D), lambda k, t: (k, 0, 0), **mem)
    seed = pl.BlockSpec((1, 128), lambda k, t: (0, 0), **mem)
    return row, vecD, vecF, w1s, w2s, seed, mem


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def fused_layer_tail(x, ln1w, ln1b, w1, b1, w2, b2, ln2w, ln2b, seed,
                     rate: float = 0.0, eps: float = 1e-5,
                     interpret: bool = False):
    """x: (K, M, D); w1: (K, D, F); w2: (K, F, D); LN params (K, D);
    b1: (K, F); b2: (K, D); seed: (1,) f32 integer-valued dropout seed.
    Returns LN2(LN1(x) + FFN(LN1(x))) per head — the transformer layer
    tail of criterion/stacked_heads._Layer0."""
    out, _ = _tail_fwd(x, ln1w, ln1b, w1, b1, w2, b2, ln2w, ln2b, seed,
                       rate, eps, interpret)
    return out


def _tail_fwd(x, ln1w, ln1b, w1, b1, w2, b2, ln2w, ln2b, seed,
              rate, eps, interpret):
    K, M, D = x.shape
    F = w1.shape[-1]
    tm = _pick_tm(M)
    row, vecD, vecF, w1s, w2s, seed_s, _ = _specs(K, tm, D, F, interpret)
    seed_row = jnp.broadcast_to(seed.reshape(-1)[:1, None], (1, 128))
    out = pl.pallas_call(
        functools.partial(_tail_fwd_kernel, rate=rate, eps=eps,
                          M=M, gr=_mask_granule(M), interpret=interpret),
        grid=(K, M // tm),
        in_specs=[seed_s, row, vecD, vecD, w1s, vecF, w2s, vecD, vecD,
                  vecD],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((K, M, D), x.dtype),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(seed_row, x, ln1w, ln1b, w1, b1, w2, b2, ln2w, ln2b)
    # NOTE (measured negative result, round 3): emitting the output
    # transposed as (M, K, D) row-major — the {2,0,1} layout the scoring
    # einsums want — does NOT remove the consumer-side relayout copies:
    # XLA pins the custom-call result to the default layout and lowers
    # the reshape+transpose chain as TWO copies (0.19 vs 0.12 ms).
    return out, (x, ln1w, ln1b, w1, b1, w2, b2, ln2w, ln2b, seed)


def _tail_bwd(rate, eps, interpret, res, dout):
    x, ln1w, ln1b, w1, b1, w2, b2, ln2w, ln2b, seed = res
    K, M, D = x.shape
    F = w1.shape[-1]
    # masks are keyed by absolute row granule (_ffn_dropout_rows), so the
    # bwd grid is free to differ from the fwd grid even with dropout on
    tm = _pick_tm(M, bwd=True)
    row, vecD, vecF, w1s, w2s, seed_s, mem = _specs(K, tm, D, F, interpret)
    # Parameter-grad accumulators: the dW blocks' index is constant in
    # t -> VMEM resident across the row tiles, flushed once per head;
    # the vector grads ride whole across the entire grid.
    accD = pl.BlockSpec((K, D), lambda k, t: (0, 0), **mem)
    accF = pl.BlockSpec((K, F), lambda k, t: (0, 0), **mem)
    accW1 = pl.BlockSpec((1, D, F), lambda k, t: (k, 0, 0), **mem)
    accW2 = pl.BlockSpec((1, F, D), lambda k, t: (k, 0, 0), **mem)
    w1t_s = pl.BlockSpec((1, F, D), lambda k, t: (k, 0, 0), **mem)
    w2t_s = pl.BlockSpec((1, D, F), lambda k, t: (k, 0, 0), **mem)
    seed_row = jnp.broadcast_to(seed.reshape(-1)[:1, None], (1, 128))
    f32 = jnp.float32
    # Pre-transposed weights for the backward's dy/dh matmuls: contracting
    # last-with-first runs ~4x faster on the v5e MXU than last-with-last
    # (docs/PERFORMANCE.md, matmul orientation).
    w1t = jnp.swapaxes(w1, 1, 2)
    w2t = jnp.swapaxes(w2, 1, 2)
    outs = pl.pallas_call(
        functools.partial(_tail_bwd_kernel, rate=rate, eps=eps,
                          M=M, gr=_mask_granule(M), interpret=interpret),
        grid=(K, M // tm),
        in_specs=[seed_s, row, vecD, vecD, w1s, vecF, w2s, vecD, vecD,
                  vecD, w1t_s, w2t_s, row],
        out_specs=(row, accD, accD, accW1, accF, accW2, accD, accD, accD),
        out_shape=(jax.ShapeDtypeStruct((K, M, D), x.dtype),
                   jax.ShapeDtypeStruct((K, D), f32),
                   jax.ShapeDtypeStruct((K, D), f32),
                   jax.ShapeDtypeStruct((K, D, F), f32),
                   jax.ShapeDtypeStruct((K, F), f32),
                   jax.ShapeDtypeStruct((K, F, D), f32),
                   jax.ShapeDtypeStruct((K, D), f32),
                   jax.ShapeDtypeStruct((K, D), f32),
                   jax.ShapeDtypeStruct((K, D), f32)),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(seed_row, x, ln1w, ln1b, w1, b1, w2, b2, ln2w, ln2b, w1t, w2t, dout)
    dx, dln1w, dln1b, dw1, db1, dw2, db2, dln2w, dln2b = outs
    return (dx, dln1w.astype(ln1w.dtype), dln1b.astype(ln1b.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype),
            dln2w.astype(ln2w.dtype), dln2b.astype(ln2b.dtype),
            jnp.zeros_like(seed))


def _tail_fwd_rule(x, ln1w, ln1b, w1, b1, w2, b2, ln2w, ln2b, seed,
                   rate, eps, interpret):
    return _tail_fwd(x, ln1w, ln1b, w1, b1, w2, b2, ln2w, ln2b, seed,
                     rate, eps, interpret)


fused_layer_tail.defvjp(_tail_fwd_rule, _tail_bwd)
