"""Fused encoder layer: strided conv -> bias -> ChannelNorm -> ReLU.

The CPC encoder's C=256 layers (kernels (8,4,4,4), strides (4,2,2,2),
/root/reference/cpc/model.py:83-93) each cost XLA a conv kernel, a
separate ChannelNorm fusion, and — because XLA picks feature-major
layouts for convs but row-major for the norm fusions — a pair of pure
layout copies per layer (~0.7 ms/step of copies + ~0.4 ms of norm
passes on top of the conv time at the bench config, device trace,
docs/PERFORMANCE.md).

Every one of these layers has kernel == 2 * stride, so in the
"block view" xb[t] = x[t*s : (t+1)*s].reshape(s*C) each output frame is
the concatenation of exactly TWO consecutive block rows:

    y[t] = relu(ChannelNorm(concat(xb[t], xb[t+1]) @ W + bias))

A first version of this kernel materialized the block view in XLA
(pad + (T,C)->(T/s,sC) reshape around the pallas_call); the kernels ran
at roofline but the step REGRESSED 1.5 ms — a block-merge reshape on a
tiled layout is a full relayout pass each direction (device trace,
round-2 lesson).  This version keeps the kernel I/O in the natural
(B, T, C) layout and does the framing in VMEM:

  * the tile loads rows [t0*s, t0*s + tm*s) plus an s-row halo, one
    sublane concat + one in-VMEM reshape builds xall = (tm+1, sC);
  * the conv is TWO aligned MXU matmuls on the kernel's tap halves
    (h = xall@W1 shifted-add xall@W2) — no lane-concat of offset
    slices (Mosaic won't lower those) and no unaligned operands: the
    one-row shift happens on the small (tm+1, C) results;
  * the norm runs on the f32 accumulator while it is still in VMEM.

The only XLA-side plumbing left is a row-pad of the input (layout
preserving) and, in the backward, a tiny cross-tile carry scatter: the
transposed conv makes frame t scatter into block rows t and t+1, so
each tile emits its interior rows plus an s-row carry for the row owned
by the next tile.  Parameter grads accumulate in VMEM across the whole
grid (constant-index output blocks, like ops/pallas/ffn.py).

MEASURED NEGATIVE RESULT (v5e, full-step device traces): the kernel is
numerically correct at bf16 tolerance but the step REGRESSES 16.96 ->
18.30 ms with it on.  The 8 pallas calls cost 1.57 ms while the XLA
work they displace is only ~0.9 ms — XLA's conv+norm path is already
near the layers' FLOP floor (~1.1 ms fwd+bwd) and the "norm + layout
copy" budget the fusion chased belongs mostly to OTHER sites (the
encoder boundary relayouts are ~0.3 ms, not 0.7).  The kernel therefore
stays OPT-IN (CPC_PALLAS_CONV=1) as a building block; the default path
keeps XLA convs.  Full analysis in docs/PERFORMANCE.md round 3.

Reference semantics covered: Conv1d + ChannelNorm(ddof=1) + ReLU
(model.py:61-105 stack body, model.py:25-58 norm).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_unbiased_fwd(h32, eps, C):
    """ChannelNorm stats: mean + UNBIASED variance (torch ddof=1,
    model.py:53), eps added to the variance."""
    mean = jnp.mean(h32, axis=-1, keepdims=True)
    hc = h32 - mean
    var = jnp.sum(hc * hc, axis=-1, keepdims=True) / (C - 1)
    inv = jax.lax.rsqrt(var + eps)
    return hc * inv, inv


def _build_xall(xm_ref, xh_ref, stride):
    """(tm*s + s, C) natural rows -> (tm+1, s*C) block view, in VMEM."""
    xm = xm_ref[0]                       # (tm*s, C)
    xh = xh_ref[0, :stride]              # halo block, first s rows real
    rows = jnp.concatenate([xm, xh], axis=0)
    tm1 = rows.shape[0] // stride
    return rows.reshape(tm1, stride * rows.shape[-1])


def _conv_halves(xall, w_ref, sC, f32):
    """The conv as two tap-half matmuls with a one-row shift, all
    operands aligned: frame t = xall[t] @ W1 + xall[t+1] @ W2."""
    h1 = jax.lax.dot_general(xall, w_ref[:sC], (((1,), (0,)), ((), ())),
                             preferred_element_type=f32)
    h2 = jax.lax.dot_general(xall, w_ref[sC:], (((1,), (0,)), ((), ())),
                             preferred_element_type=f32)
    return h1[:-1] + h2[1:]              # (tm, C)


def _fwd_kernel(xm_ref, xh_ref, w_ref, b_ref, nw_ref, nb_ref, o_ref, *,
                eps: float, stride: int):
    f32 = jnp.float32
    C = o_ref.shape[-1]
    xall = _build_xall(xm_ref, xh_ref, stride)
    h = _conv_halves(xall, w_ref, stride * C, f32) + b_ref[:].astype(f32)
    yn, _ = _ln_unbiased_fwd(h, eps, C)
    y = yn * nw_ref[:].astype(f32) + nb_ref[:].astype(f32)
    o_ref[0] = jnp.maximum(y, 0.0).astype(xm_ref.dtype)


def _bwd_kernel(xm_ref, xh_ref, w_ref, b_ref, nw_ref, nb_ref, wt_ref,
                dy_ref,
                dxm_ref, carry_ref, dw1_ref, dw2_ref, db_ref, dnw_ref,
                dnb_ref, *, eps: float, stride: int):
    f32 = jnp.float32
    cdt = xm_ref.dtype
    C = dy_ref.shape[-1]
    sC = stride * C

    # ---- recompute the forward ----
    xall = _build_xall(xm_ref, xh_ref, stride)
    h = _conv_halves(xall, w_ref, sC, f32) + b_ref[:].astype(f32)
    yn, inv = _ln_unbiased_fwd(h, eps, C)
    nw = nw_ref[:].astype(f32)
    pre = yn * nw + nb_ref[:].astype(f32)

    # ---- backward chain ----
    dy = dy_ref[0].astype(f32)
    dyb = jnp.where(pre > 0.0, dy, 0.0)                      # ReLU
    g = dyb * nw                                             # affine
    # ChannelNorm input grad with the ddof=1 variance:
    # dh = inv * (g - mean(g) - yn * (C/(C-1)) * mean(g*yn))
    m1 = jnp.mean(g, axis=-1, keepdims=True)
    m2 = jnp.mean(g * yn, axis=-1, keepdims=True) * (C / (C - 1.0))
    dh = ((g - m1 - yn * m2) * inv).astype(cdt)              # (tm, C)
    # Frame t reads xall rows t (left tap half) and t+1 (right half), so
    # dxall = shift_pad(dh) @ W^T with the shift done on the SMALL (tm+1,
    # C) side to keep every matmul operand aligned.
    zrow = jnp.zeros_like(dh[:1])
    dh_l = jnp.concatenate([dh, zrow], axis=0)               # (tm+1, C)
    dh_r = jnp.concatenate([zrow, dh], axis=0)
    dxall = (
        jax.lax.dot_general(dh_l, wt_ref[:, :sC], (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)
        + jax.lax.dot_general(dh_r, wt_ref[:, sC:], (((1,), (0,)), ((), ())),
                              preferred_element_type=f32)).astype(cdt)
    drows = dxall.reshape(-1, C)         # (tm*s + s, C) natural rows
    dxm_ref[0] = drows[:-stride]
    # carry block is halo-sized; rows [0, s) carry, the rest are zeroed
    # so the epilogue's strided pick stays clean.
    pad_rows = carry_ref.shape[1] - stride
    carry_ref[0] = jnp.concatenate(
        [drows[-stride:], jnp.zeros((pad_rows, C), cdt)], axis=0)

    # ---- parameter-grad accumulators (constant-index blocks, resident
    # across the whole grid; zeroed once, flushed at the end) ----
    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref[:])
        dw2_ref[:] = jnp.zeros_like(dw2_ref[:])
        db_ref[:] = jnp.zeros_like(db_ref[:])
        dnw_ref[:] = jnp.zeros_like(dnw_ref[:])
        dnb_ref[:] = jnp.zeros_like(dnb_ref[:])

    # dW1 = xall[:-1]^T @ dh, dW2 = xall[1:]^T @ dh — via the same
    # aligned padding trick (contract over the tm+1 rows).
    dw1_ref[:] += jax.lax.dot_general(xall, dh_l, (((0,), (0,)), ((), ())),
                                      preferred_element_type=f32)
    dw2_ref[:] += jax.lax.dot_general(xall, dh_r, (((0,), (0,)), ((), ())),
                                      preferred_element_type=f32)
    db_ref[:] += jnp.sum(dh.astype(f32), axis=0, keepdims=True)
    dnw_ref[:] += jnp.sum(dyb * yn, axis=0, keepdims=True)
    dnb_ref[:] += jnp.sum(dyb, axis=0, keepdims=True)


def _pick_tm(out_t: int) -> int:
    """Frames per grid program: largest divisor of out_t that is a
    multiple of 8 and <= 512 (CPC_CONV_TM overrides)."""
    pref = os.environ.get("CPC_CONV_TM")
    if pref is not None:
        tm = int(pref)
        if tm <= out_t and out_t % tm == 0:
            return tm
    best = 0
    for tm in range(8, min(512, out_t) + 1, 8):
        if out_t % tm == 0:
            best = tm
    return best or out_t


def _compiler_params():
    limit = int(float(os.environ.get("CPC_CONV_VMEM_LIMIT", "64e6")))
    return pltpu.CompilerParams(vmem_limit_bytes=limit)


def use_fused_conv() -> bool:
    """OPT-IN (CPC_PALLAS_CONV=1): measured 1.3 ms/step SLOWER than the
    XLA conv path at the bench config (see the module docstring), so the
    default is the XLA path everywhere."""
    return os.environ.get("CPC_PALLAS_CONV", "0") == "1"


def conv_interpret_mode() -> bool:
    return os.environ.get("CPC_PALLAS_CONV_INTERPRET", "0") == "1"


_HALO = 16  # halo block sublanes (Mosaic minimum for <=16-bit dtypes)


def fused_conv_supported(T: int, C: int, kernel: int, stride: int,
                         pad: int) -> bool:
    """kernel == 2*stride (one-block-row halo), lane-aligned s*C, pad
    rows keeping the block view aligned, halo-aligned tiles."""
    if kernel != 2 * stride or pad >= stride or C % 128 != 0:
        return False
    if (stride * C) % 128 != 0:
        return False
    Lpad = T + 2 * pad
    if Lpad % stride != 0:
        return False
    out_t = (Lpad - kernel) // stride + 1
    if out_t != Lpad // stride - 1 or out_t < 8 or out_t % 8 != 0:
        return False
    tm = _pick_tm(out_t)
    if (tm * stride) % _HALO != 0:
        return False
    kC = kernel * C
    vmem = (3 * tm * stride * C * 4      # xm/dxm/xall tiles
            + 6 * tm * C * 4             # h/yn/dh/dy + shifted pair
            + 4 * kC * C * 4             # W + W^T + f32 dW accumulators
            + tm * kC * 4)               # dxall
    limit = float(os.environ.get("CPC_CONV_VMEM_LIMIT", "64e6"))
    cap = float(os.environ.get("CPC_CONV_VMEM_CAP", str(0.8 * limit)))
    return vmem < cap


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def fused_conv_ln_relu(x, w, bias, nw, nb, stride: int, kernel: int,
                       pad: int, eps: float = 1e-5,
                       interpret: bool = False):
    """x: (B, T, C); w: (kernel*C, C) — the Conv1d WIO kernel reshaped
    (tap-major, matching the block-row layout); bias/nw/nb: (C,).
    Returns relu(ChannelNorm(conv(x)) * nw + nb), shape (B, out_t, C)."""
    out, _ = _fc_fwd(x, w, bias, nw, nb, stride, kernel, pad, eps,
                     interpret)
    return out


def _geometry(x, stride, pad):
    B, T, C = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    Lpad = T + 2 * pad
    out_t = Lpad // stride - 1
    tm = _pick_tm(out_t)
    return xp, out_t, tm


def _specs(tm, stride, C, interpret):
    mem = {} if interpret else {"memory_space": pltpu.VMEM}
    rows = tm * stride
    xm = pl.BlockSpec((1, rows, C), lambda b, t: (b, t, 0), **mem)
    # Halo: the s rows after the tile.  Pallas multiplies the index by
    # the block shape, so a _HALO-row block addressed in _HALO-row units
    # lands on row (t+1)*rows whenever rows % _HALO == 0; rows past the
    # array (last tile) read pad garbage that never flows anywhere.
    xh = pl.BlockSpec((1, _HALO, C),
                      lambda b, t: (b, (t * rows + rows) // _HALO, 0), **mem)
    w_s = pl.BlockSpec((2 * stride * C, C), lambda b, t: (0, 0), **mem)
    vec = pl.BlockSpec((1, C), lambda b, t: (0, 0), **mem)
    o_s = pl.BlockSpec((1, tm, C), lambda b, t: (b, t, 0), **mem)
    return xm, xh, w_s, vec, o_s, mem


def _fc_fwd(x, w, bias, nw, nb, stride, kernel, pad, eps, interpret):
    B, T, C = x.shape
    xp, out_t, tm = _geometry(x, stride, pad)
    xm, xh, w_s, vec, o_s, _ = _specs(tm, stride, C, interpret)
    row = lambda v: v.reshape(1, C)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps, stride=stride),
        grid=(B, out_t // tm),
        in_specs=[xm, xh, w_s, vec, vec, vec],
        out_specs=o_s,
        out_shape=jax.ShapeDtypeStruct((B, out_t, C), x.dtype),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(xp, xp, w, row(bias), row(nw), row(nb))
    return out, (x, w, bias, nw, nb)


def _fc_bwd(stride, kernel, pad, eps, interpret, res, dy):
    x, w, bias, nw, nb = res
    B, T, C = x.shape
    sC = stride * C
    xp, out_t, tm = _geometry(x, stride, pad)
    rows = tm * stride
    nt = out_t // tm
    xm, xh, w_s, vec, o_s, mem = _specs(tm, stride, C, interpret)
    wt_s = pl.BlockSpec((C, 2 * sC), lambda b, t: (0, 0), **mem)
    dxm_s = pl.BlockSpec((1, rows, C), lambda b, t: (b, t, 0), **mem)
    carry_s = pl.BlockSpec((1, _HALO, C), lambda b, t: (b, t, 0), **mem)
    accW = pl.BlockSpec((sC, C), lambda b, t: (0, 0), **mem)
    f32 = jnp.float32
    row = lambda v: v.reshape(1, C)
    wt = jnp.swapaxes(w, 0, 1)
    dxm, carries, dw1, dw2, db, dnw, dnb = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, stride=stride),
        grid=(B, nt),
        in_specs=[xm, xh, w_s, vec, vec, vec, wt_s, o_s],
        out_specs=(dxm_s, carry_s, accW, accW, vec, vec, vec),
        out_shape=(jax.ShapeDtypeStruct((B, out_t * stride, C), x.dtype),
                   jax.ShapeDtypeStruct((B, nt * _HALO, C), x.dtype),
                   jax.ShapeDtypeStruct((sC, C), f32),
                   jax.ShapeDtypeStruct((sC, C), f32),
                   jax.ShapeDtypeStruct((1, C), f32),
                   jax.ShapeDtypeStruct((1, C), f32),
                   jax.ShapeDtypeStruct((1, C), f32)),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(xp, xp, w, row(bias), row(nw), row(nb), wt, dy)
    # epilogue: padded rows [(t+1)*rows, (t+1)*rows + s) receive tile t's
    # carry; the final carry lands on the rows no frame starts at.
    dxp = jnp.concatenate(
        [dxm, jnp.zeros((B, stride, C), dxm.dtype)], axis=1)  # (B, Lpad, C)
    idx = ((np.arange(nt) + 1) * rows)[:, None] + np.arange(stride)[None, :]
    carr = carries.reshape(B, nt, _HALO, C)[:, :, :stride]
    dxp = dxp.at[:, idx.reshape(-1)].add(carr.reshape(B, nt * stride, C))
    dx = dxp[:, pad:pad + T] if pad else dxp
    dw = jnp.concatenate([dw1, dw2], axis=0).astype(w.dtype)
    return (dx, dw, db[0].astype(bias.dtype),
            dnw[0].astype(nw.dtype), dnb[0].astype(nb.dtype))


def _fc_fwd_rule(x, w, bias, nw, nb, stride, kernel, pad, eps, interpret):
    return _fc_fwd(x, w, bias, nw, nb, stride, kernel, pad, eps, interpret)


fused_conv_ln_relu.defvjp(_fc_fwd_rule, _fc_bwd)
