"""K-stacked transformer prediction heads with merged-matmul compute.

The nn.vmap'd TransformerLayer heads (prediction.py) are mathematically
K independent layers applied to the SAME context input c.  Under vmap,
XLA lowers the projections and FFN as 12-way batched matmuls over
awkward (K,B,W,C) layouts that measured ~10-15%% MXU efficiency on v5e
(docs/PERFORMANCE.md).  This module holds the IDENTICAL parameter tree
(heads/layer0/...; converter and checkpoints untouched) but computes:

  * Q/K/V for all K heads as ONE (B*W, C) x (C, 3*K*C) matmul — the
    shared input makes the per-head projections (and their weight
    gradients, (C, B*W) x (B*W, 3*K*C)) a single full-width MXU op;
  * attention through the fused Pallas kernel (ops/pallas/attention.py)
    over all K*B*h rows at once;
  * Wo / FFN as K-batched matmuls over merged (K, B*W, C) shapes.

Reference semantics covered: PredictionNetwork with transformer heads
(criterion.py:82-88) == buildTransformerAR 1-layer causal transformer
with Shaw rel-pos (transformers.py:98-111).
"""

from __future__ import annotations

import functools
import math
from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.transformer import _torch_linear_init


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _relu_dropout(h, bits, keep: float):
    """relu + dropout with a sign-recoverable backward.

    y = 1[bits < t] * relu(h) / keep, so y > 0 iff (kept AND h > 0) —
    the backward mask is recoverable from y alone: dL/dh = dy * 1[y>0] /
    keep.  Saving y (which flows forward anyway) as the ONLY residual
    removes the mask/bits round-trip XLA otherwise stores for the
    backward (~0.6 ms/step of u16 traffic at the bench config).

    The EFFECTIVE keep probability is quantized to the bit width of
    ``bits`` (u8: within 2^-8 of ``keep``); the 1/keep rescale uses the
    nominal value, matching flax's convention of rescaling by the
    requested rate rather than the realized one."""
    nbits = jnp.iinfo(bits.dtype).bits
    # Clamp to the dtype max: keep >= 1 - 2^-nbits rounds to 2^nbits,
    # which overflows the dtype at trace time.  The clamped threshold
    # keeps (2^nbits - 1)/2^nbits of units — the closest representable
    # keep probability below 1 for the given bit width.
    thresh = jnp.asarray(
        min(int(round(keep * (1 << nbits))), (1 << nbits) - 1), bits.dtype)
    mask = (bits < thresh).astype(h.dtype)
    return jnp.maximum(h, 0) * (mask * jnp.asarray(1.0 / keep, h.dtype))


def _relu_dropout_fwd(h, bits, keep):
    y = _relu_dropout(h, bits, keep)
    return y, y


def _relu_dropout_bwd(keep, y, dy):
    dh = dy * ((y > 0).astype(dy.dtype)
               * jnp.asarray(1.0 / keep, dy.dtype))
    return dh, None


_relu_dropout.defvjp(_relu_dropout_fwd, _relu_dropout_bwd)


class _Kernel(nn.Module):
    """Parameter holder producing the same scope/name as a vmapped Dense."""

    shape: Tuple[int, ...]
    init: Callable

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param("kernel", self.init, self.shape)


class _StackedMHA(nn.Module):
    """Params mirror nn.vmap(MultiHeadAttention); returns (K,B,S,D)."""

    n_predicts: int
    dmodel: int
    size_seq: int
    nheads: int = 8
    dropout: float = 0.1
    # True: return c + attention (the residual add rides inside the
    # whole-block Pallas kernel when it engages; added here otherwise).
    include_residual: bool = False

    @nn.compact
    def __call__(self, c: jax.Array, train: bool = False) -> jax.Array:
        K, D, S = self.n_predicts, self.dmodel, c.shape[1]
        B = c.shape[0]
        h, dk = self.nheads, D // self.nheads
        init = _torch_linear_init(D)
        wq = _Kernel((K, D, D), init, name="Wq")()
        wk = _Kernel((K, D, D), init, name="Wk")()
        wv = _Kernel((K, D, D), init, name="Wv")()
        wo = _Kernel((K, D, D), init, name="Wo")()
        krel = self.param("Krelpos", _torch_linear_init(dk),
                          (K, dk, self.size_seq))
        # When the caller pre-padded the sequence beyond size_seq (the
        # Pallas-tile padding in StackedTransformerHeads), extend Krelpos
        # with zeros on the LEFT: the skew reads relative position
        # r = j - i + S - 1, so a left pad of (S - size_seq) keeps
        # bias[i, j] = q . krel[:, j - i + size_seq - 1] for every valid
        # pair and contributes exactly 0 for the (unreachable) longer
        # distances — bit-equal to the unpadded module on the real rows.
        if S > self.size_seq:
            krel = jnp.pad(krel, ((0, 0), (0, 0), (S - self.size_seq, 0)))
        elif S < self.size_seq:
            krel = krel[:, :, :S]

        from ..ops.pallas.attention import (_padded_len, interpret_mode,
                                            use_fused_attention)
        from ..ops.pallas.head_attention import (attention_block_supported,
                                                 fused_attention_block,
                                                 fused_relpos_attention,
                                                 relpos_attention_supported)
        rate = self.dropout if train else 0.0
        Sp = _padded_len(S)
        if self.include_residual and use_fused_attention() \
                and attention_block_supported(Sp, dk, h, B, K):
            # Whole-block path: q/k/v projections, rel-pos attention, Wo
            # and the residual add all inside ONE Pallas kernel
            # (head_attention.py fused_attention_block) — no (K, M, D)
            # q/k/v/y intermediates in HBM in either direction.  Tile
            # padding confined here exactly like the gen-3 path below.
            if Sp != S:
                cp = jnp.pad(c, ((0, 0), (0, Sp - S), (0, 0)))
                krel = jnp.pad(krel, ((0, 0), (0, 0), (Sp - S, 0)))
            else:
                cp = c
            seed = jnp.zeros((1,), jnp.float32)
            if rate > 0.0:
                rng = self.make_rng("dropout")
                bits = jax.random.key_data(rng) \
                    if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key) else rng
                seed = (jnp.asarray(bits).reshape(-1)[-1:]
                        % jnp.uint32(2 ** 30)).astype(jnp.float32)
            cdt = c.dtype
            x = fused_attention_block(
                cp.reshape(B * Sp, D), wq.astype(cdt), wk.astype(cdt),
                wv.astype(cdt), wo.astype(cdt), krel.astype(cdt), seed,
                B, h, rate, interpret_mode())
            x = x.reshape(K, B, Sp, D)
            if Sp != S:
                x = x[:, :, :S]
            return x.astype(cdt)
        if use_fused_attention() and relpos_attention_supported(Sp, dk, h, B):
            # Natural-layout path: q/k/v as (K, B*Sp, D) straight out of
            # the K-batched projections; skew bias, mask, softmax, dropout
            # and AV all inside ONE Pallas kernel (head_attention.py).  No
            # (3,K,B,h,S,dk) transposes, no (K,B,h,S,S) bias tensor.
            # The Pallas tile padding (S -> Sp) is confined HERE: one pad
            # of c and one slice of the attention output, so Wo, the
            # residual/LN and the FFN all run at the true S (~9% of their
            # rows at the bench config).  Causality keeps padded rows out
            # of valid rows' attention; krel was left-padded above.
            if Sp != S:
                cp = jnp.pad(c, ((0, 0), (0, Sp - S), (0, 0)))
                krel = jnp.pad(krel, ((0, 0), (0, 0), (Sp - S, 0)))
            else:
                cp = c
            c2 = cp.reshape(B * Sp, D)
            q = jnp.einsum("md,kdo->kmo", c2, wq.astype(c.dtype))
            k = jnp.einsum("md,kdo->kmo", c2, wk.astype(c.dtype))
            v = jnp.einsum("md,kdo->kmo", c2, wv.astype(c.dtype))
            seed = jnp.zeros((1,), jnp.float32)
            if rate > 0.0:
                rng = self.make_rng("dropout")
                bits = jax.random.key_data(rng) \
                    if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key) else rng
                seed = (jnp.asarray(bits).reshape(-1)[-1:]
                        % jnp.uint32(2 ** 30)).astype(jnp.float32)
            y = fused_relpos_attention(q, k, v, krel.astype(c.dtype), seed,
                                       B, h, rate, interpret_mode())
            if Sp != S:
                y = y.reshape(K, B, Sp, D)[:, :, :S].reshape(K, B * S, D)
        else:
            # Fallback (CPU tests, lane-padded S): merged qkv projection +
            # the reference's zero-pad/reshape skew
            # (transformers.py:23-26,42-47), attention through the
            # bias-input Pallas kernel when it applies, plain XLA softmax
            # otherwise.
            from ..ops.pallas.attention import (fused_attention_supported,
                                                fused_causal_attention)
            w_all = jnp.concatenate([wq, wk, wv], axis=0)       # (3K, D, D)
            w_all = w_all.transpose(1, 0, 2).reshape(D, 3 * K * D)
            c2 = c.reshape(B * S, D)
            qkv = (c2 @ w_all.astype(c.dtype)).reshape(B, S, 3, K, h, dk)
            qkv = qkv.transpose(2, 3, 0, 4, 1, 5)               # (3,K,B,h,S,dk)
            q, k, v = qkv[0], qkv[1], qkv[2]
            # compute-dtype einsum: bf16 cotangents in the backward
            # (docs/PERFORMANCE.md round 2)
            qp = jnp.einsum("kbhsd,kdr->kbhsr", q, krel.astype(q.dtype))
            z = jnp.zeros((K, B, h, S, 1), qp.dtype)
            qp = jnp.concatenate([z, qp], axis=4)
            bias = qp.reshape(K, B, h, S + 1, S)[:, :, :, 1:, :]  # (K,B,h,S,S)
            if use_fused_attention() and fused_attention_supported(
                    S, dk, K * B * h):
                seed = jnp.zeros((1,), jnp.float32)
                if rate > 0.0:
                    rng = self.make_rng("dropout")
                    bits = jax.random.key_data(rng) \
                        if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key) \
                        else rng
                    seed = (jnp.asarray(bits).reshape(-1)[-1:]
                            % jnp.uint32(2 ** 30)).astype(jnp.float32)
                y = fused_causal_attention(
                    q.reshape(K * B * h, S, dk),
                    k.reshape(K * B * h, S, dk),
                    v.reshape(K * B * h, S, dk),
                    bias.astype(q.dtype).reshape(K * B * h, S, S), seed,
                    rate, interpret_mode())
                y = y.reshape(K, B, h, S, dk)
            else:
                logits = jnp.einsum(
                    "kbhqd,kbhxd->kbhqx", q, k,
                    preferred_element_type=jnp.promote_types(q.dtype,
                                                             jnp.float32))
                logits = (logits + bias) / math.sqrt(dk)
                mask = jnp.tril(jnp.ones((S, S), bool))
                logits = jnp.where(mask, logits, -jnp.inf)
                attn = jax.nn.softmax(logits, axis=-1).astype(c.dtype)
                attn = nn.Dropout(self.dropout,
                                  deterministic=not train)(attn)
                y = jnp.einsum("kbhqx,kbhxd->kbhqd", attn, v).astype(c.dtype)
            y = y.transpose(0, 1, 3, 2, 4).reshape(K, B * S, D)  # (K,M,D)

        out = jnp.einsum("kmd,kdo->kmo", y, wo.astype(y.dtype))
        out = out.reshape(K, B, S, D).astype(c.dtype)
        if self.include_residual:
            out = out + c[None]
        return out


class _StackedLN(nn.Module):
    """Params mirror nn.vmap(LayerNorm): weight/bias (K, D).  Called with
    ``x=None`` it only declares and returns the params (the fused-tail
    path applies the math inside the Pallas kernel)."""

    n_predicts: int
    dmodel: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Optional[jax.Array] = None):
        w = self.param("weight", nn.initializers.ones,
                       (self.n_predicts, self.dmodel))
        b = self.param("bias", nn.initializers.zeros,
                       (self.n_predicts, self.dmodel))
        if x is None:
            return w, b
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        shape = (self.n_predicts,) + (1,) * (x.ndim - 2) + (self.dmodel,)
        return y * w.reshape(shape).astype(x.dtype) \
            + b.reshape(shape).astype(x.dtype)


class _StackedFFN(nn.Module):
    """Params mirror nn.vmap(FFNetwork); batched (K, M, D) matmuls."""

    n_predicts: int
    dmodel: int
    dff: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: Optional[jax.Array] = None,
                 train: bool = False):
        K, D, F = self.n_predicts, self.dmodel, self.dff
        i1, i2 = _torch_linear_init(D), _torch_linear_init(F)

        class _Lin(nn.Module):
            shape: Tuple[int, ...]
            init: Callable

            @nn.compact
            def __call__(self):
                w = self.param("kernel", self.init, self.shape)
                b = self.param("bias", self.init, self.shape[::2])
                return w, b

        w1, b1 = _Lin((K, D, F), i1, name="lin1")()
        w2, b2 = _Lin((K, F, D), i2, name="lin2")()
        if x is None:
            return w1, b1, w2, b2
        _, B, S, _ = x.shape
        m = x.reshape(K, B * S, D)
        # compute-dtype einsums: f32 accumulation happens inside the MXU;
        # emitting f32 here would force the whole FFN backward (dW1/dW2/dx)
        # into f32 matmuls (docs/PERFORMANCE.md, round-2 A/B).
        h = jnp.einsum("kmd,kdf->kmf", m, w1.astype(x.dtype))
        h = h + b1[:, None, :].astype(x.dtype)
        if train and self.dropout > 0.0:
            # u8-threshold dropout fused with relu via a sign-recoverable
            # custom VJP (_relu_dropout): nn.Dropout's bernoulli draws a
            # u32 per element (a 400 MB rng-bit-generator tensor at the
            # bench config, ~1.3 ms/step with its compare fusion — device
            # trace, docs/PERFORMANCE.md); u8 bits quarter the RNG tensor
            # (keep probability 230/256 = 0.8984 vs 0.9 — well inside the
            # noise dropout injects by design) and the backward needs
            # neither bits nor a stored mask.
            keep = 1.0 - self.dropout
            bits = jax.random.bits(self.make_rng("dropout"), h.shape,
                                   jnp.uint8)
            h = _relu_dropout(h, bits, keep)
        else:
            h = nn.relu(h)
        y = jnp.einsum("kmf,kfd->kmd", h, w2.astype(x.dtype))
        y = y + b2[:, None, :].astype(x.dtype)
        return y.reshape(K, B, S, D)


class _Layer0(nn.Module):
    n_predicts: int
    dmodel: int
    size_seq: int
    nheads: int = 8
    dff: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, c: jax.Array, train: bool = False) -> jax.Array:
        # include_residual: x = c + attention comes back in one piece (the
        # whole-block Pallas kernel carries the residual add in-kernel).
        x = _StackedMHA(self.n_predicts, self.dmodel, self.size_seq,
                        self.nheads, self.dropout, include_residual=True,
                        name="multihead")(c, train)           # (K,B,S,D)
        ln1 = _StackedLN(self.n_predicts, self.dmodel, name="ln_multihead")
        ffn = _StackedFFN(self.n_predicts, self.dmodel, self.dff,
                          self.dropout, name="ffnetwork")
        ln2 = _StackedLN(self.n_predicts, self.dmodel, name="ln_ffnetwork")

        from ..ops.pallas.ffn import (ffn_interpret_mode, fused_layer_tail,
                                      fused_tail_supported, use_fused_ffn)
        K, B, S, D = x.shape
        rate = self.dropout if train else 0.0
        if use_fused_ffn() and fused_tail_supported(B * S, D, self.dff):
            # LN1 -> FFN -> residual -> LN2 as ONE Pallas kernel: the
            # (K*B*S, dff) hidden and the dropout bits never touch HBM,
            # and the backward recomputes the tail from x alone
            # (ops/pallas/ffn.py).  Identical param tree; in-kernel LN
            # stats are f32 (vs compute-dtype here), in-kernel dropout is
            # the TPU core PRNG stream (statistically equivalent — same
            # deviation as the attention kernels, docs/DESIGN.md).
            lw1, lb1 = ln1()
            w1, b1, w2, b2 = ffn()
            lw2, lb2 = ln2()
            seed = jnp.zeros((1,), jnp.float32)
            if rate > 0.0:
                rng = self.make_rng("dropout")
                bits = jax.random.key_data(rng) \
                    if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key) else rng
                seed = (jnp.asarray(bits).reshape(-1)[-1:]
                        % jnp.uint32(2 ** 30)).astype(jnp.float32)
            out = fused_layer_tail(
                x.reshape(K, B * S, D), lw1, lb1,
                w1.astype(x.dtype), b1, w2.astype(x.dtype), b2,
                lw2, lb2, seed, rate, 1e-5, ffn_interpret_mode())
            return out.reshape(K, B, S, D)
        y = ln1(x)
        ff = ffn(y, train)
        return ln2(y + ff)


class StackedTransformerHeads(nn.Module):
    """All K transformer prediction heads in one pass; the parameter tree
    is identical to nn.vmap(_TransformerHead) (same scopes/names/shapes),
    so converted checkpoints and the existing vmapped path interchange."""

    n_predicts: int
    dmodel: int
    size_seq: int
    nheads: int = 8
    dff: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, c: jax.Array, train: bool = False) -> jax.Array:
        # The Pallas attention tile padding lives inside _StackedMHA (one
        # pad of c, one slice of the attention output); Wo, residual/LN
        # and the FFN all run at the true sequence length.  Earlier
        # designs that padded per-op around the kernel (~5 ms/step of
        # layout ops) or ran the whole stack padded (~9% wasted FFN/LN
        # rows) are both documented in docs/PERFORMANCE.md.
        return _Layer0(self.n_predicts, self.dmodel, self.size_seq,
                       self.nheads, self.dff, self.dropout,
                       name="layer0")(c, train)
