"""Causal transformer (AR network and default prediction head).

Reference: /root/reference/cpc/transformers.py:10-139.

TPU-first notes: the causal mask and Shaw-style relative-position skew are
static-shape jnp expressions that XLA folds into the attention fusion; heads
are kept as a separate axis (B, h, S, dk) instead of the reference's
batch-folding so the QK/AV contractions hit the MXU at full tile width.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _torch_linear_init(fan_in: int):
    k = 1.0 / math.sqrt(fan_in)
    def init(rng, shape):
        return jax.random.uniform(rng, shape, minval=-k, maxval=k)
    return init


class Dense(nn.Module):
    """Linear layer, torch init, (in, out) kernel layout.

    The kernel is stored TRANSPOSED relative to torch's (out, in) weight:
    the forward contraction (x's last dim with the kernel's FIRST dim)
    measured 4.4x faster on v5e than x @ w.T (docs/PERFORMANCE.md) — a pure
    win for inference/feature extraction; training is neutral since the
    backward necessarily contains the opposite orientation.  The transpose
    lives in convert.py, not in the compute path.
    """

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fan_in = x.shape[-1]
        init = _torch_linear_init(fan_in)
        w = self.param("kernel", init, (fan_in, self.features))
        y = x @ w.astype(x.dtype)
        if self.use_bias:
            b = self.param("bias", init, (self.features,))
            y = y + b.astype(x.dtype)
        return y


class MultiHeadAttention(nn.Module):
    """Causal MHA with optional Shaw relative positions (transformers.py:10-83)."""

    size_seq: int
    dmodel: int
    nheads: int = 8
    dropout: float = 0.1
    relpos: bool = False  # reference: relpos = not abspos

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        B, S, _ = x.shape
        h, dk = self.nheads, self.dmodel // self.nheads
        q = Dense(self.dmodel, use_bias=False, name="Wq")(x)
        k = Dense(self.dmodel, use_bias=False, name="Wk")(x)
        v = Dense(self.dmodel, use_bias=False, name="Wv")(x)

        def split_heads(t):
            return t.reshape(B, S, h, dk).transpose(0, 2, 1, 3)  # (B,h,S,dk)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)

        bias = None
        if self.relpos:
            # Shaw-style relative positions with the zero-pad/reshape skew
            # (transformers.py:23-26, 42-47).  NOTE: do NOT "optimize" this
            # into a take_along_axis gather — XLA lowers large-index gathers
            # on TPU catastrophically (measured 13x whole-step regression);
            # the pad+reshape skew is pure layout work and nearly free.
            krel = self.param(
                "Krelpos",
                _torch_linear_init(dk),
                (dk, self.size_seq),
            ).astype(q.dtype)
            # compute-dtype einsum: the MXU accumulates in f32 internally;
            # an f32 preferred_element_type would force the backward's
            # dKrelpos/dq matmuls into f32 (docs/PERFORMANCE.md round-2).
            qp = jnp.einsum("bhqd,dr->bhqr", q, krel)
            z = jnp.zeros((B, h, S, 1), qp.dtype)
            qp = jnp.concatenate([z, qp], axis=3)          # (B,h,S,S+1)
            bias = qp.reshape(B, h, S + 1, S)[:, :, 1:, :]  # skew ->(B,h,S,S)

        from ..ops.pallas.attention import (fused_attention_supported,
                                            interpret_mode,
                                            use_fused_attention)
        if use_fused_attention() and fused_attention_supported(S, dk, B * h):
            from ..ops.pallas.attention import fused_causal_attention
            rate = self.dropout if train else 0.0
            seed = jnp.zeros((1,), jnp.float32)
            if rate > 0.0:
                # fold the flax dropout stream into a per-call kernel seed
                # (statistically equivalent dropout; documented deviation)
                rng = self.make_rng("dropout")
                bits = jax.random.key_data(rng) \
                    if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key) else rng
                seed = (jnp.asarray(bits).reshape(-1)[-1:]
                        % jnp.uint32(2 ** 30)).astype(jnp.float32)
            if bias is None:
                bias = jnp.zeros((B, h, S, S), q.dtype)
            y = fused_causal_attention(
                q.reshape(B * h, S, dk), k.reshape(B * h, S, dk),
                v.reshape(B * h, S, dk),
                bias.astype(q.dtype).reshape(B * h, S, S), seed, rate,
                interpret_mode())
            y = y.reshape(B, h, S, dk)
        else:
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", q, k,
                preferred_element_type=jnp.promote_types(q.dtype,
                                                         jnp.float32))
            if bias is not None:
                logits = logits + bias
            mask = jnp.tril(jnp.ones((S, S), bool))
            logits = logits / math.sqrt(dk)
            logits = jnp.where(mask, logits, -jnp.inf)
            attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
            y = jnp.einsum("bhqk,bhkd->bhqd", attn, v).astype(x.dtype)
        y = y.transpose(0, 2, 1, 3).reshape(B, S, self.dmodel)
        return Dense(self.dmodel, use_bias=False, name="Wo")(y)


class FFNetwork(nn.Module):
    """Two-layer ReLU MLP (transformers.py:86-95)."""

    dout: int
    dff: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = nn.relu(Dense(self.dff, name="lin1")(x))
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return Dense(self.dout, name="lin2")(y)


class LayerNorm(nn.Module):
    """Post-LN layer norm with torch naming."""

    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        w = self.param("weight", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return y * w.astype(x.dtype) + b.astype(x.dtype)


class TransformerLayer(nn.Module):
    """Post-LN block: LN(x+MHA), LN(y+FF) (transformers.py:98-111)."""

    size_seq: int
    dmodel: int
    dff: int = 2048
    dropout: float = 0.1
    nheads: int = 8
    abspos: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        att = MultiHeadAttention(self.size_seq, self.dmodel, self.nheads,
                                 self.dropout, relpos=not self.abspos,
                                 name="multihead")(x, train)
        y = LayerNorm(self.dmodel, name="ln_multihead")(x + att)
        ff = FFNetwork(self.dmodel, self.dff, self.dropout,
                       name="ffnetwork")(y, train)
        return LayerNorm(self.dmodel, name="ln_ffnetwork")(y + ff)


def sinusoidal_positions(seqlen: int, dmodel: int) -> np.ndarray:
    """StaticPositionEmbedding table (transformers.py:114-123)."""
    pos = np.arange(seqlen, dtype=np.float64)[:, None] * np.ones((1, dmodel))
    dim = np.arange(dmodel, dtype=np.float64)[None, :] * np.ones((seqlen, 1))
    div = np.exp(-math.log(10000.0) * (2 * (dim // 2) / dmodel))
    pos = pos * div
    pos[:, 0::2] = np.sin(pos[:, 0::2])
    pos[:, 1::2] = np.cos(pos[:, 1::2])
    return pos.astype(np.float32)


class TransformerAR(nn.Module):
    """Stack of causal transformer layers (buildTransformerAR,
    transformers.py:129-139).  Keeps the ``(x, hidden) -> (y, hidden)`` AR
    contract; hidden is unused.
    """

    dim_encoded: int
    n_layers: int
    size_seq: int
    abspos: bool = False
    keep_hidden: bool = False  # unused; API parity

    @property
    def dim_output(self) -> int:
        return self.dim_encoded

    @nn.compact
    def __call__(self, x: jax.Array, hidden=None, train: bool = False):
        if self.abspos:
            pe = jnp.asarray(sinusoidal_positions(self.size_seq,
                                                  self.dim_encoded))
            x = x + pe[None, :x.shape[1], :].astype(x.dtype)
        for i in range(self.n_layers):
            x = TransformerLayer(self.size_seq, self.dim_encoded,
                                 abspos=self.abspos,
                                 name=f"layer{i}")(x, train)
        return x, hidden
