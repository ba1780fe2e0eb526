"""Multi-step prediction network for InfoNCE.

Reference: PredictionNetwork (/root/reference/cpc/criterion/criterion.py:44-118)
builds ``nPredicts`` *separate* head modules and loops over them.

TPU-first design: all K heads are a single lifted module vmapped over a head
axis (``nn.vmap`` with ``variable_axes={'params': 0}``), so the K per-head
matmuls run as ONE batched (K*B*W, C) x (C, C') MXU contraction instead of K
sequential kernel launches.  Output is the stacked (K, B, W, dimEnc)
prediction tensor; scoring happens in the criterion.

Deviation (documented): the reference's 'RNN' head builds ``nn.RNN`` without
``batch_first`` (criterion.py:62-63), silently treating the batch axis as
time; here RNN heads are batch-first like the LSTM heads.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.ar import _RecurrentLayer
from ..models.transformer import TransformerLayer
from .custom_layers import EqualizedConv1d, EqualizedDense

VALID_HEADS = ("transformer", "RNN", "LSTM", "linear", "ffd",
               "conv4", "conv8", "conv12")


def _use_stacked_heads() -> bool:
    import os
    return os.environ.get("CPC_STACKED_HEADS", "1") != "0"


class _LinearHead(nn.Module):
    """Plain linear head with the residual-style init for dimEnc > dimAR
    (criterion.py:90-95)."""

    dim_output_encoder: int
    residual_std: float = 0.01

    @nn.compact
    def __call__(self, c: jax.Array, train: bool = False) -> jax.Array:
        dim_ar = c.shape[-1]
        dout = self.dim_output_encoder

        def w_init(rng, shape):
            # (in, out) layout (transpose of the torch weight; convert.py
            # handles checkpoints).  Residual-style init for dout > din
            # (criterion.py:90-95).
            if dout > dim_ar:
                k1, k2 = jax.random.split(rng)
                top = jax.random.normal(k1, (dim_ar, dim_ar))
                bot = self.residual_std * jax.random.normal(
                    k2, (dim_ar, dout - dim_ar))
                return jnp.concatenate([top, bot], axis=1)
            k = 1.0 / jnp.sqrt(jnp.asarray(float(dim_ar)))
            return jax.random.uniform(rng, shape, minval=-k, maxval=k)

        w = self.param("kernel", w_init, (dim_ar, dout))
        return c @ w.astype(c.dtype)


class _FFDHead(nn.Module):
    """Equalized 2-layer MLP head (criterion.py:11-20,69-72)."""

    dim_output_encoder: int

    @nn.compact
    def __call__(self, c: jax.Array, train: bool = False) -> jax.Array:
        h = EqualizedDense(self.dim_output_encoder, name="lin1")(c)
        return EqualizedDense(self.dim_output_encoder, name="lin2")(nn.relu(h))


class _ShiftedConvHead(nn.Module):
    """Causal (left-padded) equalized conv head (criterion.py:23-41)."""

    dim_output_encoder: int
    kernel_size: int

    @nn.compact
    def __call__(self, c: jax.Array, train: bool = False) -> jax.Array:
        pad = jnp.zeros((c.shape[0], self.kernel_size - 1, c.shape[2]),
                        c.dtype)
        x = jnp.concatenate([pad, c], axis=1)
        return EqualizedConv1d(self.dim_output_encoder, self.kernel_size,
                               name="module")(x)


class _RecurrentHead(nn.Module):
    """Single-layer GRU-free recurrent head (criterion.py:61-68)."""

    dim_output_encoder: int
    mode: str  # RNN | LSTM

    @nn.compact
    def __call__(self, c: jax.Array, train: bool = False) -> jax.Array:
        B = c.shape[0]
        H = self.dim_output_encoder
        if self.mode == "LSTM":
            h0 = (jnp.zeros((B, H), c.dtype), jnp.zeros((B, H), c.dtype))
        else:
            h0 = jnp.zeros((B, H), c.dtype)
        y, _ = _RecurrentLayer(H, self.mode, name="cell")(c, h0)
        return y


class _TransformerHead(nn.Module):
    """1-layer causal transformer head (criterion.py:82-88), relpos on."""

    dim_output_encoder: int
    size_seq: int

    @nn.compact
    def __call__(self, c: jax.Array, train: bool = False) -> jax.Array:
        return TransformerLayer(self.size_seq, self.dim_output_encoder,
                                abspos=False, name="layer0")(c, train)


def _make_head(rnn_mode: str, dim_output_encoder: int, size_seq: int):
    if rnn_mode == "transformer":
        return _TransformerHead, dict(dim_output_encoder=dim_output_encoder,
                                      size_seq=size_seq)
    if rnn_mode in ("RNN", "LSTM"):
        return _RecurrentHead, dict(dim_output_encoder=dim_output_encoder,
                                    mode=rnn_mode)
    if rnn_mode == "ffd":
        return _FFDHead, dict(dim_output_encoder=dim_output_encoder)
    if rnn_mode and rnn_mode.startswith("conv"):
        return _ShiftedConvHead, dict(dim_output_encoder=dim_output_encoder,
                                      kernel_size=int(rnn_mode[4:]))
    return _LinearHead, dict(dim_output_encoder=dim_output_encoder)


class PredictionNetwork(nn.Module):
    """K stacked prediction heads -> (K, B, W, dimEnc) in one vmapped pass."""

    n_predicts: int
    dim_output_encoder: int
    rnn_mode: Optional[str] = "transformer"
    dropout: bool = False
    size_input_seq: int = 116

    @nn.compact
    def __call__(self, c: jax.Array, train: bool = False) -> jax.Array:
        if self.rnn_mode == "transformer" and _use_stacked_heads():
            # merged-matmul implementation, identical param tree
            # (stacked_heads.py; CPC_STACKED_HEADS=0 restores nn.vmap)
            from .stacked_heads import StackedTransformerHeads
            preds = StackedTransformerHeads(
                self.n_predicts, self.dim_output_encoder,
                self.size_input_seq, name="heads")(c, train)
        else:
            head_cls, kwargs = _make_head(self.rnn_mode,
                                          self.dim_output_encoder,
                                          self.size_input_seq)
            Stacked = nn.vmap(
                head_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(None, None),
                out_axes=0,
                axis_size=self.n_predicts,
            )
            preds = Stacked(name="heads", **kwargs)(c, train)  # (K,B,W,C')
        if self.dropout:
            preds = nn.Dropout(0.5, deterministic=not train)(preds)
        return preds
