"""Autoregressive context networks (GRU / LSTM / RNN / NoAr / BiDIR).

Reference: CPCAR and friends (/root/reference/cpc/model.py:155-268).

TPU-first recurrence design: the input projection for the *whole* window is
computed as one large (B*T, C) x (C, 3H) matmul before the scan (MXU work),
so the ``lax.scan`` body only carries the (B, H) x (H, 3H) recurrent matmul —
the minimum serial work per step.  Gate layouts match torch (GRU: r,z,n;
LSTM: i,f,g,o) so reference checkpoints convert weight-for-weight.

Hidden state is an explicit carry threaded through the functional API —
torch's ``keepHidden`` module state (model.py:193-198) becomes a
``(x, h0) -> (y, hT)`` contract.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Hidden = Any  # layer-stacked hidden: GRU/RNN (L,B,H); LSTM ((L,B,H),(L,B,H))


def _uniform_init(k: float):
    def init(rng, shape):
        return jax.random.uniform(rng, shape, minval=-k, maxval=k)
    return init


def use_pallas_rnn() -> bool:
    """Fused Pallas recurrence on real TPUs; lax.scan elsewhere.
    Override with CPC_PALLAS_RNN=0/1."""
    import os
    flag = os.environ.get("CPC_PALLAS_RNN", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


class _RecurrentLayer(nn.Module):
    """One torch-layout recurrent layer scanned over time."""

    hidden_size: int
    mode: str  # GRU | LSTM | RNN

    @nn.compact
    def __call__(self, x: jax.Array, h0) -> Tuple[jax.Array, Hidden]:
        B, T, C = x.shape
        H = self.hidden_size
        ngates = {"GRU": 3, "LSTM": 4, "RNN": 1}[self.mode]
        k = 1.0 / math.sqrt(H)
        init = _uniform_init(k)
        # Kernels stored TRANSPOSED vs torch ((C, G*H) / (H, G*H)) so the
        # forward matmuls contract last-dim-with-first-dim — 4.4x faster on
        # v5e than x @ w.T (docs/PERFORMANCE.md; inference-path win).
        # convert.py transposes torch checkpoints on load.
        w_ih_t = self.param("weight_ih_t", init, (C, ngates * H))
        w_hh_t = self.param("weight_hh_t", init, (H, ngates * H))
        b_ih = self.param("bias_ih", init, (ngates * H,))
        b_hh = self.param("bias_hh", init, (ngates * H,))

        dtype = x.dtype
        w_ih_t, w_hh_t = w_ih_t.astype(dtype), w_hh_t.astype(dtype)
        b_ih, b_hh = b_ih.astype(dtype), b_hh.astype(dtype)

        # One big MXU matmul for all timesteps.
        x_proj = x.reshape(B * T, C) @ w_ih_t + b_ih
        x_proj = x_proj.reshape(B, T, ngates * H)

        # Fused Pallas recurrence on TPU: one kernel launch for the whole
        # window instead of ~8 dispatched ops per timestep.  Falls back to
        # lax.scan when T has no Mosaic-tileable chunking.
        from ..ops.pallas.rnn import pallas_rnn_supported
        if self.mode in ("GRU", "LSTM") and use_pallas_rnn() \
                and pallas_rnn_supported(T, B, ngates * H, H):
            from ..ops.pallas.rnn import gru_scan_pallas, lstm_scan_pallas
            if self.mode == "LSTM":
                h0, c0 = h0
                ys, hT, cT = lstm_scan_pallas(x_proj + b_hh, w_hh_t, h0, c0)
                return ys, (hT, cT)
            ys, hT = gru_scan_pallas(x_proj, w_hh_t, b_hh, h0)
            return ys, hT

        x_proj = x_proj.swapaxes(0, 1)  # (T, B, G*H)

        if self.mode == "GRU":
            def step(h, xp):
                hp = h @ w_hh_t + b_hh
                xr, xz, xn = jnp.split(xp, 3, axis=-1)
                hr, hz, hn = jnp.split(hp, 3, axis=-1)
                r = jax.nn.sigmoid(xr + hr)
                z = jax.nn.sigmoid(xz + hz)
                n = jnp.tanh(xn + r * hn)
                h_new = (1.0 - z) * n + z * h
                return h_new, h_new
            hT, ys = jax.lax.scan(step, h0, x_proj)
        elif self.mode == "LSTM":
            def step(carry, xp):
                h, c = carry
                hp = h @ w_hh_t + b_hh
                g = xp + hp
                i, f, gg, o = jnp.split(g, 4, axis=-1)
                i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
                c_new = f * c + i * jnp.tanh(gg)
                h_new = o * jnp.tanh(c_new)
                return (h_new, c_new), h_new
            hT, ys = jax.lax.scan(step, h0, x_proj)
        else:  # RNN (tanh)
            def step(h, xp):
                h_new = jnp.tanh(xp + h @ w_hh_t + b_hh)
                return h_new, h_new
            hT, ys = jax.lax.scan(step, h0, x_proj)
        return ys.swapaxes(0, 1), hT  # (B, T, H), final hidden


class CPCAR(nn.Module):
    """Multi-layer recurrent context network (model.py:155-204).

    ``__call__(x, hidden)`` returns ``(context, new_hidden)``; pass
    ``hidden=None`` for a zero initial state.  ``reverse`` flips time before
    and after (model.py:187-203) for the 'reverse' CPC mode.
    """

    dim_output: int
    num_layers: int = 1
    mode: str = "GRU"
    reverse: bool = False

    def zero_state(self, batch: int, dtype=jnp.float32) -> Hidden:
        shape = (self.num_layers, batch, self.dim_output)
        if self.mode == "LSTM":
            return (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
        return jnp.zeros(shape, dtype)

    @nn.compact
    def __call__(self, x: jax.Array,
                 hidden: Optional[Hidden] = None,
                 train: bool = False) -> Tuple[jax.Array, Hidden]:
        B = x.shape[0]
        if hidden is None:
            hidden = self.zero_state(B, x.dtype)
        if self.reverse:
            x = jnp.flip(x, axis=1)
        new_hidden = []
        y = x
        for layer in range(self.num_layers):
            if self.mode == "LSTM":
                h0 = (hidden[0][layer], hidden[1][layer])
            else:
                h0 = hidden[layer]
            y, hT = _RecurrentLayer(self.dim_output, self.mode,
                                    name=f"layer{layer}")(y, h0)
            new_hidden.append(hT)
        if self.mode == "LSTM":
            out_hidden = (jnp.stack([h for h, _ in new_hidden]),
                          jnp.stack([c for _, c in new_hidden]))
        else:
            out_hidden = jnp.stack(new_hidden)
        if self.reverse:
            y = jnp.flip(y, axis=1)
        # Reference detaches carried hidden (model.py:196-198).
        out_hidden = jax.tree_util.tree_map(jax.lax.stop_gradient, out_hidden)
        return y, out_hidden


class NoAr(nn.Module):
    """Identity AR (model.py:207-213)."""

    dim_output: int = 0

    @nn.compact
    def __call__(self, x, hidden=None, train: bool = False):
        return x, hidden


class BiDIRARTangled(nn.Module):
    """True bidirectional GRU, torch ``nn.GRU(bidirectional=True)``
    semantics (model.py:216-239): at every layer the forward and backward
    directions each consume the CONCATENATED two-direction output of the
    previous layer (interleaved, not two independent stacks — that is
    BiDIRAR)."""

    dim_output: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, x, hidden=None, train: bool = False):
        assert self.dim_output % 2 == 0
        H = self.dim_output // 2
        B = x.shape[0]
        y = x
        for layer in range(self.num_layers):
            h0 = jnp.zeros((B, H), y.dtype)
            yf, _ = _RecurrentLayer(H, "GRU",
                                    name=f"layer{layer}_fwd")(y, h0)
            yb, _ = _RecurrentLayer(H, "GRU", name=f"layer{layer}_bwd")(
                jnp.flip(y, axis=1), h0)
            y = jnp.concatenate([yf, jnp.flip(yb, axis=1)], axis=2)
        return y, None


class BiDIRAR(nn.Module):
    """Bidirectional GRU as two independent multi-layer stacks
    (model.py:242-268): netForward reads x, netBackward reads flipped x,
    outputs concatenate only at the end."""

    dim_output: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, x, hidden=None, train: bool = False):
        assert self.dim_output % 2 == 0
        H = self.dim_output // 2
        yf, _ = CPCAR(H, self.num_layers, "GRU", name="netForward")(x)
        yb, _ = CPCAR(H, self.num_layers, "GRU", name="netBackward")(
            jnp.flip(x, axis=1))
        return jnp.concatenate([yf, jnp.flip(yb, axis=1)], axis=2), None
