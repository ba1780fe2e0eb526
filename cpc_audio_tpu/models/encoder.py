"""Waveform encoders.

TPU-first design: channels-last (B, T, C) activations, convs through
``lax.conv_general_dilated`` with ``('NWC','WIO','NWC')`` dimension numbers so
XLA lowers them straight onto the MXU, and the whole 5-layer stack fuses with
its norms/ReLUs in one compilation.

Reference behavior being reproduced: CPCEncoder 5-layer strided Conv1d stack
(/root/reference/cpc/model.py:61-105), MFCCEncoder (model.py:108-122),
LFBEnconder (model.py:125-152).
"""

from __future__ import annotations

import math
import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .norms import make_norm_layer

# The canonical CPC conv stack (model.py:83-93): 160x downsampling.
CONV_KERNELS = (10, 8, 4, 4, 4)
CONV_STRIDES = (5, 4, 2, 2, 2)
CONV_PADS = (3, 2, 1, 1, 1)
DOWNSAMPLING = 160  # model.py:94


def use_conv_dots() -> bool:
    """kernel==2*stride convs as two row-major matmuls (see Conv1d).

    OPT-IN (CPC_CONV_DOTS=1) — a measured NEGATIVE result on v5e
    (18.19 vs 16.98 ms full-step device trace, docs/PERFORMANCE.md
    round 3).  The motivation was real: XLA's conv emitter forces
    {2,0,1} activation layouts that cost ~0.4 ms/step of copies against
    the row-major norm/relu/AR neighbors.  But under TPU *tiled*
    layouts the (B,T,C)->(B,T/s,sC) block view is NOT a bitcast (the
    (8,128) tile contents differ), so the dot path pays ~0.8 ms of
    reshape/pad materializations — and the {1,2,0} T-minor layout XLA
    had picked makes ChannelNorm's backward reduces ~0.25 ms FASTER
    than row-major (C rides sublanes, T rides lanes).  XLA's global
    layout assignment beat both hand-forced alternatives."""
    return os.environ.get("CPC_CONV_DOTS", "0") == "1"


class Conv1d(nn.Module):
    """Strided 1-D convolution, channels-last, torch-compatible param names.

    Kernel stored as (W, Cin, Cout) = 'WIO'; torch's (Cout, Cin, W) converts
    by transposing (2, 1, 0).
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    # set when calling with x=None (params-only mode for the fused
    # conv+norm Pallas path, ops/pallas/conv_ln.py)
    in_features: Optional[int] = None

    @nn.compact
    def __call__(self, x: Optional[jax.Array] = None) -> jax.Array:
        in_features = self.in_features if x is None else x.shape[-1]
        # torch Conv1d init: U(-k, k) with k = 1/sqrt(Cin * W)
        k = 1.0 / math.sqrt(in_features * self.kernel_size)
        init = nn.initializers.uniform(scale=2 * k)
        kernel = self.param("kernel", lambda rng, shape: init(rng, shape) - k,
                            (self.kernel_size, in_features, self.features))
        if x is None:
            bias = self.param("bias",
                              lambda rng, shape: init(rng, shape) - k,
                              (self.features,)) if self.use_bias else None
            return kernel, bias
        dtype = self.dtype or x.dtype
        if in_features == 1 and self.kernel_size % self.stride == 0:
            # Degenerate-input conv (the waveform layer) as dense framing:
            # XLA's conv-grad emitter handles C_in=1 badly (dW alone was
            # 0.34 ms/step in the device trace vs ~0.08 ms of traffic).
            # kernel % stride == 0 means every window is a whole number
            # of stride-blocks, so framing is reshapes/slices and the
            # conv becomes an MXU matmul whose dW backward contracts over
            # the full (B*T') depth.  NOTE: framing the C=256 layers the
            # same way was tried and REGRESSED ~3 ms/step — with a wide
            # channel dim the (B,L,C)->(B,L/s,s*C) reshape is a real
            # retiling, and its backward transpose costs more than XLA's
            # conv path (device trace, docs/PERFORMANCE.md).
            B, T, _ = x.shape
            s, kw = self.stride, self.kernel_size
            out_t = (T + 2 * self.padding - kw) // s + 1
            L = T + 2 * self.padding
            pad_r = self.padding + (-L) % s
            xp = jnp.pad(x.astype(dtype),
                         ((0, 0), (self.padding, pad_r), (0, 0)))
            blocks = xp.reshape(B, xp.shape[1] // s, s * in_features)
            nb = kw // s
            frames = jnp.concatenate(
                [blocks[:, i:blocks.shape[1] - nb + 1 + i] for i in range(nb)],
                axis=2)[:, :out_t]                # (B, out_t, kw*C_in)
            # frames element (tap*C_in + c) matches kernel (W, I, O) rows
            y = jax.lax.dot_general(
                frames,
                kernel.astype(dtype).reshape(kw * in_features, self.features),
                (((2,), (0,)), ((), ())))
        elif (self.kernel_size == 2 * self.stride
              and self.padding <= self.stride and use_conv_dots()):
            # Half-overlap conv (kernel == 2*stride — every CPC layer) as
            # TWO matmuls over a block view:
            # (B, T, C) -> (B, T/s, s*C), then
            #   y[m] = blocked[m] @ W[:s] + blocked[m+1] @ W[s:].
            # Opt-in negative result — see use_conv_dots() for why the
            # tiled-layout reshape costs outweigh the conv-layout copies
            # this removes.
            B, T, Cin = x.shape
            s, kw, p = self.stride, self.kernel_size, self.padding
            out_t = (T + 2 * p - kw) // s + 1
            blocks = out_t + 1
            # exactly blocks*s input rows enter the block view: slice off
            # the tail no output window reads, pad when the windows poke
            # past the end (the last block is always at least half pad).
            need = blocks * s - p
            xs = x[:, :need] if need <= T else x
            xp = jnp.pad(xs.astype(dtype),
                         ((0, 0), (p, max(0, need - T)), (0, 0)))
            blocked = xp.reshape(B, blocks, s * Cin)
            # kernel (kw, Cin, Cout) row-major: rows j*Cin+c of the (s*Cin,
            # Cout) halves match blocked's (j, c) minor order exactly.
            w2 = kernel.astype(dtype).reshape(2, s * Cin, self.features)
            lo = jax.lax.dot_general(blocked, w2[0],
                                     (((2,), (0,)), ((), ())))
            hi = jax.lax.dot_general(blocked, w2[1],
                                     (((2,), (0,)), ((), ())))
            y = lo[:, :out_t] + hi[:, 1:out_t + 1]
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(dtype), kernel.astype(dtype),
                window_strides=(self.stride,),
                padding=[(self.padding, self.padding)],
                dimension_numbers=("NWC", "WIO", "NWC"),
            )
        if self.use_bias:
            bias = self.param("bias", lambda rng, shape: init(rng, shape) - k,
                              (self.features,))
            y = y + bias.astype(dtype)
        return y


class CPCEncoder(nn.Module):
    """5-layer strided conv encoder, 160x downsampling (model.py:61-105).

    Input (B, T) or (B, 1, T) raw waveform; output (B, T//160, C).
    """

    size_hidden: int = 256
    norm_mode: str = "layerNorm"
    dtype: Optional[jnp.dtype] = None

    DOWNSAMPLING = DOWNSAMPLING

    @property
    def dim_output(self) -> int:
        return self.size_hidden

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if x.ndim == 3:  # (B, 1, T) reference layout -> (B, T, 1)
            x = jnp.swapaxes(x, 1, 2)
        elif x.ndim == 2:  # (B, T)
            x = x[..., None]
        dtype = self.dtype or jnp.float32
        x = x.astype(dtype)
        from ..ops.pallas.conv_ln import (conv_interpret_mode,
                                          fused_conv_ln_relu,
                                          fused_conv_supported,
                                          use_fused_conv)
        for i, (k, s, p) in enumerate(zip(CONV_KERNELS, CONV_STRIDES, CONV_PADS)):
            conv = Conv1d(self.size_hidden, k, s, p, dtype=dtype,
                          in_features=x.shape[-1], name=f"conv{i}")
            norm = make_norm_layer(self.norm_mode, self.size_hidden,
                                   name=f"norm{i}")
            if (self.norm_mode == "layerNorm" and use_fused_conv()
                    and fused_conv_supported(x.shape[1], x.shape[-1], k, s,
                                             p)):
                # conv + bias + ChannelNorm + ReLU as ONE Pallas kernel
                # (ops/pallas/conv_ln.py): the layer's activations make a
                # single HBM round trip per direction and XLA's
                # conv-vs-fusion layout copies disappear.  Identical
                # param tree (params declared by the same submodules).
                kernel, bias = conv(None)
                nw, nb = norm(None)
                x = fused_conv_ln_relu(
                    x, kernel.reshape(k * x.shape[-1],
                                      self.size_hidden).astype(dtype),
                    bias, nw, nb, s, k, p, 1e-5, conv_interpret_mode())
                continue
            x = conv(x)
            if isinstance(norm, nn.BatchNorm):
                x = norm(x, use_running_average=not train)
            else:
                x = norm(x)
            x = nn.relu(x)
        return x


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def mel_filterbank(n_freqs: int, n_mels: int, sample_rate: int = 16000,
                   f_min: float = 0.0, f_max: Optional[float] = None) -> np.ndarray:
    """HTK-style triangular mel filterbank, (n_freqs, n_mels)."""
    f_max = f_max or sample_rate / 2.0
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(_hz_to_mel(f_min), _hz_to_mel(f_max), n_mels + 2)
    f_pts = _mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def dct_matrix(n_mfcc: int, n_mels: int) -> np.ndarray:
    """Orthonormal DCT-II matrix, (n_mels, n_mfcc)."""
    n = np.arange(n_mels, dtype=np.float64)
    k = np.arange(n_mfcc, dtype=np.float64)
    dct = np.cos(np.pi / n_mels * (n[:, None] + 0.5) * k[None, :]) * 2.0
    dct[:, 0] *= 1.0 / math.sqrt(2.0)
    dct *= math.sqrt(1.0 / (2.0 * n_mels))
    return dct.astype(np.float32)


class MFCCEncoder(nn.Module):
    """MFCC front-end replacing the learned encoder (model.py:108-122).

    torchaudio.transforms.MFCC semantics: MelSpectrogram(n_fft=321,
    hop=n_fft//2, power=2) -> AmplitudeToDB(top_db=80) -> ortho DCT-II.
    Implemented as a framed rFFT (static shapes, XLA-friendly).
    """

    dim_encoded: int
    n_fft: int = 321
    sample_rate: int = 16000

    @property
    def dim_output(self) -> int:
        return self.dim_encoded

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if x.ndim == 3:
            x = x.reshape(x.shape[0], -1)
        n_mels = max(128, self.dim_encoded)
        hop = self.n_fft // 2
        win = jnp.asarray(np.hanning(self.n_fft + 1)[:-1].astype(np.float32))
        pad = self.n_fft // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
        n_frames = 1 + (xp.shape[1] - self.n_fft) // hop
        idx = (np.arange(n_frames)[:, None] * hop
               + np.arange(self.n_fft)[None, :])
        frames = xp[:, idx] * win  # (B, F, n_fft)
        spec = jnp.abs(jnp.fft.rfft(frames, axis=-1)) ** 2
        fb = jnp.asarray(mel_filterbank(self.n_fft // 2 + 1, n_mels,
                                        self.sample_rate))
        mel = spec @ fb  # (B, F, n_mels)
        db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
        db = jnp.maximum(db, jnp.max(db, axis=(1, 2), keepdims=True) - 80.0)
        dct = jnp.asarray(dct_matrix(self.dim_encoded, n_mels))
        return db @ dct  # (B, F, n_mfcc)


class LFBEncoder(nn.Module):
    """Learned filter banks (model.py:125-152; the reference's 'LFBEnconder').

    conv(1 -> 2C, k=400) -> squared-magnitude pairing -> Hann smoothing
    conv (stride 160, pad 350) -> log(1+|x|) -> InstanceNorm.
    """

    dim_encoded: int
    normalize: bool = True

    @property
    def dim_output(self) -> int:
        return self.dim_encoded

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if x.ndim == 3:
            x = jnp.swapaxes(x, 1, 2)
        elif x.ndim == 2:
            x = x[..., None]
        B = x.shape[0]
        y = Conv1d(2 * self.dim_encoded, 400, 1, 0, name="conv")(x)  # (B,L,2C)
        y = y.reshape(B, y.shape[1], self.dim_encoded, 2)
        y = y[..., 0] ** 2 + y[..., 1] ** 2  # (B, L, C)
        han = jnp.asarray(np.hanning(401)[:-1].astype(np.float32))
        # Depthwise Hann smoothing: same window applied per channel.
        y = jnp.swapaxes(y, 1, 2).reshape(B * self.dim_encoded, -1, 1)
        y = jax.lax.conv_general_dilated(
            y, han.reshape(400, 1, 1), window_strides=(160,),
            padding=[(350, 350)], dimension_numbers=("NWC", "WIO", "NWC"))
        y = y.reshape(B, self.dim_encoded, -1)
        y = jnp.log1p(jnp.abs(y))
        y = jnp.swapaxes(y, 1, 2)  # (B, F, C)
        if self.normalize:
            mean = jnp.mean(y, axis=1, keepdims=True)
            var = jnp.var(y, axis=1, keepdims=True)
            y = (y - mean) * jax.lax.rsqrt(var + 1e-5)
        return y


def get_encoder(encoder_type: str, hidden: int, norm_mode: str = "layerNorm",
                dtype=None):
    """Flag -> encoder factory (feature_loader.py:124-134 equivalent)."""
    if encoder_type == "mfcc":
        return MFCCEncoder(hidden)
    if encoder_type == "lfb":
        return LFBEncoder(hidden)
    return CPCEncoder(hidden, norm_mode, dtype=dtype)
