"""Normalization layers for the conv encoder.

TPU-native layout note: the whole framework is channels-last (B, T, C) — the
layout XLA tiles best on TPU — whereas the reference is channels-first
(B, C, T).  ``ChannelNorm`` therefore normalizes over the *last* axis here
(reference normalizes dim=1: /root/reference/cpc/model.py:50-58).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class ChannelNorm(nn.Module):
    """Per-timestep normalization across channels (model.py:25-58).

    Matches torch semantics: unbiased variance (``ddof=1``), eps added to the
    variance, affine scale/shift.
    """

    num_features: int
    epsilon: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x=None) -> jax.Array:
        # Called with ``x=None`` it only declares and returns the affine
        # params (the fused conv+norm Pallas path applies the math inside
        # the kernel, ops/pallas/conv_ln.py).
        if x is None:
            assert self.affine
            w = self.param("weight", nn.initializers.ones,
                           (self.num_features,))
            b = self.param("bias", nn.initializers.zeros,
                           (self.num_features,))
            return w, b
        # x: (B, T, C); normalize over C.  Statistics in >=f32 for
        # stability (promote_types keeps f64 inputs f64 for the x64 parity
        # tests); output and affine params in the input dtype (a bf16
        # pipeline must not silently promote back to f32).
        xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        # torch.var default is unbiased (N-1 denominator): model.py:53
        var = jnp.var(xf, axis=-1, keepdims=True, ddof=1)
        y = ((xf - mean) * jax.lax.rsqrt(var + self.epsilon)).astype(x.dtype)
        if self.affine:
            w = self.param("weight", nn.initializers.ones, (self.num_features,))
            b = self.param("bias", nn.initializers.zeros, (self.num_features,))
            y = y * w.astype(x.dtype) + b.astype(x.dtype)
        return y


class InstanceNorm(nn.Module):
    """InstanceNorm1d with affine, no running stats (model.py:74).

    Normalizes each (batch, channel) over the time axis.  torch uses the
    biased variance for the normalization itself.
    """

    num_features: int
    epsilon: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, T, C); normalize over T per (B, C).
        xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
        mean = jnp.mean(xf, axis=1, keepdims=True)
        var = jnp.var(xf, axis=1, keepdims=True)
        y = ((xf - mean) * jax.lax.rsqrt(var + self.epsilon)).astype(x.dtype)
        if self.affine:
            w = self.param("weight", nn.initializers.ones, (self.num_features,))
            b = self.param("bias", nn.initializers.zeros, (self.num_features,))
            y = y * w.astype(x.dtype) + b.astype(x.dtype)
        return y


class Identity(nn.Module):
    """IDModule equivalent (model.py:16-22)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return x


def make_norm_layer(norm_mode: str, num_features: int, name: str):
    """Factory mirroring CPCEncoder's norm selection (model.py:69-80)."""
    if norm_mode == "layerNorm":
        return ChannelNorm(num_features, name=name)
    if norm_mode == "instanceNorm":
        return InstanceNorm(num_features, name=name)
    if norm_mode == "ID":
        return Identity(name=name)
    if norm_mode == "batchNorm":
        # Running stats live in the 'batch_stats' collection; torch momentum
        # 0.1 corresponds to flax momentum 0.9.
        return nn.BatchNorm(use_running_average=None, momentum=0.9,
                            epsilon=1e-5, axis=-1, name=name)
    raise ValueError(f"Norm mode must be one of layerNorm/instanceNorm/ID/"
                     f"batchNorm, got {norm_mode}")
