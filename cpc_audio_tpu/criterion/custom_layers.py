"""Equalized-learning-rate layers (StyleGAN-style).

Reference: /root/reference/cpc/criterion/custom_layers.py:44-151.
Weights are initialized N(0,1) and the He constant sqrt(2/fan_in) * lr_mul
is applied at runtime to the WHOLE module output — bias included:
y = (x @ W + b) * c, matching ConstrainedLayer.forward (custom_layers.py:73-77)
which scales after nn.Linear/nn.Conv1d (so converted reference checkpoints
reproduce activations exactly). Biases start at zero.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp


class EqualizedDense(nn.Module):
    """EqualizedLinear (custom_layers.py:131-151)."""

    features: int
    use_bias: bool = True
    equalized: bool = True
    lr_mul: float = 1.0
    init_bias_to_zero: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fan_in = x.shape[-1]

        # (in, out) layout; converter transposes torch weights (see Dense).
        w = self.param("kernel", nn.initializers.normal(1.0),
                       (fan_in, self.features))
        y = x @ w.astype(x.dtype)
        if self.use_bias:
            b_init = (nn.initializers.zeros if self.init_bias_to_zero
                      else nn.initializers.normal(1.0))
            b = self.param("bias", b_init, (self.features,))
            y = y + b.astype(x.dtype)
        if self.equalized:
            y = y * (math.sqrt(2.0 / fan_in) * self.lr_mul)
        return y


class EqualizedConv1d(nn.Module):
    """EqualizedConv1d (custom_layers.py:81-105), channels-last.

    Kernel param kept in torch layout (Cout, Cin, W) for checkpoint parity;
    fan_in = Cin * W.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    equalized: bool = True
    lr_mul: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        fan_in = in_features * self.kernel_size

        w = self.param("weight", nn.initializers.normal(1.0),
                       (self.features, in_features, self.kernel_size))
        kernel = jnp.transpose(w, (2, 1, 0))  # -> WIO
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            dimension_numbers=("NWC", "WIO", "NWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(x.dtype)
        if self.equalized:
            y = y * (math.sqrt(2.0 / fan_in) * self.lr_mul)
        return y
