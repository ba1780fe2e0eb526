"""CPCModel: encoder + autoregressive context network.

Reference: /root/reference/cpc/model.py:276-308 and the factory wiring in
feature_loader.py:124-153 / train.py:301-311.

Functional contract (replaces torch module state):
    ``model.apply(vars, batch, label, hidden) -> (c, z, label, hidden_out)``
with channels-last activations throughout (no permute: the encoder already
emits (B, S, C), unlike model.py:287).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import CPCConfig
from .ar import CPCAR, NoAr
from .encoder import get_encoder
from .transformer import TransformerAR

# "float64" is for the x64 gradient-parity tests (tests/test_grad_parity.py),
# not a production setting — the CLI only exposes float32/bfloat16.
_COMPUTE_DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                   "float64": jnp.float64}


def get_ar(config: CPCConfig):
    """Flag -> AR factory (feature_loader.py:137-153)."""
    mode = config.arMode
    if mode == "transformer":
        # Reference getAR hard-codes 1 transformer layer regardless of
        # nLevelsGRU (feature_loader.py:139-141).
        return TransformerAR(config.hiddenEncoder, 1,
                             config.sizeWindow // 160, config.abspos)
    if mode == "no_ar":
        return NoAr()
    reverse = config.cpc_mode == "reverse"
    return CPCAR(config.hiddenGar, config.nLevelsGRU, mode, reverse=reverse)


class CPCModel(nn.Module):
    """Encoder + AR (model.py:276-289) with explicit hidden carry."""

    config: CPCConfig

    def setup(self):
        c = self.config
        dtype = _COMPUTE_DTYPES.get(c.compute_dtype, jnp.float32)
        self.gEncoder = get_encoder(c.encoder_type, c.hiddenEncoder,
                                    c.normMode, dtype=dtype)
        self.gAR = get_ar(c)

    def __call__(self, batch: jax.Array, label: Optional[jax.Array] = None,
                 hidden: Any = None, train: bool = False):
        z = self.gEncoder(batch, train=train)          # (B, S, C)
        c, hidden_out = self.gAR(z, hidden, train=train)
        return c, z, label, hidden_out

    # -- helpers ----------------------------------------------------------
    @property
    def dim_encoded(self) -> int:
        return self.config.hiddenEncoder

    @property
    def dim_context(self) -> int:
        if self.config.arMode in ("no_ar", "transformer"):
            return self.config.hiddenEncoder
        return self.config.hiddenGar

    def zero_state(self, batch: int):
        c = self.config
        if c.arMode in ("no_ar", "transformer"):
            return None
        dtype = _COMPUTE_DTYPES.get(c.compute_dtype, jnp.float32)
        shape = (c.nLevelsGRU, batch, c.hiddenGar)
        if c.arMode == "LSTM":
            return (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
        return jnp.zeros(shape, dtype)


class ConcatenatedModel(nn.Module):
    """Concatenate features of several CPC models on the channel axis
    (model.py:292-308); built by load_model for multi-checkpoint eval.
    """

    configs: Sequence[CPCConfig]

    def setup(self):
        self.models = [CPCModel(c, name=f"model{i}")
                       for i, c in enumerate(self.configs)]

    def __call__(self, batch, label=None, hidden=None, train: bool = False):
        if hidden is None:
            hidden = [None] * len(self.models)
        feats, encs, hids = [], [], []
        for m, h in zip(self.models, hidden):
            c, z, label, h_out = m(batch, label, h, train)
            feats.append(c)
            encs.append(z)
            hids.append(h_out)
        return (jnp.concatenate(feats, axis=2),
                jnp.concatenate(encs, axis=2), label, hids)

    @property
    def dim_context(self) -> int:
        return sum(CPCModel(c).dim_context for c in self.configs)

    @property
    def dim_encoded(self) -> int:
        return sum(c.hiddenEncoder for c in self.configs)

    def zero_state(self, batch: int):
        return [CPCModel(c).zero_state(batch) for c in self.configs]


def build_model(config: CPCConfig) -> CPCModel:
    """Build a CPCModel; no_ar and transformer force
    hiddenGar == hiddenEncoder (train.py:486-487, feature_loader.py:142)."""
    if config.arMode in ("no_ar", "transformer"):
        config = config.replace(hiddenGar=config.hiddenEncoder)
    return CPCModel(config)


def init_model(model: nn.Module, rng: jax.Array, batch: int = 2,
               size_window: Optional[int] = None):
    """Initialize variables with a dummy batch."""
    cfg = model.config if hasattr(model, "config") else model.configs[0]
    sw = size_window or cfg.sizeWindow
    dummy = jnp.zeros((batch, 1, sw), jnp.float32)
    return model.init({"params": rng}, dummy)
