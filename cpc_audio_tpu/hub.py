"""Hub-style model factory.

Reference: /root/reference/hubconf.py — ``CPC_audio(pretrained, **kwargs)``
downloaded the libri-light 60k checkpoint (`60k_epoch4-d0f474de.pt`) and
loaded ``checkpoint["weights"]`` with ``checkpoint["config"]``.

This environment has no network egress, so ``pretrained=True`` loads the
same torch checkpoint from a local path (``checkpoint_path=`` argument or
the ``CPC_AUDIO_CHECKPOINT`` env var) and converts the weights with
:mod:`cpc_audio_tpu.convert`.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

from .config import CPCConfig
from .models import build_model

PRETRAINED_CHECKPOINT_NAME = "60k_epoch4-d0f474de.pt"
PRETRAINED_CHECKPOINT_URL = ("https://dl.fbaipublicfiles.com/librilight/"
                             "CPC_checkpoints/60k_epoch4-d0f474de.pt")


def cpc_audio(pretrained: bool = False,
              checkpoint_path: Optional[str] = None,
              **kwargs) -> Tuple[Any, Any]:
    """Build (and optionally load) a CPC model.

    Returns (model_module, variables); variables is None when no weights
    are loaded (call ``model.init`` yourself).
    """
    config = CPCConfig()
    if pretrained:
        path = checkpoint_path or os.environ.get("CPC_AUDIO_CHECKPOINT")
        if not path or not os.path.exists(path):
            raise FileNotFoundError(
                "pretrained=True needs a local copy of "
                f"{PRETRAINED_CHECKPOINT_NAME} (no network egress). "
                f"Download {PRETRAINED_CHECKPOINT_URL} and pass "
                "checkpoint_path= or set CPC_AUDIO_CHECKPOINT.")
        import jax
        import jax.numpy as jnp
        import torch
        from . import convert
        checkpoint = torch.load(path, map_location="cpu",
                                weights_only=False)
        config = CPCConfig.from_dict(
            {**config.to_dict(), **checkpoint["config"]})
        model = build_model(config)
        params, batch_stats = convert.convert_cpc_model(
            dict(checkpoint["weights"]), model.config)
        variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
        if batch_stats:
            variables["batch_stats"] = jax.tree_util.tree_map(
                jnp.asarray, batch_stats)
        return model, variables
    config = CPCConfig.from_dict({**config.to_dict(), **kwargs})
    return build_model(config), None


# reference-name alias
CPC_audio = cpc_audio
