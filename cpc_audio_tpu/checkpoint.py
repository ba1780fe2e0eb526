"""Checkpointing: reference-layout state dicts, sidecars, resume.

Reference contract (feature_loader.py:100-121, 201-209; train.py:213-222):
  * ``checkpoint_<epoch>.pt`` holding keys
    ``gEncoder`` (whole model), ``cpcCriterion``, ``optimizer``, ``best``
  * sidecars ``checkpoint_logs.json`` and ``checkpoint_args.json`` in the
    same directory.  NOTE: the reference's train.py never wrote the args
    sidecar (SURVEY.md §2.5) — this implementation always writes it.

Serialization is a pickled dict of numpy-leaved pytrees.  Reference torch
checkpoints are also loadable (via torch, CPU) and converted with
:mod:`cpc_audio_tpu.convert`.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from .config import CPCConfig, TrainConfig

# v2: linear/recurrent kernels stored (in, out) — see docs/PERFORMANCE.md
FORMAT_VERSION = 2

# resume must not override run-control attrs (train.py:236-240).
# Deviation: nEpoch is also exempt so a finished run can be extended with a
# larger --nEpoch (the reference would restore the old value when the args
# sidecar existed, making extension impossible).
FORBIDDEN_RESUME_ATTRS = {"nGPU", "pathCheckpoint", "debug", "restart",
                          "world_size", "n_nodes", "node_id",
                          "n_gpu_per_node", "load", "nEpoch"}


def to_numpy_tree(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(model_state: Any, criterion_state: Any,
                    optimizer_state: Any, best_state: Any,
                    path_checkpoint: str,
                    batch_stats: Any = None) -> None:
    """Write the reference-layout checkpoint (feature_loader.py:201-209)."""
    state_dict = {
        "format": "cpc_audio_tpu",
        "version": FORMAT_VERSION,
        "gEncoder": to_numpy_tree(model_state),
        "cpcCriterion": to_numpy_tree(criterion_state),
        "optimizer": to_numpy_tree(optimizer_state),
        "best": to_numpy_tree(best_state),
    }
    if batch_stats is not None:
        state_dict["batch_stats"] = to_numpy_tree(batch_stats)
    tmp = path_checkpoint + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(state_dict, f, protocol=4)
    os.replace(tmp, path_checkpoint)


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load a checkpoint; native pickle first, then torch (reference
    format — converted by cpc_audio_tpu.convert)."""
    try:
        with open(path, "rb") as f:
            data = pickle.load(f)
        if isinstance(data, dict) and data.get("format") == "cpc_audio_tpu":
            return data
    except Exception:
        pass
    import torch  # reference checkpoints are torch pickles
    data = torch.load(path, map_location="cpu", weights_only=False)
    data["format"] = "torch"
    return data


def save_args_sidecar(path_dir: str, cpc_config: CPCConfig,
                      train_config: Optional[TrainConfig] = None) -> None:
    """Write checkpoint_args.json (fixing the reference train.py gap)."""
    args = dict(cpc_config.to_dict())
    if train_config is not None:
        args.update(train_config.to_dict())
    # atomic like save_checkpoint: never leave a truncated sidecar
    dest = os.path.join(path_dir, "checkpoint_args.json")
    with open(dest + ".tmp", "w") as f:
        json.dump(args, f, indent=2, sort_keys=True)
    os.replace(dest + ".tmp", dest)


def get_checkpoint_data(path_dir: str
                        ) -> Optional[Tuple[str, dict, CPCConfig, dict]]:
    """Find the latest checkpoint_<epoch>.pt + sidecars
    (feature_loader.py:100-121).

    Returns (checkpoint_path, logs, cpc_config, raw_args_dict) or None.
    """
    if not os.path.isdir(path_dir):
        return None
    checkpoints = [x for x in os.listdir(path_dir)
                   if os.path.splitext(x)[1] == ".pt"
                   and os.path.splitext(x[11:])[0].isdigit()]
    if not checkpoints:
        return None
    checkpoints.sort(key=lambda x: int(os.path.splitext(x[11:])[0]))
    data = os.path.join(path_dir, checkpoints[-1])
    logs_path = os.path.join(path_dir, "checkpoint_logs.json")
    args_path = os.path.join(path_dir, "checkpoint_args.json")
    logs = {}
    if os.path.exists(logs_path):
        with open(logs_path) as f:
            logs = json.load(f)
    raw_args: dict = {}
    if os.path.exists(args_path):
        with open(args_path) as f:
            raw_args = json.load(f)
    config = CPCConfig.from_dict({**CPCConfig().to_dict(), **raw_args})
    return os.path.abspath(data), logs, config, raw_args


def merge_args(base: dict, loc: dict,
               forbidden: Optional[set] = None) -> dict:
    """loadArgs semantics (feature_loader.py:74-80)."""
    out = dict(base)
    for k, v in loc.items():
        if forbidden is not None and k in forbidden:
            continue
        out[k] = v
    return out


def checkpoint_epoch(path: str) -> int:
    name = os.path.basename(path)
    return int(os.path.splitext(name[11:])[0])
