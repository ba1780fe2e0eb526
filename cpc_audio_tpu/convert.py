"""Reference (torch) checkpoint -> JAX parameter-tree conversion.

Lets parity evaluations load weights trained by the reference
implementation (state-dict layout from /root/reference/cpc/model.py and
criterion/criterion.py; checkpoint keys per feature_loader.py:201-209).

The mapping is mechanical: conv kernels transpose (out,in,W) -> (W,in,out)
and every linear/recurrent weight transposes to the (in, out) layout our
layers use (contracting last-with-first runs 4.4x faster on v5e than the
x @ w.T orientation — docs/PERFORMANCE.md).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from .config import CPCConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    # Force a copy: torch's .numpy() ALIASES the tensor's storage, and
    # jnp.asarray on CPU can zero-copy an aligned array — so without this,
    # a later in-place torch update (optimizer.step()) would silently
    # mutate the "converted" JAX parameters (bit us in the grad-parity
    # tests, where the torch step runs before the JAX one).
    return np.array(t, copy=True)


def _strip_prefix(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    out = {}
    for k, v in sd.items():
        if k.startswith(prefix):
            out[k[len(prefix):]] = v
    return out


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convert_norm(sd, i: int, norm_mode: str, params: dict,
                  batch_stats: dict) -> None:
    w = sd.get(f"batchNorm{i}.weight")
    b = sd.get(f"batchNorm{i}.bias")
    if norm_mode == "batchNorm":
        if w is not None:
            _set(params, (f"norm{i}", "scale"), _np(w).reshape(-1))
            _set(params, (f"norm{i}", "bias"), _np(b).reshape(-1))
        rm = sd.get(f"batchNorm{i}.running_mean")
        rv = sd.get(f"batchNorm{i}.running_var")
        if rm is not None:
            _set(batch_stats, (f"norm{i}", "mean"), _np(rm).reshape(-1))
            _set(batch_stats, (f"norm{i}", "var"), _np(rv).reshape(-1))
    elif norm_mode in ("layerNorm", "instanceNorm"):
        if w is not None:
            _set(params, (f"norm{i}", "weight"), _np(w).reshape(-1))
            _set(params, (f"norm{i}", "bias"), _np(b).reshape(-1))


def convert_encoder(sd: Dict[str, Any], config: CPCConfig
                    ) -> Tuple[dict, dict]:
    """gEncoder.* torch keys -> (params, batch_stats) for CPCEncoder."""
    params: dict = {}
    batch_stats: dict = {}
    if config.encoder_type == "lfb":
        _set(params, ("conv", "kernel"),
             _np(sd["conv.weight"]).transpose(2, 1, 0))
        _set(params, ("conv", "bias"), _np(sd["conv.bias"]))
        return params, batch_stats
    for i in range(5):
        wk = f"conv{i}.weight"
        if wk not in sd:
            continue
        _set(params, (f"conv{i}", "kernel"), _np(sd[wk]).transpose(2, 1, 0))
        _set(params, (f"conv{i}", "bias"), _np(sd[f"conv{i}.bias"]))
        _convert_norm(sd, i, config.normMode, params, batch_stats)
    return params, batch_stats


def _convert_recurrent(sd: Dict[str, Any], prefix: str, n_layers: int
                       ) -> dict:
    """torch nn.GRU/LSTM/RNN state -> stacked _RecurrentLayer params.
    Weights transpose to the (in, gates) layout (see models/ar.py)."""
    return {f"layer{l}": _rnn_layer(sd, prefix, l) for l in range(n_layers)}


def _rnn_layer(sd: Dict[str, Any], prefix: str, l: int, suffix: str = ""
               ) -> dict:
    return {
        "weight_ih_t": _np(sd[f"{prefix}weight_ih_l{l}{suffix}"]).T,
        "weight_hh_t": _np(sd[f"{prefix}weight_hh_l{l}{suffix}"]).T,
        "bias_ih": _np(sd[f"{prefix}bias_ih_l{l}{suffix}"]),
        "bias_hh": _np(sd[f"{prefix}bias_hh_l{l}{suffix}"]),
    }


def convert_bidir_tangled(sd: Dict[str, Any], n_layers: int) -> dict:
    """torch BiDIRARTangled (nn.GRU(bidirectional=True), model.py:216-239)
    state dict -> BiDIRARTangled params (interleaved directions)."""
    params: dict = {}
    for l in range(n_layers):
        params[f"layer{l}_fwd"] = _rnn_layer(sd, "ARNet.", l)
        params[f"layer{l}_bwd"] = _rnn_layer(sd, "ARNet.", l, "_reverse")
    return params


def convert_bidir(sd: Dict[str, Any], n_layers: int) -> dict:
    """torch BiDIRAR (two independent nn.GRUs, model.py:242-268) state
    dict -> BiDIRAR params."""
    return {
        "netForward": _convert_recurrent(sd, "netForward.", n_layers),
        "netBackward": _convert_recurrent(sd, "netBackward.", n_layers),
    }


def _convert_transformer_layer(sd: Dict[str, Any], prefix: str) -> dict:
    """TransformerLayer torch keys -> flax params (same layouts)."""
    out: dict = {"multihead": {}, "ln_multihead": {}, "ffnetwork": {},
                 "ln_ffnetwork": {}}
    for w in ("Wq", "Wk", "Wv", "Wo"):
        out["multihead"][w] = {
            "kernel": _np(sd[f"{prefix}multihead.{w}.weight"]).T}
    krel = sd.get(f"{prefix}multihead.Att.Krelpos")
    if krel is not None:
        out["multihead"]["Krelpos"] = _np(krel)
    for ln in ("ln_multihead", "ln_ffnetwork"):
        out[ln] = {"weight": _np(sd[f"{prefix}{ln}.weight"]),
                   "bias": _np(sd[f"{prefix}{ln}.bias"])}
    for lin in ("lin1", "lin2"):
        out["ffnetwork"][lin] = {
            "kernel": _np(sd[f"{prefix}ffnetwork.{lin}.weight"]).T,
            "bias": _np(sd[f"{prefix}ffnetwork.{lin}.bias"])}
    return out


def convert_ar(sd: Dict[str, Any], config: CPCConfig) -> dict:
    """gAR.* torch keys -> AR params."""
    if config.arMode == "no_ar":
        return {}
    if config.arMode == "transformer":
        # nn.Sequential: optional StaticPositionEmbedding at 0 shifts layers.
        # Layer count is inferred from the state dict, not nLevelsGRU —
        # reference checkpoints always have exactly 1 transformer layer
        # (getAR, feature_loader.py:139-141).
        offset = 1 if config.abspos else 0
        n_layers = len({k.split(".")[0] for k in sd
                        if k.split(".")[0].isdigit()}) - offset
        return {f"layer{i}": _convert_transformer_layer(sd, f"{i + offset}.")
                for i in range(n_layers)}
    return _convert_recurrent(sd, "baseNet.", config.nLevelsGRU)


def convert_cpc_model(state_dict: Dict[str, Any], config: CPCConfig
                      ) -> Tuple[dict, dict]:
    """Whole-CPCModel torch state dict (ckpt['gEncoder']) ->
    ({'gEncoder':..., 'gAR':...} params, batch_stats)."""
    enc_sd = _strip_prefix(state_dict, "gEncoder.")
    ar_sd = _strip_prefix(state_dict, "gAR.")
    enc_params, enc_stats = convert_encoder(enc_sd, config)
    ar_params = convert_ar(ar_sd, config)
    params = {"gEncoder": enc_params}
    if ar_params:
        params["gAR"] = ar_params
    batch_stats = {"gEncoder": enc_stats} if enc_stats else {}
    return params, batch_stats


def _stack_heads(sds, convert_one) -> dict:
    """Stack per-head param trees along a leading K axis."""
    trees = [convert_one(sd) for sd in sds]

    def stack(*leaves):
        return np.stack(leaves)

    import jax
    return jax.tree_util.tree_map(stack, *trees)


def convert_prediction_network(sd: Dict[str, Any], config: CPCConfig) -> dict:
    """wPrediction.predictors.{k}.* -> stacked 'heads' params."""
    K = config.nPredicts
    mode = config.rnnMode
    heads_sds = [
        _strip_prefix(sd, f"predictors.{k}.") for k in range(K)]

    if mode == "transformer":
        def one(h):
            return {"layer0": _convert_transformer_layer(h, "0.")}
    elif mode == "linear":
        def one(h):
            return {"kernel": _np(h["weight"]).T}
    elif mode == "ffd":
        def one(h):
            return {"lin1": {"kernel": _np(h["lin1.module.weight"]).T,
                             "bias": _np(h["lin1.module.bias"])},
                    "lin2": {"kernel": _np(h["lin2.module.weight"]).T,
                             "bias": _np(h["lin2.module.bias"])}}
    elif mode and mode.startswith("conv"):
        def one(h):
            return {"module": {"weight": _np(h["module.module.weight"]),
                               "bias": _np(h["module.module.bias"])}}
    elif mode in ("RNN", "LSTM"):
        def one(h):
            return {"cell": {"weight_ih_t": _np(h["weight_ih_l0"]).T,
                             "weight_hh_t": _np(h["weight_hh_l0"]).T,
                             "bias_ih": _np(h["bias_ih_l0"]),
                             "bias_hh": _np(h["bias_hh_l0"])}}
    else:
        raise ValueError(f"Unknown rnnMode {mode}")

    return {"heads": _stack_heads(heads_sds, one)}


def convert_criterion(state_dict: Dict[str, Any], config: CPCConfig,
                      kind: str = "cpc") -> dict:
    """ckpt['cpcCriterion'] torch state dict -> criterion params."""
    params: dict = {}
    if kind == "cpc":
        wp = _strip_prefix(state_dict, "wPrediction.")
        params["wPrediction"] = convert_prediction_network(wp, config)
        if "speakerEmb.weight" in state_dict:
            params["speakerEmb"] = {
                "embedding": _np(state_dict["speakerEmb.weight"])}
    elif kind == "speaker":
        params["linearSpeakerClassifier"] = {
            "kernel": _np(state_dict["linearSpeakerClassifier.weight"]).T,
            "bias": _np(state_dict["linearSpeakerClassifier.bias"])}
    elif kind == "phone":
        if "PhoneCriterionClassifier.weight" in state_dict:
            params["classifier0"] = {
                "kernel": _np(
                    state_dict["PhoneCriterionClassifier.weight"]).T,
                "bias": _np(state_dict["PhoneCriterionClassifier.bias"])}
        else:  # sequential MLP: indices 0, 2, 4...
            i, l = 0, 0
            while f"PhoneCriterionClassifier.{i}.weight" in state_dict:
                params[f"classifier{l}"] = {
                    "kernel": _np(
                        state_dict[f"PhoneCriterionClassifier.{i}.weight"]).T,
                    "bias": _np(
                        state_dict[f"PhoneCriterionClassifier.{i}.bias"])}
                i += 2
                l += 1
    elif kind == "ctc":
        params["PhoneCriterionClassifier"] = {
            "kernel": _np(state_dict["PhoneCriterionClassifier.weight"]).T,
            "bias": _np(state_dict["PhoneCriterionClassifier.bias"])}
    return params


def tree_shapes_match(a: Any, b: Any) -> bool:
    import jax
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return (len(la) == len(lb)
            and all(np.shape(x) == np.shape(y) for x, y in zip(la, lb)))


# ===========================================================================
# Export: JAX params -> reference torch state dict
# ===========================================================================

def _t(x):
    import torch
    return torch.from_numpy(np.asarray(x, np.float32).copy())


def export_encoder(params: dict, config: CPCConfig,
                   batch_stats: Optional[dict] = None) -> Dict[str, Any]:
    """CPCEncoder params -> gEncoder.* torch keys (inverse of
    convert_encoder)."""
    sd: Dict[str, Any] = {}
    for i in range(5):
        conv = params.get(f"conv{i}")
        if conv is None:
            continue
        sd[f"conv{i}.weight"] = _t(np.transpose(conv["kernel"], (2, 1, 0)))
        sd[f"conv{i}.bias"] = _t(conv["bias"])
        norm = params.get(f"norm{i}")
        if norm is None:
            continue
        if config.normMode == "batchNorm":
            sd[f"batchNorm{i}.weight"] = _t(norm["scale"])
            sd[f"batchNorm{i}.bias"] = _t(norm["bias"])
            if batch_stats and f"norm{i}" in batch_stats:
                sd[f"batchNorm{i}.running_mean"] = _t(
                    batch_stats[f"norm{i}"]["mean"])
                sd[f"batchNorm{i}.running_var"] = _t(
                    batch_stats[f"norm{i}"]["var"])
        elif config.normMode == "layerNorm":
            sd[f"batchNorm{i}.weight"] = _t(
                np.asarray(norm["weight"]).reshape(1, -1, 1))
            sd[f"batchNorm{i}.bias"] = _t(
                np.asarray(norm["bias"]).reshape(1, -1, 1))
        elif config.normMode == "instanceNorm":
            sd[f"batchNorm{i}.weight"] = _t(norm["weight"])
            sd[f"batchNorm{i}.bias"] = _t(norm["bias"])
    return sd


def _export_transformer_layer(p: dict, prefix: str) -> Dict[str, Any]:
    sd: Dict[str, Any] = {}
    for w in ("Wq", "Wk", "Wv", "Wo"):
        sd[f"{prefix}multihead.{w}.weight"] = _t(
            np.asarray(p["multihead"][w]["kernel"]).T)
    if "Krelpos" in p["multihead"]:
        sd[f"{prefix}multihead.Att.Krelpos"] = _t(p["multihead"]["Krelpos"])
    for ln in ("ln_multihead", "ln_ffnetwork"):
        sd[f"{prefix}{ln}.weight"] = _t(p[ln]["weight"])
        sd[f"{prefix}{ln}.bias"] = _t(p[ln]["bias"])
    for lin in ("lin1", "lin2"):
        sd[f"{prefix}ffnetwork.{lin}.weight"] = _t(
            np.asarray(p["ffnetwork"][lin]["kernel"]).T)
        sd[f"{prefix}ffnetwork.{lin}.bias"] = _t(p["ffnetwork"][lin]["bias"])
    return sd


def export_ar(params: dict, config: CPCConfig) -> Dict[str, Any]:
    if config.arMode == "no_ar" or not params:
        return {}
    sd: Dict[str, Any] = {}
    if config.arMode == "transformer":
        offset = 1 if config.abspos else 0
        layers = sorted((k for k in params if k.startswith("layer")),
                        key=lambda k: int(k[5:]))
        for i, k in enumerate(layers):
            sd.update(_export_transformer_layer(params[k], f"{i + offset}."))
        return sd
    for l in range(config.nLevelsGRU):
        layer = params[f"layer{l}"]
        sd[f"baseNet.weight_ih_l{l}"] = _t(np.asarray(layer["weight_ih_t"]).T)
        sd[f"baseNet.weight_hh_l{l}"] = _t(np.asarray(layer["weight_hh_t"]).T)
        sd[f"baseNet.bias_ih_l{l}"] = _t(layer["bias_ih"])
        sd[f"baseNet.bias_hh_l{l}"] = _t(layer["bias_hh"])
    return sd


def export_cpc_model(params: dict, config: CPCConfig,
                     batch_stats: Optional[dict] = None) -> Dict[str, Any]:
    """Our model params -> a state dict the reference's
    ``CPCModel.load_state_dict`` accepts (keys gEncoder.* / gAR.*)."""
    stats = (batch_stats or {}).get("gEncoder", {})
    sd = {f"gEncoder.{k}": v
          for k, v in export_encoder(params["gEncoder"], config,
                                     stats).items()}
    sd.update({f"gAR.{k}": v
               for k, v in export_ar(params.get("gAR", {}), config).items()})
    return sd


def export_torch_checkpoint(params: dict, config: CPCConfig, path: str,
                            criterion_params: Optional[dict] = None,
                            batch_stats: Optional[dict] = None) -> None:
    """Write a reference-format torch checkpoint (feature_loader.py:201-209
    layout) loadable by the reference's loadModel."""
    import torch
    state = {"gEncoder": export_cpc_model(params, config, batch_stats),
             "cpcCriterion": criterion_params or {},
             "optimizer": {}, "best": {}}
    torch.save(state, path)


def export_checkpoint_file(path_in: str, path_out: str,
                           path_args: Optional[str] = None) -> None:
    """Convert one of our trainer checkpoints (checkpoint.py pickle layout)
    to a reference-format torch checkpoint the reference's loadModel /
    feature tooling can consume directly (feature_loader.py:201-209)."""
    import json
    import os

    from . import checkpoint as ckpt

    data = ckpt.load_checkpoint(path_in)
    if path_args is None:
        path_args = os.path.join(os.path.dirname(path_in) or ".",
                                 "checkpoint_args.json")
    with open(path_args) as f:
        config = CPCConfig.from_dict(json.load(f))
    if config.arMode in ("no_ar", "transformer"):
        config = config.replace(hiddenGar=config.hiddenEncoder)
    export_torch_checkpoint(data["gEncoder"], config, path_out,
                            batch_stats=data.get("batch_stats"))


def main(argv=None) -> int:
    """CLI: ``python -m cpc_audio_tpu.convert export <in.pt> <out.pt>``
    writes a torch checkpoint the reference tooling loads as-is."""
    import argparse

    parser = argparse.ArgumentParser(
        description="Checkpoint format conversion")
    sub = parser.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("export", help="ours -> reference torch format")
    p.add_argument("checkpoint", type=str)
    p.add_argument("output", type=str)
    p.add_argument("--path_args", type=str, default=None,
                   help="checkpoint_args.json (default: sibling of input)")
    args = parser.parse_args(argv)
    export_checkpoint_file(args.checkpoint, args.output, args.path_args)
    print(f"Exported {args.checkpoint} -> {args.output} (torch format)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
