"""Checkpoint loading + feature-extraction API.

Reference: /root/reference/cpc/feature_loader.py (269 LoC).

Functional differences by design:
  * Models are flax modules; "loading a model" returns (module, variables).
  * ``FeatureModule`` keeps the reference's stateful-hidden convenience (for
    ABX chunked extraction, eval/ABX.py:169-170) as explicit held state with
    a ``reset()``; hidden resets per file in build_feature (the reference
    carried hidden across files — a quirk, documented deviation).
  * ``build_feature`` always runs fixed-size chunks (tail padded, valid
    frames sliced) so the TPU compiles exactly one shape; causal ARs make
    this exact.
"""

from __future__ import annotations

import os
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import checkpoint as ckpt
from . import convert
from .config import CPCConfig
from .data.audio_io import decode_file
from .models import ConcatenatedModel, build_model


# ---------------------------------------------------------------------------
# Model loading
# ---------------------------------------------------------------------------

def _load_single(path: str) -> Tuple[CPCConfig, dict, Any, Any]:
    """Load one checkpoint file -> (config, raw_args, model_params,
    batch_stats)."""
    data = ckpt.get_checkpoint_data(os.path.dirname(path))
    if data is None:
        raise FileNotFoundError(f"No checkpoint data found for {path}")
    _, _, config, raw_args = data
    blob = ckpt.load_checkpoint(path)
    if blob.get("format") == "cpc_audio_tpu":
        if blob.get("version", 1) < ckpt.FORMAT_VERSION:
            raise ValueError(
                f"{path} uses checkpoint format v{blob.get('version', 1)} "
                f"(pre-transposed-kernel layout); this build reads "
                f"v{ckpt.FORMAT_VERSION}. Re-train or re-export the "
                f"checkpoint.")
        params = blob["gEncoder"]
        batch_stats = blob.get("batch_stats") or {}
        batch_stats = batch_stats.get("model", batch_stats)
    else:  # reference torch checkpoint
        sd = blob["gEncoder"]
        sd = {k: v for k, v in sd.items()}
        params, batch_stats = convert.convert_cpc_model(sd, config)
    return config, raw_args, params, batch_stats


def load_model(path_checkpoints: Sequence[str], load_state_dict: bool = True,
               compute_dtype: Optional[str] = None
               ) -> Tuple[Any, dict, int, int]:
    """Rebuild model(s) from checkpoints (feature_loader.py:156-190).

    Returns (model_module, variables, hidden_gar, hidden_encoder).
    Multiple paths -> ConcatenatedModel.

    ``compute_dtype`` overrides the saved activation compute dtype for
    inference (params stay as stored; f32 master weights cast per-op):
    'bfloat16' roughly doubles MXU throughput on TPU for feature
    extraction at a small numeric cost.  None keeps the checkpoint's own
    setting (reference-parity default).
    """
    configs: List[CPCConfig] = []
    params_list: List[Any] = []
    stats_list: List[Any] = []
    hidden_gar, hidden_encoder = 0, 0

    for path in path_checkpoints:
        config, raw_args, params, batch_stats = _load_single(path)
        if compute_dtype is not None:
            config = config.replace(compute_dtype=compute_dtype)
        load_chain = raw_args.get("load")
        do_load = load_chain and (
            len(load_chain) > 1
            or os.path.dirname(os.path.abspath(load_chain[0]))
            != os.path.dirname(os.path.abspath(path)))
        if do_load:
            # probe checkpoint wrapping a pretrained CPC: rebuild from the
            # chain, then load this checkpoint's weights over it
            sub_model, sub_vars, hg, he = load_model(
                load_chain, load_state_dict=False,
                compute_dtype=compute_dtype)
            if isinstance(sub_model, ConcatenatedModel):
                raise NotImplementedError(
                    "nested concatenated checkpoints unsupported")
            configs.append(sub_model.config)
            hidden_gar += hg
            hidden_encoder += he
        else:
            if config.arMode == "no_ar":
                config = config.replace(hiddenGar=config.hiddenEncoder)
            if config.arMode == "transformer":
                config = config.replace(hiddenGar=config.hiddenEncoder)
            configs.append(config)
            hidden_gar += config.hiddenGar
            hidden_encoder += config.hiddenEncoder
        if load_state_dict:
            params_list.append(params)
            stats_list.append(batch_stats)

    if len(configs) == 1:
        model = build_model(configs[0])
    else:
        model = ConcatenatedModel(configs)

    if load_state_dict:
        if len(configs) == 1:
            variables = {"params": params_list[0]}
            if stats_list[0]:
                variables["batch_stats"] = stats_list[0]
        else:
            variables = {"params": {f"model{i}": p
                                    for i, p in enumerate(params_list)}}
            if any(stats_list):
                variables["batch_stats"] = {
                    f"model{i}": s for i, s in enumerate(stats_list) if s}
    else:
        rng = jax.random.PRNGKey(0)
        sw = configs[0].sizeWindow
        variables = model.init({"params": rng},
                               jnp.zeros((1, 1, sw), jnp.float32))
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    return model, variables, hidden_gar, hidden_encoder


def load_state_into(state, path: str, config: CPCConfig,
                    load_criterion: bool = False,
                    load_optimizer: bool = False):
    """Load checkpoint weights into a fresh TrainState (resume /
    --load paths, reference train.py:301-343)."""
    blob = ckpt.load_checkpoint(path)
    params = dict(state.params)
    batch_stats = state.batch_stats
    if blob.get("format") == "cpc_audio_tpu":
        if blob.get("version", 1) < ckpt.FORMAT_VERSION:
            raise ValueError(
                f"{path} uses checkpoint format v{blob.get('version', 1)}; "
                f"this build reads v{ckpt.FORMAT_VERSION}.")
        model_params = blob["gEncoder"]
        if not convert.tree_shapes_match(model_params, state.params["model"]):
            raise ValueError(f"checkpoint {path} does not match the model")
        params["model"] = jax.tree_util.tree_map(jnp.asarray, model_params)
        if load_criterion and blob.get("cpcCriterion"):
            params["criterion"] = jax.tree_util.tree_map(
                jnp.asarray, blob["cpcCriterion"])
        opt_state = state.opt_state
        if load_optimizer and blob.get("optimizer") is not None:
            try:
                flat_new = [jnp.asarray(x) for x in
                            jax.tree_util.tree_leaves(blob["optimizer"])]
                flat_cur = jax.tree_util.tree_leaves(state.opt_state)
                # shape AND dtype check: a layout change in the optimizer
                # (e.g. flat vs per-leaf moments) can match leaf COUNT
                # while the shapes differ, and a dtype change (f32 vs
                # bf16 moments) matches both but would silently flip the
                # opt_state dtype — either way the jitted step's donated
                # buffers would be wrong, so reinitialize instead
                if [(getattr(a, "shape", ()), getattr(a, "dtype", None))
                        for a in flat_new] != \
                        [(getattr(a, "shape", ()), getattr(a, "dtype", None))
                         for a in flat_cur]:
                    raise ValueError("optimizer leaf shapes/dtypes differ")
                treedef = jax.tree_util.tree_structure(state.opt_state)
                opt_state = jax.tree_util.tree_unflatten(treedef, flat_new)
            except Exception:
                print("WARNING: optimizer state incompatible; reinitialized")
        if blob.get("batch_stats"):
            batch_stats = jax.tree_util.tree_map(jnp.asarray,
                                                 blob["batch_stats"])
        return state._replace(params=params, opt_state=opt_state,
                              batch_stats=batch_stats)
    # torch reference checkpoint
    model_params, torch_stats = convert.convert_cpc_model(
        dict(blob["gEncoder"]), config)
    params["model"] = jax.tree_util.tree_map(jnp.asarray, model_params)
    if load_criterion and blob.get("cpcCriterion"):
        params["criterion"] = jax.tree_util.tree_map(
            jnp.asarray, convert.convert_criterion(
                dict(blob["cpcCriterion"]), config, kind="cpc"))
    if torch_stats:
        batch_stats = {"model": jax.tree_util.tree_map(jnp.asarray,
                                                       torch_stats)}
    return state._replace(params=params, batch_stats=batch_stats)


# ---------------------------------------------------------------------------
# Feature extraction
# ---------------------------------------------------------------------------

def seq_normalization(out: jax.Array) -> jax.Array:
    """Per-sequence time normalization (feature_loader.py:221-225);
    torch unbiased variance.  A 1-frame sequence has no unbiased
    variance (the reference emits NaN there); this returns zeros
    instead — (x - mean) is exactly 0 for a single frame."""
    mean = jnp.mean(out, axis=1, keepdims=True)
    if out.shape[1] <= 1:
        return out - mean
    var = jnp.var(out, axis=1, keepdims=True, ddof=1)
    return (out - mean) / jnp.sqrt(var + 1e-8)


def to_one_hot(labels: jax.Array, n_items: int) -> jax.Array:
    """(B, S) int -> (B, S, n_items) one-hot (feature_loader.py:212-218)."""
    return jax.nn.one_hot(labels, n_items, dtype=jnp.float32)


class FeatureModule:
    """Inference wrapper over (module, variables)
    (feature_loader.py:15-38)."""

    def __init__(self, model, variables, get_encoded: bool = False,
                 collapse: bool = False, keep_hidden: bool = False):
        self.model = model
        self.variables = variables
        self.get_encoded = get_encoded
        self.collapse = collapse
        self.keep_hidden = keep_hidden
        self.hidden = None

        def fwd(variables, batch, hidden):
            c, z, _, h = model.apply(variables, batch, None, hidden,
                                     train=False)
            return (z if get_encoded else c), h

        self._fwd = jax.jit(fwd)

    def get_downsampling_factor(self) -> int:
        return 160

    def reset(self) -> None:
        self.hidden = None

    def __call__(self, data) -> jax.Array:
        batch, label = data if isinstance(data, tuple) else (data, None)
        batch = jnp.asarray(batch, jnp.float32)
        if batch.ndim == 2:
            batch = batch[:, None, :]
        features, h = self._fwd(self.variables, batch, self.hidden)
        if self.keep_hidden:
            self.hidden = h
        if self.collapse:
            features = features.reshape(-1, features.shape[-1])
        # public feature API is always f32 (bf16 ml_dtypes arrays break
        # downstream numpy consumers), matching the reference contract
        return features.astype(jnp.float32)


class ModelPhoneCombined:
    """Feature maker + phone classifier -> posteriors
    (feature_loader.py:41-71)."""

    def __init__(self, feature_module: FeatureModule, criterion,
                 criterion_variables, one_hot: bool = False):
        self.model = feature_module
        self.criterion = criterion
        self.criterion_variables = criterion_variables
        self.one_hot = one_hot

        def predict(variables, c):
            return criterion.apply(variables, c,
                                   method=criterion.get_prediction)

        self._predict = jax.jit(predict)

    def get_downsampling_factor(self) -> int:
        return self.model.get_downsampling_factor()

    def __call__(self, data) -> jax.Array:
        c = self.model(data)
        pred = self._predict(self.criterion_variables, c)
        if self.one_hot:
            return to_one_hot(jnp.argmax(pred, axis=2), pred.shape[2])
        return jax.nn.softmax(pred, axis=2)


def build_feature(feature_maker, seq_path: str, strict: bool = False,
                  max_size_seq: int = 64000, seq_norm: bool = False,
                  pad_tail: bool = True) -> np.ndarray:
    """Chunked long-file inference (feature_loader.py:228-269).

    Returns (1, n_frames, C).  Non-strict: the ragged tail chunk is
    right-padded to max_size_seq and only its valid frames kept, which
    keeps ONE compiled shape on TPU.  The padding is exact except for the
    LAST frame of the file: its receptive field reaches past the audio
    end, where the reference's unpadded conv sees edge padding at the
    true length while the padded run sees zero *samples* (frames computed
    purely from those zeros are bias+norm-valued and feed later conv
    layers differently).  ``pad_tail=False`` runs the tail at its true
    length instead — bit-matching the reference ``buildFeature`` on every
    frame (test_export_roundtrip.py) at the cost of one extra compiled
    shape per distinct tail length.  Strict: the tail is re-run as a
    full-size chunk ending at the file end and only the missing frames
    appended (feature_loader.py:246-268)."""
    seq = decode_file(seq_path)
    if hasattr(feature_maker, "reset"):
        feature_maker.reset()
    size_seq = len(seq)
    ds = feature_maker.get_downsampling_factor() \
        if hasattr(feature_maker, "get_downsampling_factor") else 160
    # Chunk dispatches are independent of chunk readbacks (the recurrent
    # hidden carry lives on-device in the feature maker), so defer every
    # np.asarray to the end and start each chunk's device->host transfer
    # at dispatch time: chunk t transfers while chunk t+1 computes
    # (CPC_SERVE_ASYNC_READBACK=0 restores blocking per-chunk readbacks;
    # measured A/B in docs/PERFORMANCE.md round 5 serving).
    async_readback = os.environ.get("CPC_SERVE_ASYNC_READBACK", "1") != "0"

    def stage(features):
        if async_readback and hasattr(features, "copy_to_host_async"):
            features.copy_to_host_async()
        return features

    out = []
    start = 0
    while start < size_seq:
        if strict and start + max_size_seq > size_seq:
            break
        end = min(size_seq, start + max_size_seq)
        chunk = seq[start:end]
        valid_frames = len(chunk) // ds
        if len(chunk) < max_size_seq and pad_tail:
            chunk = np.pad(chunk, (0, max_size_seq - len(chunk)))
        features = feature_maker((chunk[None, None, :], None))
        features = features[:, :valid_frames]
        if seq_norm:
            features = seq_normalization(features)
        out.append(stage(features))
        start += max_size_seq
    if strict and start < size_seq:
        chunk = seq[-max_size_seq:] if size_seq >= max_size_seq \
            else np.pad(seq, (max_size_seq - size_seq, 0))
        features = feature_maker((chunk[None, None, :], None))
        delta = (size_seq - start) // ds
        if seq_norm:
            features = seq_normalization(features)
        out.append(stage(features[:, features.shape[1] - delta:]))
    return np.concatenate([np.asarray(f) for f in out], axis=1)


def build_features_batched(feature_maker: "FeatureModule",
                           seq_paths: Sequence[str], n_lanes: int = 8,
                           max_size_seq: int = 64000,
                           seq_norm: bool = False,
                           decode_workers: int = 4):
    """Batched multi-file feature extraction (serving path).

    The reference extracts eval features strictly one file at a time
    (eval/ABX.py:174-177 -> feature_loader.py:228-269: B=1 chunks, one
    dispatch + one host readback per chunk).  On an accelerator that
    leaves most of the chip idle and pays per-chunk dispatch latency.
    This generator packs ``n_lanes`` files side by side into fixed-shape
    ``(n_lanes, 1, max_size_seq)`` batches — one compiled program, one
    dispatch and one readback per *batch* of chunks — while preserving
    the per-file semantics of :func:`build_feature` exactly:

      * chunks of one file stay in one lane, in order, so recurrent
        hidden state carries across a file's chunks (when the module
        was built with ``keep_hidden=True``, reference ABX.py:169-170)
        and is zeroed at every file boundary (per-lane reset mask —
        the carried state never leaks between files);
      * the tail chunk is zero-padded to ``max_size_seq`` and only its
        valid frames kept (``build_feature``'s ``pad_tail=True`` path);
      * ``seq_norm`` applies per chunk over its valid frames, as the
        per-file path does (feature_loader.py:221-225 semantics).

    Lanes that run out of files are fed zeros and their output dropped.
    Audio decode runs ahead on a thread pool (the native decoder
    releases the GIL).  ``strict`` chunking is not supported here —
    use :func:`build_feature` for that mode.

    Yields ``(index, features)`` with ``features`` shaped
    ``(1, n_frames, C)``, in file-completion order (NOT input order);
    ``index`` is the position in ``seq_paths``.
    """
    from concurrent.futures import ThreadPoolExecutor

    async_readback = os.environ.get("CPC_SERVE_ASYNC_READBACK", "1") != "0"
    model = feature_maker.model
    variables = feature_maker.variables
    get_encoded = feature_maker.get_encoded
    carry_hidden = feature_maker.keep_hidden
    ds = feature_maker.get_downsampling_factor()

    # Cache the jitted forward ON the feature module: a fresh jax.jit per
    # generator call re-traces and re-requests compilation every
    # invocation — through the axon remote tunnel that cost ~17 s per
    # call and was the entire round-4 "batched is slower wall-clock"
    # anomaly (docs/PERFORMANCE.md round 5 serving section).  The
    # per-file path never had this problem (FeatureModule jits once in
    # __init__).
    fwd_cache = getattr(feature_maker, "_batched_fwd_cache", None)
    if fwd_cache is None:
        fwd_cache = {}
        feature_maker._batched_fwd_cache = fwd_cache
    fwd = fwd_cache.get(get_encoded)
    if fwd is None:
        def fwd(variables, batch, hidden, keep):
            # keep: (n_lanes,) 0/1 — zero a lane's carried hidden at file
            # starts (and every chunk when the module does not keep
            # hidden).
            hidden = jax.tree_util.tree_map(
                lambda h: h * keep[:, None].astype(h.dtype), hidden)
            c, z, _, h = model.apply(variables, batch, None, hidden,
                                     train=False)
            return (z if get_encoded else c).astype(jnp.float32), h

        fwd = jax.jit(fwd)
        fwd_cache[get_encoded] = fwd
    hidden = (model.zero_state(n_lanes)
              if hasattr(model, "zero_state") else None)

    n_total = len(seq_paths)
    pool = ThreadPoolExecutor(max_workers=decode_workers)
    try:
        pending = [(i, pool.submit(decode_file, p))
                   for i, p in enumerate(seq_paths[:2 * n_lanes])]
        next_submit = len(pending)

        # per-lane dispatch state: [file index, waveform, sample cursor]
        # or None; completed per-chunk frames accumulate in `acc` keyed by
        # file index (bookkeeping happens at READBACK time — the dispatch
        # loop runs one step ahead, see below)
        lanes: List[Any] = [None] * n_lanes
        acc: dict = {}

        def refill(lane):
            nonlocal next_submit
            if not pending:
                return False
            idx, fut = pending.pop(0)
            if next_submit < n_total:
                pending.append((next_submit,
                                pool.submit(decode_file,
                                            seq_paths[next_submit])))
                next_submit += 1
            lanes[lane] = [idx, np.asarray(fut.result(), np.float32), 0]
            acc[idx] = []
            return True

        def dispatch():
            """Build + dispatch the next chunk batch; returns
            (device_feats, meta) or None when no work is left to send.
            meta rows: (lane, file_idx, valid_frames, is_last_chunk)."""
            nonlocal hidden
            batch = np.zeros((n_lanes, 1, max_size_seq), np.float32)
            keep = np.ones((n_lanes,), np.float32)
            meta = []
            for lane in range(n_lanes):
                if lanes[lane] is None and refill(lane):
                    keep[lane] = 0.0
                st = lanes[lane]
                if st is None:
                    keep[lane] = 0.0  # dead lane: zeros in, output dropped
                    continue
                if st[2] == 0:
                    keep[lane] = 0.0  # first chunk of a file
                chunk = st[1][st[2]:st[2] + max_size_seq]
                batch[lane, 0, :len(chunk)] = chunk
                last = st[2] + max_size_seq >= len(st[1])
                meta.append((lane, st[0], len(chunk) // ds, last))
                st[2] += max_size_seq
                if last:
                    lanes[lane] = None  # lane is free for the next dispatch
            if not meta:
                return None
            if not carry_hidden:
                keep[:] = 0.0
            feats, hidden = fwd(variables, jnp.asarray(batch), hidden,
                                jnp.asarray(keep))
            if async_readback:
                # start the device->host transfer of THIS batch's output
                # now, so it rides under the next batch's host-side pack
                # + dispatch instead of serializing inside drain()'s
                # np.asarray (CPC_SERVE_ASYNC_READBACK=0 disables;
                # measured A/B in docs/PERFORMANCE.md round 5 serving)
                feats.copy_to_host_async()
            return feats, meta  # device array: NOT read back yet

        def drain(feats, meta):
            feats = np.asarray(feats)  # ONE readback per batch of chunks
            for lane, idx, valid, last in meta:
                f = feats[lane:lane + 1, :valid]
                if seq_norm:
                    mean = f.mean(axis=1, keepdims=True)
                    if valid <= 1:  # no unbiased variance of one frame
                        f = f - mean
                    else:
                        var = f.var(axis=1, keepdims=True, ddof=1)
                        f = (f - mean) / np.sqrt(var + 1e-8)
                acc[idx].append(f)
                if last:
                    parts = acc.pop(idx)
                    yield idx, (np.concatenate(parts, axis=1) if parts else
                                np.zeros((1, 0, feats.shape[-1]),
                                         np.float32))

        # 1-deep pipeline: dispatch batch t+1 (async) BEFORE reading back
        # batch t, so device compute overlaps the host readback + decode.
        inflight = dispatch()
        while inflight is not None:
            nxt = dispatch()
            for item in drain(*inflight):
                yield item
            inflight = nxt
    finally:
        pool.shutdown(wait=False, cancel_futures=True)


def load_supervised_criterion(path_checkpoint: str):
    """Rebuild + load a phone/CTC probe checkpoint
    (feature_loader.py:83-97).  Returns (criterion, variables, n_phones)."""
    from .criterion import CTCPhoneCriterion, PhoneCriterion
    from .data import parse_seq_labels

    data = ckpt.get_checkpoint_data(os.path.dirname(path_checkpoint))
    assert data is not None
    _, _, config, raw_args = data
    _, n_phones = parse_seq_labels(raw_args["pathPhone"])
    dim = config.hiddenGar if not config.onEncoder else config.hiddenEncoder
    if raw_args.get("CTC"):
        criterion = CTCPhoneCriterion(dim, n_phones, config.onEncoder)
    else:
        criterion = PhoneCriterion(dim, n_phones, config.onEncoder,
                                   n_layers=config.nLevelsPhone)
    blob = ckpt.load_checkpoint(path_checkpoint)
    if blob.get("format") == "cpc_audio_tpu":
        variables = {"params": jax.tree_util.tree_map(
            jnp.asarray, blob["cpcCriterion"])}
    else:
        kind = "ctc" if raw_args.get("CTC") else "phone"
        variables = {"params": jax.tree_util.tree_map(
            jnp.asarray, convert.convert_criterion(
                dict(blob["cpcCriterion"]), config, kind=kind))}
    return criterion, variables, n_phones
