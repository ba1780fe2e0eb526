"""CPC pretraining / supervised-probe training CLI.

Reference: /root/reference/cpc/train.py (494 LoC).  Same flag surface, same
log/checkpoint contract (plus the checkpoint_args.json sidecar the reference
forgot to write), with the compute path replaced by a jitted ``shard_map``
train step over a 1-D TPU mesh.

Usage:
    python -m cpc_audio_tpu.train --pathDB <dir> [--pathTrain x.txt]
        [--pathVal y.txt] --pathCheckpoint <out> [flags...]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time
from copy import deepcopy
from typing import Tuple

import numpy as np

from . import checkpoint as ckpt
from .config import (CPCConfig, TrainConfig, add_cpc_args,
                     config_from_namespace)
from .criterion import (CPCUnsupervisedCriterion, CTCPhoneCriterion,
                        NoneCriterion, PhoneCriterion, SpeakerCriterion)
from .data import (AudioBatchData, filter_seqs, find_all_seqs,
                   parse_seq_labels)
from .models import build_model
from .utils import misc as utils


def get_criterion(config: CPCConfig, train_config: TrainConfig,
                  downsampling: int, n_speakers: int, n_phones: int):
    """Criterion routing (reference train.py:24-51)."""
    dim_features = config.hiddenGar if not config.onEncoder \
        else config.hiddenEncoder
    if not train_config.supervised:
        if config.cpc_mode == "none":
            return NoneCriterion()
        size_input_seq = config.sizeWindow // downsampling
        return CPCUnsupervisedCriterion(
            n_predicts=config.nPredicts,
            dim_output_ar=config.hiddenGar,
            dim_output_encoder=config.hiddenEncoder,
            negative_sampling_ext=config.negativeSamplingExt,
            mode=config.cpc_mode,
            rnn_mode=config.rnnMode,
            dropout=config.dropout,
            speaker_embedding=config.speakerEmbedding,
            n_speakers=n_speakers,
            size_input_seq=size_input_seq,
            sampling_mode=config.negativeSamplingMode,
            stop_grad_negatives=config.stopGradNegatives,
            negative_sampling_scope=config.negative_sampling_scope)
    if train_config.pathPhone is not None:
        if not train_config.CTC:
            return PhoneCriterion(dim_features, n_phones, config.onEncoder,
                                  n_layers=config.nLevelsPhone)
        return CTCPhoneCriterion(dim_features, n_phones, config.onEncoder)
    return SpeakerCriterion(dim_features, n_speakers)


def _metrics_to_numpy(metrics) -> Tuple[np.ndarray, np.ndarray]:
    return (np.atleast_1d(np.asarray(metrics["losses"], np.float64)),
            np.atleast_1d(np.asarray(metrics["acc"], np.float64)))


def train_epoch(loader, train_step, state, hidden, key, lr,
                shard_fn, logging_step: int, meter=None) -> Tuple:
    """One epoch (reference trainStep, train.py:64-121).

    Loss/accuracy vectors accumulate in DEVICE buffers (two tiny async
    ``jnp.add`` dispatches per step) and are read back to the host only at
    ``logging_step`` boundaries and at epoch end.  A per-step
    ``np.asarray`` readback — through the axon tunnel — serializes step
    N's completion with step N+1's dispatch and cost ~15% of sustained
    throughput (docs/PERFORMANCE.md round 3); the reference's per-batch
    ``.item()`` equivalents are train.py:92-99."""
    import jax
    import jax.numpy as jnp
    start_time = time.perf_counter()
    n_examples = 0
    logs, last_logs = {}, None
    dev_sums = None            # device-side {losses, acc} running sums
    it = 0

    def read_back(sums):
        losses, acc = _metrics_to_numpy(sums)
        return {"locLoss_train": losses, "locAcc_train": acc}

    for step, (batch, labels) in enumerate(loader):
        n_examples += batch.shape[0]
        b, l = shard_fn(batch, labels)
        # ONE key per epoch: per-step streams derive from state.step
        # inside the jit (parallel.train_step.stream_keys) — a host-side
        # split here would dispatch a ~0.7 ms scalar-threefry program to
        # the device every step.
        state, hidden, metrics = train_step(state, b, l, hidden, key, lr)
        dev_sums = metrics if dev_sums is None else \
            jax.tree_util.tree_map(jnp.add, dev_sums, metrics)
        if meter is not None:
            meter.update(batch.shape[0])
        it += 1
        if (step + 1) % logging_step == 0:
            logs = read_back(dev_sums)       # sync point (backpressure)
            elapsed = time.perf_counter() - start_time
            print(f"Update {step + 1}")
            print(f"elapsed: {elapsed:.1f} s")
            print(f"{1000.0 * elapsed / logging_step:.1f} ms per batch, "
                  f"{1000.0 * elapsed / n_examples:.1f} ms / example")
            if meter is not None:
                print(f"throughput: {meter.summary()}")
            loc_logs = utils.update_logs(logs, logging_step, last_logs)
            last_logs = deepcopy(logs)
            utils.show_logs("Training loss", loc_logs)
            start_time, n_examples = time.perf_counter(), 0
    if it:
        logs = read_back(dev_sums)
    logs = utils.update_logs(logs, it)
    logs["iter"] = it
    utils.show_logs("Average training loss on epoch", logs)
    return logs, state, hidden, key


def val_epoch(loader, val_step, state, hidden, key, shard_fn) -> Tuple:
    """Validation pass (reference valStep, train.py:122-155).  Metrics
    accumulate on device; one host readback at the end."""
    import jax
    import jax.numpy as jnp
    logs = {}
    dev_sums = None
    it = 0
    for step, (batch, labels) in enumerate(loader):
        b, l = shard_fn(batch, labels)
        hidden, metrics = val_step(state, b, l, hidden, key, step)
        dev_sums = metrics if dev_sums is None else \
            jax.tree_util.tree_map(jnp.add, dev_sums, metrics)
        it += 1
    if it:
        losses, acc = _metrics_to_numpy(dev_sums)
        logs = {"locLoss_val": losses, "locAcc_val": acc}
    logs = utils.update_logs(logs, max(it, 1))
    logs["iter"] = it
    utils.show_logs("Validation loss:", logs)
    return logs, hidden, key


def run(train_dataset: AudioBatchData, val_dataset: AudioBatchData,
        batch_size: int, config: CPCConfig, train_config: TrainConfig,
        model, criterion, state, mesh, logs: dict,
        n_devices: int) -> None:
    """Epoch loop (reference run, train.py:158-222)."""
    import jax
    from .parallel import (make_optimizer, make_train_step, make_val_step,
                           shard_batch)
    from .utils.profiling import ThroughputMeter, profile_trace

    optimizer = make_optimizer(config.beta1, config.beta2, config.epsilon)
    keep_hidden = config.samplingType == "sequential" \
        and config.arMode in ("GRU", "LSTM", "RNN")
    hidden_example = model.zero_state(batch_size) if keep_hidden else None
    train_step = make_train_step(model, criterion, optimizer, mesh,
                                 hidden_example)
    val_step = make_val_step(model, criterion, mesh, hidden_example)

    def shard_fn(batch, labels):
        return shard_batch(mesh, batch, np.asarray(labels))

    n_epoch = config.nEpoch
    start_epoch = len(logs["epoch"])
    best_acc = -1.0
    best_state = ckpt.to_numpy_tree(state.params["model"])
    base_key = jax.random.PRNGKey(config.random_seed or 0)
    start_time = time.time()
    path_checkpoint = train_config.pathCheckpoint

    print(f"Running {n_epoch} epochs")
    for epoch in range(start_epoch, n_epoch):
        print(f"Starting epoch {epoch}")
        lr = utils.lr_for_epoch(config.learningRate, epoch,
                                config.schedulerStep, config.schedulerRamp)
        train_loader = train_dataset.get_data_loader(
            batch_size, config.samplingType, True)
        val_loader = val_dataset.get_data_loader(
            batch_size, "sequential", False)
        # len(loader) is a lower-bound estimate under samespeaker
        # sampling (ragged tail batches are completed per interval);
        # the throughput meter reports the actual step count.
        print("Training dataset ~%d batches, Validation dataset ~%d"
              " batches, batch size %d" % (len(train_loader),
                                           len(val_loader), batch_size))
        hidden = jax.tree_util.tree_map(lambda x: x * 0, hidden_example) \
            if hidden_example is not None else None
        meter = ThroughputMeter(n_devices)
        profile_dir = getattr(train_config, "profile_dir", None) \
            if epoch == start_epoch else None
        # one real fold per epoch (resume-reproducible: epoch is absolute)
        ekey = jax.random.fold_in(base_key, 2 * epoch)
        vkey = jax.random.fold_in(base_key, 2 * epoch + 1)
        with profile_trace(profile_dir):
            loc_logs_train, state, hidden, _ = train_epoch(
                train_loader, train_step, state, hidden, ekey, lr, shard_fn,
                logs["logging_step"], meter=meter)
        print(f"epoch throughput: {meter.summary()}")
        stalls = getattr(train_loader.dataset, "stall_log", None)
        if stalls and len(stalls) > 1:
            # entry 0 is the cold-start load; the rest is time training
            # actually waited on pack prefetch (loader starvation)
            print(f"loader stalls: {sum(stalls[1:]):.2f}s over "
                  f"{len(stalls) - 1} pack swaps "
                  f"(max {max(stalls[1:]):.2f}s)")
        loc_logs_val, hidden, _ = val_epoch(
            val_loader, val_step, state, hidden, vkey, shard_fn)
        print(f"Ran {epoch + 1} epochs "
              f"in {time.time() - start_time:.2f} seconds")

        if "locAcc_val" in loc_logs_val:
            current_acc = float(np.mean(loc_logs_val["locAcc_val"]))
        elif "locAcc_train" in loc_logs_train:
            # Fixed-shape batching drops ragged tails, so a validation
            # split smaller than one batch yields ZERO val batches (the
            # reference's ragged loader always yields at least one).
            # Track best on train accuracy instead of crashing.
            print("WARNING: validation set smaller than one batch; "
                  "tracking best checkpoint on train accuracy")
            current_acc = float(np.mean(loc_logs_train["locAcc_train"]))
        else:
            # Both splits smaller than one batch: nothing to rank on —
            # keep best_acc/best_state unchanged rather than KeyError.
            print("WARNING: neither split produced a batch this epoch; "
                  "best checkpoint unchanged")
            current_acc = best_acc
        if current_acc > best_acc:
            best_acc = current_acc
            best_state = ckpt.to_numpy_tree(state.params["model"])

        for k, v in dict(loc_logs_train, **loc_logs_val).items():
            if k not in logs:
                logs[k] = [None for _ in range(epoch)]
            if isinstance(v, np.ndarray):
                v = v.tolist()
            logs[k].append(v)
        logs["epoch"].append(epoch)

        if path_checkpoint is not None and (
                epoch % logs["saveStep"] == 0 or epoch == n_epoch - 1):
            ckpt.save_checkpoint(
                state.params["model"], state.params["criterion"],
                state.opt_state, best_state,
                os.path.join(path_checkpoint, f"checkpoint_{epoch}.pt"),
                batch_stats=state.batch_stats or None)
            if train_config.export_torch:
                from . import convert
                convert.export_torch_checkpoint(
                    ckpt.to_numpy_tree(state.params["model"]), config,
                    os.path.join(path_checkpoint,
                                 f"checkpoint_{epoch}.torch.pt"),
                    batch_stats=(state.batch_stats or {}).get("model"))
            utils.save_logs(logs, os.path.join(path_checkpoint,
                                               "checkpoint_logs.json"))


def main(argv=None) -> int:
    args = parse_args(argv)
    cpc_config = config_from_namespace(args)
    train_config = TrainConfig.from_dict(vars(args))

    import jax
    from .parallel import get_mesh
    from .parallel.distributed import (initialize_distributed,
                                       shard_sequences)
    from .parallel.train_step import create_train_state, make_optimizer

    if train_config.distributed:
        initialize_distributed()

    seed = utils.set_seed(cpc_config.random_seed)
    cpc_config = cpc_config.replace(random_seed=seed)
    logs = {"epoch": [], "iter": [], "saveStep": train_config.save_step,
            "logging_step": train_config.logging_step}

    load_optimizer = False
    load_paths = list(train_config.load) if train_config.load else None

    # auto-resume (train.py:231-243)
    if train_config.pathCheckpoint is not None \
            and not train_config.restart \
            and ckpt.get_checkpoint_data(train_config.pathCheckpoint):
        data = ckpt.get_checkpoint_data(train_config.pathCheckpoint)
        path_ckpt, logs_loaded, saved_config, raw_args = data
        merged = ckpt.merge_args(
            {**cpc_config.to_dict(), **train_config.to_dict()}, raw_args,
            ckpt.FORBIDDEN_RESUME_ATTRS)
        cpc_config = CPCConfig.from_dict(merged)
        train_config = TrainConfig.from_dict(
            {**train_config.to_dict(),
             **{k: v for k, v in merged.items()
                if k not in ckpt.FORBIDDEN_RESUME_ATTRS}})
        logs.update(logs_loaded)
        logs.setdefault("logging_step", train_config.logging_step)
        load_paths = [path_ckpt]
        load_optimizer = True
        print(f"Resuming from checkpoint {path_ckpt}")

    print(f'CONFIG:\n{json.dumps(cpc_config.to_dict(), indent=4, sort_keys=True)}')
    print(f'RUN CONFIG:\n{json.dumps(train_config.to_dict(), indent=4, sort_keys=True)}')

    # -- data -----------------------------------------------------------
    if not os.path.isdir(train_config.pathDB):
        print(f"ERROR: --pathDB {train_config.pathDB} is not a directory")
        return 1
    seq_names, speakers = find_all_seqs(
        train_config.pathDB, extension=train_config.file_extension,
        load_cache=not train_config.ignore_cache)
    if not seq_names:
        print(f"ERROR: no '{train_config.file_extension}' sequences found "
              f"under {train_config.pathDB}")
        return 1

    if not train_config.supervised or train_config.pathPhone is None:
        phone_labels, n_phones = None, 0
    else:
        print("Loading the phone labels at " + train_config.pathPhone)
        phone_labels, n_phones = parse_seq_labels(train_config.pathPhone)

    if train_config.pathTrain is not None:
        seq_train = filter_seqs(train_config.pathTrain, seq_names)
    else:
        seq_train = seq_names
    if train_config.pathVal is None:
        # random 99/1 split (train.py:260-264)
        shuffled = list(seq_train)
        random.shuffle(shuffled)
        size_train = int(0.99 * len(shuffled))
        seq_train, seq_val = shuffled[:size_train], shuffled[size_train:]
    else:
        seq_val = filter_seqs(train_config.pathVal, seq_names)

    if train_config.debug:
        seq_train = seq_train[:2000]
        seq_val = seq_val[:2000]

    # multi-host: each process loads a disjoint shard of the file list
    if jax.process_count() > 1:
        seq_train = shard_sequences(seq_train)
        seq_val = shard_sequences(seq_val)

    print(f"Loading audio data at {train_config.pathDB}")
    train_dataset = AudioBatchData(
        train_config.pathDB, cpc_config.sizeWindow, seq_train, phone_labels,
        len(speakers), n_process_loader=train_config.n_process_loader,
        max_size_loaded=train_config.max_size_loaded, seed=seed)
    val_dataset = AudioBatchData(
        train_config.pathDB, cpc_config.sizeWindow, seq_val, phone_labels,
        len(speakers), n_process_loader=train_config.n_process_loader,
        max_size_loaded=train_config.max_size_loaded, seed=seed)

    # -- mesh / batch ------------------------------------------------------
    n_avail = len(jax.devices())
    n_devices = n_avail if train_config.nGPU <= 0 \
        else min(train_config.nGPU, n_avail)
    mesh = get_mesh(n_devices)
    batch_size = n_devices * train_config.batchSizeGPU
    print(f"Let's use {n_devices} devices (mesh axes {mesh.axis_names})!")

    # -- model / criterion ------------------------------------------------
    # no_ar / transformer ARs emit hiddenEncoder-dim contexts; normalize
    # hiddenGar so the criterion sizing matches (reference train.py:486-487,
    # feature_loader.py:142 mutate args in place).
    if cpc_config.arMode in ("no_ar", "transformer"):
        cpc_config = cpc_config.replace(hiddenGar=cpc_config.hiddenEncoder)
    model = build_model(cpc_config)
    criterion = get_criterion(cpc_config, train_config, 160,
                              len(speakers), n_phones)
    optimizer = make_optimizer(cpc_config.beta1, cpc_config.beta2,
                               cpc_config.epsilon)
    import jax.numpy as jnp
    if train_config.supervised and train_config.pathPhone is not None:
        label_example = jnp.zeros((2, cpc_config.sizeWindow // 160),
                                  jnp.int32)
    elif train_config.supervised or cpc_config.speakerEmbedding > 0:
        label_example = jnp.zeros((2,), jnp.int32)
    else:
        label_example = None
    state = create_train_state(
        jax.random.PRNGKey(seed), model, criterion, optimizer,
        (2, 1, cpc_config.sizeWindow),
        label_example=label_example)

    if load_paths:
        from .feature_loader import load_state_into
        state = load_state_into(state, load_paths[0], cpc_config,
                                load_criterion=(train_config.loadCriterion
                                                or load_optimizer),
                                load_optimizer=load_optimizer)

    if train_config.pathCheckpoint is not None:
        os.makedirs(train_config.pathCheckpoint, exist_ok=True)
        ckpt.save_args_sidecar(train_config.pathCheckpoint, cpc_config,
                               train_config)

    run(train_dataset, val_dataset, batch_size, cpc_config, train_config,
        model, criterion, state, mesh, logs, n_devices)
    return 0


def parse_args(argv=None) -> argparse.Namespace:
    """Full reference flag surface (train.py:390-488)."""
    parser = argparse.ArgumentParser(description="TPU-native CPC trainer")
    parser = add_cpc_args(parser)
    d = TrainConfig()
    g = parser.add_argument_group("Dataset")
    g.add_argument("--pathDB", type=str, default=d.pathDB)
    g.add_argument("--file_extension", type=str, default=d.file_extension)
    g.add_argument("--pathTrain", type=str, default=d.pathTrain)
    g.add_argument("--pathVal", type=str, default=d.pathVal)
    g.add_argument("--n_process_loader", type=int, default=d.n_process_loader)
    g.add_argument("--ignore_cache", action="store_true")
    g.add_argument("--max_size_loaded", type=int, default=d.max_size_loaded)
    g = parser.add_argument_group("Supervised mode")
    g.add_argument("--supervised", action="store_true")
    g.add_argument("--pathPhone", type=str, default=d.pathPhone)
    g.add_argument("--CTC", action="store_true")
    g = parser.add_argument_group("Save")
    g.add_argument("--pathCheckpoint", type=str, default=d.pathCheckpoint)
    g.add_argument("--logging_step", type=int, default=d.logging_step)
    g.add_argument("--save_step", type=int, default=d.save_step)
    g = parser.add_argument_group("Load")
    g.add_argument("--load", type=str, default=None, nargs="*")
    g.add_argument("--loadCriterion", action="store_true")
    g.add_argument("--restart", action="store_true")
    g = parser.add_argument_group("Device")
    g.add_argument("--nGPU", type=int, default=d.nGPU,
                   help="Number of devices (kept for flag parity; -1=all)")
    g.add_argument("--batchSizeGPU", type=int, default=d.batchSizeGPU)
    parser.add_argument("--debug", action="store_true")
    g = parser.add_argument_group("TPU")
    g.add_argument("--profile_dir", type=str, default=d.profile_dir,
                   help="Write a jax.profiler trace of the first epoch here")
    g.add_argument("--distributed", action="store_true",
                   help="Initialize the multi-host JAX runtime (TPU pods)")
    g.add_argument("--export_torch", action="store_true",
                   help="Also write reference-format checkpoint_<n>.torch.pt"
                        " files the reference tooling loads directly")
    args = parser.parse_args(argv)
    if args.pathDB is None:
        parser.error("--pathDB is required")
    return args


if __name__ == "__main__":
    sys.exit(main())
