"""Linear separability probes: speaker / phone / CTC-phone.

Reference: /root/reference/cpc/eval/linear_separability.py (275 LoC).

Trains a probe criterion on frozen (default) or fine-tuned CPC features.
The probe step runs under ``shard_map`` like the main trainer; in frozen
mode only the criterion parameters are differentiated (the reference set
requires_grad=False on the feature maker, linear_separability.py:253-254).

Usage:
    python -m cpc_audio_tpu.eval.linear_separability DB TRAIN VAL CKPT \
        [--pathPhone P [--CTC]] [--unfrozen] [--get_encoded] ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

from .. import checkpoint as ckpt
from ..criterion import CTCPhoneCriterion, PhoneCriterion, SpeakerCriterion
from ..data import AudioBatchData, filter_seqs, find_all_seqs, parse_seq_labels
from ..feature_loader import load_model
from ..utils import misc as utils


def make_probe_step(model, criterion, optimizer, mesh, frozen: bool,
                    train: bool):
    """Build the jitted probe train/val step.

    frozen: gradients flow only into criterion params; features are
    stop-gradient (reference .detach(), linear_separability.py:33-35)."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import PartitionSpec as P
    from ..parallel.mesh import DATA_AXIS

    def forward(params, batch_stats, batch, labels, train_flag):
        variables = {"params": params["model"]}
        if batch_stats:
            variables["batch_stats"] = batch_stats["model"]
        c, z, lab, _ = model.apply(variables, batch, labels, train=train_flag)
        return c, z, lab

    def step_impl(state, batch, labels, key, lr):
        if not train:
            c, z, lab = forward(state.params, state.batch_stats, batch,
                                labels, False)
            losses, accs = criterion.apply(
                {"params": state.params["criterion"]}, c, z, labels,
                train=False)
            metrics = {"losses": jax.lax.pmean(losses, DATA_AXIS),
                       "acc": jax.lax.pmean(accs, DATA_AXIS)}
            return state, metrics

        def loss_fn(diff_params):
            if frozen:
                params = {"model": state.params["model"],
                          "criterion": diff_params}
            else:
                params = diff_params
            c, z, lab = forward(params, state.batch_stats, batch, labels,
                                not frozen)
            if frozen:
                c = jax.lax.stop_gradient(c)
                z = jax.lax.stop_gradient(z)
            losses, accs = criterion.apply({"params": params["criterion"]},
                                           c, z, labels, train=True)
            return jnp.sum(losses), (losses, accs)

        diff = state.params["criterion"] if frozen else state.params
        grads, (losses, accs) = jax.grad(loss_fn, has_aux=True)(diff)
        grads = jax.lax.psum(grads, DATA_AXIS)
        if frozen:
            grads = {"model": jax.tree_util.tree_map(jnp.zeros_like,
                                                     state.params["model"]),
                     "criterion": grads}
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        params = optax.apply_updates(state.params, updates)
        metrics = {"losses": jax.lax.pmean(losses, DATA_AXIS),
                   "acc": jax.lax.pmean(accs, DATA_AXIS)}
        new_state = state._replace(params=params, opt_state=opt_state,
                                   step=state.step + 1)
        return new_state, metrics

    sharded = jax.shard_map(
        step_impl, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(sharded)


def run(state, train_step, val_step, train_dataset, val_dataset, batch_size,
        n_epochs, save_step, path_checkpoint, lr, logs, mesh, seed=0):
    import jax
    from ..parallel import shard_batch

    start_epoch = len(logs["epoch"])
    best_acc = -1.0
    best_state = ckpt.to_numpy_tree(state.params)
    key = jax.random.PRNGKey(seed)
    start_time = time.time()

    import jax.numpy as jnp

    def _epoch_means(dev_sums, it, suffix):
        # one host readback per epoch (train.py's device-buffer metrics:
        # a per-step np.asarray through the axon tunnel serializes step
        # dispatches on the readback RTT)
        if dev_sums is None:
            return {f"locLoss_{suffix}": np.asarray([0.0]),
                    f"locAcc_{suffix}": np.asarray([0.0])}
        return {f"locLoss_{suffix}": np.asarray(
                    [float(np.mean(np.asarray(dev_sums["losses"]))) / it]),
                f"locAcc_{suffix}": np.asarray(
                    [float(np.mean(np.asarray(dev_sums["acc"]))) / it])}

    for epoch in range(start_epoch, n_epochs):
        train_loader = train_dataset.get_data_loader(batch_size, "uniform",
                                                     True)
        val_loader = val_dataset.get_data_loader(batch_size, "sequential",
                                                 False)
        # one key per epoch: the probe step takes a key for signature
        # parity but derives nothing from it per step, and a host-side
        # split per step dispatches a standalone threefry program
        key, sub = jax.random.split(key)
        dev_sums = None
        it = 0
        for batch, labels in train_loader:
            b, l = shard_batch(mesh, batch, np.asarray(labels))
            state, metrics = train_step(state, b, l, sub, lr)
            dev_sums = metrics if dev_sums is None else \
                jax.tree_util.tree_map(jnp.add, dev_sums, metrics)
            it += 1
        logs_train = _epoch_means(dev_sums, max(it, 1), "train")

        dev_sums = None
        it = 0
        for batch, labels in val_loader:
            b, l = shard_batch(mesh, batch, np.asarray(labels))
            _, metrics = val_step(state, b, l, sub, 0.0)
            dev_sums = metrics if dev_sums is None else \
                jax.tree_util.tree_map(jnp.add, dev_sums, metrics)
            it += 1
        logs_val = _epoch_means(dev_sums, max(it, 1), "val")

        print("")
        print("_" * 50)
        print(f"Ran {epoch + 1} epochs in {time.time() - start_time:.2f} "
              f"seconds")
        utils.show_logs("Training loss", logs_train)
        utils.show_logs("Validation loss", logs_val)
        print("_" * 50)

        if float(logs_val["locAcc_val"][0]) > best_acc:
            best_state = ckpt.to_numpy_tree(state.params)
            best_acc = float(logs_val["locAcc_val"][0])

        logs["epoch"].append(epoch)
        for k, v in dict(logs_train, **logs_val).items():
            if k not in logs:
                logs[k] = [None for _ in range(epoch)]
            logs[k].append(v.tolist() if isinstance(v, np.ndarray) else v)

        if (epoch % save_step == 0 and epoch > 0) or epoch == n_epochs - 1:
            ckpt.save_checkpoint(
                state.params["model"], state.params["criterion"],
                state.opt_state, best_state,
                os.path.join(path_checkpoint, f"checkpoint_{epoch}.pt"),
                batch_stats=state.batch_stats or None)
            utils.save_logs(logs, os.path.join(path_checkpoint,
                                               "checkpoint_logs.json"))
    return state, best_acc


def parse_args(argv):
    parser = argparse.ArgumentParser(
        description="Linear separability trainer "
                    "(default: speaker separability)")
    parser.add_argument("pathDB", type=str)
    parser.add_argument("pathTrain", type=str)
    parser.add_argument("pathVal", type=str)
    parser.add_argument("load", type=str, nargs="*")
    parser.add_argument("--pathPhone", type=str, default=None)
    parser.add_argument("--CTC", action="store_true")
    parser.add_argument("--pathCheckpoint", type=str, default="out")
    parser.add_argument("--nGPU", type=int, default=-1)
    parser.add_argument("--batchSizeGPU", type=int, default=8)
    parser.add_argument("--n_epoch", type=int, default=10)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--unfrozen", action="store_true")
    parser.add_argument("--no_pretraining", action="store_true")
    parser.add_argument("--file_extension", type=str, default=".flac")
    parser.add_argument("--save_step", type=int, default=-1)
    parser.add_argument("--get_encoded", action="store_true")
    parser.add_argument("--lr", type=float, default=2e-4)
    parser.add_argument("--beta1", type=float, default=0.9)
    parser.add_argument("--beta2", type=float, default=0.999)
    parser.add_argument("--epsilon", type=float, default=2e-8)
    parser.add_argument("--ignore_cache", action="store_true")
    parser.add_argument("--size_window", type=int, default=20480)
    parser.add_argument("--random_seed", type=int, default=0)
    args = parser.parse_args(argv)
    if args.save_step <= 0:
        args.save_step = args.n_epoch
    args.load = [os.path.abspath(x) for x in args.load]
    args.pathCheckpoint = os.path.abspath(args.pathCheckpoint)
    return args


def main(argv=None) -> int:
    import jax
    import jax.numpy as jnp
    from ..parallel import get_mesh, make_optimizer
    from ..parallel.train_step import TrainState

    args = parse_args(argv if argv is not None else sys.argv[1:])
    logs = {"epoch": [], "iter": [], "saveStep": args.save_step}

    seq_names, speakers = find_all_seqs(args.pathDB,
                                        extension=args.file_extension,
                                        load_cache=not args.ignore_cache)

    model, variables, hidden_gar, hidden_encoder = load_model(
        args.load, load_state_dict=not args.no_pretraining)
    dim_features = hidden_encoder if args.get_encoded else hidden_gar

    phone_labels, n_phones = None, 0
    if args.pathPhone is not None:
        phone_labels, n_phones = parse_seq_labels(args.pathPhone)
        if not args.CTC:
            print("Running phone separability with aligned phones")
            criterion = PhoneCriterion(dim_features, n_phones,
                                       args.get_encoded)
        else:
            print("Running phone separability with CTC loss")
            criterion = CTCPhoneCriterion(dim_features, n_phones,
                                          args.get_encoded)
    else:
        print("Running speaker separability")
        criterion = SpeakerCriterion(dim_features, len(speakers))

    seq_train = filter_seqs(args.pathTrain, seq_names)
    seq_val = filter_seqs(args.pathVal, seq_names)
    if args.debug:
        seq_train = seq_train[:1000]
        seq_val = seq_val[:100]

    db_train = AudioBatchData(args.pathDB, args.size_window, seq_train,
                              phone_labels, len(speakers),
                              seed=args.random_seed)
    db_val = AudioBatchData(args.pathDB, args.size_window, seq_val,
                            phone_labels, len(speakers),
                            seed=args.random_seed)

    n_avail = len(jax.devices())
    n_devices = n_avail if args.nGPU <= 0 else min(args.nGPU, n_avail)
    mesh = get_mesh(n_devices)
    batch_size = args.batchSizeGPU * n_devices

    # init criterion params with example shapes
    B = 2
    c_dim = hidden_gar
    frames = args.size_window // 160
    c_ex = jnp.zeros((B, frames, c_dim))
    z_ex = jnp.zeros((B, frames, hidden_encoder))
    if args.pathPhone is not None:
        label_ex = jnp.zeros((B, frames), jnp.int32)
    else:
        label_ex = jnp.zeros((B,), jnp.int32)
    crit_vars = criterion.init({"params": jax.random.PRNGKey(args.random_seed)},
                               c_ex, z_ex, label_ex)

    optimizer = make_optimizer(args.beta1, args.beta2, args.epsilon)
    params = {"model": variables["params"],
              "criterion": crit_vars.get("params", {})}
    batch_stats = {"model": variables["batch_stats"]} \
        if "batch_stats" in variables else {}
    state = TrainState(params, batch_stats, optimizer.init(params),
                       jnp.zeros((), jnp.int32))

    frozen = not args.unfrozen
    print("Working with frozen features" if frozen
          else "Working in full fine-tune mode")
    train_step = make_probe_step(model, criterion, optimizer, mesh, frozen,
                                 train=True)
    val_step = make_probe_step(model, criterion, optimizer, mesh, frozen,
                               train=False)

    os.makedirs(args.pathCheckpoint, exist_ok=True)
    # args sidecar (linear_separability.py:265-266) + model-config fields so
    # load_model / load_supervised_criterion can rebuild from this directory
    sidecar = dict(model.config.to_dict()) if hasattr(model, "config") \
        else dict(model.configs[0].to_dict())
    sidecar.update(vars(args))
    sidecar["onEncoder"] = args.get_encoded
    with open(os.path.join(args.pathCheckpoint, "checkpoint_args.json"),
              "w") as f:
        json.dump(sidecar, f, indent=2)

    run(state, train_step, val_step, db_train, db_val, batch_size,
        args.n_epoch, args.save_step, args.pathCheckpoint, args.lr, logs,
        mesh, seed=args.random_seed)
    return 0


if __name__ == "__main__":
    sys.exit(main())
