"""Cross-lingual phone transfer on Common Voice: CTC training + PER.

Reference: /root/reference/cpc/eval/common_voices_eval.py (585 LoC).

TPU-first notes: utterances pad to the dataset max (one static shape per
dataset — XLA compiles the step once); the CTC classifier keeps the
reference architecture (optional per-utterance masked seqNorm, optional
LSTM, Conv1d(dim -> nPhones+1, k=8, stride=4) so feature length divides by
4 again); beam-search PER runs through the native C++ kernel on a process
pool.

Usage:
    python -m cpc_audio_tpu.eval.common_voices train DB PHONES CKPT [...]
    python -m cpc_audio_tpu.eval.common_voices per OUTPUT_DIR [...]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import random
import sys
from typing import List, Optional, Tuple

import flax.linen as nn
import numpy as np

from .. import checkpoint as ckpt
from ..criterion.seq_alignment import beam_search, get_seq_per
from ..data import filter_seqs, find_all_seqs, parse_seq_labels
from ..data.audio_io import decode_file
from ..feature_loader import load_model
from ..models.ar import _RecurrentLayer
from ..models.encoder import Conv1d


class SingleSequenceDataset:
    """One item = one whole padded utterance + padded phone labels
    (common_voices_eval.py:32-125)."""

    def __init__(self, path_db: str, seq_names, phone_labels_dict: dict,
                 in_dim: int = 1):
        self.in_dim = in_dim
        self.seqs: List[np.ndarray] = []
        self.phones: List[np.ndarray] = []
        loaded = []
        for _, rel in seq_names:
            name = os.path.splitext(os.path.basename(rel))[0]
            if name not in phone_labels_dict:
                continue
            loaded.append((name, os.path.join(path_db, rel)))
        loaded.sort()
        self.max_size = 0
        self.max_size_phone = 0
        for name, path in loaded:
            seq = decode_file(path)
            labels = np.asarray(phone_labels_dict[name], np.int64)
            self.seqs.append(seq)
            self.phones.append(labels)
            self.max_size = max(self.max_size, len(seq))
            self.max_size_phone = max(self.max_size_phone, len(labels))
        print(f"Loaded {len(self.seqs)} sequences "
              f"(maxSizeSeq={self.max_size}, "
              f"maxSizePhone={self.max_size_phone})")

    def __len__(self):
        return len(self.seqs)

    def batches(self, batch_size: int, shuffle: bool = True,
                rng: Optional[random.Random] = None, pad_batch: bool = True):
        """Yield (seq (B,1,maxS), size_seq (B,), phone (B,maxP),
        size_phone (B,)) with a FIXED batch size (tail re-samples)."""
        order = list(range(len(self.seqs)))
        if shuffle:
            (rng or random).shuffle(order)
        for i in range(0, len(order), batch_size):
            idx = order[i:i + batch_size]
            if pad_batch and len(idx) < batch_size:
                idx = idx + order[:batch_size - len(idx)]
            B = len(idx)
            seq = np.zeros((B, 1, self.max_size), np.float32)
            phone = np.zeros((B, self.max_size_phone), np.int64)
            size_seq = np.zeros(B, np.int64)
            size_phone = np.zeros(B, np.int64)
            for j, k in enumerate(idx):
                s, p = self.seqs[k], self.phones[k]
                seq[j, 0, :len(s)] = s
                phone[j, :len(p)] = p
                size_seq[j] = len(s)
                size_phone[j] = len(p)
            yield seq, size_seq, phone, size_phone


class CTCPhoneCriterionCV(nn.Module):
    """The Common Voice CTC head (common_voices_eval.py:128-188)."""

    dim_encoder: int
    n_phones: int
    use_lstm: bool = False
    size_kernel: int = 8
    seq_norm: bool = False
    dropout: bool = False
    reduction: str = "mean"

    @property
    def blank_label(self) -> int:
        return self.n_phones

    @nn.compact
    def get_prediction(self, c_feature, feature_size, train: bool = False):
        import jax
        import jax.numpy as jnp
        B, S, H = c_feature.shape
        if self.seq_norm:
            mask = (jnp.arange(S)[None, :] < feature_size[:, None])[..., None]
            denom = jnp.maximum(feature_size, 1)[:, None, None]
            m = jnp.sum(c_feature * mask, axis=1, keepdims=True) / denom
            v = jnp.sum(((c_feature - m) * mask) ** 2, axis=1,
                        keepdims=True) / denom
            c_feature = (c_feature - m) / jnp.sqrt(v + 1e-8)
        if self.use_lstm:
            h0 = (jnp.zeros((B, self.dim_encoder), c_feature.dtype),
                  jnp.zeros((B, self.dim_encoder), c_feature.dtype))
            c_feature, _ = _RecurrentLayer(self.dim_encoder, "LSTM",
                                           name="conv1")(c_feature, h0)
        if self.dropout:
            c_feature = nn.Dropout(0.5, deterministic=not train)(c_feature)
        return Conv1d(self.n_phones + 1, self.size_kernel,
                      self.size_kernel // 2,
                      name="PhoneCriterionClassifier")(c_feature)

    def __call__(self, c_feature, feature_size, label, label_size,
                 train: bool = False):
        import jax
        import jax.numpy as jnp
        import optax
        predictions = self.get_prediction(c_feature, feature_size, train)
        feature_size = jnp.minimum(feature_size // 4, predictions.shape[1])
        S = predictions.shape[1]
        logit_pad = (jnp.arange(S)[None, :]
                     >= feature_size[:, None]).astype(jnp.float32)
        P = label.shape[1]
        label_pad = (jnp.arange(P)[None, :]
                     >= label_size[:, None]).astype(jnp.float32)
        loss = optax.ctc_loss(predictions.astype(jnp.float32), logit_pad,
                              label, label_pad, blank_id=self.n_phones)
        loss = jnp.where(jnp.isfinite(loss), loss, 0.0)  # zero_infinity
        if self.reduction == "mean":
            loss = loss / jnp.maximum(label_size, 1)
            return jnp.mean(loss)
        return jnp.sum(loss)


def _make_steps(model, model_variables, criterion, crit_params, optimizer,
                frozen: bool, downsampling: int):
    import jax
    import jax.numpy as jnp
    import optax

    def features(params_model, batch):
        if model is None:  # IDModule: pre-computed features (B, C, S)
            return jnp.swapaxes(batch, 1, 2)
        variables = dict(model_variables)
        variables["params"] = params_model
        c, z, _, _ = model.apply(variables, batch, None, train=False)
        return c

    def loss_fn(params, batch, size_seq, phone, size_phone, key):
        c = features(params["model"], batch)
        if frozen:
            c = jax.lax.stop_gradient(c)
        fsize = size_seq // downsampling
        loss = criterion.apply({"params": params["criterion"]}, c, fsize,
                               phone, size_phone, train=True,
                               rngs={"dropout": key})
        return loss

    @jax.jit
    def train_step(params, opt_state, batch, size_seq, phone, size_phone,
                   key, step, lr):
        # per-step dropout stream derives from (epoch key, step) IN-JIT: a
        # host-side jax.random.split per step dispatches a standalone
        # scalar-threefry program to the device (~0.7 ms each, CLAUDE.md)
        key = jax.random.fold_in(key, step)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, size_seq,
                                                  phone, size_phone, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def val_step(params, batch, size_seq, phone, size_phone):
        c = features(params["model"], batch)
        fsize = size_seq // downsampling
        return criterion.apply({"params": params["criterion"]}, c, fsize,
                               phone, size_phone, train=False)

    @jax.jit
    def predict_step(params, batch, size_seq):
        c = features(params["model"], batch)
        fsize = size_seq // downsampling
        pred = criterion.apply({"params": params["criterion"]}, c, fsize,
                               method=criterion.get_prediction)
        return jax.nn.softmax(pred, axis=2)

    return train_step, val_step, predict_step


def _per_one(args):
    posterior, valid, gt, blank = args
    pred_seq = beam_search(posterior[:valid], 20, blank)[0][1]
    return get_seq_per(gt, pred_seq)


def per_step(dataset, predict_step, params, batch_size: int,
             downsampling: int, blank_label: int) -> Tuple[float, float]:
    """Beam-search PER over a dataset (common_voices_eval.py:280-327).

    One persistent spawn pool for the whole dataset (per-batch pools paid
    a full interpreter + JAX re-import per worker per batch), and a
    1-deep pipeline: batch N+1's posterior dispatch + async device->host
    transfer ride under batch N's host-side beam search."""
    import multiprocessing
    from concurrent.futures import ProcessPoolExecutor
    avg, var, n = 0.0, 0.0, 0
    # spawn, not fork: forking after JAX init can deadlock
    ctx = multiprocessing.get_context("spawn")
    with ProcessPoolExecutor(max_workers=min(8, max(batch_size, 1)),
                             mp_context=ctx) as ex:

        def drain(posts_dev, size_seq, phone, size_phone):
            nonlocal avg, var, n
            posts = np.asarray(posts_dev)  # transfer started at dispatch
            jobs = []
            for b in range(len(size_seq)):
                valid = int(min(size_seq[b] // downsampling // 4,
                                posts.shape[1]))
                gt = phone[b, :size_phone[b]].tolist()
                jobs.append((posts[b], valid, gt, blank_label))
            values = list(ex.map(_per_one, jobs))
            avg += float(np.sum(values))
            var += float(np.sum(np.square(values)))
            n += len(values)

        pending = None
        for seq, size_seq, phone, size_phone in dataset.batches(
                batch_size, shuffle=False, pad_batch=False):
            posts_dev = predict_step(params, seq, size_seq)
            posts_dev.copy_to_host_async()
            if pending is not None:
                drain(*pending)
            pending = (posts_dev, size_seq, phone, size_phone)
        if pending is not None:
            drain(*pending)
    avg /= n
    var = var / n - avg ** 2
    print(f"Average PER {avg}")
    print(f"Standard deviation PER {math.sqrt(max(var, 0.0))}")
    return avg, math.sqrt(max(var, 0.0))


def run_training(train_dataset, val_dataset, train_step, val_step, params,
                 opt_state, batch_size, n_epochs, lr, path_checkpoint,
                 seed: int = 0):
    import jax
    best_loss = float("inf")
    rng = random.Random(seed)
    key = jax.random.PRNGKey(seed)
    for epoch in range(n_epochs):
        # losses accumulate in a DEVICE buffer (one tiny async add per
        # step) and are read back once per epoch: a per-step float(loss)
        # through the axon tunnel serializes step N's completion with
        # step N+1's dispatch (same pattern as train.train_epoch)
        key, epoch_key = jax.random.split(key)  # ONE host split per epoch
        tot, n = None, 0
        for seq, ss, ph, sp in train_dataset.batches(batch_size, True, rng):
            params, opt_state, loss = train_step(params, opt_state, seq, ss,
                                                 ph, sp, epoch_key, n, lr)
            tot = loss if tot is None else tot + loss
            n += 1
        tot = float(tot) if tot is not None else 0.0
        print(f"Epoch {epoch} loss train : {tot / max(n, 1)}")
        tot, n = None, 0
        for seq, ss, ph, sp in val_dataset.batches(batch_size, False):
            loss = val_step(params, seq, ss, ph, sp)
            tot = loss if tot is None else tot + loss
            n += 1
        tot = float(tot) if tot is not None else 0.0
        loss_val = tot / max(n, 1)
        print(f"Epoch {epoch} loss val : {loss_val}")
        if loss_val < best_loss:
            best_loss = loss_val
            blob = {"format": "cpc_audio_tpu", "version": 1,
                    "classifier": ckpt.to_numpy_tree(params["criterion"]),
                    "model": ckpt.to_numpy_tree(params["model"]),
                    "bestLoss": best_loss}
            import pickle
            with open(path_checkpoint, "wb") as f:
                pickle.dump(blob, f, protocol=4)
    return params, opt_state, best_loss


def build_parser():
    parser = argparse.ArgumentParser(
        description="Simple phone recognition pipeline for Common Voice")
    subparsers = parser.add_subparsers(dest="command")
    p = subparsers.add_parser("train")
    p.add_argument("pathDB", type=str)
    p.add_argument("pathPhone", type=str)
    p.add_argument("pathCheckpoint", type=str,
                   help="CPC checkpoint, or ID for pre-computed features")
    p.add_argument("--freeze", action="store_true")
    p.add_argument("--pathTrain", default=None, type=str)
    p.add_argument("--pathVal", default=None, type=str)
    p.add_argument("--file_extension", type=str, default=".mp3")
    p.add_argument("--batchSize", type=int, default=8)
    p.add_argument("--nEpochs", type=int, default=30)
    p.add_argument("--beta1", type=float, default=0.9)
    p.add_argument("--beta2", type=float, default=0.999)
    p.add_argument("--epsilon", type=float, default=1e-8)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("-o", "--output", type=str, default="out")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--no_pretraining", action="store_true")
    p.add_argument("--LSTM", action="store_true")
    p.add_argument("--seqNorm", action="store_true")
    p.add_argument("--kernelSize", type=int, default=8)
    p.add_argument("--dropout", action="store_true")
    p.add_argument("--in_dim", type=int, default=1)
    p.add_argument("--loss_reduction", type=str, default="mean",
                   choices=["mean", "sum"])
    p.add_argument("--seed", type=int, default=0)

    p = subparsers.add_parser("per")
    p.add_argument("output", type=str)
    p.add_argument("--batchSize", type=int, default=8)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--pathDB", type=str, default=None)
    p.add_argument("--pathVal", type=str, default=None)
    p.add_argument("--pathPhone", type=str, default=None)
    p.add_argument("--file_extension", type=str, default=".mp3")
    p.add_argument("--name", type=str, default="0")
    p.add_argument("--seed", type=int, default=0)
    return parser


def get_per_args(args):
    """Restore training args for the per subcommand
    (common_voices_eval.py:359-380)."""
    with open(os.path.join(args.output, "args_training.json")) as f:
        data = json.load(f)
    if args.pathDB is None:
        args.pathDB = data["pathDB"]
        args.file_extension = data["file_extension"]
    if args.pathVal is None and args.pathPhone is None:
        args.pathPhone = data["pathPhone"]
        args.pathVal = data["pathVal"]
    args.pathCheckpoint = data["pathCheckpoint"]
    args.no_pretraining = data["no_pretraining"]
    args.LSTM = data.get("LSTM", False)
    args.seqNorm = data.get("seqNorm", False)
    args.dropout = data.get("dropout", False)
    args.in_dim = data.get("in_dim", 1)
    args.loss_reduction = data.get("loss_reduction", "mean")
    args.kernelSize = data.get("kernelSize", 8)
    return args


def main(argv=None) -> int:
    import jax
    import jax.numpy as jnp
    from ..parallel import make_optimizer

    args = build_parser().parse_args(argv if argv is not None
                                     else sys.argv[1:])
    if args.command == "per":
        args = get_per_args(args)
    elif args.command != "train":
        build_parser().print_usage()
        return 2

    os.makedirs(args.output, exist_ok=True)
    phone_labels, n_phones = parse_seq_labels(args.pathPhone)
    in_seqs, _ = find_all_seqs(args.pathDB, extension=args.file_extension)

    if args.command == "train" and args.pathTrain is not None:
        seq_train = filter_seqs(args.pathTrain, in_seqs)
    else:
        seq_train = in_seqs
    if args.pathVal is None and args.command == "train":
        rng = random.Random(args.seed)
        seq_train = list(seq_train)
        rng.shuffle(seq_train)
        size_train = int(0.9 * len(seq_train))
        seq_train, seq_val = seq_train[:size_train], seq_train[size_train:]
    elif args.pathVal is not None:
        seq_val = filter_seqs(args.pathVal, in_seqs)
    else:
        raise RuntimeError("No validation dataset found for PER computation")
    if args.debug:
        seq_val = seq_val[:100]

    downsampling = 160
    if args.pathCheckpoint == "ID":
        downsampling = 1
        model, model_variables = None, {}
        hidden_gar = args.in_dim
    else:
        model, model_variables, hidden_gar, _ = load_model(
            [args.pathCheckpoint], load_state_dict=not args.no_pretraining)

    criterion = CTCPhoneCriterionCV(hidden_gar, n_phones, args.LSTM,
                                    size_kernel=args.kernelSize,
                                    seq_norm=args.seqNorm,
                                    dropout=args.dropout,
                                    reduction=args.loss_reduction)
    c_ex = jnp.zeros((2, 16, hidden_gar))
    crit_vars = criterion.init(
        {"params": jax.random.PRNGKey(args.seed),
         "dropout": jax.random.PRNGKey(1)},
        c_ex, jnp.full((2,), 16), jnp.zeros((2, 8), jnp.int32),
        jnp.full((2,), 8))

    print(f"Loading the validation dataset at {args.pathDB}")
    dataset_val = SingleSequenceDataset(args.pathDB, seq_val, phone_labels,
                                        in_dim=args.in_dim)
    path_checkpoint = os.path.join(args.output, "checkpoint.pt")

    optimizer = make_optimizer(getattr(args, "beta1", 0.9),
                               getattr(args, "beta2", 0.999),
                               getattr(args, "epsilon", 1e-8))
    params = {"model": model_variables.get("params", {}),
              "criterion": crit_vars["params"]}

    frozen = args.command == "train" and args.freeze
    train_step, val_step, predict_step = _make_steps(
        model, model_variables, criterion, crit_vars["params"], optimizer,
        frozen, downsampling)

    if args.command == "train":
        if args.debug:
            random.shuffle(seq_train)
            seq_train = seq_train[:1000]
        print(f"Loading the training dataset at {args.pathDB}")
        dataset_train = SingleSequenceDataset(args.pathDB, seq_train,
                                              phone_labels,
                                              in_dim=args.in_dim)
        with open(os.path.join(args.output, "args_training.json"),
                  "w") as f:
            json.dump({**vars(args), "command": "train"}, f, indent=2)
        opt_state = optimizer.init(params)
        run_training(dataset_train, dataset_val, train_step, val_step,
                     params, opt_state, args.batchSize, args.nEpochs,
                     args.lr, path_checkpoint, seed=args.seed)
    else:
        import pickle
        print(f"Loading data at {path_checkpoint}")
        with open(path_checkpoint, "rb") as f:
            blob = pickle.load(f)
        if "bestLoss" in blob:
            print(f"Best loss : {blob['bestLoss']}")
        params = {"model": jax.tree_util.tree_map(jnp.asarray,
                                                  blob["model"]),
                  "criterion": jax.tree_util.tree_map(jnp.asarray,
                                                      blob["classifier"])}
        with open(os.path.join(args.output,
                               f"args_validation_{args.name}.json"),
                  "w") as f:
            json.dump(vars(args), f, indent=2)
        per_step(dataset_val, predict_step, params, args.batchSize,
                 downsampling, criterion.blank_label)
    return 0


if __name__ == "__main__":
    sys.exit(main())
