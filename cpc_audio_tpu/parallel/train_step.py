"""Jitted, sharded train/val steps.

Replaces the reference's DataParallel train loop body
(/root/reference/cpc/train.py:64-155) with a single compiled program:
forward (encoder + AR), InfoNCE, backward, Adam update — all under
``shard_map`` on a 1-D ``data`` mesh.

Parity notes:
  * Per-device negative sampling: the RNG key folds in the device index, so
    each shard samples negatives within its own local batch — the same
    semantics as wrapping the criterion in DataParallel (train.py:374).
  * Loss/grad reduction: the backward objective is the SUM over devices of
    per-device mean CE summed over prediction steps, exactly
    ``allLosses.sum().backward()`` over the gathered (nGPU, K) tensor
    (train.py:85); logged metrics are the device MEAN (train.py:97-98).
  * Adam: optax.scale_by_adam(eps_root=0) matches torch.optim.Adam; the
    learning rate enters as a traced scalar so per-epoch scheduling
    (utils.lr_for_epoch) needs no recompilation.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import DATA_AXIS


def stream_keys(key, step, d):
    """(sampling, dropout) keys for (train step, device) — arithmetically.

    A single-block threefry (``fold_in``/``split``) costs ~0.7 ms on v5e
    whether dispatched as its own tiny program from the host loop or
    lowered in-jit (XLA emits a SCALAR rotate chain) — two of them were
    1.45 ms of a 21 ms step in the device trace.  Stream selection only
    needs distinct key words — the downstream threefry/rbg block cipher
    provides the avalanche — so step and device indices are mixed in with
    odd-constant integer multiplies (Fibonacci hashing), letting callers
    pass ONE key for a whole epoch.  The manual DataParallel replay
    (tests/test_distributed.py) uses this same helper, keeping the
    8-device step bit-reproducible."""
    bits = jax.random.key_data(key).reshape(-1)[:2].astype(jnp.uint32)
    s, d = jnp.uint32(step), jnp.uint32(d)
    m0 = (s + 1) * jnp.uint32(0x9E3779B9) ^ (d + 1) * jnp.uint32(0x85EBCA6B)
    m1 = (s + 1) * jnp.uint32(0xC2B2AE35) ^ (d + 1) * jnp.uint32(0x27D4EB2F)
    k_sample = jnp.stack([bits[0] ^ m0, bits[1] ^ m1])
    # swapped mixes: a distinct stream even under threefry<->rbg reuse
    k_drop = jnp.stack([bits[0] ^ m1, bits[1] ^ m0])
    return (jax.random.wrap_key_data(k_sample),
            jax.random.wrap_key_data(k_drop))


def _rbg_key(key):
    """Dropout stream as an 'rbg' key: hardware-backed bit generation is
    ~3 ms/step cheaper than threefry at the bench config (same-session
    A/B, docs/PERFORMANCE.md).  Dropout only needs statistical
    independence; negative SAMPLING stays threefry for reproducibility."""
    bits = jax.random.key_data(key) \
        if jnp.issubdtype(key.dtype, jax.dtypes.prng_key) else key
    return jax.random.wrap_key_data(jnp.tile(bits.reshape(-1)[:2], 2),
                                    impl="rbg")


class TrainState(NamedTuple):
    params: Any          # {"model": ..., "criterion": ...}
    batch_stats: Any     # {} when the encoder has no batchNorm
    opt_state: Any
    step: jax.Array


def make_optimizer(beta1: float = 0.9, beta2: float = 0.999,
                   epsilon: float = 1e-8) -> optax.GradientTransformation:
    """Adam direction; the step scales by the traced lr inside train_step.

    Plain per-leaf moments.  The DEFINITIVE comparison — three full-step
    device traces, same process, everything else fixed — is per-leaf
    18.40 < width-grouped 18.97 < optax.flatten 19.56 ms/step on the
    37-leaf/17.6M default tree: inside the step XLA fuses each leaf's
    update with its gradient producer/consumer, while any flattening
    scheme pays concat/relayout traffic it cannot win back.  (Two earlier
    flip-flops came from bad instruments: a constant-gradient microbench
    lets XLA over-simplify, and op-category accounting mis-attributes
    fusions — docs/PERFORMANCE.md round 2.)"""
    return optax.chain(
        optax.scale_by_adam(b1=beta1, b2=beta2, eps=epsilon, eps_root=0.0),
        optax.scale(-1.0),
    )


def create_train_state(rng: jax.Array, model, criterion,
                       optimizer: optax.GradientTransformation,
                       batch_shape: Tuple[int, ...],
                       label_example=None) -> TrainState:
    """Initialize model+criterion parameters with dummy shapes."""
    k_model, k_crit, k_sample = jax.random.split(rng, 3)
    dummy = jnp.zeros(batch_shape, jnp.float32)
    model_vars = model.init({"params": k_model}, dummy, label_example,
                            train=True)
    c, z, _, _ = model.apply(model_vars, dummy, label_example, train=False)
    crit_vars = criterion.init(
        {"params": k_crit, "sampling": k_sample, "dropout": k_sample},
        c, z, label_example, train=False)
    params = {"model": model_vars["params"],
              "criterion": crit_vars.get("params", {})}
    batch_stats = {"model": model_vars["batch_stats"]} \
        if "batch_stats" in model_vars else {}
    opt_state = optimizer.init(params)
    return TrainState(params, batch_stats, opt_state,
                      jnp.zeros((), jnp.int32))


def _model_variables(params, batch_stats):
    v = {"params": params["model"]}
    if batch_stats:
        v["batch_stats"] = batch_stats["model"]
    return v


def _forward_loss(model, criterion, params, batch_stats, batch, labels,
                  hidden, rngs, train: bool):
    model_vars = _model_variables(params, batch_stats)
    # The transformer AR has dropout inside the model (transformers.py:75).
    model_rngs = {"dropout": rngs["dropout"]} if train and rngs else None
    if batch_stats and train:
        (c, z, lab, hid), updated = model.apply(
            model_vars, batch, labels, hidden, train=True,
            mutable=["batch_stats"], rngs=model_rngs)
        new_stats = {"model": updated["batch_stats"]}
    else:
        c, z, lab, hid = model.apply(model_vars, batch, labels, hidden,
                                     train=train, rngs=model_rngs)
        new_stats = batch_stats
    losses, accs = criterion.apply({"params": params["criterion"]}, c, z,
                                   lab, train=train, rngs=rngs)
    return losses, accs, new_stats, hid


def _hidden_spec(hidden):
    """Hidden-state leaves are (layers, B, H): batch on axis 1."""
    return jax.tree_util.tree_map(lambda _: P(None, DATA_AXIS), hidden)


def make_train_step(model, criterion, optimizer, mesh: Mesh,
                    hidden_example=None, donate: bool = True):
    """Build the jitted sharded train step.

    Signature: ``train_step(state, batch, labels, hidden, key, lr)
    -> (state, hidden_out, metrics)`` where metrics = {losses (K,), acc (K,)}.
    """
    hspec = _hidden_spec(hidden_example)

    def step_impl(state: TrainState, batch, labels, hidden, key, lr):
        k_sample, k_drop = stream_keys(key, state.step,
                                       jax.lax.axis_index(DATA_AXIS))
        rngs = {"sampling": k_sample, "dropout": _rbg_key(k_drop)}

        def loss_fn(params):
            losses, accs, new_stats, hid = _forward_loss(
                model, criterion, params, state.batch_stats, batch, labels,
                hidden, rngs, train=True)
            return jnp.sum(losses), (losses, accs, new_stats, hid)

        grads, (losses, accs, new_stats, hid) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        # DataParallel-sum parity: gradient of the device-summed loss.
        grads = jax.lax.psum(grads, DATA_AXIS)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        # one fused scale+add kernel per leaf (kernel count, not math,
        # dominates the optimizer cost on this chip; docs/PERFORMANCE.md)
        params = jax.tree_util.tree_map(
            lambda p, u: p + lr * u.astype(p.dtype), state.params, updates)
        if new_stats:
            # Deliberate deviation (docs/DESIGN.md): BatchNorm running
            # stats are pmean'd over the data axis each step, so every
            # replica holds the same (all-shard) statistics.  The
            # reference's DataParallel keeps only the master GPU's
            # replica stats (replicas re-broadcast each forward,
            # /root/reference/cpc/model.py:69-80 under train.py:372) —
            # i.e. stats from 1/n of the global batch.  Synced stats are
            # the principled multi-device semantics (cf. SyncBatchNorm)
            # and keep checkpoints replica-independent.  Pinned by
            # tests/test_distributed.py::test_batch_stats_pmean_semantics.
            new_stats = jax.lax.pmean(new_stats, DATA_AXIS)
        metrics = {"losses": jax.lax.pmean(losses, DATA_AXIS),
                   "acc": jax.lax.pmean(accs, DATA_AXIS)}
        new_state = TrainState(params, new_stats, opt_state, state.step + 1)
        if hidden_example is None:
            hid = None  # not carried; keep out_specs pytree-compatible
        return new_state, hid, metrics

    sharded = jax.shard_map(
        step_impl, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), hspec, P(), P()),
        out_specs=(P(), hspec, P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def make_val_step(model, criterion, mesh: Mesh, hidden_example=None):
    """``val_step(state, batch, labels, hidden, key, step) -> (hidden,
    metrics)`` (train.py:122-155).  ``step`` is the batch index — the
    caller passes ONE key per epoch (see stream_keys)."""
    hspec = _hidden_spec(hidden_example)

    def step_impl(state: TrainState, batch, labels, hidden, key, step):
        k_sample, _ = stream_keys(key, step,
                                  jax.lax.axis_index(DATA_AXIS))
        rngs = {"sampling": k_sample}
        losses, accs, _, hid = _forward_loss(
            model, criterion, state.params, state.batch_stats, batch,
            labels, hidden, rngs, train=False)
        metrics = {"losses": jax.lax.pmean(losses, DATA_AXIS),
                   "acc": jax.lax.pmean(accs, DATA_AXIS)}
        if hidden_example is None:
            hid = None
        return hid, metrics

    sharded = jax.shard_map(
        step_impl, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), hspec, P(), P()),
        out_specs=(hspec, P()),
        check_vma=False)
    return jax.jit(sharded)
