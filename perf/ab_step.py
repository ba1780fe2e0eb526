"""Bisect the train-step overhead: fwd+bwd is ~10 ms but the full
shard_map step is ~30 ms.  Same-process slope timing of:

  grads      plain jit: loss fwd+bwd only (no update)
  adam       plain jit: fwd+bwd + psum-free Adam update (donated)
  shmap      shard_map version of 'adam' (psum + pmean metrics)
  step       the shipped make_train_step
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope_time(fn, k1=4, k2=14, reps=2):
    fn(3)
    best1 = best2 = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(k1)
        best1 = min(best1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        fn(k2)
        best2 = min(best2, time.perf_counter() - t0)
    return max((best2 - best1) / (k2 - k1), 1e-9)


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import PartitionSpec as P

    from cpc_audio_tpu.config import CPCConfig
    from cpc_audio_tpu.criterion import CPCUnsupervisedCriterion
    from cpc_audio_tpu.models import build_model
    from cpc_audio_tpu.parallel import (create_train_state, get_mesh,
                                        make_optimizer, make_train_step,
                                        shard_batch)
    from cpc_audio_tpu.parallel.train_step import TrainState, _rbg_key

    B = 32
    config = CPCConfig(compute_dtype="bfloat16")
    rng = np.random.RandomState(0)
    model = build_model(config)
    criterion = CPCUnsupervisedCriterion(
        n_predicts=config.nPredicts, dim_output_ar=config.hiddenGar,
        dim_output_encoder=config.hiddenEncoder,
        negative_sampling_ext=config.negativeSamplingExt,
        rnn_mode=config.rnnMode,
        size_input_seq=config.sizeWindow // 160)
    optimizer = make_optimizer(config.beta1, config.beta2, config.epsilon)
    mesh = get_mesh(len(jax.devices()))
    state0 = create_train_state(jax.random.PRNGKey(0), model, criterion,
                                optimizer, (2, 1, config.sizeWindow))
    batch_np = rng.randn(B * len(jax.devices()), 1,
                         config.sizeWindow).astype(np.float32)
    batch = shard_batch(mesh, batch_np)
    skey = jax.random.PRNGKey(1)

    def loss_fn(params, batch, rngs):
        c, z, lab, _ = model.apply({"params": params["model"]}, batch, None,
                                   train=True,
                                   rngs={"dropout": rngs["dropout"]})
        losses, accs = criterion.apply({"params": params["criterion"]},
                                       c, z, lab, train=True, rngs=rngs)
        return jnp.sum(losses), losses

    # --- grads only ---
    @jax.jit
    def grads_only(params, batch, key):
        k1, k2 = jax.random.split(key)
        rngs = {"sampling": k1, "dropout": _rbg_key(k2)}
        (l, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, rngs)
        return losses, grads["model"]["gEncoder"]["conv0"]["bias"]

    def run_grads(k):
        out = None
        for i in range(k):
            out, _ = grads_only(state0.params, batch,
                                jax.random.fold_in(skey, i))
        np.asarray(out)

    # --- + Adam update, donated, no shard_map ---
    def plain_step(state, batch, key, lr):
        k1, k2 = jax.random.split(key)
        rngs = {"sampling": k1, "dropout": _rbg_key(k2)}
        (l, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, rngs)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, state.batch_stats, opt_state,
                          state.step + 1), losses

    plain_step_j = jax.jit(plain_step, donate_argnums=(0,))

    state_a = state0

    def run_adam(k):
        nonlocal state_a
        losses = None
        for i in range(k):
            state_a, losses = plain_step_j(state_a, batch,
                                           jax.random.fold_in(skey, i), 2e-4)
        np.asarray(losses)

    # --- shipped shard_map step ---
    train_step = make_train_step(model, criterion, optimizer, mesh)
    state_s = create_train_state(jax.random.PRNGKey(0), model, criterion,
                                 optimizer, (2, 1, config.sizeWindow))

    def run_step(k):
        nonlocal state_s
        m = None
        for i in range(k):
            state_s, _, m = train_step(state_s, batch, None, None,
                                       jax.random.fold_in(skey, i), 2e-4)
        np.asarray(m["losses"])

    # --- shipped step with pre-split keys (no per-iter host fold_in) ---
    keys = [jax.device_put(jax.random.fold_in(skey, i)) for i in range(64)]
    state_p = create_train_state(jax.random.PRNGKey(2), model, criterion,
                                 optimizer, (2, 1, config.sizeWindow))

    def run_step_prekeys(k):
        nonlocal state_p
        m = None
        for i in range(k):
            state_p, _, m = train_step(state_p, batch, None, None,
                                       keys[i % 64], 2e-4)
        np.asarray(m["losses"])

    runs = {"grads": run_grads, "adam": run_adam, "step": run_step,
            "step_prekeys": run_step_prekeys}
    results = {k: float("inf") for k in runs}
    for _ in range(2):
        for name, fn in runs.items():
            t = slope_time(fn)
            results[name] = min(results[name], t)
            print(f"{name}: {t * 1e3:.2f} ms", flush=True)
    print("--- best ---")
    for name, t in results.items():
        print(f"{name}: {t * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
