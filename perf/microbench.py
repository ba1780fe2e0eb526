"""Component microbenchmarks on the real TPU (readback-slope timing).

Usage: python perf/microbench.py [step|heads|crit|crit_sg|neg] ...

Timing: through the axon tunnel, dispatch completion is not execution
completion; every measurement forces a device->host readback and takes the
slope between two chained run lengths (see bench.py / CLAUDE.md).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _grad_probe(tree):
    """Scalar depending on every gradient leaf.  WITHOUT this, a jit that
    returns only the loss lets XLA DCE the whole backward pass — early
    round-2 component numbers silently measured forward-only."""
    import jax
    import jax.numpy as jnp
    return sum(jnp.sum(g.astype(jnp.float32))
               for g in jax.tree_util.tree_leaves(tree))


def slope_time(fn, k1=4, k2=14, reps=3):
    """fn(k) must run k chained iterations and force a readback."""
    fn(3)  # compile + warm
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

    from cpc_audio_tpu.config import CPCConfig
    from cpc_audio_tpu.criterion import CPCUnsupervisedCriterion

    which = sys.argv[1:] or ["step", "heads", "crit", "crit_sg"]
    B, S, C, K, N = 32, 128, 256, 12, 128
    W = S - K
    config = CPCConfig(compute_dtype="bfloat16")
    rng = np.random.RandomState(0)
    results = {}

    if "step" in which:
        from cpc_audio_tpu.models import build_model
        from cpc_audio_tpu.parallel import (create_train_state, get_mesh,
                                            make_optimizer, make_train_step,
                                            shard_batch)
        model = build_model(config)
        criterion = CPCUnsupervisedCriterion(
            n_predicts=config.nPredicts, dim_output_ar=config.hiddenGar,
            dim_output_encoder=config.hiddenEncoder,
            negative_sampling_ext=config.negativeSamplingExt,
            rnn_mode=config.rnnMode,
            size_input_seq=config.sizeWindow // 160)
        optimizer = make_optimizer(config.beta1, config.beta2, config.epsilon)
        mesh = get_mesh(len(jax.devices()))
        state = create_train_state(jax.random.PRNGKey(0), model, criterion,
                                   optimizer, (2, 1, config.sizeWindow))
        train_step = make_train_step(model, criterion, optimizer, mesh)
        batch = shard_batch(mesh, rng.randn(
            B * len(jax.devices()), 1, config.sizeWindow).astype(np.float32))
        key = jax.random.PRNGKey(1)

        def run(k):
            nonlocal state
            m = None
            for i in range(k):
                state, _, m = train_step(state, batch, None, None,
                                         jax.random.fold_in(key, i), 2e-4)
            np.asarray(m["losses"])
        results["step"] = slope_time(run)

    def criterion_bench(stop_grad, mode="transformer", train=True):
        crit = CPCUnsupervisedCriterion(
            n_predicts=K, dim_output_ar=C, dim_output_encoder=C,
            negative_sampling_ext=N, rnn_mode=mode,
            size_input_seq=S, stop_grad_negatives=stop_grad)
        c = jnp.asarray(rng.randn(B, S, C), jnp.bfloat16)
        z = jnp.asarray(rng.randn(B, S, C), jnp.bfloat16)
        variables = crit.init(
            {"params": jax.random.PRNGKey(0),
             "sampling": jax.random.PRNGKey(1)}, c, z, None)

        @jax.jit
        def fwd_bwd(params, c, z, key):
            def loss(p, c, z):
                losses, _ = crit.apply({"params": p}, c, z, train=train,
                                       rngs={"sampling": key,
                                             "dropout": key})
                return jnp.sum(losses)
            l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(
                params, c, z)
            return l + _grad_probe(grads), grads[1]

        key = jax.random.PRNGKey(2)

        def run(k):
            l = None
            for i in range(k):
                l, _ = fwd_bwd(variables["params"], c, z,
                               jax.random.fold_in(key, i))
            np.asarray(l)
        return slope_time(run)

    if "crit" in which:
        results["crit"] = criterion_bench(False)
    if "crit_sg" in which:
        results["crit_sg"] = criterion_bench(True)
    if "crit_lin" in which:
        results["crit_lin"] = criterion_bench(False, mode="linear")
    if "crit_notrain" in which:
        results["crit_notrain"] = criterion_bench(False, train=False)

    if "model" in which:
        # encoder + AR fwd+bwd alone (no criterion): the non-criterion
        # share of the step.
        from cpc_audio_tpu.models import build_model
        model = build_model(config)
        x = jnp.asarray(rng.randn(B, 1, config.sizeWindow), np.float32)
        variables = model.init({"params": jax.random.PRNGKey(0)}, x)
        cot_c = jnp.asarray(rng.randn(B, S, C), jnp.bfloat16)
        cot_z = jnp.asarray(rng.randn(B, S, C), jnp.bfloat16)

        @jax.jit
        def fwd_bwd(params, x):
            def loss(p, x):
                c, z, _, _ = model.apply({"params": p}, x, None, train=True)
                return jnp.sum((c * cot_c).astype(jnp.float32)) \
                    + jnp.sum((z * cot_z).astype(jnp.float32))
            l, grads = jax.value_and_grad(loss, argnums=(0,))(params, x)
            return l + _grad_probe(grads)

        def run(k):
            l = None
            for _ in range(k):
                l = fwd_bwd(variables["params"], x)
            np.asarray(l)
        results["model"] = slope_time(run)

    if "neg" in which:
        # gather + scoring + CE alone (no prediction heads), grads wrt
        # (preds, z) — the negative-path cost the heads bench excludes.
        from cpc_audio_tpu.criterion.infonce import (sample_negatives,
                                                     stack_positives)
        preds = jnp.asarray(rng.randn(K, B, W, C), jnp.bfloat16)
        z = jnp.asarray(rng.randn(B, S, C), jnp.bfloat16)

        @jax.jit
        def fwd_bwd(preds, z, key):
            def loss(preds, z):
                neg = sample_negatives(key, z, W, N)
                pos = stack_positives(z, K, W)
                f32 = jnp.float32
                ps = jnp.einsum("kbwc,kbwc->kbw", preds, pos,
                                preferred_element_type=f32) / C
                ns = jnp.einsum("kbwc,bnwc->kbnw", preds, neg,
                                preferred_element_type=f32) / C
                logits = jnp.concatenate([ps[:, :, None, :], ns], axis=2)
                lp = jax.nn.log_softmax(logits, axis=2)
                return -jnp.mean(lp[:, :, 0, :])
            l, grads = jax.value_and_grad(loss, argnums=(0, 1))(preds, z)
            return l + _grad_probe(grads)
        key = jax.random.PRNGKey(5)

        def run(k):
            l = None
            for i in range(k):
                l = fwd_bwd(preds, z, jax.random.fold_in(key, i))
            np.asarray(l)
        results["neg"] = slope_time(run)

    if "heads" in which:
        from cpc_audio_tpu.criterion.prediction import PredictionNetwork
        net = PredictionNetwork(K, C, "transformer", False,
                                size_input_seq=W)
        c = jnp.asarray(rng.randn(B, W, C), jnp.bfloat16)
        variables = net.init({"params": jax.random.PRNGKey(0)}, c)
        cot = jnp.asarray(rng.randn(K, B, W, C), jnp.bfloat16)

        @jax.jit
        def fwd_bwd(params, c, key):
            def loss(p, c):
                preds = net.apply({"params": p}, c, train=True,
                                  rngs={"dropout": key})
                return jnp.sum((preds * cot).astype(jnp.float32))
            l, grads = jax.value_and_grad(loss, argnums=(0, 1))(params, c)
            return l + _grad_probe(grads)

        key = jax.random.PRNGKey(3)

        def run(k):
            l = None
            for i in range(k):
                l = fwd_bwd(variables["params"], c,
                            jax.random.fold_in(key, i))
            np.asarray(l)
        results["heads"] = slope_time(run)

    for name, t in results.items():
        print(f"{name}: {t * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
