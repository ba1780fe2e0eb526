"""Same-process sweep: where do the 28 ms of the train step go?

Measures interleaved (env flags flip per-trace, so each variant is a
separate jit):
  crit_pallas   criterion fwd+bwd, pallas attention (shipped default)
  crit_xla      criterion fwd+bwd, CPC_PALLAS_ATTN=0
  model         encoder+AR fwd+bwd
  step          full train step (shipped)
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

    from cpc_audio_tpu.config import CPCConfig
    from cpc_audio_tpu.criterion import CPCUnsupervisedCriterion

    B, S, C, K, N = 32, 128, 256, 12, 128
    config = CPCConfig(compute_dtype="bfloat16")
    rng = np.random.RandomState(0)

    def make_crit(pallas_attn: bool):
        os.environ["CPC_PALLAS_ATTN"] = "1" if pallas_attn else "0"
        crit = CPCUnsupervisedCriterion(
            n_predicts=K, dim_output_ar=C, dim_output_encoder=C,
            negative_sampling_ext=N, rnn_mode="transformer",
            size_input_seq=S)
        c = jnp.asarray(rng.randn(B, S, C), jnp.bfloat16)
        z = jnp.asarray(rng.randn(B, S, C), jnp.bfloat16)
        variables = crit.init(
            {"params": jax.random.PRNGKey(0),
             "sampling": jax.random.PRNGKey(1)}, c, z, None)

        @jax.jit
        def fwd_bwd(params, c, z, key):
            def loss(p, c, z):
                losses, _ = crit.apply({"params": p}, c, z, train=True,
                                       rngs={"sampling": key,
                                             "dropout": key})
                return jnp.sum(losses)
            l, _ = jax.value_and_grad(loss, argnums=(0, 1, 2))(params, c, z)
            return l

        key = jax.random.PRNGKey(2)
        params = variables["params"]

        def run(k):
            l = None
            for i in range(k):
                l = fwd_bwd(params, c, z, jax.random.fold_in(key, i))
            np.asarray(l)
            os.environ["CPC_PALLAS_ATTN"] = "1" if pallas_attn else "0"
        # trace now while env is set
        run(1)
        return run

    run_crit_pallas = make_crit(True)
    run_crit_xla = make_crit(False)
    os.environ.pop("CPC_PALLAS_ATTN", None)

    from cpc_audio_tpu.models import build_model
    model = build_model(config)
    x = jnp.asarray(rng.randn(B, 1, config.sizeWindow), np.float32)
    mvars = model.init({"params": jax.random.PRNGKey(0)}, x)
    cot_c = jnp.asarray(rng.randn(B, S, C), jnp.bfloat16)
    cot_z = jnp.asarray(rng.randn(B, S, C), jnp.bfloat16)

    @jax.jit
    def model_fwd_bwd(params, x):
        def loss(p, x):
            c, z, _, _ = model.apply({"params": p}, x, None, train=True)
            return jnp.sum((c * cot_c).astype(jnp.float32)) \
                + jnp.sum((z * cot_z).astype(jnp.float32))
        l, _ = jax.value_and_grad(loss, argnums=(0,))(params, x)
        return l

    def run_model(k):
        l = None
        for _ in range(k):
            l = model_fwd_bwd(mvars["params"], x)
        np.asarray(l)

    from cpc_audio_tpu.parallel import (create_train_state, get_mesh,
                                        make_optimizer, make_train_step,
                                        shard_batch)
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
    skey = jax.random.PRNGKey(1)

    def run_step(k):
        nonlocal state
        m = None
        for i in range(k):
            state, _, m = train_step(state, batch, None, None,
                                     jax.random.fold_in(skey, i), 2e-4)
        np.asarray(m["losses"])

    runs = {"crit_pallas": run_crit_pallas, "crit_xla": run_crit_xla,
            "model": run_model, "step": run_step}
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
