"""One-process probe of the composition gap: criterion-only (9 ms) +
model-only (1 ms) vs the combined fwd+bwd (24 ms in ab_step).

  crit       criterion fwd+bwd on fixed (c, z) inputs, grads wrt params+c+z
  model      encoder+AR fwd+bwd with direct cotangents
  joint      full loss fwd+bwd (the real thing)
  split      model and criterion backwards both run, but the criterion's
             cotangents do NOT flow into the model (stop_gradient at c, z);
             model gets direct cotangents instead
If split ~= crit+model but joint >> split, the cost is the chained
dcriterion->dmodel backward; if joint ~= split, it's something both share.
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
    from cpc_audio_tpu.models import build_model
    from cpc_audio_tpu.parallel import (create_train_state, get_mesh,
                                        make_optimizer)
    from cpc_audio_tpu.parallel.train_step import _rbg_key

    B, S, C, K, N = 32, 128, 256, 12, 128
    config = CPCConfig(compute_dtype="bfloat16")
    rng = np.random.RandomState(0)
    model = build_model(config)
    criterion = CPCUnsupervisedCriterion(
        n_predicts=K, dim_output_ar=C, dim_output_encoder=C,
        negative_sampling_ext=N, rnn_mode="transformer", size_input_seq=S)
    optimizer = make_optimizer()
    get_mesh(len(jax.devices()))
    state = create_train_state(jax.random.PRNGKey(0), model, criterion,
                               optimizer, (2, 1, config.sizeWindow))
    params = state.params
    x = jnp.asarray(rng.randn(B, 1, config.sizeWindow), np.float32)
    cb = jnp.asarray(rng.randn(B, S, C), jnp.bfloat16)
    zb = jnp.asarray(rng.randn(B, S, C), jnp.bfloat16)
    cot_c = jnp.asarray(rng.randn(B, S, C), jnp.bfloat16)
    cot_z = jnp.asarray(rng.randn(B, S, C), jnp.bfloat16)
    skey = jax.random.PRNGKey(1)

    def rngs_for(key):
        k1, k2 = jax.random.split(key)
        return {"sampling": k1, "dropout": _rbg_key(k2)}

    @jax.jit
    def crit_fb(params, c, z, key):
        def loss(p, c, z):
            losses, _ = criterion.apply({"params": p}, c, z, None,
                                        train=True, rngs=rngs_for(key))
            return jnp.sum(losses)
        l, _ = jax.value_and_grad(loss, argnums=(0, 1, 2))(
            params["criterion"], c, z)
        return l

    @jax.jit
    def model_fb(params, x):
        def loss(p, x):
            c, z, _, _ = model.apply({"params": p}, x, None, train=True)
            return jnp.sum((c * cot_c).astype(jnp.float32)) \
                + jnp.sum((z * cot_z).astype(jnp.float32))
        l, _ = jax.value_and_grad(loss)(params["model"], x)
        return l

    @jax.jit
    def joint_fb(params, x, key):
        def loss(p):
            c, z, _, _ = model.apply({"params": p["model"]}, x, None,
                                     train=True)
            losses, _ = criterion.apply({"params": p["criterion"]}, c, z,
                                        None, train=True,
                                        rngs=rngs_for(key))
            return jnp.sum(losses)
        l, _ = jax.value_and_grad(loss)(params)
        return l

    @jax.jit
    def split_fb(params, x, key):
        def loss(p):
            c, z, _, _ = model.apply({"params": p["model"]}, x, None,
                                     train=True)
            losses, _ = criterion.apply(
                {"params": p["criterion"]}, jax.lax.stop_gradient(c),
                jax.lax.stop_gradient(z), None, train=True,
                rngs=rngs_for(key))
            aux = jnp.sum((c * cot_c).astype(jnp.float32)) \
                + jnp.sum((z * cot_z).astype(jnp.float32))
            return jnp.sum(losses) + aux
        l, _ = jax.value_and_grad(loss)(params)
        return l

    def mk(fn, *args_fn):
        def run(k):
            l = None
            for i in range(k):
                l = fn(*args_fn(i))
            np.asarray(l)
        return run

    runs = {
        "crit": mk(crit_fb, lambda i: params, lambda i: cb, lambda i: zb,
                   lambda i: jax.random.fold_in(skey, i)),
        "model": mk(model_fb, lambda i: params, lambda i: x),
        "joint": mk(joint_fb, lambda i: params, lambda i: x,
                    lambda i: jax.random.fold_in(skey, i)),
        "split": mk(split_fb, lambda i: params, lambda i: x,
                    lambda i: jax.random.fold_in(skey, i)),
    }

    def mk2(fn, argfns):
        def run(k):
            l = None
            for i in range(k):
                l = fn(*[a(i) for a in argfns])
            np.asarray(l)
        return run

    runs = {
        "crit": mk2(crit_fb, [lambda i: params, lambda i: cb, lambda i: zb,
                              lambda i: jax.random.fold_in(skey, i)]),
        "model": mk2(model_fb, [lambda i: params, lambda i: x]),
        "joint": mk2(joint_fb, [lambda i: params, lambda i: x,
                                lambda i: jax.random.fold_in(skey, i)]),
        "split": mk2(split_fb, [lambda i: params, lambda i: x,
                                lambda i: jax.random.fold_in(skey, i)]),
    }
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
