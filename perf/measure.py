"""Canonical component measurements (readback-slope, one process).

METHODOLOGY NOTE: a jitted ``value_and_grad`` whose gradients are not
returned gets its entire backward pass DCE'd by XLA — early round-2
numbers measured forward-only without knowing it.  Every fwd+bwd time
here returns a scalar reduced over the FULL gradient tree so nothing is
dead.

Usage: python perf/measure.py [name ...]
Names: step heads_fwd_train heads_fwd_eval heads_fb crit_fwd_train
       crit_fwd_eval crit_fb crit_fb_notrain model_fwd model_fb adam_only
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope_time(fn, k1=4, k2=14, reps=3):
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


def grad_probe(tree):
    """Cheap scalar that depends on every gradient leaf (anti-DCE)."""
    import jax
    import jax.numpy as jnp
    return sum(jnp.sum(g.astype(jnp.float32))
               for g in jax.tree_util.tree_leaves(tree))


def main():
    import jax
    import jax.numpy as jnp

    from cpc_audio_tpu.config import CPCConfig
    from cpc_audio_tpu.criterion import CPCUnsupervisedCriterion
    from cpc_audio_tpu.models import build_model
    from cpc_audio_tpu.parallel import (create_train_state, get_mesh,
                                        make_optimizer, make_train_step,
                                        shard_batch)
    from cpc_audio_tpu.parallel.train_step import _rbg_key

    which = sys.argv[1:] or ["step", "heads_fwd_train", "heads_fwd_eval",
                             "heads_fb", "crit_fwd_train", "crit_fb",
                             "model_fwd", "model_fb"]
    B, S, C, K, N = 32, 128, 256, 12, 128
    W = S - K
    config = CPCConfig(compute_dtype="bfloat16")
    rng = np.random.RandomState(0)
    bf16 = jnp.bfloat16
    runs = {}
    skey = jax.random.PRNGKey(1)

    def rngs_for(key):
        k1, k2 = jax.random.split(key)
        return {"sampling": k1, "dropout": _rbg_key(k2)}

    # ---- prediction heads ----
    if any(n.startswith("heads") for n in which):
        from cpc_audio_tpu.criterion.prediction import PredictionNetwork
        net = PredictionNetwork(K, C, "transformer", False, size_input_seq=W)
        c = jnp.asarray(rng.randn(B, W, C), bf16)
        hv = net.init({"params": jax.random.PRNGKey(0)}, c)
        cot = jnp.asarray(rng.randn(K, B, W, C), bf16)

        def heads_fwd(train):
            @jax.jit
            def f(p, c, key):
                r = {"dropout": _rbg_key(key)} if train else {}
                y = net.apply({"params": p}, c, train=train, rngs=r)
                return jnp.sum((y * cot).astype(jnp.float32))

            def run(k):
                l = None
                for i in range(k):
                    l = f(hv["params"], c, jax.random.fold_in(skey, i))
                np.asarray(l)
            return run

        if "heads_fwd_train" in which:
            runs["heads_fwd_train"] = heads_fwd(True)
        if "heads_fwd_eval" in which:
            runs["heads_fwd_eval"] = heads_fwd(False)

        if "heads_fb" in which:
            @jax.jit
            def heads_fb(p, c, key):
                def loss(p, c):
                    y = net.apply({"params": p}, c, train=True,
                                  rngs={"dropout": _rbg_key(key)})
                    return jnp.sum((y * cot).astype(jnp.float32))
                l, gs = jax.value_and_grad(loss, argnums=(0, 1))(p, c)
                return l + grad_probe(gs)

            def run_hfb(k):
                l = None
                for i in range(k):
                    l = heads_fb(hv["params"], c, jax.random.fold_in(skey, i))
                np.asarray(l)
            runs["heads_fb"] = run_hfb

    # ---- criterion ----
    if any(n.startswith("crit") for n in which):
        crit = CPCUnsupervisedCriterion(
            n_predicts=K, dim_output_ar=C, dim_output_encoder=C,
            negative_sampling_ext=N, rnn_mode="transformer",
            size_input_seq=S)
        cc = jnp.asarray(rng.randn(B, S, C), bf16)
        zz = jnp.asarray(rng.randn(B, S, C), bf16)
        cv = crit.init({"params": jax.random.PRNGKey(0),
                        "sampling": jax.random.PRNGKey(1)}, cc, zz, None)

        def crit_fwd(train):
            @jax.jit
            def f(p, c, z, key):
                losses, _ = crit.apply({"params": p}, c, z, None,
                                       train=train, rngs=rngs_for(key))
                return jnp.sum(losses)

            def run(k):
                l = None
                for i in range(k):
                    l = f(cv["params"], cc, zz, jax.random.fold_in(skey, i))
                np.asarray(l)
            return run

        if "crit_fwd_train" in which:
            runs["crit_fwd_train"] = crit_fwd(True)
        if "crit_fwd_eval" in which:
            runs["crit_fwd_eval"] = crit_fwd(False)

        def crit_fb(train):
            @jax.jit
            def f(p, c, z, key):
                def loss(p, c, z):
                    losses, _ = crit.apply({"params": p}, c, z, None,
                                           train=train, rngs=rngs_for(key))
                    return jnp.sum(losses)
                l, gs = jax.value_and_grad(loss, argnums=(0, 1, 2))(p, c, z)
                return l + grad_probe(gs)

            def run(k):
                l = None
                for i in range(k):
                    l = f(cv["params"], cc, zz, jax.random.fold_in(skey, i))
                np.asarray(l)
            return run

        if "crit_fb" in which:
            runs["crit_fb"] = crit_fb(True)
        if "crit_fb_notrain" in which:
            runs["crit_fb_notrain"] = crit_fb(False)

    # ---- model ----
    if any(n.startswith("model") for n in which) or "step" in which \
            or "adam_only" in which:
        model = build_model(config)
        x = jnp.asarray(rng.randn(B, 1, config.sizeWindow), np.float32)

    if any(n.startswith("model") for n in which):
        mv = model.init({"params": jax.random.PRNGKey(0)}, x)
        cot_c = jnp.asarray(rng.randn(B, S, C), bf16)
        cot_z = jnp.asarray(rng.randn(B, S, C), bf16)

        def model_loss(p, x):
            c, z, _, _ = model.apply({"params": p}, x, None, train=True)
            return jnp.sum((c * cot_c).astype(jnp.float32)) \
                + jnp.sum((z * cot_z).astype(jnp.float32))

        if "model_fwd" in which:
            f_fwd = jax.jit(model_loss)

            def run_mf(k):
                l = None
                for _ in range(k):
                    l = f_fwd(mv["params"], x)
                np.asarray(l)
            runs["model_fwd"] = run_mf

        if "model_fb" in which:
            @jax.jit
            def model_fb(p, x):
                l, g = jax.value_and_grad(model_loss)(p, x)
                return l + grad_probe(g)

            def run_mfb(k):
                l = None
                for _ in range(k):
                    l = model_fb(mv["params"], x)
                np.asarray(l)
            runs["model_fb"] = run_mfb

    # ---- full step / adam ----
    if "step" in which or "adam_only" in which:
        criterion = CPCUnsupervisedCriterion(
            n_predicts=config.nPredicts, dim_output_ar=config.hiddenGar,
            dim_output_encoder=config.hiddenEncoder,
            negative_sampling_ext=config.negativeSamplingExt,
            rnn_mode=config.rnnMode,
            size_input_seq=config.sizeWindow // 160)
        optimizer = make_optimizer()
        mesh = get_mesh(len(jax.devices()))
        state = create_train_state(jax.random.PRNGKey(0), model, criterion,
                                   optimizer, (2, 1, config.sizeWindow))

    if "step" in which:
        train_step = make_train_step(model, criterion, optimizer, mesh)
        batch = shard_batch(mesh, rng.randn(
            B * len(jax.devices()), 1,
            config.sizeWindow).astype(np.float32))
        st = [state]

        def run_step(k):
            # constant key (streams derive from state.step in-jit); a
            # fold_in here would add a ~0.7 ms dispatched threefry per step
            m = None
            for _ in range(k):
                st[0], _, m = train_step(st[0], batch, None, None,
                                         skey, 2e-4)
            np.asarray(m["losses"])
        runs["step"] = run_step

    if "adam_only" in which:
        import optax
        from cpc_audio_tpu.parallel.train_step import TrainState
        gtree = jax.tree_util.tree_map(lambda p: jnp.ones_like(p),
                                       state.params)

        @jax.jit
        def adam_step(st2, lr):
            updates, opt_state = optimizer.update(gtree, st2.opt_state,
                                                  st2.params)
            updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
            params = optax.apply_updates(st2.params, updates)
            return TrainState(params, st2.batch_stats, opt_state,
                              st2.step + 1)

        st3 = [create_train_state(jax.random.PRNGKey(3), model, criterion,
                                  optimizer, (2, 1, config.sizeWindow))]

        def run_adam(k):
            for _ in range(k):
                st3[0] = adam_step(st3[0], 2e-4)
            np.asarray(st3[0].step)
        runs["adam_only"] = run_adam

    if "null" in which:
        # Per-dispatch floor probe: if a trivial chained jit has a multi-ms
        # slope, every per-call measurement (and the real train loop) is
        # dispatch-bound through the axon tunnel, not device-bound.
        @jax.jit
        def bump(x):
            return x + 1.0

        xs = jnp.zeros((8, 128), jnp.float32)

        def run_null(k):
            y = xs
            for _ in range(k):
                y = bump(y)
            np.asarray(y)
        runs["null"] = run_null

    results = {k: float("inf") for k in runs}
    for _ in range(2):
        for name, fn in runs.items():
            t = slope_time(fn, reps=2)
            results[name] = min(results[name], t)
            print(f"{name}: {t * 1e3:.2f} ms", flush=True)
    print("--- best ---")
    for name, t in results.items():
        print(f"{name}: {t * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
