"""Multi-host helpers: per-process file-list sharding."""

from cpc_audio_tpu.parallel.distributed import shard_sequences


def test_shard_sequences_disjoint_cover():
    seqs = [(i, f"f{i}.flac") for i in range(10)]
    shards = [shard_sequences(seqs, process_index=p, process_count=3)
              for p in range(3)]
    seen = [x for s in shards for x in s]
    assert sorted(seen) == sorted(seqs)          # full coverage
    flat = [tuple(x) for s in shards for x in s]
    assert len(set(flat)) == len(flat)           # disjoint


def test_shard_sequences_single_process_identity():
    seqs = [(0, "a"), (1, "b")]
    assert shard_sequences(seqs, process_index=0, process_count=1) == seqs


def test_sharded_step_equals_manual_dataparallel_replay():
    """The 8-device shard_map train step must equal a manual DataParallel
    replay: per-device keys stream_keys(key, step, d), per-shard grads of the summed
    loss, grad-sum across shards, one optimizer update (reference
    semantics: torch DataParallel sum, train.py:85,372-375)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from cpc_audio_tpu.config import CPCConfig
    from cpc_audio_tpu.criterion import CPCUnsupervisedCriterion
    from cpc_audio_tpu.models import build_model
    from cpc_audio_tpu.parallel import (create_train_state, get_mesh,
                                        make_optimizer, make_train_step,
                                        shard_batch)
    from cpc_audio_tpu.parallel.train_step import _forward_loss, stream_keys

    n_dev = 8
    config = CPCConfig(hiddenEncoder=16, hiddenGar=16, nPredicts=2,
                       negativeSamplingExt=4, sizeWindow=3200,
                       arMode="GRU", rnnMode="linear")
    model = build_model(config)
    criterion = CPCUnsupervisedCriterion(
        n_predicts=config.nPredicts, dim_output_ar=config.hiddenGar,
        dim_output_encoder=config.hiddenEncoder,
        negative_sampling_ext=config.negativeSamplingExt,
        rnn_mode=config.rnnMode,
        size_input_seq=config.sizeWindow // 160)
    optimizer = make_optimizer(config.beta1, config.beta2, config.epsilon)
    state0 = create_train_state(jax.random.PRNGKey(0), model, criterion,
                                optimizer, (1, 1, config.sizeWindow))

    rng = np.random.RandomState(3)
    batch_np = rng.randn(2 * n_dev, 1, config.sizeWindow).astype(np.float32)
    key, lr = jax.random.PRNGKey(7), 2e-4

    # --- sharded step ---------------------------------------------------
    mesh = get_mesh(n_dev)
    train_step = make_train_step(model, criterion, optimizer, mesh,
                                 donate=False)
    batch = shard_batch(mesh, batch_np)
    state1, _, metrics = train_step(state0, batch, None, None, key, lr)

    # --- manual replay on the default device ----------------------------
    shards = np.split(batch_np, n_dev, axis=0)
    total_grads = None
    all_losses = []
    for d in range(n_dev):
        k_sample, k_drop = stream_keys(key, 0, d)  # state0.step == 0
        rngs = {"sampling": k_sample, "dropout": k_drop}

        def loss_fn(params):
            losses, accs, _, _ = _forward_loss(
                model, criterion, params, state0.batch_stats,
                jnp.asarray(shards[d]), None, None, rngs, train=True)
            return jnp.sum(losses), losses

        grads, losses = jax.grad(loss_fn, has_aux=True)(state0.params)
        all_losses.append(np.asarray(losses))
        total_grads = grads if total_grads is None else \
            jax.tree_util.tree_map(jnp.add, total_grads, grads)

    updates, _ = optimizer.update(total_grads, state0.opt_state,
                                  state0.params)
    updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
    params_ref = optax.apply_updates(state0.params, updates)

    flat1 = jax.tree_util.tree_leaves_with_path(state1.params)
    flat_ref = dict(jax.tree_util.tree_leaves_with_path(params_ref))
    assert flat1
    # atol: psum vs sequential-add f32 reduction order perturbs gradients
    # in the last ulp, and Adam's rsqrt amplifies that for near-zero
    # gradient entries (update scale is lr=2e-4, so 5e-6 is ~2% of one
    # step on a handful of elements).
    for path, leaf in flat1:
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(flat_ref[path]),
                                   atol=5e-6, err_msg=str(path))
    np.testing.assert_allclose(np.asarray(metrics["losses"]),
                               np.mean(all_losses, axis=0), rtol=1e-5)


def test_batch_stats_pmean_semantics():
    """Pins the deliberate BatchNorm deviation (docs/DESIGN.md): after a
    sharded train step with --normMode batchNorm, the state's running
    stats equal the MEAN over devices of each shard's locally-updated
    stats (SyncBatchNorm semantics) — not the master replica's stats as
    in the reference's DataParallel (model.py:69-80, train.py:372)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cpc_audio_tpu.config import CPCConfig
    from cpc_audio_tpu.criterion import CPCUnsupervisedCriterion
    from cpc_audio_tpu.models import build_model
    from cpc_audio_tpu.parallel import (create_train_state, get_mesh,
                                        make_optimizer, make_train_step,
                                        shard_batch)
    from cpc_audio_tpu.parallel.train_step import _forward_loss, stream_keys

    n_dev = 4
    config = CPCConfig(hiddenEncoder=16, hiddenGar=16, nPredicts=2,
                       negativeSamplingExt=4, sizeWindow=3200,
                       arMode="GRU", rnnMode="linear", normMode="batchNorm")
    model = build_model(config)
    criterion = CPCUnsupervisedCriterion(
        n_predicts=config.nPredicts, dim_output_ar=config.hiddenGar,
        dim_output_encoder=config.hiddenEncoder,
        negative_sampling_ext=config.negativeSamplingExt,
        rnn_mode=config.rnnMode,
        size_input_seq=config.sizeWindow // 160)
    optimizer = make_optimizer(config.beta1, config.beta2, config.epsilon)
    state0 = create_train_state(jax.random.PRNGKey(0), model, criterion,
                                optimizer, (1, 1, config.sizeWindow))
    assert state0.batch_stats, "batchNorm config must carry batch_stats"

    rng = np.random.RandomState(11)
    # distinct per-shard data so per-shard stats genuinely differ
    batch_np = rng.randn(2 * n_dev, 1, config.sizeWindow).astype(np.float32)
    batch_np[8:] *= 3.0
    key, lr = jax.random.PRNGKey(5), 2e-4

    mesh = get_mesh(n_dev)
    train_step = make_train_step(model, criterion, optimizer, mesh,
                                 donate=False)
    state1, _, _ = train_step(state0, shard_batch(mesh, batch_np),
                              None, None, key, lr)

    # manual replay: per-shard local stats, then mean over shards
    shards = np.split(batch_np, n_dev, axis=0)
    per_dev_stats = []
    for d in range(n_dev):
        k_sample, k_drop = stream_keys(key, 0, d)
        rngs = {"sampling": k_sample, "dropout": k_drop}
        _, _, new_stats, _ = _forward_loss(
            model, criterion, state0.params, state0.batch_stats,
            jnp.asarray(shards[d]), None, None, rngs, train=True)
        per_dev_stats.append(new_stats)
    mean_stats = jax.tree_util.tree_map(
        lambda *xs: jnp.mean(jnp.stack(xs), axis=0), *per_dev_stats)

    got = dict(jax.tree_util.tree_leaves_with_path(state1.batch_stats))
    want = jax.tree_util.tree_leaves_with_path(mean_stats)
    assert want
    changed = False
    for path, leaf in want:
        np.testing.assert_allclose(np.asarray(got[path]), np.asarray(leaf),
                                   rtol=1e-5, atol=1e-6, err_msg=str(path))
        changed |= not np.allclose(np.asarray(leaf),
                                   np.asarray(dict(
                                       jax.tree_util.tree_leaves_with_path(
                                           state0.batch_stats))[path]))
    assert changed, "stats never moved — test would pass vacuously"
    # and the synced stats differ from any single shard's local stats
    d0 = dict(jax.tree_util.tree_leaves_with_path(per_dev_stats[0]))
    assert any(not np.allclose(np.asarray(got[p]), np.asarray(d0[p]))
               for p, _ in want)


def test_two_process_multihost_train_step():
    """2-process jax.distributed simulation (CPU, 2 virtual devices per
    process): one REAL sharded train step over the global 4-device mesh.
    Both processes must report identical losses and an identical
    post-update parameter checksum — the gradient psum crosses the
    process boundary."""
    import os
    import re
    import socket
    import subprocess
    import sys

    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen([sys.executable, worker, str(i), str(port)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env)
             for i in range(2)]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=500)
        text = out.decode()
        assert p.returncode == 0, f"proc{i} failed:\n{text[-2000:]}"
        m = re.search(r"MHOK proc%d losses=(\[.*?\]) chk=([\d.]+)" % i, text)
        assert m, text[-2000:]
        outs.append((m.group(1), m.group(2)))
    assert outs[0] == outs[1], outs


def test_stream_keys_distinct_across_steps_devices_and_collections():
    """Arithmetic stream derivation must give distinct key material per
    (step, device) and between the sampling and dropout collections."""
    import jax

    from cpc_audio_tpu.parallel.train_step import stream_keys

    base = jax.random.PRNGKey(42)
    seen = set()
    for step in (0, 1, 2, 1000):
        for dev in range(8):
            ks, kd = stream_keys(base, step, dev)
            for k in (ks, kd):
                bits = tuple(int(x) for x in jax.random.key_data(k).ravel())
                assert bits not in seen, (step, dev, bits)
                seen.add(bits)
    # and the streams actually produce different samples
    ks0, _ = stream_keys(base, 0, 0)
    ks1, _ = stream_keys(base, 1, 0)
    a = jax.random.randint(ks0, (8,), 0, 1000)
    b = jax.random.randint(ks1, (8,), 0, 1000)
    assert not (a == b).all()


def test_negative_sampling_scope_pools_and_grads():
    """Global-scope negatives (SURVEY.md §2.9 extension): inside shard_map
    the sampler draws from the ALL-GATHERED batch, and gradients route back
    through the all_gather transpose (psum_scatter) to the devices that own
    each negative frame.  Verified against a plain single-process replay of
    the same keys/indices for both the exact and stratified samplers."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from cpc_audio_tpu.criterion.infonce import (sample_negatives,
                                                 sample_negatives_stratified)
    from cpc_audio_tpu.parallel import get_mesh

    n_dev, b_loc, S, C, N, W = 4, 2, 16, 8, 4, 14
    mesh = get_mesh(n_dev)
    rng = np.random.RandomState(0)
    z_full = jnp.asarray(rng.randn(n_dev * b_loc, S, C), jnp.float32)
    key = jax.random.PRNGKey(42)

    for sampler in (sample_negatives, sample_negatives_stratified):
        def local_loss(z_local):
            d = jax.lax.axis_index("data")
            pool = jax.lax.all_gather(z_local, "data", axis=0, tiled=True)
            neg = sampler(jax.random.fold_in(key, d), z_local, W, N,
                          pool=pool)
            # weighted so the grad pattern is position-sensitive.  The loss
            # is the LOCAL term only: the all_gather transpose
            # (psum_scatter) already sums every device's cotangent into the
            # owning shard, so grad(z_local) = d(sum_d loss_d)/d z_local.
            wgt = jnp.arange(neg.size, dtype=jnp.float32).reshape(neg.shape)
            return jnp.sum(wgt * neg ** 2)

        sharded_grad = jax.jit(jax.shard_map(
            jax.grad(local_loss), mesh=mesh,
            in_specs=P("data"), out_specs=P("data"), check_vma=False))
        g_sh = np.asarray(sharded_grad(z_full))

        def manual_loss(z_full):
            tot = 0.0
            for d in range(n_dev):
                z_loc = jax.lax.dynamic_slice_in_dim(
                    z_full, d * b_loc, b_loc, axis=0)
                neg = sampler(jax.random.fold_in(key, d), z_loc, W, N,
                              pool=z_full)
                wgt = jnp.arange(neg.size,
                                 dtype=jnp.float32).reshape(neg.shape)
                tot = tot + jnp.sum(wgt * neg ** 2)
            return tot

        g_ref = np.asarray(jax.grad(manual_loss)(z_full))
        assert np.any(g_ref != 0)
        np.testing.assert_allclose(g_sh, g_ref, rtol=1e-6, atol=1e-6,
                                   err_msg=sampler.__name__)

        # and the pool is genuinely global: device 0's negatives must
        # include frames owned by other devices (value-coded rows)
        z_coded = jnp.broadcast_to(
            (1.0 + jnp.arange(n_dev * b_loc, dtype=jnp.float32))
            [:, None, None], z_full.shape)

        def worker(z_local):
            d = jax.lax.axis_index("data")
            pool = jax.lax.all_gather(z_local, "data", axis=0, tiled=True)
            return sampler(jax.random.fold_in(key, d), z_local, W, N,
                           pool=pool)

        negs = np.asarray(jax.jit(jax.shard_map(
            worker, mesh=mesh, in_specs=P("data"), out_specs=P("data"),
            check_vma=False))(z_coded))
        dev0_vals = np.unique(negs[:b_loc])
        assert dev0_vals.max() > b_loc, \
            f"{sampler.__name__}: no cross-device negatives drawn"


def test_global_scope_train_step_runs_and_differs():
    """End-to-end: --negative_sampling_scope global trains (finite metrics)
    on an 8-device mesh and produces different losses than device scope
    (cross-device negatives); at world size 1 the two scopes are
    bit-identical (all_gather is the identity), preserving exact
    single-device reference behavior."""
    import jax
    import numpy as np

    from cpc_audio_tpu.config import CPCConfig
    from cpc_audio_tpu.criterion import CPCUnsupervisedCriterion
    from cpc_audio_tpu.models import build_model
    from cpc_audio_tpu.parallel import (create_train_state, get_mesh,
                                        make_optimizer, make_train_step,
                                        shard_batch)

    config = CPCConfig(hiddenEncoder=16, hiddenGar=16, nPredicts=2,
                       negativeSamplingExt=4, sizeWindow=3200,
                       arMode="GRU", rnnMode="linear")
    model = build_model(config)

    def crit(scope):
        return CPCUnsupervisedCriterion(
            n_predicts=config.nPredicts, dim_output_ar=config.hiddenGar,
            dim_output_encoder=config.hiddenEncoder,
            negative_sampling_ext=config.negativeSamplingExt,
            rnn_mode=config.rnnMode,
            size_input_seq=config.sizeWindow // 160,
            negative_sampling_scope=scope)

    optimizer = make_optimizer()
    key = jax.random.PRNGKey(9)

    def run(n_dev, scope):
        criterion = crit(scope)
        mesh = get_mesh(n_dev)
        state = create_train_state(jax.random.PRNGKey(0), model, criterion,
                                   optimizer, (1, 1, config.sizeWindow))
        step = make_train_step(model, criterion, optimizer, mesh,
                               donate=False)
        batch = shard_batch(mesh, np.random.RandomState(5).randn(
            2 * n_dev, 1, config.sizeWindow).astype(np.float32))
        _, _, metrics = step(state, batch, None, None, key, 2e-4)
        return np.asarray(metrics["losses"])

    l_dev = run(8, "device")
    l_glob = run(8, "global")
    assert np.all(np.isfinite(l_dev)) and np.all(np.isfinite(l_glob))
    assert not np.allclose(l_dev, l_glob), \
        "global scope must draw different negatives than device scope"

    l1_dev = run(1, "device")
    l1_glob = run(1, "global")
    np.testing.assert_array_equal(l1_dev, l1_glob)
