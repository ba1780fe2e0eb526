"""Throughput benchmark: CPC pretraining windows/sec/chip.

Runs the full default-config training step (256-dim conv encoder, LSTM AR,
12 vmapped transformer prediction heads, 128 negatives, 20480-sample
windows — reference cpc_default_config.py defaults) on synthetic data.

Timing methodology: through the remote TPU tunnel, dispatch completion is
NOT execution completion, so the measurement forces a device->host readback
of the final step's loss and takes the SLOPE between two chained run
lengths (k2 - k1 steps) to cancel the fixed RPC/transfer overhead.

The inner run of k steps executes as ONE dispatch (`lax.fori_loop` over
the train step, same jitted program as training, state threaded through
the carry).  Per-step host dispatches through the tunnel leave a ~1.5
ms/step RPC bubble between device programs (device-trace total 16.9 ms vs
18.4 ms slope when dispatching step-by-step) that is an artifact of this
remote-tunnel environment, not of the training program — a production
host driving a local chip dispatches in ~50 us and the real trainer
amortizes readbacks over logging_step batches.  Chaining makes the slope
measure the device-bound rate, which matches the deterministic device
traces (perf/trace_step.py).  CPC_BENCH_CHAIN=0 restores per-step
dispatch for measuring the tunnel overhead itself.

``vs_baseline`` compares against A100_REF_WINDOWS_PER_SEC, an estimate of
the torch reference's single-A100 throughput (the reference publishes no
numbers — BASELINE.md): ~17.1 GFLOP/window per train step with eager
torch, sequential per-head Python-loop modules and cuDNN LSTM at ~3.8%
of A100 bf16 peak ~= 700 windows/s.  Full derivation + sensitivity
bracket: docs/PERFORMANCE.md "the A100 denominator, derived".
BASELINE.json's north star is >= 3x this.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

A100_REF_WINDOWS_PER_SEC = 700.0  # documented estimate, see module docstring


def main():
    import jax
    from cpc_audio_tpu.config import CPCConfig
    from cpc_audio_tpu.criterion import CPCUnsupervisedCriterion
    from cpc_audio_tpu.models import build_model
    from cpc_audio_tpu.parallel import (create_train_state, get_mesh,
                                        make_optimizer, make_train_step,
                                        shard_batch)

    # CPC_BENCH_SMOKE=1: tiny config, CPU backend — a correctness smoke of
    # THIS script (incl. the chained fori_loop path) for the test suite;
    # the printed number is then meaningless.
    smoke = os.environ.get("CPC_BENCH_SMOKE", "0") == "1"
    if smoke:
        jax.config.update("jax_platforms", "cpu")

    n_devices = len(jax.devices())
    # CPC_BENCH_BATCH: per-chip batch override for scaling probes; the
    # recorded headline stays the default B=32 operating point.
    per_chip_batch = 4 if smoke else int(
        os.environ.get("CPC_BENCH_BATCH", "32"))
    batch_size = per_chip_batch * n_devices

    config = CPCConfig(compute_dtype="bfloat16") if not smoke else \
        CPCConfig(compute_dtype="bfloat16", hiddenEncoder=64, hiddenGar=64,
                  nPredicts=4, negativeSamplingExt=16, sizeWindow=3200)
    model = build_model(config)
    criterion = CPCUnsupervisedCriterion(
        n_predicts=config.nPredicts, dim_output_ar=config.hiddenGar,
        dim_output_encoder=config.hiddenEncoder,
        negative_sampling_ext=config.negativeSamplingExt,
        rnn_mode=config.rnnMode,
        sampling_mode=config.negativeSamplingMode,
        size_input_seq=config.sizeWindow // 160)
    optimizer = make_optimizer(config.beta1, config.beta2, config.epsilon)
    mesh = get_mesh(n_devices)
    state = create_train_state(jax.random.PRNGKey(0), model, criterion,
                               optimizer, (2, 1, config.sizeWindow))
    train_step = make_train_step(model, criterion, optimizer, mesh)

    rng = np.random.RandomState(0)
    batch = shard_batch(
        mesh, rng.randn(batch_size, 1, config.sizeWindow).astype(np.float32))
    labels = shard_batch(mesh, np.zeros(batch_size, np.int64))
    key = jax.random.PRNGKey(1)

    chain = os.environ.get("CPC_BENCH_CHAIN", "1") == "1"
    if chain:
        import jax.numpy as jnp

        @jax.jit
        def run_k(state, k):
            def body(_, carry):
                st, _ = carry
                st, _, m = train_step(st, batch, labels, None, key, 2e-4)
                return st, m["losses"]
            return jax.lax.fori_loop(
                0, k, body, (state, jnp.zeros(config.nPredicts)))

        def run_steps(state, k):
            state, losses = run_k(state, k)
            return state, {"losses": losses}
    else:
        def run_steps(state, k):
            # constant key: per-step streams derive from state.step in-jit;
            # a host-side fold_in here would dispatch a ~0.7 ms scalar
            # threefry program to the device between steps (device trace).
            metrics = None
            for _ in range(k):
                state, _, metrics = train_step(
                    state, batch, labels, None, key, 2e-4)
            return state, metrics

    # compile + warm, with a forced readback
    state, metrics = run_steps(state, 3)
    _ = np.asarray(metrics["losses"])

    def timed(k, reps=5):
        nonlocal state
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            state, metrics = run_steps(state, k)
            _ = np.asarray(metrics["losses"])  # force true completion
            best = min(best, time.perf_counter() - t0)
        return best

    k1, k2 = (2, 4) if smoke else (4, 14)
    t1 = timed(k1)
    t2 = timed(k2)
    step_time = max((t2 - t1) / (k2 - k1), 1e-9)

    windows_per_sec = batch_size / step_time
    per_chip = windows_per_sec / n_devices
    print(json.dumps({
        "metric": "cpc_pretrain_windows_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "windows/sec/chip",
        "vs_baseline": round(per_chip / A100_REF_WINDOWS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
