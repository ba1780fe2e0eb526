"""A/B the negative-sampling SCOPE cost: device (default) vs global.

`--negative_sampling_scope global` draws each anchor's negatives from the
all_gather'd cross-device pool (infonce.py global-scope extension).
That buys cross-device negatives at two costs the default avoids:

  1. the differentiable all_gather of (world*B, S, C) encodings per
     step (its transpose is a psum_scatter in the backward), and
  2. the MATERIALIZED sampler path — the fused stratified objective is
     domain-incompatible with the padded global pool, so the (B,W,N,C)
     negatives tensor and its backward scatter return.

This instrument measures both on the virtual 8-device CPU mesh (the
only multi-device surface in this environment; relative ratios are the
point — single-chip TPU cannot show a real all_gather).  Modes:

  device-auto    : shipped default (fused stratified at pow-2 shapes)
  device-exact   : reference objective, per-device negatives
  global         : all_gather pool + materialized sampler

The three modes are stepped in ROUND-ROBIN interleave (one step of
each per round) and summarized by the median, so the CPU host's
load drift affects all modes equally — two earlier sequential-block
runs of this A/B disagreed on the global/auto ratio purely from
drift between the blocks.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python perf/ab_scope.py [--steps 8] [--batchSizeGPU 4]
Prints one JSON line with per-mode step times and ratios.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_devices", type=int, default=8)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--batchSizeGPU", type=int, default=4,
                   help="per-device batch (4 x 128 frames = pow-2 domain)")
    p.add_argument("--hiddenEncoder", type=int, default=256)
    p.add_argument("--negativeSamplingExt", type=int, default=128)
    args = p.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags +
            f" --xla_force_host_platform_device_count={args.n_devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    from cpc_audio_tpu.config import CPCConfig
    from cpc_audio_tpu.criterion import CPCUnsupervisedCriterion
    from cpc_audio_tpu.models import build_model
    from cpc_audio_tpu.parallel import (create_train_state, get_mesh,
                                        make_optimizer, make_train_step,
                                        shard_batch)

    config = CPCConfig(hiddenEncoder=args.hiddenEncoder,
                       hiddenGar=args.hiddenEncoder,
                       negativeSamplingExt=args.negativeSamplingExt,
                       arMode="LSTM", rnnMode="transformer")
    model = build_model(config)
    optimizer = make_optimizer(config.beta1, config.beta2, config.epsilon)
    mesh = get_mesh(args.n_devices)
    B = args.batchSizeGPU * args.n_devices
    rng = np.random.RandomState(0)
    batch = shard_batch(
        mesh, rng.randn(B, 1, config.sizeWindow).astype(np.float32))
    labels = shard_batch(mesh, np.zeros(B, np.int64))

    def build(mode, scope):
        criterion = CPCUnsupervisedCriterion(
            n_predicts=config.nPredicts, dim_output_ar=config.hiddenGar,
            dim_output_encoder=config.hiddenEncoder,
            negative_sampling_ext=config.negativeSamplingExt,
            rnn_mode=config.rnnMode,
            size_input_seq=config.sizeWindow // 160,
            sampling_mode=mode, negative_sampling_scope=scope)
        state = create_train_state(jax.random.PRNGKey(0), model, criterion,
                                   optimizer, (1, 1, config.sizeWindow))
        step = make_train_step(model, criterion, optimizer, mesh)
        return state, step

    modes = (("device-auto", "auto", "device"),
             ("device-exact", "exact", "device"),
             ("global", "auto", "global"))
    key = jax.random.PRNGKey(1)
    runs = {}
    for name, mode, scope in modes:
        state, step = build(mode, scope)
        state, _, m = step(state, batch, labels, None, key, 2e-4)  # compile
        jax.block_until_ready(m["losses"])
        runs[name] = {"state": state, "step": step, "times": [],
                      "loss": None}
    for i in range(args.steps):  # round-robin: drift hits all modes alike
        for name, _, _ in modes:
            r = runs[name]
            t0 = time.perf_counter()
            r["state"], _, m = r["step"](r["state"], batch, labels, None,
                                         key, 2e-4)
            jax.block_until_ready(m["losses"])
            r["times"].append(time.perf_counter() - t0)
            r["loss"] = float(np.mean(np.asarray(m["losses"])))
    out = {}
    for name, _, _ in modes:
        times = runs[name]["times"]
        med = sorted(times)[len(times) // 2]
        out[name] = {"ms_per_step": round(1e3 * med, 1),
                     "ms_min": round(1e3 * min(times), 1),
                     "loss": round(runs[name]["loss"], 4)}
    out["global_vs_device_auto"] = round(
        out["global"]["ms_per_step"] / out["device-auto"]["ms_per_step"], 2)
    out["global_vs_device_exact"] = round(
        out["global"]["ms_per_step"] / out["device-exact"]["ms_per_step"], 2)
    print(json.dumps({"metric": "scope_ab_cpu8",
                      "config": {"B_local": args.batchSizeGPU,
                                 "N": args.negativeSamplingExt,
                                 "hidden": args.hiddenEncoder,
                                 "S": config.sizeWindow // 160},
                      **out}))


if __name__ == "__main__":
    main()
