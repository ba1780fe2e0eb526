"""Device-trace the full bench-config train step and print the top ops.

Usage: python perf/trace_step.py [outdir] [crit|heads|step(default)]
Parses the written trace.json.gz and aggregates TensorCore op durations
per run_id-free op name, averaged over the traced iterations.
"""

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ITERS = 8


def run_and_trace(outdir: str, which: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cpc_audio_tpu.config import CPCConfig
    from cpc_audio_tpu.criterion import CPCUnsupervisedCriterion
    from cpc_audio_tpu.models import build_model
    from cpc_audio_tpu.parallel import (create_train_state, get_mesh,
                                        make_optimizer, make_train_step,
                                        shard_batch)
    from cpc_audio_tpu.parallel.train_step import _rbg_key

    config = CPCConfig(compute_dtype="bfloat16")
    rng = np.random.RandomState(0)
    skey = jax.random.PRNGKey(1)
    B = 32

    if which == "step":
        model = build_model(config)
        criterion = CPCUnsupervisedCriterion(
            n_predicts=config.nPredicts, dim_output_ar=config.hiddenGar,
            dim_output_encoder=config.hiddenEncoder,
            negative_sampling_ext=config.negativeSamplingExt,
            rnn_mode=config.rnnMode,
            sampling_mode=os.environ.get("CPC_SAMPLING_MODE", "exact"),
            negative_sampling_scope=os.environ.get("CPC_SAMPLING_SCOPE",
                                                   "device"),
            size_input_seq=config.sizeWindow // 160)
        optimizer = make_optimizer()
        mesh = get_mesh(len(jax.devices()))
        state = create_train_state(jax.random.PRNGKey(0), model, criterion,
                                   optimizer, (2, 1, config.sizeWindow))
        train_step = make_train_step(model, criterion, optimizer, mesh)
        batch = shard_batch(mesh, rng.randn(
            B * len(jax.devices()), 1, config.sizeWindow).astype(np.float32))

        def iter_once(st):
            st, _, m = train_step(st, batch, None, None, skey, 2e-4)
            return st, m["losses"]

        st = state
        for _ in range(3):
            st, probe = iter_once(st)
        np.asarray(probe)
        jax.profiler.start_trace(outdir)
        for _ in range(N_ITERS):
            st, probe = iter_once(st)
        np.asarray(probe)
        jax.profiler.stop_trace()
    elif which == "crit":
        S, C, K, N = 128, 256, 12, 128
        crit = CPCUnsupervisedCriterion(
            n_predicts=K, dim_output_ar=C, dim_output_encoder=C,
            negative_sampling_ext=N, rnn_mode="transformer",
            size_input_seq=S)
        cc = jnp.asarray(rng.randn(B, S, C), jnp.bfloat16)
        zz = jnp.asarray(rng.randn(B, S, C), jnp.bfloat16)
        cv = crit.init({"params": jax.random.PRNGKey(0),
                        "sampling": jax.random.PRNGKey(1)}, cc, zz, None)

        @jax.jit
        def f(p, c, z, key):
            k1, k2 = jax.random.split(key)
            rngs = {"sampling": k1, "dropout": _rbg_key(k2)}

            def loss(p, c, z):
                losses, _ = crit.apply({"params": p}, c, z, None,
                                       train=True, rngs=rngs)
                return jnp.sum(losses)
            l, gs = jax.value_and_grad(loss, argnums=(0, 1, 2))(p, c, z)
            return l + sum(jnp.sum(g.astype(jnp.float32))
                           for g in jax.tree_util.tree_leaves(gs))

        for i in range(3):
            l = f(cv["params"], cc, zz, jax.random.fold_in(skey, i))
        np.asarray(l)
        jax.profiler.start_trace(outdir)
        for i in range(N_ITERS):
            l = f(cv["params"], cc, zz, jax.random.fold_in(skey, i))
        np.asarray(l)
        jax.profiler.stop_trace()
    else:
        raise SystemExit(f"unknown target {which}")


def parse(outdir: str):
    files = glob.glob(os.path.join(outdir, "**/*.trace.json.gz"),
                      recursive=True)
    if not files:
        raise SystemExit("no trace written")
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    # find TensorCore process ids (XLA Ops track)
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    tid_names = {(e["pid"], e["tid"]): e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "thread_name"}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    wall = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        tname = tid_names.get((e["pid"], e["tid"]), "")
        pname = pid_names.get(e["pid"], "")
        if "XLA Ops" not in tname and "XLA Ops" not in pname \
                and "TensorCore" not in pname:
            continue
        name = re.sub(r"\d+", "#", e.get("name", ""))
        dur = e.get("dur", 0) / 1e3  # us -> ms
        tot[name] += dur
        cnt[name] += 1
        wall += dur
    print(f"total device op time: {wall / N_ITERS:.2f} ms/iter "
          f"({len(tot)} distinct ops)")
    top = sorted(tot.items(), key=lambda kv: -kv[1])[:30]
    for name, t in top:
        print(f"{t / N_ITERS:7.3f} ms  x{cnt[name] // N_ITERS:<4d} {name[:110]}")


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof_step"
    which = sys.argv[2] if len(sys.argv) > 2 else "step"
    if not glob.glob(os.path.join(outdir, "**/*.trace.json.gz"),
                     recursive=True):
        run_and_trace(outdir, which)
    parse(outdir)
