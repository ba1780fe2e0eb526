"""Probe: multi-chain scatter-add — 8 disjoint VMEM accumulators.

The InfoNCE backward's 475k-row scatter-add measures 4.87 ms (XLA) and
round 2 showed it latency-bound: every row costs a ~9.6-cycle serial
read-modify-write because duplicate destinations forbid parallel RMW.
A single Pallas scalar loop measured 8 ms (worse).  This probe tests the
untried variant: EIGHT separate (B*S, C) f32 accumulator refs with
update i going to ref i%8 — Mosaic knows distinct refs don't alias, so
the 8 RMW chains are independent and its scheduler can interleave them,
hiding the per-row latency.  XLA sums the 8 copies afterward (32 MB).

Usage: python perf/probe_scatter8.py [n_chains=8] [chunk=4096]
"""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, S, C, W, N = 32, 128, 256, 116, 128
R = B * W * N          # 475136
J = B * S              # 4096


def make_kernel(n_chains, chunk):
    def kernel(idx_ref, dneg_ref, *dz_refs):
        @pl.when(pl.program_id(0) == 0)
        def _():
            for r in dz_refs:
                r[:] = jnp.zeros_like(r[:])

        def body(i, carry):
            base = i * n_chains
            for j in range(n_chains):
                row = idx_ref[0, base + j]
                upd = dneg_ref[pl.ds(base + j, 1), :].astype(jnp.float32)
                dz_refs[j][pl.ds(row, 1), :] += upd
            return carry
        jax.lax.fori_loop(0, chunk // n_chains, body, 0)
    return kernel


def pallas_scatter(dneg, idx, n_chains, chunk):
    grid = (R // chunk,)
    outs = pl.pallas_call(
        make_kernel(n_chains, chunk),
        grid=grid,
        in_specs=[pl.BlockSpec((1, chunk), lambda t: (t, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((chunk, C), lambda t: (t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=tuple(pl.BlockSpec((J, C), lambda t: (0, 0),
                                     memory_space=pltpu.VMEM)
                        for _ in range(n_chains)),
        out_shape=tuple(jax.ShapeDtypeStruct((J, C), jnp.float32)
                        for _ in range(n_chains)),
    )(idx.reshape(-1, chunk), dneg)
    return functools.reduce(jnp.add, outs)


def main():
    n_chains = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    rng = np.random.RandomState(0)
    dneg = jnp.asarray(rng.randn(R, C), jnp.float32).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, J, size=(R,)), jnp.int32)

    @jax.jit
    def f_pallas(dneg, idx):
        return pallas_scatter(dneg, idx, n_chains, chunk)

    @jax.jit
    def f_xla(dneg, idx):
        z = jnp.zeros((J, C), jnp.float32)
        return z.at[idx].add(dneg.astype(jnp.float32))

    y1 = f_pallas(dneg, idx)
    y2 = f_xla(dneg, idx)
    err = float(jnp.max(jnp.abs(y1 - y2)))
    print("max err", err, "(accumulation-order rounding expected ~1e-3)")

    import glob, gzip, json, os
    from collections import defaultdict
    outdir = "/tmp/probe_scatter8"
    os.system(f"rm -rf {outdir}")
    with jax.profiler.trace(outdir):
        for _ in range(8):
            y1 = f_pallas(dneg, idx)
            y2 = f_xla(dneg, idx)
        np.asarray(y1); np.asarray(y2)
    files = sorted(glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True))
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    pid_names = {e["pid"]: e["args"].get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    tid_names = {(e["pid"], e["tid"]): e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "thread_name"}
    tot = defaultdict(float); cnt = defaultdict(int)
    for e in events:
        if e.get("ph") != "X":
            continue
        tname = tid_names.get((e["pid"], e["tid"]), "")
        pname = pid_names.get(e["pid"], "")
        if "XLA Ops" not in tname and "XLA Ops" not in pname \
                and "TensorCore" not in pname:
            continue
        tot[e["name"]] += e.get("dur", 0) / 1e3
        cnt[e["name"]] += 1
    for name, t in sorted(tot.items(), key=lambda kv: -kv[1])[:8]:
        print(f"{t / 8:7.3f} ms x{cnt[name] // 8:<3d} {name[:80]}")


if __name__ == "__main__":
    main()
