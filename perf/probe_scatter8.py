"""Probe: Pallas scatter-add with an 8x-row-padded VMEM accumulator.

The InfoNCE backward's 475k-row scatter-add measures 4.87 ms (XLA),
latency-bound at ~9.6 cycles/row (round 2).  Mosaic rejects dynamic
sublane offsets unless provably 8-aligned, so a naive Pallas row RMW
can't even lower.  This probe pads the destination 8x — accumulator
row j lives at padded row j*8, which IS provably aligned — making each
update an aligned (1, C) load-add-store.  Multiple accumulator copies
(updates round-robined by stream position) give Mosaic independent RMW
chains to interleave, hiding the store-to-load latency.  The 32 MB/copy
fits v5e VMEM for 1-2 copies; XLA folds the sparse copies afterward.

Usage: python perf/probe_scatter8.py [n_chains=2]
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
CHUNK = 4096           # updates per grid program


def make_kernel(n_chains):
    def kernel(idx_ref, dneg_ref, *dz_refs):
        @pl.when(pl.program_id(0) == 0)
        def _():
            for r in dz_refs:
                r[:] = jnp.zeros_like(r[:])

        f32 = jnp.float32

        def body(i, carry):
            g = dneg_ref[pl.ds(i * 8, 8), :].astype(f32)   # aligned granule
            for j in range(8):
                k = i * 8 + j
                row = idx_ref[0, k // (CHUNK // 8), k % (CHUNK // 8)]
                dz = dz_refs[j % n_chains]
                dz[pl.ds(row * 8, 1), :] += g[j:j + 1]
            return carry
        jax.lax.fori_loop(0, CHUNK // 8, body, 0)
    return kernel


def pallas_scatter(dneg, idx, n_chains):
    grid = (R // CHUNK,)
    outs = pl.pallas_call(
        make_kernel(n_chains),
        grid=grid,
        in_specs=[pl.BlockSpec((1, 8, CHUNK // 8), lambda t: (t, 0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((CHUNK, C), lambda t: (t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=tuple(pl.BlockSpec((J * 8, C), lambda t: (0, 0),
                                     memory_space=pltpu.VMEM)
                        for _ in range(n_chains)),
        out_shape=tuple(jax.ShapeDtypeStruct((J * 8, C), jnp.float32)
                        for _ in range(n_chains)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(110e6)),
    )(idx.reshape(-1, 8, CHUNK // 8), dneg)
    acc = functools.reduce(jnp.add, outs)
    return acc.reshape(J, 8, C)[:, 0]


def main():
    n_chains = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    rng = np.random.RandomState(0)
    dneg = jnp.asarray(rng.randn(R, C), jnp.float32).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, J, size=(R,)), jnp.int32)

    @jax.jit
    def f_pallas(dneg, idx):
        return pallas_scatter(dneg, idx, n_chains)

    @jax.jit
    def f_xla(dneg, idx):
        z = jnp.zeros((J, C), jnp.float32)
        return z.at[idx].add(dneg.astype(jnp.float32))

    y1 = f_pallas(dneg, idx)
    y2 = f_xla(dneg, idx)
    err = float(jnp.max(jnp.abs(y1 - y2)))
    print("max err", err, "(accumulation-order rounding expected)")

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
