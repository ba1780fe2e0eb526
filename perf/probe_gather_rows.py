"""Probe: in-kernel dynamic ROW gather from a VMEM-resident table.

The InfoNCE forward gathers 475k random rows (B*W*N at the bench config)
from the (B*S, C) encoded tensor — 1.45 ms/step as an XLA gather (device
trace, fusion with no number).  The table is only 2 MB (bf16), so a
Pallas kernel can pin it in VMEM and stream indices; this probe measures
whether Mosaic's sublane-domain dynamic gather (jnp.take along axis 0)
beats XLA, using deterministic device traces of both.

Usage: python perf/probe_gather_rows.py [tw_rows_per_program]
"""
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, S, C, W, N = 32, 128, 256, 116, 128
R = B * W * N          # 475136 rows


def kernel(z_ref, idx_ref, o_ref):
    o_ref[:] = jnp.take(z_ref[:], idx_ref[0].reshape(-1), axis=0)


def pallas_gather(z, idx, rows_per):
    grid = (R // rows_per,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((B * S, C), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 8, rows_per // 8), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows_per, C), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, C), z.dtype),
    )(z, idx.reshape(-1, 8, rows_per // 8))


def main():
    rows_per = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(B * S, C), jnp.float32).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, B * S, size=(R,)), jnp.int32)

    @jax.jit
    def f_pallas(z, idx):
        return pallas_gather(z, idx, rows_per)

    @jax.jit
    def f_xla(z, idx):
        return jnp.take(z, idx, axis=0)

    y1 = f_pallas(z, idx)
    y2 = f_xla(z, idx)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    print("correct; tracing...")

    import glob, gzip, json
    from collections import defaultdict
    outdir = "/tmp/probe_gather_rows"
    os.system(f"rm -rf {outdir}")
    with jax.profiler.trace(outdir):
        for i in range(8):
            y1 = f_pallas(z, idx)
            y2 = f_xla(z, idx)
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
