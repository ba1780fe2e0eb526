"""Probe the axon tunnel's host<->device transfer behavior vs payload size.

Context: the batched feature extractor moves the SAME total bytes as the
per-file path but in 8x larger payloads; through the tunnel it at first
measured SLOWER wall-clock despite a 3.1x faster device-bound rate.
This probe showed the transport actually FAVORS batching (fixed ~40 ms
latency, throughput roughly size-independent) — which is what exposed
the real culprit as a per-call re-jit in the generator, since fixed in
feature_loader (resolution: docs/PERFORMANCE.md round 5 serving
section; batched now wins 2.2x wall-clock through the tunnel too).
Production PCIe moves these payloads in <1 ms.

Usage: python perf/probe_tunnel.py
Prints one JSON line: per-size median seconds + effective MB/s.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sizes_mb = [0.25, 1.0, 2.0, 3.3, 8.0]
    out = {}
    for mb in sizes_mb:
        n = int(mb * 1e6 / 4)
        x = np.random.RandomState(0).randn(n).astype(np.float32)
        # warm both directions once
        d = jax.device_put(x)
        d.block_until_ready()
        _ = np.asarray(d + 1.0)

        puts, gets = [], []
        for _ in range(5):
            t0 = time.perf_counter()
            d = jax.device_put(x)
            d.block_until_ready()
            puts.append(time.perf_counter() - t0)
            y = d + 1.0  # fresh buffer so the readback is not cached
            y.block_until_ready()
            t0 = time.perf_counter()
            _ = np.asarray(y)
            gets.append(time.perf_counter() - t0)
        p, g = sorted(puts)[2], sorted(gets)[2]
        out[f"{mb}MB"] = {
            "put_s": round(p, 4), "put_MBps": round(mb / p, 1),
            "get_s": round(g, 4), "get_MBps": round(mb / g, 1),
        }
    print(json.dumps({"metric": "tunnel_transfer_profile", "sizes": out}))


if __name__ == "__main__":
    main()
