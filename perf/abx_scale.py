"""ABX at realistic scale: host (native OpenMP DTW) vs batched on-device.

Real ZeroSpeech .item files yield thousands of triplet groups; the fixture
files in tests/ have a handful.  This instrument synthesizes a
realistic-scale group population (sizes drawn from the ZeroSpeech-like
ranges: 2-10 items per role after the max_size_group=10 cap, 4-20 frames
per item, D=256 features) and times both scoring paths end-to-end through
get_abx_scores_dtw_on_group.

Usage: python perf/abx_scale.py [n_groups=2000] [host|device|both]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cpc_audio_tpu.eval.abx import group_computation as abx_g  # noqa: E402


class SyntheticGroups:
    """Minimal group-iterator stand-in (same tuples as ABXIterator)."""

    def __init__(self, n_groups: int, dim: int = 256, seed: int = 0,
                 symmetric: bool = True):
        rng = np.random.RandomState(seed)
        self.groups = []
        self.symmetric = symmetric
        for g in range(n_groups):
            na = rng.randint(2, 11)
            nb = rng.randint(2, 11)
            smax = rng.randint(4, 21)

            def make(n):
                sizes = rng.randint(max(2, smax // 2), smax + 1, size=n)
                data = rng.randn(n, smax, dim).astype(np.float32)
                data /= np.linalg.norm(data, axis=2, keepdims=True)
                return data, sizes.astype(np.int64)

            a = make(na)
            b = make(nb)
            x = a if symmetric else make(rng.randint(2, 11))
            coords = (g % 40, (g // 40) % 40, g % 7, (g // 7) % 7)
            self.groups.append((coords, a, b, x))

    def __iter__(self):
        return iter(self.groups)

    def __len__(self):
        return len(self.groups)

    def get_board_size(self):
        return (40, 40, 7, 7)


def main():
    n_groups = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    it = SyntheticGroups(n_groups)
    dist = abx_g.get_cosine_distance_batch
    results = {}

    if which in ("host", "both"):
        t0 = time.perf_counter()
        _, vals_h, _ = abx_g.get_abx_scores_dtw_on_group(it, dist, True)
        results["host_s"] = time.perf_counter() - t0

    if which in ("device", "both"):
        # warm-up scores one small prefix so compiles are separated out
        warm = SyntheticGroups(64, seed=1)
        t0 = time.perf_counter()
        abx_g.get_abx_scores_dtw_on_group(warm, dist, True, on_device=True)
        results["device_warmup_s"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        _, vals_d, _ = abx_g.get_abx_scores_dtw_on_group(
            it, dist, True, on_device=True)
        results["device_s"] = time.perf_counter() - t0

    if which == "both":
        diff = float(np.max(np.abs(np.asarray(vals_h) - np.asarray(vals_d))))
        results["max_abs_diff"] = diff
    results["n_groups"] = n_groups
    print({k: (round(v, 4) if isinstance(v, float) else v)
           for k, v in results.items()})


if __name__ == "__main__":
    main()
