"""Smoke test for bench.py — the driver runs it to record BENCH_r{N}, so
its code path (including the chained lax.fori_loop measurement loop)
must stay runnable.  CPC_BENCH_SMOKE shrinks the config and forces the
CPU backend; the printed number is meaningless but the JSON contract
must hold."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(extra_env):
    env = dict(os.environ, CPC_BENCH_SMOKE="1", **extra_env)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, timeout=600, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["metric"] == "cpc_pretrain_windows_per_sec_per_chip"
    assert rec["value"] > 0
    assert "vs_baseline" in rec
    return rec


def test_bench_chained_smoke():
    _run({"CPC_BENCH_CHAIN": "1"})


def test_bench_per_step_smoke():
    _run({"CPC_BENCH_CHAIN": "0"})
