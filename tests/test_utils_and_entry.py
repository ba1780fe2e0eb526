"""Scheduler goldens (ported from cpc/utils/unit_tests.py:21-61) and the
driver entry points."""

import numpy as np

import jax

from cpc_audio_tpu.utils import lr_for_epoch, \
    update_logs
from cpc_audio_tpu.utils.profiling import ThroughputMeter


def test_ramp_golden():
    """testCombineRamp: ramp=3 -> lr/3, 2lr/3, 1, 1, 1..."""
    base = 1.0
    expected = [1 / 3, 2 / 3, 1.0] + [1.0] * 12
    for epoch, exp in enumerate(expected):
        assert abs(lr_for_epoch(base, epoch, -1, 3) - exp) < 1e-9


def test_ramp_step_golden():
    """testCombineRampStep: ramp=3, step=6 -> lr/3, 2lr/3, 1,1,1,1, 0.5."""
    base = 1.0
    expected = [1 / 3, 2 / 3, 1.0, 1.0, 1.0, 1.0, 0.5]
    for epoch, exp in enumerate(expected):
        assert abs(lr_for_epoch(base, epoch, 6, 3) - exp) < 1e-9


def test_step_only():
    assert lr_for_epoch(2.0, 0, 2, None) == 2.0
    assert lr_for_epoch(2.0, 2, 2, None) == 1.0
    assert lr_for_epoch(2.0, 4, 2, None) == 0.5


def test_update_logs_delta():
    logs = {"a": np.array([4.0, 8.0])}
    prev = {"a": np.array([2.0, 2.0])}
    out = update_logs(logs, 2, prev)
    np.testing.assert_array_equal(out["a"], [1.0, 3.0])


def test_throughput_meter():
    m = ThroughputMeter(n_devices=4)
    m.update(32)
    m.update(32)
    assert m.windows_per_sec > 0
    assert "windows/s" in m.summary()


def test_graft_entry_single_chip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (8, 128, 256)
    assert out[1].shape == (8, 128, 256)


def test_graft_entry_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    n = len(jax.devices())
    g.dryrun_multichip(min(n, 8))
