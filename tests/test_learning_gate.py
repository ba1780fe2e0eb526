"""Learning-quality gate (VERDICT r2 item 5): briefly CPC-train on the
fixture db, then assert trained features beat a random-init model of the
same architecture on the frozen phone probe (metric ``locAcc_val``,
reference eval/linear_separability.py:99) by a margin.

Guards the full stack — data pipeline, model, custom-VJP backward,
optimizer — against silent learning regressions no unit test can catch.
The gate's default shapes (sizeWindow 5120, batch 8 -> M=256 pow-2)
make the default `auto` sampling mode resolve to the SHIPPED fused
stratified objective, so this test gates the production path.
Calibrated on CPU (gate default seed 1 — seed 0 sits on the fixture
db's documented plateau attractor, docs/PERFORMANCE.md round 3/4):
30 CPC epochs / 30 probe epochs gives trained ~0.20 vs random ~0.005
(delta ~0.195); the asserted margin of 0.02 leaves ~10x slack.  Runs in
~3 min unloaded.

Same command manually (stronger, or on TPU):
    python -m cpc_audio_tpu.eval.learning_gate --nEpochCPC 40
"""

import json
import os

import pytest

from cpc_audio_tpu.ops import native

REF_DATA = "/root/reference/cpc/test_data"

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(os.path.join(REF_DATA, "test_db"))
         and native.available()),
    reason="fixtures or native decoder unavailable")


def test_trained_features_beat_random_on_phone_probe(tmp_path, capsys):
    from cpc_audio_tpu.eval.learning_gate import main

    rc = main(["--workdir", str(tmp_path), "--margin", "0.02",
               "--nEpochCPC", "30", "--nEpochProbe", "30"])
    out = capsys.readouterr().out
    line = [l for l in out.splitlines() if l.startswith('{"gate"')][-1]
    result = json.loads(line)
    assert rc == 0, f"learning gate failed: {result}"
    assert result["ok"]
    assert result["acc_trained"] > result["acc_random"]
