"""Subprocess worker for the 2-process multi-host simulation test.

Usage: python multihost_worker.py <process_id> <coordinator_port>

Joins a 2-process jax.distributed CPU runtime (2 virtual devices per
process -> global 4-device mesh), runs ONE real sharded train step over
the global mesh, and prints losses + a parameter checksum that must match
across processes (the gradient psum crosses the process boundary).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
proc_id, port = int(sys.argv[1]), sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cpc_audio_tpu.parallel.distributed import (initialize_distributed,  # noqa: E402
                                                process_info,
                                                shard_sequences)

initialize_distributed(coordinator_address=f"localhost:{port}",
                       num_processes=2, process_id=proc_id)
assert process_info() == (proc_id, 2)
assert len(jax.devices()) == 4 and jax.local_device_count() == 2

seqs = [f"f{i}" for i in range(10)]
assert shard_sequences(seqs) == seqs[proc_id::2]

from cpc_audio_tpu.config import CPCConfig  # noqa: E402
from cpc_audio_tpu.criterion import CPCUnsupervisedCriterion  # noqa: E402
from cpc_audio_tpu.models import build_model  # noqa: E402
from cpc_audio_tpu.parallel import (create_train_state, get_mesh,  # noqa: E402
                                    make_optimizer, make_train_step,
                                    shard_batch)

config = CPCConfig(hiddenEncoder=16, hiddenGar=16, nPredicts=2,
                   negativeSamplingExt=4, sizeWindow=3200,
                   arMode="GRU", rnnMode="linear")
model = build_model(config)
criterion = CPCUnsupervisedCriterion(
    n_predicts=config.nPredicts, dim_output_ar=config.hiddenGar,
    dim_output_encoder=config.hiddenEncoder,
    negative_sampling_ext=config.negativeSamplingExt,
    rnn_mode=config.rnnMode, size_input_seq=config.sizeWindow // 160)
optimizer = make_optimizer(config.beta1, config.beta2, config.epsilon)
mesh = get_mesh(len(jax.devices()))
state = create_train_state(jax.random.PRNGKey(0), model, criterion,
                           optimizer, (1, 1, config.sizeWindow))
train_step = make_train_step(model, criterion, optimizer, mesh,
                             donate=False)
rng = np.random.RandomState(0)
batch = shard_batch(
    mesh, rng.randn(len(jax.devices()), 1,
                    config.sizeWindow).astype(np.float32))
state, _, metrics = train_step(state, batch, None, None,
                               jax.random.PRNGKey(1), 2e-4)
losses = np.asarray(metrics["losses"].addressable_shards[0].data)
assert np.isfinite(losses).all(), losses
leaf = jax.tree_util.tree_leaves(state.params)[0]
chk = float(np.asarray(jnp.sum(jnp.abs(leaf.addressable_shards[0].data))))
print(f"MHOK proc{proc_id} losses={np.round(losses, 6).tolist()} "
      f"chk={chk:.6f}")
