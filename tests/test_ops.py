"""On-device op tests: anti-diagonal DTW vs the native/python golden, and
the pallas scoring kernel in interpret mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpc_audio_tpu.eval.abx.group_computation import _dtw_py
from cpc_audio_tpu.ops.dtw_jax import dtw_batch_device, dtw_pairwise_device
from cpc_audio_tpu.ops.pallas.scoring import (fused_negative_scores,
                                              reference_negative_scores)


def test_dtw_device_matches_python():
    rng = np.random.RandomState(0)
    P, S1, S2 = 6, 9, 7
    dist = rng.rand(P, S1, S2).astype(np.float32)
    sx = rng.randint(2, S1 + 1, P)
    sy = rng.randint(2, S2 + 1, P)
    out = np.asarray(dtw_batch_device(jnp.asarray(dist), jnp.asarray(sx),
                                      jnp.asarray(sy)))
    for p in range(P):
        exp = _dtw_py(dist[p], sx[p], sy[p])
        assert abs(out[p] - exp) < 1e-5, p


def test_dtw_device_pairwise_symmetric():
    rng = np.random.RandomState(1)
    N, S = 4, 6
    dist = rng.rand(N, N, S, S).astype(np.float32)
    dist = (dist + dist.transpose(1, 0, 3, 2)) / 2
    sx = np.full(N, S, np.int64)
    out = np.asarray(dtw_pairwise_device(jnp.asarray(dist), sx, sx, True))
    np.testing.assert_allclose(out, out.T, atol=1e-6)
    assert np.all(np.diag(out) == 0)
    # upper triangle matches per-pair device DTW
    exp = _dtw_py(dist[0, 1], S, S)
    assert abs(out[0, 1] - exp) < 1e-5


def test_dtw_device_degenerate_sizes():
    """Length-1 sequences: cost = dist[0,0] (path length 1)."""
    dist = np.full((1, 4, 4), 7.0, np.float32)
    dist[0, 0, 0] = 3.0
    out = np.asarray(dtw_batch_device(jnp.asarray(dist),
                                      jnp.asarray([1]), jnp.asarray([1])))
    assert abs(out[0] - 3.0) < 1e-6


def test_pallas_scoring_interpret_matches_reference():
    rng = np.random.RandomState(2)
    K, B, W, C, N, S = 3, 4, 16, 32, 8, 24
    preds = jnp.asarray(rng.randn(K, B, W, C).astype(np.float32))
    z = jnp.asarray(rng.randn(B * S, C).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, B * S, (B, N, W)).astype(np.int32))
    ref = reference_negative_scores(preds, z, idx)
    got = fused_negative_scores(preds, z, idx, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
