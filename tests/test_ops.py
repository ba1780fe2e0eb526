"""On-device op tests: anti-diagonal DTW vs the native/python golden."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpc_audio_tpu.eval.abx.group_computation import _dtw_py
from cpc_audio_tpu.ops.dtw_jax import dtw_batch_device, dtw_pairwise_device


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



def _lstm_ref(xp, w_hh, h0, c0):
    def step(carry, x):
        h, c = carry
        g = x + h @ w_hh.T
        i, f, gg, o = jnp.split(g, 4, -1)
        c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
        h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
        return (h2, c2), h2
    (hT, cT), ys = jax.lax.scan(step, (h0, c0), xp.swapaxes(0, 1))
    return ys.swapaxes(0, 1), hT, cT


def _gru_ref(xp, w_hh, b_hh, h0):
    def step(h, x):
        gh = h @ w_hh.T + b_hh
        xr, xz, xn = jnp.split(x, 3, -1)
        hr, hz, hn = jnp.split(gh, 3, -1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h2 = (1 - z) * n + z * h
        return h2, h2
    hT, ys = jax.lax.scan(step, h0, xp.swapaxes(0, 1))
    return ys.swapaxes(0, 1), hT


def test_pallas_lstm_interpret_fwd_bwd():
    from cpc_audio_tpu.ops.pallas.rnn import lstm_scan_pallas
    rng = np.random.RandomState(0)
    B, T, H = 3, 16, 8
    w_hh = jnp.asarray(rng.randn(4 * H, H).astype(np.float32) * 0.3)
    xp = jnp.asarray(rng.randn(B, T, 4 * H).astype(np.float32))
    h0 = jnp.asarray(rng.randn(B, H).astype(np.float32) * 0.1)
    c0 = jnp.asarray(rng.randn(B, H).astype(np.float32) * 0.1)
    ys_r, hT_r, cT_r = _lstm_ref(xp, w_hh, h0, c0)
    ys_p, hT_p, cT_p = lstm_scan_pallas(xp, w_hh.T, h0, c0, True)
    np.testing.assert_allclose(np.asarray(ys_p), np.asarray(ys_r),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(cT_p), np.asarray(cT_r),
                               atol=1e-5)

    def loss_ref(a):
        ys, hT, cT = _lstm_ref(*a)
        return (ys ** 2).sum() * 0.5 + hT.sum() + (cT ** 2).sum()

    def loss_pal(a):
        ys, hT, cT = lstm_scan_pallas(a[0], a[1].T, a[2], a[3], True)
        return (ys ** 2).sum() * 0.5 + hT.sum() + (cT ** 2).sum()

    args = (xp, w_hh, h0, c0)
    for a, b in zip(jax.grad(loss_ref)(args), jax.grad(loss_pal)(args)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=1e-3)


def test_pallas_gru_interpret_fwd_bwd():
    from cpc_audio_tpu.ops.pallas.rnn import gru_scan_pallas
    rng = np.random.RandomState(1)
    B, T, H = 3, 16, 8
    w_hh = jnp.asarray(rng.randn(3 * H, H).astype(np.float32) * 0.3)
    b_hh = jnp.asarray(rng.randn(3 * H).astype(np.float32) * 0.1)
    xp = jnp.asarray(rng.randn(B, T, 3 * H).astype(np.float32))
    h0 = jnp.asarray(rng.randn(B, H).astype(np.float32) * 0.1)
    ys_r, hT_r = _gru_ref(xp, w_hh, b_hh, h0)
    ys_p, hT_p = gru_scan_pallas(xp, w_hh.T, b_hh, h0, True)
    np.testing.assert_allclose(np.asarray(ys_p), np.asarray(ys_r),
                               atol=1e-5)

    def loss_ref(a):
        ys, hT = _gru_ref(*a)
        return (ys ** 2).sum() * 0.5 + hT.sum()

    def loss_pal(a):
        ys, hT = gru_scan_pallas(a[0], a[1].T, a[2], a[3], True)
        return (ys ** 2).sum() * 0.5 + hT.sum()

    args = (xp, w_hh, b_hh, h0)
    for a, b in zip(jax.grad(loss_ref)(args), jax.grad(loss_pal)(args)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=1e-3)


def test_vmem_gate_rejects_oversized_batch():
    """B=128 at the default LSTM config must fall back to lax.scan — the
    fused kernel's scoped-VMEM footprint exceeds the 16 MB limit there
    (observed compile-time OOM before this gate)."""
    from cpc_audio_tpu.ops.pallas.rnn import (_pick_chunk,
                                              pallas_rnn_supported)
    assert pallas_rnn_supported(128, 32, 1024, 256)
    assert _pick_chunk(128, 64, 1024, 256) in (0, 8)
    assert not pallas_rnn_supported(128, 128, 1024, 256)


@pytest.mark.parametrize("J,C,R,ck,su", [(20000, 64, 512, 64, 1024),
                                         (50000, 128, 1024, 128, 2048)])
def test_pallas_scatter_add_matches_xla(J, C, R, ck, su):
    """scatter_add_rows (sorted range-chunked one-hot matmuls) matches the
    XLA scatter in f32, including the aligned-window spill masking."""
    from cpc_audio_tpu.ops.pallas.scatter_add import scatter_add_rows
    rng = np.random.RandomState(0)
    upd = jnp.asarray(rng.randn(J, C), jnp.bfloat16)
    keys = jnp.asarray(rng.randint(0, R, J), jnp.int32)
    out = scatter_add_rows(upd, keys, R, chunk_rows=ck, sub_updates=su,
                           interpret=True)
    ref = jnp.zeros((R, C), jnp.float32).at[keys].add(
        upd.astype(jnp.float32))
    rel = float(jnp.max(jnp.abs(out - ref))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 1e-5, rel


def test_pallas_scatter_add_skew_fallback():
    """A destination distribution exceeding the window capacity must fall
    back to the exact XLA scatter (all keys -> one row)."""
    from cpc_audio_tpu.ops.pallas.scatter_add import scatter_add_rows
    rng = np.random.RandomState(1)
    upd = jnp.asarray(rng.randn(20000, 64), jnp.bfloat16)
    keys = jnp.zeros((20000,), jnp.int32)
    out = scatter_add_rows(upd, keys, 512, chunk_rows=64,
                           sub_updates=1024, interpret=True)
    ref = jnp.zeros((512, 64), jnp.float32).at[keys].add(
        upd.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


# ---------------------------------------------------------------------------
# Feistel format-preserving permutation (ops/feistel.py)


@pytest.mark.parametrize("nbits", [4, 7, 12])
def test_feistel_bijective_and_invertible(nbits):
    from cpc_audio_tpu.ops.feistel import (ROUNDS, feistel_inverse,
                                           feistel_permute)
    M = 1 << nbits
    keys = jax.random.bits(jax.random.PRNGKey(11), (6, ROUNDS),
                           dtype=jnp.uint32)
    x = jnp.arange(M, dtype=jnp.uint32)[None, :]
    y = feistel_permute(x, keys, nbits)
    assert y.shape == (6, M)
    ys = np.sort(np.asarray(y), axis=1)
    np.testing.assert_array_equal(ys, np.broadcast_to(np.arange(M), (6, M)))
    np.testing.assert_array_equal(np.asarray(feistel_inverse(y, keys, nbits)),
                                  np.broadcast_to(np.asarray(x), (6, M)))


def test_feistel_pointwise_marginal_uniform():
    """The permutation family's value at a fixed point must be ~uniform
    across keys (this is what makes stratified sampling's per-window
    negative marginals match the iid reference sampler)."""
    from cpc_audio_tpu.ops.feistel import ROUNDS, feistel_permute
    nbits, trials = 6, 4096
    M = 1 << nbits
    keys = jax.random.bits(jax.random.PRNGKey(5), (trials, ROUNDS),
                           dtype=jnp.uint32)
    vals = feistel_permute(jnp.full((1, 1), 23, jnp.uint32)[..., 0][None],
                           keys, nbits)
    counts = np.bincount(np.asarray(vals).ravel(), minlength=M)
    exp = trials / M
    chi2 = float(((counts - exp) ** 2 / exp).sum())
    # dof 63: mean 63, 99.99th percentile ~115; generous bound
    assert chi2 < 150, chi2
