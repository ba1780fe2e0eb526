"""Interpret-mode equivalence tests for the fused transformer-layer tail
kernel (ops/pallas/ffn.py): LN1 -> FFN -> residual -> LN2 must match a
pure-JAX reference — values AND all ten input/parameter gradients — with
dropout off (exact math) and with dropout on (same mask, reconstructed
from the kernel's deterministic (seed, program) stream)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpc_audio_tpu.ops.pallas.attention import _dropout_mask
from cpc_audio_tpu.ops.pallas.ffn import (_mask_granule, _pick_tm,
                                          fused_layer_tail,
                                          fused_tail_supported)

K, M, D, F = 2, 64, 128, 256
EPS = 1e-5


def _params(rng, dtype=jnp.float32):
    x = jnp.asarray(rng.randn(K, M, D) * 0.5, dtype)
    ln1w = jnp.asarray(1.0 + 0.1 * rng.randn(K, D), jnp.float32)
    ln1b = jnp.asarray(0.1 * rng.randn(K, D), jnp.float32)
    w1 = jnp.asarray(rng.randn(K, D, F) / np.sqrt(D), dtype)
    b1 = jnp.asarray(0.1 * rng.randn(K, F), jnp.float32)
    w2 = jnp.asarray(rng.randn(K, F, D) / np.sqrt(F), dtype)
    b2 = jnp.asarray(0.1 * rng.randn(K, D), jnp.float32)
    ln2w = jnp.asarray(1.0 + 0.1 * rng.randn(K, D), jnp.float32)
    ln2b = jnp.asarray(0.1 * rng.randn(K, D), jnp.float32)
    return (x, ln1w, ln1b, w1, b1, w2, b2, ln2w, ln2b)


def _ln(x, w, b):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + EPS) * w[:, None] + b[:, None]


def _mask_for(rate, seed_val):
    """Reassemble the kernel's interpret-mode dropout mask as one
    (K, M, F) tensor (scaled by 1/keep, zeros where dropped).  Streams
    are keyed by the ABSOLUTE row granule (ffn._ffn_dropout_rows), so
    this reconstruction is tile-size independent by construction."""
    gr = _mask_granule(M)
    n_gr = M // gr
    seed = jnp.asarray(seed_val, jnp.float32)
    rows = []
    for k in range(K):
        tiles = [_dropout_mask((gr, F), rate, seed, k * n_gr + g, True)
                 for g in range(n_gr)]
        rows.append(jnp.concatenate(tiles, axis=0))
    return jnp.stack(rows)


def _reference(args, rate=0.0, mask=None):
    x, ln1w, ln1b, w1, b1, w2, b2, ln2w, ln2b = args
    y = _ln(x.astype(jnp.float32), ln1w, ln1b).astype(x.dtype)
    hp = jnp.einsum("kmd,kdf->kmf", y, w1,
                    preferred_element_type=jnp.float32) + b1[:, None]
    h = jnp.maximum(hp, 0.0)
    if rate > 0.0:
        h = h * mask
    h = h.astype(x.dtype)
    f = jnp.einsum("kmf,kfd->kmd", h, w2,
                   preferred_element_type=jnp.float32) + b2[:, None]
    y2 = y.astype(jnp.float32) + f
    return _ln(y2, ln2w, ln2b).astype(x.dtype)


def _fused(args, rate=0.0, seed_val=0.0):
    seed = jnp.full((1,), seed_val, jnp.float32)
    return fused_layer_tail(*args, seed, rate, EPS, True)


def test_supported_gate():
    assert fused_tail_supported(M, D, F)
    assert not fused_tail_supported(M, D + 8, F)      # lane-misaligned D
    assert not fused_tail_supported(M + 4, D, F)      # sublane-misaligned M


def test_tail_values_no_dropout():
    rng = np.random.RandomState(0)
    args = _params(rng)
    got = _fused(args)
    want = _reference(args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_tail_grads_no_dropout():
    rng = np.random.RandomState(1)
    args = _params(rng)
    cot = jnp.asarray(rng.randn(K, M, D), jnp.float32)

    def loss_fused(*a):
        return jnp.sum(_fused(a) * cot)

    def loss_ref(*a):
        return jnp.sum(_reference(a) * cot)

    g_f = jax.grad(loss_fused, argnums=tuple(range(9)))(*args)
    g_r = jax.grad(loss_ref, argnums=tuple(range(9)))(*args)
    names = ["x", "ln1w", "ln1b", "w1", "b1", "w2", "b2", "ln2w", "ln2b"]
    for n, a, b in zip(names, g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=n)


def test_tail_values_and_grads_with_dropout():
    """With the interpret-mode mask reconstructed tile-by-tile, the fused
    path must equal the reference exactly — including through the
    backward's recomputed (sign-recovered) mask."""
    rate, seed_val = 0.25, 7.0
    rng = np.random.RandomState(2)
    args = _params(rng)
    mask = _mask_for(rate, seed_val)
    # the mask must actually drop something and carry the 1/keep scale
    frac = float(jnp.mean(mask == 0.0))
    assert 0.15 < frac < 0.35
    assert np.isclose(float(jnp.max(mask)), 1.0 / (1.0 - rate))

    got = _fused(args, rate, seed_val)
    want = _reference(args, rate, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    cot = jnp.asarray(rng.randn(K, M, D), jnp.float32)
    g_f = jax.grad(lambda *a: jnp.sum(_fused(a, rate, seed_val) * cot),
                   argnums=tuple(range(9)))(*args)
    g_r = jax.grad(lambda *a: jnp.sum(_reference(a, rate, mask) * cot),
                   argnums=tuple(range(9)))(*args)
    names = ["x", "ln1w", "ln1b", "w1", "b1", "w2", "b2", "ln2w", "ln2b"]
    for n, a, b in zip(names, g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=n)


def test_dropout_mask_survives_fwd_bwd_tile_split(monkeypatch):
    """With DIFFERENT fwd/bwd row tiles and dropout ON, the backward must
    regenerate the exact forward mask (absolute-granule keying).  The
    program-id-keyed scheme fails this: its bwd mask depends on the tile
    size, silently corrupting every gradient through the dropout site —
    the same bug class the attention kernel fixed in round 3."""
    rate, seed_val = 0.25, 5.0
    rng = np.random.RandomState(6)
    args = _params(rng)
    cot = jnp.asarray(rng.randn(K, M, D), jnp.float32)

    monkeypatch.setenv("CPC_FFN_TM", "16")
    monkeypatch.setenv("CPC_FFN_TM_BWD", "64")
    assert _pick_tm(M) == 16 and _pick_tm(M, bwd=True) == 64
    mask = _mask_for(rate, seed_val)
    got = _fused(args, rate, seed_val)
    want = _reference(args, rate, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    g_f = jax.grad(lambda *a: jnp.sum(_fused(a, rate, seed_val) * cot),
                   argnums=tuple(range(9)))(*args)
    g_r = jax.grad(lambda *a: jnp.sum(_reference(a, rate, mask) * cot),
                   argnums=tuple(range(9)))(*args)
    for n, a, b in zip(["x", "w1", "w2"], g_f[:1] + g_f[3:4] + g_f[5:6],
                       g_r[:1] + g_r[3:4] + g_r[5:6]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=n)


def test_tail_deterministic():
    rate, seed_val = 0.1, 3.0
    rng = np.random.RandomState(3)
    args = _params(rng)
    a = _fused(args, rate, seed_val)
    b = _fused(args, rate, seed_val)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = _fused(args, rate, seed_val + 1)
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_stacked_layer_fused_matches_xla(monkeypatch):
    """Module-level: StackedTransformerHeads with the fused tail ON
    (interpret) equals the XLA path — values and input grads — dropout
    off (eval mode)."""
    from cpc_audio_tpu.criterion.stacked_heads import StackedTransformerHeads

    monkeypatch.setenv("CPC_PALLAS_ATTN", "0")
    monkeypatch.setenv("CPC_PALLAS_FFN_INTERPRET", "1")
    rng = np.random.RandomState(4)
    B, W, DM = 2, 32, 128
    c = jnp.asarray(rng.randn(B, W, DM), jnp.float32)
    net = StackedTransformerHeads(2, DM, W, nheads=8, dff=256)
    monkeypatch.setenv("CPC_PALLAS_FFN", "0")
    params = net.init({"params": jax.random.PRNGKey(0)}, c)

    def run(cc):
        return net.apply(params, cc)

    want, want_g = jax.value_and_grad(
        lambda cc: jnp.sum(run(cc) ** 2))(c)
    monkeypatch.setenv("CPC_PALLAS_FFN", "1")
    got, got_g = jax.value_and_grad(
        lambda cc: jnp.sum(run(cc) ** 2))(c)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                               rtol=1e-4, atol=1e-5)
