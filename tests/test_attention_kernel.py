"""Interpret-mode equivalence tests for the fused attention kernel
(ops/pallas/attention.py) against the XLA path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpc_audio_tpu.ops.pallas.attention import (fused_attention_supported,
                                                fused_causal_attention)


def ref_attn(q, k, v, bias):
    S, dk = q.shape[1], q.shape[2]
    s = jnp.einsum("nid,njd->nij", q.astype(jnp.float32),
                   k.astype(jnp.float32))
    s = (s + bias.astype(jnp.float32)) / np.sqrt(dk)
    mask = jnp.tril(jnp.ones((S, S), bool))
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("nij,njd->nid", p,
                      v.astype(jnp.float32)).astype(q.dtype)


def _rand(rng, shape, dtype):
    return jnp.asarray(rng.randn(*shape), dtype)


ZERO_SEED = jnp.zeros((1,), jnp.float32)


@pytest.mark.parametrize("dtype,S", [(jnp.float32, 116), (jnp.bfloat16, 116),
                                     (jnp.float32, 20)])
def test_fused_attention_fwd_and_grads(dtype, S):
    rng = np.random.RandomState(0)
    N, dk = 16, 32
    assert fused_attention_supported(S, dk, N)
    q, k, v = (_rand(rng, (N, S, dk), dtype) for _ in range(3))
    bias = _rand(rng, (N, S, S), dtype)
    cot = _rand(rng, (N, S, dk), dtype)

    def loss_f(q, k, v, b):
        out = fused_causal_attention(q, k, v, b, ZERO_SEED, 0.0, True)
        return jnp.sum((out * cot).astype(jnp.float32))

    def loss_r(q, k, v, b):
        return jnp.sum((ref_attn(q, k, v, b) * cot).astype(jnp.float32))

    out = fused_causal_attention(q, k, v, bias, ZERO_SEED, 0.0, True)
    atol = 2e-5 if dtype == jnp.float32 else 0.1
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref_attn(q, k, v, bias),
                                          np.float32), atol=atol)
    g_f = jax.grad(loss_f, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_r = jax.grad(loss_r, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gtol = 1e-4 if dtype == jnp.float32 else 0.35
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=gtol)


def test_fused_attention_vmap_matches_loop():
    rng = np.random.RandomState(1)
    K, N, S, dk = 3, 8, 20, 32
    q, k, v = (_rand(rng, (K, N, S, dk), jnp.float32) for _ in range(3))
    b = _rand(rng, (K, N, S, S), jnp.float32)

    def f(q, k, v, b):
        return fused_causal_attention(q, k, v, b, ZERO_SEED, 0.0, True)

    out_v = jax.vmap(f)(q, k, v, b)
    out_l = jnp.stack([f(q[i], k[i], v[i], b[i]) for i in range(K)])
    np.testing.assert_allclose(np.asarray(out_v), np.asarray(out_l))


def test_fused_attention_dropout_deterministic_and_unbiased():
    rng = np.random.RandomState(2)
    N, S, dk = 64, 32, 32
    q, k, v = (_rand(rng, (N, S, dk), jnp.float32) for _ in range(3))
    bias = jnp.zeros((N, S, S), jnp.float32)
    seed = jnp.asarray([7.0], jnp.float32)

    o1 = fused_causal_attention(q, k, v, bias, seed, 0.5, True)
    o2 = fused_causal_attention(q, k, v, bias, seed, 0.5, True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    o3 = fused_causal_attention(q, k, v, bias, jnp.asarray([8.0]), 0.5, True)
    assert float(jnp.max(jnp.abs(o3 - o1))) > 1e-3  # stream moved

    # E[dropout(p)] == p: averaging many rows should approach no-dropout
    base = fused_causal_attention(q, k, v, bias, seed, 0.0, True)
    diff = float(jnp.mean(o1 - base))
    assert abs(diff) < 0.05, diff


def test_mha_module_fused_matches_xla(monkeypatch):
    """MultiHeadAttention with the fused kernel (interpret) reproduces the
    XLA path exactly, relpos skew included."""
    from cpc_audio_tpu.models.transformer import MultiHeadAttention

    monkeypatch.setenv("CPC_PALLAS_ATTN_INTERPRET", "1")
    rng = np.random.RandomState(3)
    B, S, D = 4, 24, 64
    x = _rand(rng, (B, S, D), jnp.float32)
    mha = MultiHeadAttention(size_seq=S, dmodel=D, nheads=8, relpos=True)
    variables = mha.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("CPC_PALLAS_ATTN", "0")
    y_ref = mha.apply(variables, x)
    monkeypatch.setenv("CPC_PALLAS_ATTN", "1")
    y_fused = mha.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=2e-5)

    def loss(v, flag):
        monkeypatch.setenv("CPC_PALLAS_ATTN", flag)
        return jnp.sum(mha.apply(v, x) ** 2)

    g_ref = jax.grad(lambda v: loss(v, "0"))(variables)
    g_fused = jax.grad(lambda v: loss(v, "1"))(variables)
    flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(g_fused))
    for path, leaf in flat_r:
        np.testing.assert_allclose(np.asarray(flat_f[path]),
                                   np.asarray(leaf), atol=5e-5,
                                   err_msg=str(path))
