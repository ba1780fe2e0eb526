"""Fused conv+ChannelNorm+ReLU encoder kernel (ops/pallas/conv_ln.py).

Interpret-mode equivalence against the XLA composition
(lax.conv_general_dilated + ChannelNorm(ddof=1) + relu), values and
grads, at the real CPC layer geometries (kernel == 2*stride,
/root/reference/cpc/model.py:83-93).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpc_audio_tpu.ops.pallas.conv_ln import fused_conv_ln_relu


def _composed(x, w, b, nw, nb, s, k, p, eps=1e-5):
    y = jax.lax.conv_general_dilated(
        x, w.reshape(k, x.shape[-1], -1), window_strides=(s,),
        padding=[(p, p)], dimension_numbers=("NWC", "WIO", "NWC")) + b
    mean = jnp.mean(y, -1, keepdims=True)
    var = jnp.var(y, -1, keepdims=True, ddof=1)
    yn = (y - mean) * jax.lax.rsqrt(var + eps)
    return jnp.maximum(yn * nw + nb, 0.0)


def _params(rng, k, C):
    return (jnp.asarray(rng.randn(k * C, C) / 30, jnp.float32),
            jnp.asarray(rng.randn(C) * 0.1, jnp.float32),
            jnp.asarray(1 + 0.1 * rng.randn(C), jnp.float32),
            jnp.asarray(0.1 * rng.randn(C), jnp.float32))


@pytest.mark.parametrize("T,C,k,s,p,tm", [
    (64, 128, 8, 4, 2, None),     # single tile
    (160, 128, 4, 2, 1, "8"),     # 10 tiles -> cross-tile dx carries
    (640, 128, 8, 4, 2, None),    # the real layer-1 geometry
])
def test_fused_conv_matches_composition(monkeypatch, T, C, k, s, p, tm):
    if tm is not None:
        monkeypatch.setenv("CPC_CONV_TM", tm)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, T, C), jnp.float32)
    w, b, nw, nb = _params(rng, k, C)

    y_ref = _composed(x, w, b, nw, nb, s, k, p)
    y = fused_conv_ln_relu(x, w, b, nw, nb, s, k, p, 1e-5, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)

    ct = jnp.asarray(rng.randn(*y_ref.shape), jnp.float32)
    g_ref = jax.grad(lambda *a: jnp.vdot(_composed(*a, s, k, p), ct),
                     argnums=(0, 1, 2, 3, 4))(x, w, b, nw, nb)
    g = jax.grad(
        lambda *a: jnp.vdot(fused_conv_ln_relu(*a, s, k, p, 1e-5, True), ct),
        argnums=(0, 1, 2, 3, 4))(x, w, b, nw, nb)
    for name, a, bb in zip(("x", "w", "b", "nw", "nb"), g_ref, g):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_fused_conv_stacked_layers():
    """Three fused layers composed (the layer-1..3 geometry) match the
    XLA composition end-to-end, values and grads.  Pinned seed: relu
    tie-breaking makes STACKED grad comparisons sensitive to float
    rounding wherever some |pre-activation| is within the recompute
    rounding (~1e-6) of zero — both paths are deterministic, so a
    passing seed stays passing."""
    rng = np.random.RandomState(1)
    C = 128
    layers = [(8, 4, 2), (4, 2, 1), (4, 2, 1)]
    x = jnp.asarray(np.abs(rng.randn(2, 640, C)), jnp.float32)
    params = [_params(rng, k, C) for k, _, _ in layers]

    def stack(x, params, fused):
        for (k, s, p), (w, b, nw, nb) in zip(layers, params):
            if fused:
                x = fused_conv_ln_relu(x, w, b, nw, nb, s, k, p, 1e-5,
                                       True)
            else:
                x = _composed(x, w, b, nw, nb, s, k, p)
        return x

    y_ref = stack(x, params, False)
    y = stack(x, params, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=3e-5)
    g_ref = jax.grad(lambda x, pp: jnp.sum(stack(x, pp, False) ** 2),
                     argnums=(0, 1))(x, params)
    g = jax.grad(lambda x, pp: jnp.sum(stack(x, pp, True) ** 2),
                 argnums=(0, 1))(x, params)
    flat_r = jax.tree_util.tree_leaves(g_ref)
    flat_f = jax.tree_util.tree_leaves(g)
    for a, bb in zip(flat_r, flat_f):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                   rtol=2e-4, atol=3e-4)


def test_encoder_module_fused_path(monkeypatch):
    """CPCEncoder with the fused path ON: identical param tree, forward
    equal to the XLA path, and grads equal up to relu tie-flips (tiny
    fwd rounding differences flip the mask where |pre| ~ 1e-6 — see the
    stacked test note), asserted as per-leaf relative L2 error < 1%."""
    from cpc_audio_tpu.models.encoder import CPCEncoder

    monkeypatch.setenv("CPC_PALLAS_CONV_INTERPRET", "1")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 3200), jnp.float32)
    enc = CPCEncoder(128)
    monkeypatch.setenv("CPC_PALLAS_CONV", "0")
    v = enc.init({"params": jax.random.PRNGKey(0)}, x)
    y_ref = enc.apply(v, x)
    monkeypatch.setenv("CPC_PALLAS_CONV", "1")
    v2 = enc.init({"params": jax.random.PRNGKey(0)}, x)
    assert jax.tree_util.tree_map(lambda a: a.shape, v["params"]) \
        == jax.tree_util.tree_map(lambda a: a.shape, v2["params"])
    y = enc.apply(v, x)
    assert y.shape == y_ref.shape == (2, 20, 128)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=3e-5)

    def loss(v, flag):
        monkeypatch.setenv("CPC_PALLAS_CONV", flag)
        return jnp.sum(enc.apply(v, x) ** 2)

    g_ref = jax.grad(lambda v: loss(v, "0"))(v)
    g = jax.grad(lambda v: loss(v, "1"))(v)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(g))
    for path, a in jax.tree_util.tree_leaves_with_path(g_ref):
        bb = flat_f[path]
        err = float(jnp.linalg.norm(bb - a))
        ref = float(jnp.linalg.norm(a)) + 1e-9
        assert err / ref < 1e-2, f"{path}: rel L2 {err / ref:.2e}"


def test_encoder_fused_gate_respects_norm_mode(monkeypatch):
    """Non-ChannelNorm modes must take the unfused path (the kernel bakes
    ChannelNorm semantics in)."""
    from cpc_audio_tpu.models.encoder import CPCEncoder

    monkeypatch.setenv("CPC_PALLAS_CONV_INTERPRET", "1")
    monkeypatch.setenv("CPC_PALLAS_CONV", "1")
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 3200), jnp.float32)
    enc = CPCEncoder(128, norm_mode="instanceNorm")
    v = enc.init({"params": jax.random.PRNGKey(0)}, x)
    y1 = enc.apply(v, x)
    monkeypatch.setenv("CPC_PALLAS_CONV", "0")
    y2 = enc.apply(v, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))
