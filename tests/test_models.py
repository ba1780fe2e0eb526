"""Model-layer tests: shapes, norms, recurrences, transformer.

Mirrors the reference factory tests (cpc/unit_tests.py:279-342) and adds the
golden recurrence checks the reference lacks (verified against torch GRU/LSTM
semantics by construction).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpc_audio_tpu.config import CPCConfig
from cpc_audio_tpu.models import (CPCAR, ChannelNorm, CPCEncoder,
                                  ConcatenatedModel, NoAr, TransformerAR,
                                  build_model, get_ar, get_encoder)


def test_encoder_output_shape(rng):
    enc = CPCEncoder(size_hidden=64)
    x = jnp.zeros((2, 1, 20480))
    params = enc.init(rng, x)
    y = enc.apply(params, x)
    assert y.shape == (2, 128, 64)  # 160x downsampling (model.py:94)


def test_conv_dots_matches_lax_conv(rng, monkeypatch):
    """The opt-in two-matmul block formulation of kernel==2*stride convs
    (CPC_CONV_DOTS=1, a documented perf negative-result path) must match
    lax.conv_general_dilated — values and gradients — including on
    lengths that don't divide the stride (the common_voices classifier
    runs k=8/s=4/p=0 on arbitrary T)."""
    from cpc_audio_tpu.models.encoder import Conv1d

    nprng = np.random.RandomState(0)
    for (cin, k, s, p, t) in [(16, 8, 4, 2, 64), (16, 4, 2, 1, 30),
                              (5, 8, 4, 0, 37)]:
        x = jnp.asarray(nprng.randn(2, t, cin), jnp.float32)
        m = Conv1d(8, k, s, p)
        v = m.init(rng, x)
        cot_shape = m.apply(v, x).shape
        cot = jnp.asarray(nprng.randn(*cot_shape), jnp.float32)

        def loss(v, x):
            return jnp.sum(m.apply(v, x) * cot)

        monkeypatch.setenv("CPC_CONV_DOTS", "0")
        y0, (gv0, gx0) = m.apply(v, x), jax.grad(loss, (0, 1))(v, x)
        monkeypatch.setenv("CPC_CONV_DOTS", "1")
        y1, (gv1, gx1) = m.apply(v, x), jax.grad(loss, (0, 1))(v, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0),
                                   atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(gv1),
                        jax.tree_util.tree_leaves(gv0)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


@pytest.mark.parametrize("norm", ["layerNorm", "instanceNorm", "ID"])
def test_encoder_norm_modes(rng, norm):
    enc = CPCEncoder(size_hidden=32, norm_mode=norm)
    x = jax.random.normal(rng, (2, 1, 3200))
    params = enc.init(rng, x)
    y = enc.apply(params, x)
    assert y.shape == (2, 20, 32)
    assert np.isfinite(np.asarray(y)).all()


def test_encoder_batchnorm_updates_stats(rng):
    enc = CPCEncoder(size_hidden=32, norm_mode="batchNorm")
    x = jax.random.normal(rng, (2, 1, 3200))
    variables = enc.init(rng, x, train=True)
    y, mutated = enc.apply(variables, x, train=True, mutable=["batch_stats"])
    assert y.shape == (2, 20, 32)
    old = variables["batch_stats"]["norm0"]["mean"]
    new = mutated["batch_stats"]["norm0"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_channelnorm_matches_manual(rng):
    cn = ChannelNorm(8)
    x = jax.random.normal(rng, (2, 5, 8))
    params = cn.init(rng, x)
    y = cn.apply(params, x)
    xn = np.asarray(x)
    expected = (xn - xn.mean(-1, keepdims=True)) / np.sqrt(
        xn.var(-1, keepdims=True, ddof=1) + 1e-5)
    np.testing.assert_allclose(np.asarray(y), expected, atol=1e-5)


@pytest.mark.parametrize("mode", ["GRU", "LSTM", "RNN"])
def test_ar_shapes_and_hidden_carry(rng, mode):
    ar = CPCAR(dim_output=16, num_layers=2, mode=mode)
    x = jax.random.normal(rng, (3, 12, 8))
    params = ar.init(rng, x)
    y, h = ar.apply(params, x)
    assert y.shape == (3, 12, 16)
    # carrying hidden across two halves == one pass (keepHidden semantics,
    # model.py:193-198)
    y1, h1 = ar.apply(params, x[:, :6])
    y2, h2 = ar.apply(params, x[:, 6:], h1)
    np.testing.assert_allclose(np.asarray(jnp.concatenate([y1, y2], axis=1)),
                               np.asarray(y), atol=1e-5)


def test_gru_golden_manual(rng):
    """One GRU step against a hand-rolled torch-equation computation."""
    ar = CPCAR(dim_output=4, num_layers=1, mode="GRU")
    x = jax.random.normal(rng, (1, 1, 3))
    params = ar.init(rng, x)
    p = params["params"]["layer0"]
    w_ih = np.asarray(p["weight_ih_t"]).T
    w_hh = np.asarray(p["weight_hh_t"]).T
    b_ih, b_hh = np.asarray(p["bias_ih"]), np.asarray(p["bias_hh"])
    xv = np.asarray(x)[0, 0]
    h = np.zeros(4)

    def sig(v):
        return 1 / (1 + np.exp(-v))

    gi = w_ih @ xv + b_ih
    gh = w_hh @ h + b_hh
    r = sig(gi[:4] + gh[:4])
    z = sig(gi[4:8] + gh[4:8])
    n = np.tanh(gi[8:] + r * gh[8:])
    expected = (1 - z) * n + z * h
    y, _ = ar.apply(params, x)
    np.testing.assert_allclose(np.asarray(y)[0, 0], expected, atol=1e-5)


def test_reverse_ar(rng):
    ar = CPCAR(dim_output=8, num_layers=1, mode="GRU", reverse=True)
    x = jax.random.normal(rng, (2, 10, 8))
    params = ar.init(rng, x)
    y, _ = ar.apply(params, x)
    fwd = CPCAR(dim_output=8, num_layers=1, mode="GRU", reverse=False)
    y2, _ = fwd.apply(params, jnp.flip(x, 1))
    np.testing.assert_allclose(np.asarray(y), np.asarray(jnp.flip(y2, 1)),
                               atol=1e-6)


def test_transformer_causality(rng):
    """Changing a future frame must not affect past outputs."""
    tr = TransformerAR(dim_encoded=16, n_layers=1, size_seq=12)
    x = jax.random.normal(rng, (1, 12, 16))
    params = tr.init(rng, x)
    y, _ = tr.apply(params, x)
    x2 = x.at[:, 8:].set(0.0)
    y2, _ = tr.apply(params, x2)
    np.testing.assert_allclose(np.asarray(y)[:, :8], np.asarray(y2)[:, :8],
                               atol=1e-5)
    assert not np.allclose(np.asarray(y)[:, 8:], np.asarray(y2)[:, 8:])


def test_cpc_model_forward(rng):
    cfg = CPCConfig(hiddenEncoder=32, hiddenGar=24, sizeWindow=3200,
                    arMode="GRU")
    model = build_model(cfg)
    x = jnp.zeros((2, 1, 3200))
    variables = model.init(rng, x)
    c, z, label, hidden = model.apply(variables, x, None)
    assert z.shape == (2, 20, 32)
    assert c.shape == (2, 20, 24)


def test_no_ar_forces_gar_dim(rng):
    cfg = CPCConfig(hiddenEncoder=32, hiddenGar=99, sizeWindow=3200,
                    arMode="no_ar")
    model = build_model(cfg)
    assert model.config.hiddenGar == 32  # train.py:486-487


@pytest.mark.parametrize("ar_mode,cls", [
    ("GRU", CPCAR), ("LSTM", CPCAR), ("RNN", CPCAR),
    ("no_ar", NoAr), ("transformer", TransformerAR)])
def test_get_ar_factory(ar_mode, cls):
    """Real AR-builder tests (the reference's were shadowed,
    unit_tests.py:316-342)."""
    cfg = CPCConfig(arMode=ar_mode)
    assert isinstance(get_ar(cfg), cls)


def test_concatenated_model(rng):
    cfgs = [CPCConfig(hiddenEncoder=16, hiddenGar=8, sizeWindow=3200,
                      arMode="GRU"),
            CPCConfig(hiddenEncoder=16, hiddenGar=12, sizeWindow=3200,
                      arMode="GRU")]
    model = ConcatenatedModel(cfgs)
    x = jnp.zeros((2, 1, 3200))
    variables = model.init(rng, x)
    c, z, label, hidden = model.apply(variables, x, None)
    assert c.shape == (2, 20, 20)
    assert z.shape == (2, 20, 32)


def test_mfcc_lfb_encoders(rng):
    x = jax.random.normal(rng, (2, 1, 3200)) * 0.1
    for etype, frames in [("mfcc", None), ("lfb", 20)]:
        enc = get_encoder(etype, 32)
        params = enc.init(rng, x)
        y = enc.apply(params, x)
        assert y.ndim == 3 and y.shape[0] == 2 and y.shape[2] == 32
        assert np.isfinite(np.asarray(y)).all()


def test_relpos_matches_reference_skew(rng):
    """The static-gather relative-position term equals the reference's
    zero-pad/reshape skew trick (transformers.py:42-47) after masking."""
    import math
    from cpc_audio_tpu.models.transformer import MultiHeadAttention

    S, dm, h = 12, 16, 4
    mha = MultiHeadAttention(S, dm, h, dropout=0.0, relpos=True)
    x = jax.random.normal(rng, (2, S, dm))
    params = mha.init(jax.random.PRNGKey(1), x)
    got = np.asarray(mha.apply(params, x))

    p = params["params"]

    def lin(n, t):
        return t @ np.asarray(p[n]["kernel"])

    xn = np.asarray(x)
    dk = dm // h
    q = lin("Wq", xn).reshape(2, S, h, dk).transpose(0, 2, 1, 3)
    k = lin("Wk", xn).reshape(2, S, h, dk).transpose(0, 2, 1, 3)
    v = lin("Wv", xn).reshape(2, S, h, dk).transpose(0, 2, 1, 3)
    QK = q @ k.transpose(0, 1, 3, 2)
    qp = q @ np.asarray(p["Krelpos"])
    z = np.zeros((2, h, S, 1))
    qp2 = np.concatenate([z, qp], axis=3).reshape(2, h, S + 1, S)[:, :, 1:, :]
    A = (QK + qp2) / math.sqrt(dk) + np.triu(np.full((S, S), -np.inf), k=1)
    A = np.exp(A - A.max(-1, keepdims=True))
    A /= A.sum(-1, keepdims=True)
    y = (A @ v).transpose(0, 2, 1, 3).reshape(2, S, dm)
    expected = lin("Wo", y)
    np.testing.assert_allclose(got, expected, atol=1e-5)
