"""Torch-checkpoint converter tests.

Numerical parity is checked against torch's *public* modules (Conv1d, GRU,
LSTM) — the same primitives the reference builds on — and structural
compatibility against our own init trees for the composite models.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from cpc_audio_tpu import convert
from cpc_audio_tpu.config import CPCConfig
from cpc_audio_tpu.models import CPCAR, CPCEncoder, build_model
from cpc_audio_tpu.criterion import CPCUnsupervisedCriterion


def test_conv_encoder_numeric_parity():
    """5-layer strided conv stack matches torch conv outputs."""
    tconvs = torch.nn.ModuleList()
    specs = [(1, 16, 10, 5, 3), (16, 16, 8, 4, 2), (16, 16, 4, 2, 1),
             (16, 16, 4, 2, 1), (16, 16, 4, 2, 1)]
    for cin, cout, k, s, p in specs:
        tconvs.append(torch.nn.Conv1d(cin, cout, k, stride=s, padding=p))

    sd = {}
    for i, conv in enumerate(tconvs):
        sd[f"conv{i}.weight"] = conv.weight
        sd[f"conv{i}.bias"] = conv.bias
    cfg = CPCConfig(hiddenEncoder=16, normMode="ID")
    params, stats = convert.convert_encoder(sd, cfg)

    x = torch.randn(2, 1, 3200)
    with torch.no_grad():
        t = x
        for conv in tconvs:
            t = torch.relu(conv(t))
    expected = t.permute(0, 2, 1).numpy()

    enc = CPCEncoder(size_hidden=16, norm_mode="ID")
    got = enc.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), expected, atol=2e-4)


@pytest.mark.parametrize("mode", ["GRU", "LSTM", "RNN"])
def test_recurrent_numeric_parity(mode):
    """scan recurrences match torch nn.GRU/LSTM/RNN bit-for-bit-ish."""
    torch.manual_seed(0)
    cls = {"GRU": torch.nn.GRU, "LSTM": torch.nn.LSTM,
           "RNN": torch.nn.RNN}[mode]
    tnet = cls(8, 16, num_layers=2, batch_first=True)
    sd = {f"baseNet.{k}": v for k, v in tnet.state_dict().items()}
    params = convert._convert_recurrent(sd, "baseNet.", 2)
    x = torch.randn(3, 12, 8)
    with torch.no_grad():
        expected, _ = tnet(x)
    ar = CPCAR(dim_output=16, num_layers=2, mode=mode)
    got, _ = ar.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), expected.numpy(), atol=1e-5)


def test_channelnorm_parity():
    """ChannelNorm conversion: torch (1,C,1) affine -> flat (C,)."""
    C = 8
    w = torch.randn(1, C, 1)
    b = torch.randn(1, C, 1)
    sd = {"conv0.weight": torch.randn(C, 1, 10),
          "conv0.bias": torch.randn(C),
          "batchNorm0.weight": w, "batchNorm0.bias": b}
    cfg = CPCConfig(hiddenEncoder=C, normMode="layerNorm")
    params, _ = convert.convert_encoder(sd, cfg)
    np.testing.assert_array_equal(params["norm0"]["weight"],
                                  w.numpy().reshape(-1))


def test_full_model_conversion_structure():
    """A synthetic reference-layout state dict converts into a tree with the
    exact shapes of our init tree (GRU AR + transformer heads)."""
    cfg = CPCConfig(hiddenEncoder=16, hiddenGar=12, nPredicts=2,
                    negativeSamplingExt=4, sizeWindow=3200, arMode="GRU",
                    rnnMode="transformer")
    model = build_model(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 1, 3200)))

    # synth torch-like state dict with the reference's key layout
    sd = {}
    for i, (k, cin) in enumerate(zip([10, 8, 4, 4, 4],
                                     [1, 16, 16, 16, 16])):
        sd[f"gEncoder.conv{i}.weight"] = torch.randn(16, cin, k)
        sd[f"gEncoder.conv{i}.bias"] = torch.randn(16)
        sd[f"gEncoder.batchNorm{i}.weight"] = torch.randn(1, 16, 1)
        sd[f"gEncoder.batchNorm{i}.bias"] = torch.randn(1, 16, 1)
    for name, shape in [("weight_ih_l0", (36, 16)), ("weight_hh_l0", (36, 12)),
                        ("bias_ih_l0", (36,)), ("bias_hh_l0", (36,))]:
        sd[f"gAR.baseNet.{name}"] = torch.randn(*shape)
    params, stats = convert.convert_cpc_model(sd, cfg)
    assert convert.tree_shapes_match(params, variables["params"])

    # criterion with transformer heads
    # transformer heads require dim_output_ar == dim_output_encoder (as in
    # the reference, criterion.py:82-88 builds dmodel=dimOutputEncoder)
    crit = CPCUnsupervisedCriterion(
        n_predicts=2, dim_output_ar=16, dim_output_encoder=16,
        negative_sampling_ext=4, rnn_mode="transformer", size_input_seq=20)
    c = jnp.zeros((1, 20, 16))
    z = jnp.zeros((1, 20, 16))
    cvars = crit.init({"params": jax.random.PRNGKey(0),
                       "sampling": jax.random.PRNGKey(1)}, c, z, None)
    W = 18
    csd = {}
    for k in range(2):
        pre = f"wPrediction.predictors.{k}.0."
        for wn in ("Wq", "Wk", "Wv", "Wo"):
            csd[pre + f"multihead.{wn}.weight"] = torch.randn(16, 16)
        csd[pre + "multihead.Att.Krelpos"] = torch.randn(2, W)
        for ln in ("ln_multihead", "ln_ffnetwork"):
            csd[pre + f"{ln}.weight"] = torch.randn(16)
            csd[pre + f"{ln}.bias"] = torch.randn(16)
        csd[pre + "ffnetwork.lin1.weight"] = torch.randn(2048, 16)
        csd[pre + "ffnetwork.lin1.bias"] = torch.randn(2048)
        csd[pre + "ffnetwork.lin2.weight"] = torch.randn(16, 2048)
        csd[pre + "ffnetwork.lin2.bias"] = torch.randn(16)
    cparams = convert.convert_criterion(csd, cfg.replace(nPredicts=2),
                                        kind="cpc")
    assert convert.tree_shapes_match(cparams["wPrediction"],
                                     cvars["params"]["wPrediction"])


def test_hub_factory():
    from cpc_audio_tpu.hub import cpc_audio
    model, variables = cpc_audio(hiddenEncoder=32, hiddenGar=16,
                                 arMode="GRU")
    assert variables is None
    assert model.config.hiddenEncoder == 32
    with pytest.raises(FileNotFoundError):
        cpc_audio(pretrained=True, checkpoint_path="/nonexistent.pt")
