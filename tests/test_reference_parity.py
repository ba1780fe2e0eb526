"""End-to-end numerical parity against the ACTUAL reference torch model.

Builds the reference CPCModel (imported from /root/reference with heavy
optional deps stubbed), converts its randomly-initialized state dict with
cpc_audio_tpu.convert, and checks that our JAX model produces the same
context/encoder features on the same input — the strongest possible
evidence that reference checkpoints load correctly.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_modules():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # stub heavy optional imports the model paths don't need
    for name in ("torchaudio", "progressbar", "tqdm", "soundfile"):
        sys.modules.setdefault(name, types.ModuleType(name))
    import importlib.util

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    ref_transformers = load("transformers_ref", f"{REF}/cpc/transformers.py")
    # cpc/model.py imports torchaudio at top level (stubbed above)
    ref_model = load("model_ref", f"{REF}/cpc/model.py")
    return ref_model, ref_transformers


from cpc_audio_tpu import convert
from cpc_audio_tpu.config import CPCConfig
from cpc_audio_tpu.models import build_model


@pytest.mark.parametrize("ar_mode", ["GRU", "LSTM"])
def test_cpc_model_forward_parity(ref_modules, ar_mode):
    """Reference CPCEncoder+CPCAR forward == converted JAX forward."""
    ref_model, _ = ref_modules
    torch.manual_seed(0)
    H = 32
    enc = ref_model.CPCEncoder(sizeHidden=H, normMode="layerNorm")
    ar = ref_model.CPCAR(H, H, keepHidden=False, nLevelsGRU=2, mode=ar_mode)
    cpc = ref_model.CPCModel(enc, ar)
    cpc.eval()

    x = torch.randn(2, 1, 3200)
    with torch.no_grad():
        c_ref, z_ref, _ = cpc(x, None)

    cfg = CPCConfig(hiddenEncoder=H, hiddenGar=H, sizeWindow=3200,
                    arMode=ar_mode, nLevelsGRU=2, normMode="layerNorm")
    model = build_model(cfg)
    params, batch_stats = convert.convert_cpc_model(cpc.state_dict(), cfg)
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    c, z, _, _ = model.apply(variables, jnp.asarray(x.numpy()), None)

    np.testing.assert_allclose(np.asarray(z), z_ref.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(c), c_ref.numpy(), atol=5e-4)


def test_transformer_ar_forward_parity(ref_modules):
    """Reference buildTransformerAR == converted TransformerAR."""
    ref_model, ref_transformers = ref_modules
    torch.manual_seed(1)
    H, S = 32, 20
    tnet = ref_transformers.buildTransformerAR(H, 2, S, False)
    tnet.eval()
    x = torch.randn(2, S, H)
    with torch.no_grad():
        y_ref = tnet(x)

    cfg = CPCConfig(hiddenEncoder=H, sizeWindow=S * 160,
                    arMode="transformer", nLevelsGRU=2)
    sd = {f"gAR.{k}": v for k, v in tnet.state_dict().items()}
    params = convert.convert_ar(convert._strip_prefix(sd, "gAR."), cfg)

    from cpc_audio_tpu.models import TransformerAR
    tar = TransformerAR(dim_encoded=H, n_layers=2, size_seq=S)
    y, _ = tar.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=2e-4)


def test_transformer_abspos_parity(ref_modules):
    ref_model, ref_transformers = ref_modules
    torch.manual_seed(2)
    H, S = 32, 16
    tnet = ref_transformers.buildTransformerAR(H, 1, S, True)
    tnet.eval()
    x = torch.randn(2, S, H)
    with torch.no_grad():
        y_ref = tnet(x)
    cfg = CPCConfig(hiddenEncoder=H, sizeWindow=S * 160,
                    arMode="transformer", nLevelsGRU=1, abspos=True)
    params = convert.convert_ar(
        {k: v for k, v in tnet.state_dict().items()}, cfg)
    from cpc_audio_tpu.models import TransformerAR
    tar = TransformerAR(dim_encoded=H, n_layers=1, size_seq=S, abspos=True)
    y, _ = tar.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=2e-4)


def test_checkpoint_file_roundtrip_parity(ref_modules, tmp_path):
    """A torch-saved reference checkpoint file loads through load_model and
    reproduces the reference forward."""
    import json
    import os
    ref_model, _ = ref_modules
    torch.manual_seed(3)
    H = 16
    enc = ref_model.CPCEncoder(sizeHidden=H, normMode="layerNorm")
    ar = ref_model.CPCAR(H, H, keepHidden=False, nLevelsGRU=1, mode="GRU")
    cpc = ref_model.CPCModel(enc, ar)
    cpc.eval()
    ckpt_dir = tmp_path / "refckpt"
    ckpt_dir.mkdir()
    torch.save({"gEncoder": cpc.state_dict(), "cpcCriterion": {},
                "optimizer": {}, "best": {}},
               str(ckpt_dir / "checkpoint_5.pt"))
    args = CPCConfig(hiddenEncoder=H, hiddenGar=H, sizeWindow=3200,
                     arMode="GRU", nLevelsGRU=1).to_dict()
    with open(ckpt_dir / "checkpoint_args.json", "w") as f:
        json.dump(args, f)

    from cpc_audio_tpu.feature_loader import load_model
    model, variables, hg, he = load_model([str(ckpt_dir / "checkpoint_5.pt")])
    assert (hg, he) == (H, H)
    x = torch.randn(1, 1, 3200)
    with torch.no_grad():
        c_ref, z_ref, _ = cpc(x, None)
    c, z, _, _ = model.apply(variables, jnp.asarray(x.numpy()), None)
    np.testing.assert_allclose(np.asarray(c), c_ref.numpy(), atol=5e-4)


@pytest.mark.parametrize("ar_mode", ["GRU", "transformer"])
def test_export_to_torch_roundtrip(ref_modules, ar_mode):
    """Our params -> torch state dict -> loads into the REFERENCE model and
    reproduces our forward."""
    ref_model, ref_transformers = ref_modules
    H = 16
    cfg = CPCConfig(hiddenEncoder=H, hiddenGar=H, sizeWindow=3200,
                    arMode=ar_mode, nLevelsGRU=1, normMode="layerNorm")
    model = build_model(cfg)
    variables = model.init({"params": jax.random.PRNGKey(5)},
                           jnp.zeros((1, 1, 3200)))
    sd = convert.export_cpc_model(variables["params"], cfg)

    enc = ref_model.CPCEncoder(sizeHidden=H, normMode="layerNorm")
    if ar_mode == "transformer":
        ar = ref_transformers.buildTransformerAR(H, 1, 3200 // 160, False)
    else:
        ar = ref_model.CPCAR(H, H, keepHidden=False, nLevelsGRU=1,
                             mode="GRU")
    cpc = ref_model.CPCModel(enc, ar)
    missing, unexpected = cpc.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    cpc.eval()

    x = torch.randn(1, 1, 3200)
    with torch.no_grad():
        c_ref, z_ref, _ = cpc(x, None)
    c, z, _, _ = model.apply(variables, jnp.asarray(x.numpy()), None)
    np.testing.assert_allclose(np.asarray(z), z_ref.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(c), c_ref.numpy(), atol=5e-4)


def test_hub_pretrained_from_local_torch_checkpoint(ref_modules, tmp_path):
    """hub.cpc_audio(pretrained=True) loads a 60k-style torch checkpoint
    ({'weights', 'config'} layout, hubconf.py:23-35)."""
    ref_model, _ = ref_modules
    torch.manual_seed(7)
    H = 16
    enc = ref_model.CPCEncoder(sizeHidden=H, normMode="layerNorm")
    ar = ref_model.CPCAR(H, H, keepHidden=False, nLevelsGRU=1, mode="GRU")
    cpc = ref_model.CPCModel(enc, ar)
    cpc.eval()
    cfg = {"hiddenEncoder": H, "hiddenGar": H, "sizeWindow": 3200,
           "arMode": "GRU", "nLevelsGRU": 1, "normMode": "layerNorm"}
    path = str(tmp_path / "60k_style.pt")
    torch.save({"weights": cpc.state_dict(), "config": cfg}, path)

    from cpc_audio_tpu.hub import cpc_audio
    model, variables = cpc_audio(pretrained=True, checkpoint_path=path)
    assert model.config.hiddenEncoder == H
    x = torch.randn(1, 1, 3200)
    with torch.no_grad():
        c_ref, _, _ = cpc(x, None)
    c, z, _, _ = model.apply(variables, jnp.asarray(x.numpy()), None)
    np.testing.assert_allclose(np.asarray(c), c_ref.numpy(), atol=5e-4)
