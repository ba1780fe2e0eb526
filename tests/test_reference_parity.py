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


@pytest.fixture(scope="module")
def ref_custom_layers():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "custom_layers_ref", f"{REF}/cpc/criterion/custom_layers.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["custom_layers_ref"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_equalized_linear_parity(ref_custom_layers):
    """ConstrainedLayer scales the WHOLE output, bias included
    (custom_layers.py:73-77); EqualizedDense must do the same."""
    from cpc_audio_tpu.criterion.custom_layers import EqualizedDense
    torch.manual_seed(11)
    ref = ref_custom_layers.EqualizedLinear(8, 12)
    with torch.no_grad():
        ref.module.bias.normal_(0.0, 1.0)  # nonzero bias exposes the scale
    ref.eval()
    x = torch.randn(4, 8)
    with torch.no_grad():
        y_ref = ref(x)

    params = {"kernel": jnp.asarray(ref.module.weight.detach().numpy().T),
              "bias": jnp.asarray(ref.module.bias.detach().numpy())}
    y = EqualizedDense(12).apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=1e-5)


def test_equalized_conv1d_parity(ref_custom_layers):
    from cpc_audio_tpu.criterion.custom_layers import EqualizedConv1d
    torch.manual_seed(12)
    ref = ref_custom_layers.EqualizedConv1d(8, 12, 4, padding=3)
    with torch.no_grad():
        ref.module.bias.normal_(0.0, 1.0)
    ref.eval()
    x = torch.randn(2, 8, 10)  # torch NCW
    with torch.no_grad():
        y_ref = ref(x).permute(0, 2, 1)  # -> NWC

    params = {"weight": jnp.asarray(ref.module.weight.detach().numpy()),
              "bias": jnp.asarray(ref.module.bias.detach().numpy())}
    y = EqualizedConv1d(12, kernel_size=4, padding=3).apply(
        {"params": params}, jnp.asarray(x.permute(0, 2, 1).numpy()))
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=1e-5)


def test_ctc_phone_criterion_mean_reduction_parity():
    """CTCPhoneCriterion loss matches torch nn.CTCLoss(reduction='mean'),
    which divides each sequence's loss by its target length before
    averaging (reference criterion.py:328-355)."""
    from cpc_audio_tpu.criterion.supervised import CTCPhoneCriterion
    rng = np.random.RandomState(13)
    B, S, H, P = 3, 12, 6, 5
    c = rng.randn(B, S, H).astype(np.float32)
    # frame-aligned labels with repeats (different collapsed lengths/batch)
    label = np.stack([
        np.repeat(rng.randint(0, P, S // 4), 4),
        np.repeat(rng.randint(0, P, S // 2), 2),
        rng.randint(0, P, S),
    ]).astype(np.int32)

    crit = CTCPhoneCriterion(dim_encoder=H, n_phones=P)
    variables = crit.init(jax.random.PRNGKey(0), jnp.asarray(c),
                          None, jnp.asarray(label))
    loss, _ = crit.apply(variables, jnp.asarray(c), None, jnp.asarray(label))

    w = np.asarray(
        variables["params"]["PhoneCriterionClassifier"]["kernel"]).T
    b = np.asarray(variables["params"]["PhoneCriterionClassifier"]["bias"])
    lin = torch.nn.Linear(H, P + 1)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(w))
        lin.bias.copy_(torch.from_numpy(b))
    logits = lin(torch.from_numpy(c))  # (B,S,P+1)
    logp = torch.nn.functional.log_softmax(logits, dim=2).permute(1, 0, 2)
    targets, sizes = [], []
    for row in label:
        keep = np.concatenate([[True], row[1:] != row[:-1]])
        targets.append(row[keep])
        sizes.append(int(keep.sum()))
    tmax = max(sizes)
    padded = np.zeros((B, tmax), np.int64)
    for i, t in enumerate(targets):
        padded[i, :len(t)] = t
    ctc = torch.nn.CTCLoss(blank=P, zero_infinity=True)  # reduction='mean'
    loss_ref = ctc(logp, torch.from_numpy(padded),
                   torch.full((B,), S, dtype=torch.int64),
                   torch.tensor(sizes, dtype=torch.int64))
    np.testing.assert_allclose(float(loss[0]), float(loss_ref), rtol=1e-4)


def test_bidir_tangled_parity(ref_modules):
    """BiDIRARTangled == torch nn.GRU(bidirectional=True): each layer sees
    both directions' concatenated outputs (model.py:216-239)."""
    ref_model, _ = ref_modules
    from cpc_audio_tpu.convert import convert_bidir_tangled
    from cpc_audio_tpu.models.ar import BiDIRARTangled
    torch.manual_seed(21)
    D, H, L, S = 12, 16, 2, 9
    ref = ref_model.BiDIRARTangled(D, H, L)
    ref.eval()
    x = torch.randn(3, S, D)
    with torch.no_grad():
        y_ref = ref(x)

    params = convert_bidir_tangled(ref.state_dict(), L)
    net = BiDIRARTangled(dim_output=H, num_layers=L)
    y, _ = net.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=2e-5)


def test_bidir_parity(ref_modules):
    """BiDIRAR == two independent torch GRU stacks concatenated at the
    end (model.py:242-268)."""
    ref_model, _ = ref_modules
    from cpc_audio_tpu.convert import convert_bidir
    from cpc_audio_tpu.models.ar import BiDIRAR
    torch.manual_seed(22)
    D, H, L, S = 12, 16, 2, 9
    ref = ref_model.BiDIRAR(D, H, L)
    ref.eval()
    x = torch.randn(3, S, D)
    with torch.no_grad():
        y_ref = ref(x)

    params = convert_bidir(ref.state_dict(), L)
    net = BiDIRAR(dim_output=H, num_layers=L)
    y, _ = net.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=2e-5)


def test_mfcc_encoder_torchaudio_parity():
    """MFCCEncoder matches torchaudio.transforms.MFCC numerics
    (reference model.py:108-122). torchaudio is not installed, so its
    documented pipeline is reimplemented with torch ops: torch.stft
    (center, reflect, periodic hann, power 2) -> HTK mel filterbank
    (norm=None) -> AmplitudeToDB(power, top_db=80) -> ortho DCT-II."""
    import math

    from cpc_audio_tpu.models.encoder import MFCCEncoder

    torch.manual_seed(31)
    B, L, n_mfcc, n_fft, sr = 2, 3200, 20, 321, 16000
    n_mels, hop = 128, n_fft // 2
    x = torch.randn(B, 1, L)

    # --- torchaudio.transforms.MFCC reimplementation -------------------
    wave = x.view(B, -1)
    window = torch.hann_window(n_fft)
    spec = torch.stft(wave, n_fft, hop_length=hop, win_length=n_fft,
                      window=window, center=True, pad_mode="reflect",
                      normalized=False, onesided=True, return_complex=True)
    spec = spec.abs() ** 2  # (B, n_freqs, T)

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)

    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0, sr // 2, n_freqs)
    m_pts = np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2.0), n_mels + 2)
    f_pts = mel_to_hz(m_pts)
    f_diff = np.diff(f_pts)
    slopes = f_pts[None, :] - all_freqs[:, None]
    fb = np.maximum(0.0, np.minimum(-slopes[:, :-2] / f_diff[:-1],
                                    slopes[:, 2:] / f_diff[1:]))
    mel = torch.from_numpy(fb.astype(np.float32)).T @ spec  # (B, n_mels, T)

    db = 10.0 * torch.log10(torch.clamp(mel, min=1e-10))
    db = torch.max(db, db.amax(dim=(-2, -1), keepdim=True) - 80.0)

    n = np.arange(n_mels)
    k = np.arange(n_mfcc)[:, None]
    dct = np.cos(math.pi / n_mels * (n[None, :] + 0.5) * k)
    dct[0] *= 1.0 / math.sqrt(2.0)
    dct = (dct * math.sqrt(2.0 / n_mels)).T  # (n_mels, n_mfcc)
    mfcc_ref = (db.transpose(-2, -1) @ torch.from_numpy(
        dct.astype(np.float32)))  # (B, T, n_mfcc)

    # --- ours -----------------------------------------------------------
    enc = MFCCEncoder(dim_encoded=n_mfcc)
    out = enc.apply({}, jnp.asarray(x.numpy()))
    assert out.shape == mfcc_ref.shape
    np.testing.assert_allclose(np.asarray(out), mfcc_ref.numpy(),
                               atol=1e-2, rtol=1e-4)


def test_lfb_encoder_parity(ref_modules):
    """LFBEncoder matches the reference LFBEnconder numerics
    (model.py:125-152): conv pair-magnitudes -> Hann smoothing (stride
    160) -> log1p -> InstanceNorm."""
    ref_model, _ = ref_modules
    from cpc_audio_tpu.models.encoder import LFBEncoder

    torch.manual_seed(32)
    C = 16
    ref = ref_model.LFBEnconder(C)
    ref.eval()
    x = torch.randn(2, 1, 3200)
    with torch.no_grad():
        y_ref = ref(x).permute(0, 2, 1)  # CPCModel permutes (model.py:287)

    params = {"conv": {
        "kernel": jnp.asarray(ref.conv.weight.detach().numpy()
                              .transpose(2, 1, 0)),
        "bias": jnp.asarray(ref.conv.bias.detach().numpy())}}
    enc = LFBEncoder(dim_encoded=C)
    y = enc.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=1e-4)


def test_convert_cli_export_loads_in_reference(ref_modules, tmp_path):
    """python -m cpc_audio_tpu.convert export writes a torch checkpoint the
    reference CPCModel load_state_dict accepts strict=True."""
    import json
    import os

    from cpc_audio_tpu import checkpoint as ckpt
    from cpc_audio_tpu.convert import main as convert_main
    ref_model, _ = ref_modules
    H = 16
    cfg = CPCConfig(hiddenEncoder=H, hiddenGar=H, sizeWindow=3200,
                    arMode="GRU", nLevelsGRU=1, normMode="layerNorm")
    model = build_model(cfg)
    variables = model.init({"params": jax.random.PRNGKey(9)},
                           jnp.zeros((1, 1, 3200)))
    src = str(tmp_path / "checkpoint_0.pt")
    ckpt.save_checkpoint(variables["params"], {}, {}, {}, src)
    with open(tmp_path / "checkpoint_args.json", "w") as f:
        json.dump(cfg.to_dict(), f)
    dst = str(tmp_path / "exported.pt")
    assert convert_main(["export", src, dst]) == 0

    state = torch.load(dst, weights_only=False)
    enc = ref_model.CPCEncoder(sizeHidden=H, normMode="layerNorm")
    ar = ref_model.CPCAR(H, H, keepHidden=False, nLevelsGRU=1, mode="GRU")
    cpc = ref_model.CPCModel(enc, ar)
    cpc.load_state_dict(state["gEncoder"], strict=True)
    cpc.eval()
    x = torch.randn(1, 1, 3200)
    with torch.no_grad():
        c_ref, z_ref, _ = cpc(x, None)
    c, z, _, _ = model.apply(variables, jnp.asarray(x.numpy()), None)
    np.testing.assert_allclose(np.asarray(z), z_ref.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(c), c_ref.numpy(), atol=5e-4)
