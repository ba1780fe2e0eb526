"""Training-dynamics parity vs the ACTUAL torch reference.

Forward parity (test_reference_parity.py) cannot catch a silent gradient
bug in the rebuilt backward — the criterion uses custom VJPs
(infonce._score_pair, stacked_heads._relu_dropout) and the whole stack is
re-derived.  These tests close that gap:

  * one train step — grad of the summed InfoNCE + Adam — must match one
    torch step of ``allLosses.sum().backward(); optimizer.step()``
    (/root/reference/cpc/train.py:85-91) on converted weights, per-leaf,
    with IDENTICAL injected negatives (the reference's ``sampleClean``,
    criterion.py:174-219, and our ``sample_negatives`` are both
    monkeypatched to read the same index arrays);
  * a 50-step loss-trajectory comparison on identical synthetic batches.

The one-step test runs BOTH frameworks in float64: at f32, the encoder's
~1e5 ReLU pre-activations land within reduction-order noise of zero a few
times per batch, and each such gate flip perturbs a handful of gradient
elements by O(grad) — making per-leaf f32 comparison irreducibly flaky.
At f64 the flip probability is ~1e-15 per element and tolerances tighten
three orders of magnitude, so any REAL backward bug (a wrong VJP term is
an O(1) relative error) is unmistakable.

Covers the transformer-head config AND the ffd/conv-head configs (the
equalized-layer paths).  Dropout is off on both sides (torch ``.eval()``
modules / ``train=False``): dropout STREAMS are not bit-comparable across
frameworks by design (docs/DESIGN.md deviations).
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _load(name, path, search=None):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        name, path, submodule_search_locations=search)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def x64():
    """Enable jax x64 for one test, restoring the session default after."""
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", old)


@pytest.fixture(scope="module")
def ref_modules():
    """Reference model + criterion packages, with ``transformers``
    resolving to /root/reference/cpc/transformers.py (the reference runs
    with cpc/ on sys.path — criterion.py:83's name-collision hazard)."""
    saved_tr = sys.modules.get("transformers")
    for name in ("torchaudio", "progressbar", "tqdm", "soundfile"):
        sys.modules.setdefault(name, types.ModuleType(name))
    _load("transformers", f"{REF}/cpc/transformers.py")
    ref_model = _load("model_ref_gp", f"{REF}/cpc/model.py")
    ref_crit_pkg = _load("refcrit", f"{REF}/cpc/criterion/__init__.py",
                         search=[f"{REF}/cpc/criterion"])
    yield ref_model, ref_crit_pkg
    if saved_tr is not None:
        sys.modules["transformers"] = saved_tr
    else:
        sys.modules.pop("transformers", None)


from cpc_audio_tpu import convert
from cpc_audio_tpu.config import CPCConfig
from cpc_audio_tpu.criterion import CPCUnsupervisedCriterion
from cpc_audio_tpu.criterion import infonce
from cpc_audio_tpu.models import build_model
from cpc_audio_tpu.parallel.train_step import _forward_loss, make_optimizer

B, H, K, N, WIN = 4, 32, 2, 4, 3200          # S = 20 frames, W = 18
S_FRAMES = WIN // 160
LR = 2e-4


def _draw_indices(rng, S, W):
    """One set of negative indices, shared verbatim by both frameworks.
    Layout (B, N, W) like the reference's flat draw (criterion.py:179-199).
    Offsets are drawn from [K+1, S) — a subset of the reference's [1, S)
    support — so a negative never aliases a positive frame (offset == k
    with the anchor's own batch row): an aliased candidate scores an
    EXACT tie with the positive, and 1-ulp f32 reduction-order noise
    breaks such ties differently per framework, making the accuracy
    comparison flaky by a few windows."""
    return (rng.randint(0, B, size=(B, N, W)).astype(np.int64),
            rng.randint(K + 1, S, size=(B, N, W)).astype(np.int64))


def _patch_torch_sampler(crit, indices):
    """Make the reference sampleClean consume ``indices`` (per call)."""
    state = {"i": 0}

    def sample_clean(encoded, window_size):
        bsz, S, C = encoded.size()
        batch_idx, seq_off = indices[state["i"] % len(indices)]
        state["i"] += 1
        base = torch.arange(window_size)
        seq_idx = torch.remainder(torch.from_numpy(seq_off) + base, S)
        ext = (torch.from_numpy(batch_idx) * S + seq_idx).reshape(-1)
        neg = encoded.contiguous().view(-1, C)[ext].view(
            bsz, N, window_size, C)
        outs = []
        for k in range(1, crit.nPredicts + 1):
            pos = encoded[:, k:k + window_size].reshape(
                bsz, 1, window_size, C)
            outs.append(torch.cat([pos, neg], dim=1))
        return outs, torch.zeros(bsz * window_size, dtype=torch.long)

    crit.sampleClean = sample_clean


def _patched_jax_sampler(indices):
    """sample_negatives drop-in reading the same (B, N, W) indices."""
    state = {"i": 0}

    def sample(key, encoded, window_size, n_negative, pool=None):
        assert pool is None  # injected-negatives path is device-scope only
        bsz, S, C = encoded.shape
        batch_idx, seq_off = indices[state["i"] % len(indices)]
        state["i"] += 1
        seq_idx = (jnp.asarray(seq_off)
                   + jnp.arange(window_size)[None, None, :]) % S
        flat = (jnp.asarray(batch_idx) * S
                + seq_idx).transpose(0, 2, 1).reshape(-1)
        return jnp.take(encoded.reshape(bsz * S, C), flat,
                        axis=0).reshape(bsz, window_size, n_negative, C)

    return sample


def _build_pair(ref_modules, rnn_mode, ar_mode="LSTM", seed=0,
                dtype="float32"):
    """Matched (torch model+criterion, our model+criterion+params)."""
    ref_model, ref_crit = ref_modules
    torch.manual_seed(seed)
    enc = ref_model.CPCEncoder(sizeHidden=H, normMode="layerNorm")
    ar = ref_model.CPCAR(H, H, keepHidden=False, nLevelsGRU=1, mode=ar_mode)
    cpc_t = ref_model.CPCModel(enc, ar)
    crit_t = ref_crit.CPCUnsupersivedCriterion(
        nPredicts=K, dimOutputAR=H, dimOutputEncoder=H,
        negativeSamplingExt=N, rnnMode=rnn_mode, dropout=False,
        sizeInputSeq=S_FRAMES)
    cpc_t.eval()
    crit_t.eval()
    if dtype == "float64":
        cpc_t.double()
        crit_t.double()

    cfg = CPCConfig(hiddenEncoder=H, hiddenGar=H, nPredicts=K,
                    negativeSamplingExt=N, sizeWindow=WIN, arMode=ar_mode,
                    nLevelsGRU=1, rnnMode=rnn_mode, normMode="layerNorm",
                    compute_dtype=dtype)
    model_j = build_model(cfg)
    crit_j = CPCUnsupervisedCriterion(
        n_predicts=K, dim_output_ar=H, dim_output_encoder=H,
        negative_sampling_ext=N, rnn_mode=rnn_mode,
        size_input_seq=S_FRAMES)
    model_params, _ = convert.convert_cpc_model(cpc_t.state_dict(), cfg)
    crit_params = convert.convert_criterion(
        {k: v for k, v in crit_t.state_dict().items()}, cfg, kind="cpc")
    tgt = jnp.float64 if dtype == "float64" else jnp.float32
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, tgt),
        {"model": model_params, "criterion": crit_params})
    return cpc_t, crit_t, cfg, model_j, crit_j, params


def _torch_grads_as_tree(cpc_t, crit_t, cfg):
    """Torch .grad tensors -> our param-tree layout (the converter is
    permutation/stack-only, so gradients convert exactly like weights)."""
    gm = {name: p.grad.detach().clone()
          for name, p in cpc_t.named_parameters()}
    gc = {name: p.grad.detach().clone()
          for name, p in crit_t.named_parameters()}
    model_g, _ = convert.convert_cpc_model(gm, cfg)
    crit_g = convert.convert_criterion(gc, cfg, kind="cpc")
    return jax.tree_util.tree_map(
        jnp.asarray, {"model": model_g, "criterion": crit_g})


def _jax_loss_and_grads(model_j, crit_j, params, batch_np):
    def loss_fn(p):
        losses, accs, _, _ = _forward_loss(
            model_j, crit_j, p, {}, jnp.asarray(batch_np), None, None,
            {"sampling": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, train=False)
        return jnp.sum(losses), (losses, accs)

    (tot, (losses, accs)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    return tot, losses, accs, grads


def _assert_tree_close(got, want, rtol, atol, ctx=""):
    flat_w = jax.tree_util.tree_leaves_with_path(want)
    flat_g = dict(jax.tree_util.tree_leaves_with_path(got))
    assert flat_w and len(flat_g) == len(flat_w)
    for path, leaf in flat_w:
        np.testing.assert_allclose(
            np.asarray(flat_g[path], np.float64),
            np.asarray(leaf, np.float64), rtol=rtol, atol=atol,
            err_msg=f"{ctx}{jax.tree_util.keystr(path)}")


@pytest.mark.parametrize("rnn_mode,ar_mode", [
    ("transformer", "LSTM"),   # default config; merged-matmul heads
    ("ffd", "GRU"),            # equalized-linear heads
    ("conv4", "GRU"),          # equalized shifted-conv heads
    ("linear", "LSTM"),
])
def test_one_step_grad_and_param_parity(ref_modules, x64, rnn_mode, ar_mode):
    """grad(sum InfoNCE) and the post-Adam parameters must match the torch
    reference per-leaf on converted weights + identical negatives, in f64
    (see module docstring for why f32 per-leaf comparison is flaky)."""
    cpc_t, crit_t, cfg, model_j, crit_j, params = _build_pair(
        ref_modules, rnn_mode, ar_mode, dtype="float64")
    rng = np.random.RandomState(41)
    indices = [_draw_indices(rng, S_FRAMES, S_FRAMES - K)]
    batch_np = rng.randn(B, 1, WIN)

    # --- torch step (reference train.py:85-91) -------------------------
    _patch_torch_sampler(crit_t, indices)
    opt_t = torch.optim.Adam(
        list(cpc_t.parameters()) + list(crit_t.parameters()),
        lr=LR, betas=(0.9, 0.999), eps=1e-8)
    xb = torch.from_numpy(batch_np)
    c_t, z_t, lab_t = cpc_t(xb, None)
    losses_t, acc_t = crit_t(c_t, z_t, lab_t)
    losses_t.sum().backward()
    grads_t = _torch_grads_as_tree(cpc_t, crit_t, cfg)
    opt_t.step()
    post_t = jax.tree_util.tree_map(jnp.asarray, {
        "model": convert.convert_cpc_model(cpc_t.state_dict(), cfg)[0],
        "criterion": convert.convert_criterion(
            dict(crit_t.state_dict()), cfg, kind="cpc")})

    # --- our step (same math as parallel.train_step) -------------------
    orig = infonce.sample_negatives
    infonce.sample_negatives = _patched_jax_sampler(indices)
    try:
        tot, losses_j, accs_j, grads_j = _jax_loss_and_grads(
            model_j, crit_j, params, batch_np)
    finally:
        infonce.sample_negatives = orig

    np.testing.assert_allclose(np.asarray(losses_j),
                               losses_t.detach().numpy().ravel(),
                               rtol=1e-10, atol=1e-12)
    # acc granularity is 1/(B*W) = 1/72; our criterion reports f32, torch
    # f64 — atol only needs to beat one count while absorbing the f32
    # representation gap.
    np.testing.assert_allclose(np.asarray(accs_j),
                               acc_t.detach().numpy().ravel(),
                               rtol=0, atol=1e-6)
    # gradient parity — the core claim: the rebuilt backward (custom
    # VJPs included) equals torch autograd through the whole stack.
    # f64 noise floor is ~1e-13 relative; a real VJP bug would be O(1).
    _assert_tree_close(grads_j, grads_t, rtol=1e-7, atol=1e-11,
                       ctx="grad:")

    optimizer = make_optimizer()
    opt_state = optimizer.init(params)
    updates, _ = optimizer.update(grads_j, opt_state, params)
    post_j = jax.tree_util.tree_map(
        lambda p, u: p + LR * u.astype(p.dtype), params, updates)
    # post-step params: Adam normalizes the gradient (g/|g| at step 1),
    # so near-zero grad leaves amplify relative grad error; the f64
    # atol bounds any element's movement error at ~1e-9 of one lr step.
    _assert_tree_close(post_j, post_t, rtol=1e-7, atol=1e-11,
                       ctx="post-step:")


@pytest.mark.parametrize("rnn_mode", ["transformer", "ffd"])
def test_fifty_step_loss_trajectory_parity(ref_modules, rnn_mode):
    """50 Adam steps on identical synthetic batches + injected negatives:
    the loss trajectories must stay inside a tight band (compounding
    f32 reduction-order noise only — no systematic drift)."""
    n_steps = 50
    cpc_t, crit_t, cfg, model_j, crit_j, params = _build_pair(
        ref_modules, rnn_mode, "GRU", seed=3)
    rng = np.random.RandomState(7)
    indices = [_draw_indices(rng, S_FRAMES, S_FRAMES - K)
               for _ in range(n_steps)]
    batches = [rng.randn(B, 1, WIN).astype(np.float32)
               for _ in range(n_steps)]

    _patch_torch_sampler(crit_t, indices)
    opt_t = torch.optim.Adam(
        list(cpc_t.parameters()) + list(crit_t.parameters()),
        lr=LR, betas=(0.9, 0.999), eps=1e-8)
    traj_t = []
    for bt in batches:
        opt_t.zero_grad()
        c_t, z_t, lab_t = cpc_t(torch.from_numpy(bt), None)
        losses_t, _ = crit_t(c_t, z_t, lab_t)
        tot = losses_t.sum()
        tot.backward()
        opt_t.step()
        traj_t.append(float(tot.detach()))

    optimizer = make_optimizer()
    opt_state = optimizer.init(params)
    orig = infonce.sample_negatives
    infonce.sample_negatives = _patched_jax_sampler(indices)
    traj_j = []
    try:
        for bt in batches:
            tot, _, _, grads = _jax_loss_and_grads(
                model_j, crit_j, params, bt)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(
                lambda p, u: p + LR * u.astype(p.dtype), params, updates)
            traj_j.append(float(tot))
    finally:
        infonce.sample_negatives = orig

    traj_t, traj_j = np.asarray(traj_t), np.asarray(traj_j)
    np.testing.assert_allclose(traj_j, traj_t, rtol=5e-3, atol=5e-3)
    # and the optimization is actually doing something in both frameworks
    assert traj_t[-1] < traj_t[0]
    assert traj_j[-1] < traj_j[0]
