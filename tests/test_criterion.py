"""Criterion tests: negative sampling semantics, InfoNCE goldens,
supervised probes, label collapsing, beam search, PER goldens.

Golden values for beam search / PER ported from the reference's hand-computed
cases (cpc/unit_tests.py:208-276).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpc_audio_tpu.criterion import (CPCUnsupervisedCriterion,
                                     CTCPhoneCriterion, NoneCriterion,
                                     PhoneCriterion, SpeakerCriterion,
                                     beam_search_py, collapse_label_chain,
                                     collapse_label_chain_padded,
                                     get_seq_per, sample_negatives,
                                     stack_positives)


def test_sample_negatives_semantics(rng):
    """Negatives never sit at the anchor's own frame offset and index into
    real batch rows (criterion.py:186-197)."""
    B, S, C, N, W = 4, 16, 8, 32, 10
    z = jax.random.normal(rng, (B, S, C))
    neg = sample_negatives(jax.random.PRNGKey(7), z, W, N)
    assert neg.shape == (B, W, N, C)
    zf = np.asarray(z).reshape(B * S, C)
    negn = np.asarray(neg).transpose(0, 2, 1, 3)  # (B, N, W, C)
    # every negative is an actual encoder frame
    for b in range(B):
        for n in range(0, N, 7):
            for w in range(0, W, 3):
                d = np.abs(zf - negn[b, n, w]).sum(1)
                hits = np.where(d < 1e-6)[0]
                assert len(hits) >= 1
                # never the anchor offset w of any row? The scheme only
                # guarantees time != w (mod S) for the sampled row.
                assert all(h % S != w for h in hits)


def test_stack_positives(rng):
    B, S, C, K, W = 2, 12, 4, 3, 9
    z = jax.random.normal(rng, (B, S, C))
    pos = stack_positives(z, K, W)
    assert pos.shape == (K, B, W, C)
    for k in range(K):
        np.testing.assert_array_equal(np.asarray(pos[k]),
                                      np.asarray(z[:, k + 1:k + 1 + W]))


def _make_criterion(K=3, dim=8, N=8, S=16, rnn_mode="linear", **kw):
    crit = CPCUnsupervisedCriterion(
        n_predicts=K, dim_output_ar=dim, dim_output_encoder=dim,
        negative_sampling_ext=N, rnn_mode=rnn_mode, size_input_seq=S, **kw)
    return crit


def test_infonce_forward_shapes(rng):
    B, S, dim = 4, 16, 8
    crit = _make_criterion()
    c = jax.random.normal(rng, (B, S, dim))
    z = jax.random.normal(jax.random.PRNGKey(1), (B, S, dim))
    variables = crit.init({"params": rng, "sampling": jax.random.PRNGKey(2)},
                          c, z, None)
    losses, acc = crit.apply(variables, c, z, None,
                             rngs={"sampling": jax.random.PRNGKey(3)})
    assert losses.shape == (3,) and acc.shape == (3,)
    assert np.isfinite(np.asarray(losses)).all()
    assert (np.asarray(acc) >= 0).all() and (np.asarray(acc) <= 1).all()


def test_infonce_perfect_predictor_low_loss(rng):
    """If context 'predicts' the future encoding exactly (identity head on
    c == scaled future z), loss must be far below chance and accuracy
    near 1."""
    B, S, dim, K, N = 8, 20, 16, 1, 16
    z = jax.random.normal(rng, (B, S, dim)) * 10.0
    W = S - K
    # craft context = future encoding (k=1) so a head approximating identity
    # wins; use linear head initialized to identity via param surgery
    c = jnp.concatenate([z[:, 1:], jnp.zeros((B, K, dim))], axis=1)
    crit = _make_criterion(K=K, dim=dim, N=N, S=S, rnn_mode="linear")
    variables = crit.init({"params": rng, "sampling": jax.random.PRNGKey(0)},
                          c, z, None)
    params = jax.tree_util.tree_map(lambda x: x, variables["params"])
    w = params["wPrediction"]["heads"]["kernel"]
    eye = jnp.broadcast_to(jnp.eye(dim)[None], w.shape)
    params["wPrediction"]["heads"]["kernel"] = eye
    losses, acc = crit.apply({"params": params}, c, z, None,
                             rngs={"sampling": jax.random.PRNGKey(5)})
    chance = np.log(N + 1)
    assert float(losses[0]) < 0.1 * chance
    assert float(acc[0]) > 0.95


def test_infonce_transformer_head(rng):
    B, S, dim = 2, 16, 8
    crit = _make_criterion(rnn_mode="transformer")
    c = jax.random.normal(rng, (B, S, dim))
    z = jax.random.normal(jax.random.PRNGKey(1), (B, S, dim))
    variables = crit.init({"params": rng, "sampling": jax.random.PRNGKey(2)},
                          c, z, None)
    losses, acc = crit.apply(variables, c, z, None,
                             rngs={"sampling": jax.random.PRNGKey(3)})
    assert losses.shape == (3,)
    assert np.isfinite(np.asarray(losses)).all()


@pytest.mark.parametrize("head", ["ffd", "conv4", "conv8", "LSTM", "RNN"])
def test_infonce_other_heads(rng, head):
    B, S, dim = 2, 16, 8
    crit = _make_criterion(rnn_mode=head)
    c = jax.random.normal(rng, (B, S, dim))
    z = jax.random.normal(jax.random.PRNGKey(1), (B, S, dim))
    variables = crit.init({"params": rng, "sampling": jax.random.PRNGKey(2)},
                          c, z, None)
    losses, _ = crit.apply(variables, c, z, None,
                           rngs={"sampling": jax.random.PRNGKey(3)})
    assert np.isfinite(np.asarray(losses)).all()


def test_infonce_reverse_mode(rng):
    B, S, dim = 2, 16, 8
    crit = _make_criterion(mode="reverse")
    c = jax.random.normal(rng, (B, S, dim))
    z = jax.random.normal(jax.random.PRNGKey(1), (B, S, dim))
    variables = crit.init({"params": rng, "sampling": jax.random.PRNGKey(2)},
                          c, z, None)
    losses, _ = crit.apply(variables, c, z, None,
                           rngs={"sampling": jax.random.PRNGKey(3)})
    assert np.isfinite(np.asarray(losses)).all()


def test_infonce_speaker_embedding(rng):
    B, S, dim = 2, 16, 8
    crit = _make_criterion(speaker_embedding=4, n_speakers=5)
    c = jax.random.normal(rng, (B, S, dim))
    z = jax.random.normal(jax.random.PRNGKey(1), (B, S, dim))
    label = jnp.array([0, 3])
    variables = crit.init({"params": rng, "sampling": jax.random.PRNGKey(2)},
                          c, z, label)
    losses, _ = crit.apply(variables, c, z, label,
                           rngs={"sampling": jax.random.PRNGKey(3)})
    assert np.isfinite(np.asarray(losses)).all()


def test_none_criterion(rng):
    crit = NoneCriterion()
    c = jnp.zeros((2, 4, 8))
    variables = crit.init(rng, c, c, None)
    loss, acc = crit.apply(variables, c, c, None)
    assert float(loss[0]) == 0.0


def test_speaker_criterion(rng):
    crit = SpeakerCriterion(dim_encoder=8, n_speakers=4)
    c = jax.random.normal(rng, (6, 10, 8))
    label = jnp.array([0, 1, 2, 3, 0, 1])
    variables = crit.init(rng, c, None, label)
    loss, acc = crit.apply(variables, c, None, label)
    assert loss.shape == (1,) and acc.shape == (1,)


def test_phone_criterion(rng):
    crit = PhoneCriterion(dim_encoder=8, n_phones=5)
    c = jax.random.normal(rng, (2, 10, 8))
    label = jnp.zeros((2, 10), jnp.int32)
    variables = crit.init(rng, c, None, label)
    loss, acc = crit.apply(variables, c, None, label)
    assert np.isfinite(float(loss[0]))


def test_ctc_criterion(rng):
    crit = CTCPhoneCriterion(dim_encoder=8, n_phones=5)
    c = jax.random.normal(rng, (2, 10, 8))
    label = jnp.array([[0, 0, 1, 1, 2, 2, 3, 3, 4, 4],
                       [1, 1, 1, 1, 2, 2, 2, 2, 2, 2]], jnp.int32)
    variables = crit.init(rng, c, None, label)
    loss, _ = crit.apply(variables, c, None, label)
    assert np.isfinite(float(loss[0])) and float(loss[0]) > 0


# ---------------------------------------------------------------------------
# seq_alignment goldens (ported from reference unit_tests.py:208-276)
# ---------------------------------------------------------------------------

def test_collapse_label_chain():
    labels = np.array([[0, 0, 1, 1, 2, 2, 3], [1, 1, 1, 1, 1, 2, 2]])
    out, sizes = collapse_label_chain(labels)
    np.testing.assert_array_equal(sizes, [4, 2])
    np.testing.assert_array_equal(out[0, :4], [0, 1, 2, 3])
    np.testing.assert_array_equal(out[1, :2], [1, 2])


def test_collapse_label_chain_padded_matches_numpy(rng):
    labels = jax.random.randint(rng, (5, 20), 0, 3)
    targets, paddings = collapse_label_chain_padded(labels)
    ref_out, ref_sizes = collapse_label_chain(np.asarray(labels))
    sizes = (1 - np.asarray(paddings)).sum(1).astype(int)
    np.testing.assert_array_equal(sizes, ref_sizes)
    for i in range(5):
        np.testing.assert_array_equal(np.asarray(targets)[i, :sizes[i]],
                                      ref_out[i, :sizes[i]])


def test_beam_search_small():
    """Reference golden (unit_tests.py:218-235): T=2, P=3, blank=2."""
    preds = np.array([[0.1, 0.2, 0.7],
                      [0.4, 0.2, 0.4]], np.float32)
    out = beam_search_py(preds, 10, 2)
    scores = {tuple(seq): s for s, seq in out}
    # P("") = 0.7*0.4 + blank paths; hand-check a few probabilities
    assert abs(scores[()] - (0.7 * 0.4)) < 1e-6
    # P([0]) = p(0 at t0)*p(blank or 0 at t1) + p(blank t0)*p(0 t1)
    p0 = 0.1 * (0.4 + 0.4) + 0.7 * 0.4
    assert abs(scores[(0,)] - p0) < 1e-6
    # best beam is the argmax over all
    best = max(scores.items(), key=lambda kv: kv[1])[0]
    assert best == tuple(out[0][1])


def test_per_golden():
    """get_seq_PER golden = 4/7 (reference unit_tests.py:269-276)."""
    ref_seq = [0, 1, 1, 2, 0, 2, 2]
    pred_seq = [1, 1, 2, 2, 0, 0]
    assert abs(get_seq_per(ref_seq, pred_seq) - 4.0 / 7) < 1e-8


def test_sample_negatives_rolled_semantics(rng):
    """Rolled negatives: each candidate is a contiguous mod-S window of a
    real batch row, offset >= 1."""
    from cpc_audio_tpu.criterion import sample_negatives_rolled
    B, S, C, N, W = 4, 16, 8, 6, 10
    z = jax.random.normal(rng, (B, S, C))
    neg = sample_negatives_rolled(jax.random.PRNGKey(3), z, W, N)
    assert neg.shape == (B, W, N, C)
    zf = np.asarray(z)
    negn = np.asarray(neg).transpose(0, 2, 1, 3)  # (B, N, W, C)
    for b in range(B):
        for n in range(N):
            hits = [(b2, s) for b2 in range(B) for s in range(S)
                    if np.allclose(zf[b2, s], negn[b, n, 0], atol=1e-6)]
            assert hits, (b, n)
            b2, s0 = hits[0]
            for w in range(0, W, 3):
                assert np.allclose(zf[b2, (s0 + w) % S], negn[b, n, w],
                                   atol=1e-6)


def test_infonce_rolled_mode(rng):
    B, S, dim = 4, 16, 8
    crit = _make_criterion(sampling_mode="rolled")
    c = jax.random.normal(rng, (B, S, dim))
    z = jax.random.normal(jax.random.PRNGKey(1), (B, S, dim))
    variables = crit.init({"params": rng, "sampling": jax.random.PRNGKey(2)},
                          c, z, None)
    losses, acc = crit.apply(variables, c, z, None,
                             rngs={"sampling": jax.random.PRNGKey(3)})
    assert np.isfinite(np.asarray(losses)).all()


def test_infonce_stop_grad_negatives(rng):
    """stop_grad_negatives must zero the negatives' gradient contribution
    to z while keeping the positives' path alive."""
    B, S, dim = 4, 16, 8
    z = jax.random.normal(jax.random.PRNGKey(1), (B, S, dim))
    c = jax.random.normal(rng, (B, S, dim))
    for sg in (False, True):
        crit = _make_criterion(stop_grad_negatives=sg)
        variables = crit.init(
            {"params": rng, "sampling": jax.random.PRNGKey(2)}, c, z, None)

        def loss(zz):
            losses, _ = crit.apply(variables, c, zz, None,
                                   rngs={"sampling": jax.random.PRNGKey(3)})
            return losses.sum()

        g = np.asarray(jax.grad(loss)(z))
        assert np.isfinite(g).all()
        assert np.abs(g).max() > 0  # positives path always contributes


def test_stacked_transformer_heads_match_vmap(monkeypatch):
    """StackedTransformerHeads (merged-matmul compute) is bit-compatible
    with the nn.vmap'd TransformerLayer heads: same param tree, same
    forward, matching grads."""
    import jax.tree_util as tu

    from cpc_audio_tpu.criterion.prediction import PredictionNetwork

    K, B, W, C = 4, 3, 20, 32
    rng = np.random.RandomState(0)
    c = jnp.asarray(rng.randn(B, W, C), jnp.float32)
    net = PredictionNetwork(K, C, "transformer", False, size_input_seq=W)

    monkeypatch.setenv("CPC_STACKED_HEADS", "0")
    v = net.init({"params": jax.random.PRNGKey(0)}, c)
    y_vmap = net.apply(v, c)
    monkeypatch.setenv("CPC_STACKED_HEADS", "1")
    v2 = net.init({"params": jax.random.PRNGKey(0)}, c)
    assert tu.tree_map(lambda x: x.shape, v["params"]) \
        == tu.tree_map(lambda x: x.shape, v2["params"])
    y_stacked = net.apply(v, c)
    np.testing.assert_allclose(np.asarray(y_stacked), np.asarray(y_vmap),
                               atol=1e-5)

    def loss(params, flag):
        monkeypatch.setenv("CPC_STACKED_HEADS", flag)
        return jnp.sum(net.apply({"params": params}, c) ** 2)

    g1 = jax.grad(lambda p: loss(p, "0"))(v["params"])
    g2 = jax.grad(lambda p: loss(p, "1"))(v["params"])
    for (p1, l1), (_, l2) in zip(tu.tree_leaves_with_path(g1),
                                 tu.tree_leaves_with_path(g2)):
        np.testing.assert_allclose(np.asarray(l2), np.asarray(l1),
                                   atol=2e-4, err_msg=str(p1))


def test_score_pair_custom_vjp_matches_autodiff():
    """_score_pair's bf16-cotangent backward equals plain autodiff through
    the einsums when everything is f32 (the cast is then a no-op)."""
    from cpc_audio_tpu.criterion.infonce import _score_pair

    K, B, W, N, C = 3, 2, 5, 7, 16
    rng = np.random.RandomState(0)
    preds = jnp.asarray(rng.randn(K, B, W, C), jnp.float32)
    pos = jnp.asarray(rng.randn(K, B, W, C), jnp.float32)
    neg = jnp.asarray(rng.randn(B, W, N, C), jnp.float32)

    def ref(preds, pos, neg):
        ps = jnp.einsum("kbwc,kbwc->kbw", preds, pos) / C
        ns = jnp.einsum("kbwc,bwnc->kbwn", preds, neg) / C
        return jnp.sum(jnp.sin(ps)) + jnp.sum(jnp.cos(ns))

    def cust(preds, pos, neg):
        ps, ns = _score_pair(preds, pos, neg, 1.0 / C)
        return jnp.sum(jnp.sin(ps)) + jnp.sum(jnp.cos(ns))

    np.testing.assert_allclose(np.asarray(cust(preds, pos, neg)),
                               np.asarray(ref(preds, pos, neg)), rtol=1e-6)
    g_ref = jax.grad(ref, argnums=(0, 1, 2))(preds, pos, neg)
    g_c = jax.grad(cust, argnums=(0, 1, 2))(preds, pos, neg)
    for a, b in zip(g_ref, g_c):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_relu_dropout_custom_vjp_matches_composition():
    """_relu_dropout's sign-recoverable backward equals autodiff through
    the explicit mask*relu composition for the same bits."""
    from cpc_audio_tpu.criterion.stacked_heads import _relu_dropout

    rng = np.random.RandomState(0)
    h = jnp.asarray(rng.randn(4, 64), jnp.float32)
    bits = jnp.asarray(rng.randint(0, 65536, (4, 64)), jnp.uint16)
    keep = 0.9

    def ref(h):
        thresh = jnp.uint16(int(round(keep * 65536)))
        mask = (bits < thresh).astype(h.dtype)
        return jnp.maximum(h, 0) * mask / keep

    def f_ref(h):
        return jnp.sum(jnp.sin(ref(h)))

    def f_cust(h):
        return jnp.sum(jnp.sin(_relu_dropout(h, bits, keep)))

    y_ref, y_c = ref(h), _relu_dropout(h, bits, keep)
    np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_ref),
                               rtol=1e-6)
    g_ref = jax.grad(f_ref)(h)
    g_c = jax.grad(f_cust)(h)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-7)
    # dropped and negative entries get exactly zero gradient
    assert np.all(np.asarray(g_c)[np.asarray(y_c) == 0] == 0)


def test_sample_negatives_stratified_semantics(rng):
    """Stratified negatives: real frames, per-slice AND per-anchor
    uniqueness, and a backward that matches autodiff of a plain gather."""
    from cpc_audio_tpu.ops.feistel import ROUNDS, feistel_permute
    from cpc_audio_tpu.criterion.infonce import sample_negatives_stratified

    B, S, C, N, W = 4, 16, 8, 8, 12
    M = B * S
    z = jax.random.normal(rng, (B, S, C))
    key = jax.random.PRNGKey(7)
    neg = sample_negatives_stratified(key, z, W, N)
    assert neg.shape == (B, W, N, C)

    # reproduce the indices the sampler derived from `key`:
    # idx[s, n] = pi((s + g*n) mod M) with ONE keyed permutation pi
    keys = jax.random.bits(key, (ROUNDS,), dtype=jnp.uint32)
    g = M // N
    slots = (np.arange(B * W, dtype=np.uint32)[:, None]
             + np.uint32(g) * np.arange(N, dtype=np.uint32)[None, :]) % M
    idx = feistel_permute(jnp.asarray(slots), keys, M.bit_length() - 1)
    idx_np = np.asarray(idx)
    for n in range(N):  # slice-wise uniqueness (what kills the scatter)
        assert len(set(idx_np[:, n].tolist())) == B * W
    for s in range(B * W):  # anchor-wise: without-replacement negatives
        assert len(set(idx_np[s].tolist())) == N
    flat = jnp.asarray(idx_np.reshape(-1), jnp.int32)

    def plain(zz):
        return jnp.take(zz.reshape(M, C), flat, axis=0).reshape(B, W, N, C)

    np.testing.assert_array_equal(np.asarray(neg), np.asarray(plain(z)))

    cot = jax.random.normal(jax.random.PRNGKey(3), (B, W, N, C))
    g_strat = jax.grad(
        lambda zz: jnp.vdot(sample_negatives_stratified(key, zz, W, N),
                            cot))(z)
    g_plain = jax.grad(lambda zz: jnp.vdot(plain(zz), cot))(z)
    np.testing.assert_allclose(np.asarray(g_strat), np.asarray(g_plain),
                               atol=1e-5)


def test_sample_negatives_stratified_rejects_non_pow2(rng):
    from cpc_audio_tpu.criterion.infonce import sample_negatives_stratified
    z = jax.random.normal(rng, (3, 16, 8))  # 48 frames: not a power of two
    with pytest.raises(ValueError, match="power-of-two"):
        sample_negatives_stratified(jax.random.PRNGKey(0), z, 12, 8)
    z2 = jax.random.normal(rng, (4, 16, 8))
    with pytest.raises(ValueError, match="negativeSamplingExt"):
        sample_negatives_stratified(jax.random.PRNGKey(0), z2, 12, 6)


def test_infonce_stratified_mode(rng):
    """End to end: finite loss, gradients flow into the encodings through
    BOTH the positive and the negative (permutation-gather) paths."""
    B, S, dim = 4, 16, 8
    crit = _make_criterion(sampling_mode="stratified")
    c = jax.random.normal(rng, (B, S, dim))
    z = jax.random.normal(jax.random.PRNGKey(1), (B, S, dim))
    variables = crit.init({"params": rng, "sampling": jax.random.PRNGKey(2)},
                          c, z, None)

    def loss(zz):
        losses, _ = crit.apply(variables, c, zz, None,
                               rngs={"sampling": jax.random.PRNGKey(3)})
        return jnp.sum(losses)

    val = loss(z)
    assert np.isfinite(float(val))
    dz = jax.grad(loss)(z)
    assert float(jnp.abs(dz).max()) > 0
    assert np.isfinite(np.asarray(dz)).all()


def test_stratified_fused_scoring_matches_materialized(rng):
    """The fused sample+score path (`_stratified_score_pair` + masked
    reduce) equals materializing `sample_negatives_stratified` and
    scoring densely — same loss, same accuracy, same gradients wrt both
    the encodings and the predictions.  (The fused path drops the
    per-anchor rotation (q+n)%Q, a bijection of the candidate axis the
    loss only reduces over.)"""
    from cpc_audio_tpu.ops.feistel import (ROUNDS, feistel_inverse,
                                           feistel_permute)
    from cpc_audio_tpu.criterion.infonce import (_info_nce_reduce,
                                                 _score_pair,
                                                 _stratified_score_pair,
                                                 sample_negatives_stratified)

    B, S, C, N, K = 4, 16, 8, 8, 3
    W = S - K
    M = B * S
    g = M // N
    nbits = M.bit_length() - 1
    key = jax.random.PRNGKey(11)
    z = jax.random.normal(rng, (B, S, C))
    preds = jax.random.normal(jax.random.PRNGKey(1), (K, B, W, C))

    def fused(zz, pp):
        pos = stack_positives(zz, K, W)
        keys = jax.random.bits(key, (ROUNDS,), dtype=jnp.uint32)
        ar = jnp.arange(M, dtype=jnp.uint32)
        perm = feistel_permute(ar, keys, nbits)
        inv = feistel_inverse(ar, keys, nbits)
        ps, ns = _stratified_score_pair(pp, pos, zz.reshape(M, C),
                                        perm, inv, g, 1.0 / C)
        return _info_nce_reduce(ps, ns, B * W)

    def dense(zz, pp):
        pos = stack_positives(zz, K, W)
        neg = sample_negatives_stratified(key, zz, W, N)
        ps, ns = _score_pair(pp, pos, neg, 1.0 / C)
        return _info_nce_reduce(ps.reshape(K, B * W),
                                ns.reshape(K, B * W, N), B * W)

    lf, af = fused(z, preds)
    ld, ad = dense(z, preds)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(ld), rtol=1e-5)
    # acc can flip on EXACT ties (the positive frame drawn as its own
    # negative scores identically; the two contraction orders differ by
    # 1 ulp) — allow up to 2 tie flips out of B*W anchors per step.
    np.testing.assert_allclose(np.asarray(af), np.asarray(ad),
                               atol=2.0 / (B * W) + 1e-7)

    # the strong property: per-anchor candidate score MULTISETS agree
    keys = jax.random.bits(key, (ROUNDS,), dtype=jnp.uint32)
    ar = jnp.arange(M, dtype=jnp.uint32)
    perm = feistel_permute(ar, keys, nbits)
    inv = feistel_inverse(ar, keys, nbits)
    pos = stack_positives(z, K, W)
    _, nsf = _stratified_score_pair(preds, pos, z.reshape(M, C),
                                    perm, inv, g, 1.0 / C)
    neg = sample_negatives_stratified(key, z, W, N)
    _, nsd = _score_pair(preds, pos, neg, 1.0 / C)
    sf = np.sort(np.asarray(nsf)[:, :B * W], axis=-1)
    sd = np.sort(np.asarray(nsd).reshape(K, B * W, N), axis=-1)
    np.testing.assert_allclose(sf, sd, atol=1e-6)

    gf = jax.grad(lambda zz, pp: jnp.sum(fused(zz, pp)[0]),
                  argnums=(0, 1))(z, preds)
    gd = jax.grad(lambda zz, pp: jnp.sum(dense(zz, pp)[0]),
                  argnums=(0, 1))(z, preds)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gd[0]),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gd[1]),
                               rtol=1e-4, atol=1e-6)


def test_stratified_fused_vjp_matches_autodiff(rng):
    """`_stratified_score_pair`'s hand-written backward agrees with
    autodiff of its own forward (the bf16 cast is a no-op in f32)."""
    from cpc_audio_tpu.ops.feistel import (ROUNDS, feistel_inverse,
                                           feistel_permute)
    from cpc_audio_tpu.criterion.infonce import (_stratified_scores_impl,
                                                 _stratified_score_pair)

    B, S, C, N, K = 2, 32, 8, 16, 3
    W = S - K
    M = B * S
    g = M // N
    nbits = M.bit_length() - 1
    keys = jax.random.bits(jax.random.PRNGKey(5), (ROUNDS,),
                           dtype=jnp.uint32)
    ar = jnp.arange(M, dtype=jnp.uint32)
    perm = feistel_permute(ar, keys, nbits)
    inv = feistel_inverse(ar, keys, nbits)
    z = jax.random.normal(rng, (M, C))
    preds = jax.random.normal(jax.random.PRNGKey(1), (K, B, W, C))
    pos = jax.random.normal(jax.random.PRNGKey(2), (K, B, W, C))

    def f_cust(pp, po, zz):
        ps, ns = _stratified_score_pair(pp, po, zz, perm, inv, g, 1.0 / C)
        return jnp.sum(jnp.sin(ps)) + jnp.sum(jnp.cos(ns))

    def f_ref(pp, po, zz):
        ps, ns, _ = _stratified_scores_impl(pp, po, zz, perm, g, 1.0 / C)
        return jnp.sum(jnp.sin(ps)) + jnp.sum(jnp.cos(ns))

    np.testing.assert_allclose(float(f_cust(preds, pos, z)),
                               float(f_ref(preds, pos, z)), rtol=1e-6)
    gc = jax.grad(f_cust, argnums=(0, 1, 2))(preds, pos, z)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(preds, pos, z)
    for a, b in zip(gc, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_infonce_auto_mode_resolution(rng):
    """'auto' resolves to the fused stratified path on power-of-two
    shapes (same loss as explicit 'stratified') and falls back to the
    reference's exact sampler otherwise (same loss as explicit 'exact')."""
    def run(mode, B, S, dim=8, N=8):
        crit = _make_criterion(N=N, S=S, sampling_mode=mode)
        c = jax.random.normal(rng, (B, S, dim))
        z = jax.random.normal(jax.random.PRNGKey(1), (B, S, dim))
        variables = crit.init({"params": jax.random.PRNGKey(0),
                               "sampling": jax.random.PRNGKey(2)}, c, z, None)
        return crit.apply(variables, c, z, None,
                          rngs={"sampling": jax.random.PRNGKey(3)})

    # B*S = 64 (pow2), N = 8 (pow2): auto == stratified
    la, _ = run("auto", B=4, S=16)
    ls, _ = run("stratified", B=4, S=16)
    np.testing.assert_allclose(np.asarray(la), np.asarray(ls), rtol=1e-6)

    # B*S = 48 (not pow2): auto == exact (stratified would raise)
    la2, _ = run("auto", B=3, S=16)
    le2, _ = run("exact", B=3, S=16)
    np.testing.assert_allclose(np.asarray(la2), np.asarray(le2), rtol=1e-6)
