"""InfoNCE (CPC) criterion.

Reference: CPCUnsupersivedCriterion [sic]
(/root/reference/cpc/criterion/criterion.py:139-257) and its within-batch
negative sampler ``sampleClean`` (criterion.py:174-219).

TPU-first design decisions:
  * Negatives are drawn once per batch with the reference's exact modular
    offset scheme (time index = (w + U[1,S)) mod S, so a negative never sits
    at the anchor's own frame offset) and gathered as ONE (B, W, N, C)
    tensor shared by every prediction step — one gather instead of K.
  * Scoring is two einsum contractions, 'kbwc,kbwc->kbw' (positives) and
    'kbwc,bwnc->kbwn' (negatives), which XLA maps to MXU batched matmuls
    with the candidate axis MINOR (softmax on lanes); the reference's
    per-step python loop and (B,1+N,W,C) concat never materialize, and the
    CE is a logsumexp that never builds the full log-probability tensor.
    Scores are means over C (criterion.py:116), preserving the reference's
    softmax temperature.
  * Randomness comes from the linen 'sampling' RNG collection, so under
    shard_map each device folds its own key — reproducing the reference's
    per-GPU-shard sampling semantics (train.py:372-375).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.feistel import ROUNDS, feistel_inverse, feistel_permute
from .prediction import PredictionNetwork


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _score_pair(preds, pos, neg, inv_c: float):
    """pos/neg scores (mean over C, criterion.py:116) with a bf16-cotangent
    backward.

    The forward emits f32 scores (the CE/logsumexp needs them), but
    autodiff would then make every backward matmul read f32 score
    cotangents — and the dneg it produces (the 475k-row scatter's update
    tensor) comes out f32, adding a 243 MB convert pass (device trace).
    The custom backward casts dscore to the compute dtype once (12 MB)
    and keeps dpred/dpos/dneg in bf16 end to end, like the rest of the
    gradient pipeline."""
    acc_t = jnp.promote_types(preds.dtype, jnp.float32)
    ps = jnp.einsum("kbwc,kbwc->kbw", preds, pos,
                    preferred_element_type=acc_t) * inv_c
    ns = jnp.einsum("kbwc,bwnc->kbwn", preds, neg,
                    preferred_element_type=acc_t) * inv_c
    return ps, ns


def _score_pair_fwd(preds, pos, neg, inv_c):
    return _score_pair(preds, pos, neg, inv_c), (preds, pos, neg)


def _score_pair_bwd(inv_c, res, cot):
    preds, pos, neg = res
    dps, dns = cot
    dps_c = (dps * inv_c).astype(preds.dtype)[..., None]     # (K,B,W,1)
    dns_c = (dns * inv_c).astype(preds.dtype)                # (K,B,W,N)
    dpred = dps_c * pos + jnp.einsum("kbwn,bwnc->kbwc", dns_c, neg)
    dpos = dps_c * preds
    dneg = jnp.einsum("kbwn,kbwc->bwnc", dns_c, preds)
    return dpred, dpos, dneg


_score_pair.defvjp(_score_pair_fwd, _score_pair_bwd)


class BaseCriterion(nn.Module):
    """Interface parity (criterion.py:121-127)."""

    def warm_up(self) -> bool:
        return False


class NoneCriterion(BaseCriterion):
    """Zero loss for the 'none' CPC mode (criterion.py:130-136)."""

    @nn.compact
    def __call__(self, c_feature, encoded_data, label, train: bool = False):
        z = jnp.zeros((1,), jnp.float32)
        return z, z


def sample_negatives(key: jax.Array, encoded_data: jax.Array,
                     window_size: int, n_negative: int,
                     pool: Optional[jax.Array] = None) -> jax.Array:
    """Within-batch negative sampling (criterion.py:174-201).

    encoded_data: (B, S, C).  Returns (B, W, N, C) negatives where
    neg[b, w, n] = pool[b', (w + u) % S] with b' ~ U[0,Bp), u ~ U[1,S)
    drawn independently per (b, n, w) — the reference's exact scheme.

    ``pool`` is the (Bp, S, C) tensor negatives are drawn FROM; it
    defaults to ``encoded_data`` itself (the reference's per-shard
    semantics).  The global negative-sampling scope passes the
    all-gathered cross-device batch instead (SURVEY.md §2.9 extension).

    Layout note: candidates are laid out (B, W, N, C) — w-major — so the
    scoring einsum is a clean (b, w)-batched (N, C) x (C, K) matmul and the
    softmax axis downstream is minor (docs/PERFORMANCE.md round 2).
    """
    B = encoded_data.shape[0]
    if pool is None:
        pool = encoded_data
    Bp, S, C = pool.shape
    k1, k2 = jax.random.split(key)
    batch_idx = jax.random.randint(k1, (B, n_negative, window_size), 0, Bp)
    seq_off = jax.random.randint(k2, (B, n_negative, window_size), 1, S)
    base = jnp.arange(window_size)[None, None, :]
    seq_idx = (seq_off + base) % S
    flat_idx = (batch_idx * S + seq_idx).transpose(0, 2, 1).reshape(-1)
    neg = jnp.take(pool.reshape(Bp * S, C), flat_idx, axis=0)
    return neg.reshape(B, window_size, n_negative, C)


def sample_negatives_rolled(key: jax.Array, encoded_data: jax.Array,
                            window_size: int, n_negative: int,
                            pool: Optional[jax.Array] = None) -> jax.Array:
    """Structured negative sampling: one (row, offset) pair per (b, n).

    neg[b, w, n] = z[b', (u + w) % S] with b' ~ U[0,B), u ~ U[1,S) drawn
    per (b, n) — each negative is a contiguous (mod-S) window of a random
    batch row.  DEPRECATED TEST HOOK — measured BOTH no faster than exact
    mode on v5e (XLA lowers the slab gather's backward no better than the
    row scatter) AND learning-degrading at fixture scale (training stalls
    at chance; docs/PERFORMANCE.md round 3).  No known use; kept only as
    a comparison arm for perf/validate_objectives.py.
    Returns (B, W, N, C) like ``sample_negatives``.
    """
    B = encoded_data.shape[0]
    if pool is None:
        pool = encoded_data
    Bp, S, C = pool.shape
    k1, k2 = jax.random.split(key)
    batch_idx = jax.random.randint(k1, (B, n_negative), 0, Bp)
    seq_off = jax.random.randint(k2, (B, n_negative), 1, S)
    z2 = jnp.concatenate([pool, pool], axis=1)  # (Bp,2S,C)
    flat = z2.reshape(Bp * 2 * S, C)
    starts = (batch_idx * 2 * S + seq_off).reshape(-1)

    def one(i0):
        return jax.lax.dynamic_slice(flat, (i0, 0), (window_size, C))

    neg = jax.vmap(one)(starts)
    return neg.reshape(B, n_negative, window_size, C).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _windowed_permutation_gather(z_flat, idx, inv, B: int, W: int, N: int):
    """Gather negatives indexed by ONE permutation at strided offsets,
    with a streaming (scatter-free, random-read-free) backward.

    Forward: plain row gather — neg[b, w, n] = z_flat[idx[b*W+w, n]]
    where idx[s, n] = pi((s + g*n) mod M), g = M/N, pi a keyed Feistel
    permutation of [0, M).

    Backward: writing u = pi^{-1}(d), the z cotangent is

        dz[d] = sum_n dneg[(u - g*n) mod M, n]   (zero where s >= B*W),

    a cyclic correlation over g-element blocks.  With u = g*q + r the
    block index is (q - n) mod (M/g), so the whole reduction is a gather
    of CONTIGUOUS (g*C)-byte blocks — 16 KB at the bench config, i.e.
    streaming DMA — followed by one tiny (M, C) inverse-permutation
    gather.  This replaces both the 4.87 ms serial 475k-row scatter-add
    autodiff emits for iid indices (iteration-bound, ~9.6 cycles/row)
    and the 7.0 ms per-slice random row gather of the first stratified
    design (512 B random reads run at ~44 GB/s on this chip;
    docs/PERFORMANCE.md round 4)."""
    flat = idx.reshape(-1).astype(jnp.int32)
    neg = jnp.take(z_flat, flat, axis=0)
    return neg.reshape(B, W, N, z_flat.shape[-1])


def _windowed_permutation_gather_fwd(z_flat, idx, inv, B, W, N):
    out = _windowed_permutation_gather(z_flat, idx, inv, B, W, N)
    return out, inv


def _windowed_permutation_gather_bwd(B, W, N, inv, dneg):
    C = dneg.shape[-1]
    M = inv.shape[0]
    BW = B * W
    g = M // N
    Q = M // g                                 # == N
    d = dneg.reshape(BW, N, C).transpose(1, 0, 2)          # (N, BW, C)
    d = jnp.pad(d, ((0, 0), (0, M - BW), (0, 0)))          # (N, M, C)
    dq = d.reshape(N, Q, g * C)
    tidx = (jnp.arange(Q, dtype=jnp.int32)[None, :]
            - jnp.arange(N, dtype=jnp.int32)[:, None]) % Q  # (N, Q)
    blocks = jnp.take_along_axis(dq, tidx[..., None], axis=1)
    dz_pre = blocks.astype(jnp.float32).sum(0).reshape(M, C)
    dz = jnp.take(dz_pre, inv.astype(jnp.int32), axis=0)
    # float0 cotangents must match each integer primal's shape:
    # idx is (B*W, N), inv is (M,).
    zero_idx = np.zeros((BW, N), dtype=jax.dtypes.float0)
    zero_inv = np.zeros((M,), dtype=jax.dtypes.float0)
    return dz.astype(dneg.dtype), zero_idx, zero_inv


_windowed_permutation_gather.defvjp(_windowed_permutation_gather_fwd,
                                    _windowed_permutation_gather_bwd)


def _stratified_shapes_ok(Bp: int, S: int, n_negative: int,
                          B: int, window_size: int) -> bool:
    """True iff the stratified sampler's domain constraints hold (used by
    sampling_mode='auto' to fall back to 'exact' without raising)."""
    M = Bp * S
    N = n_negative
    return (M & (M - 1) == 0 and N & (N - 1) == 0 and N <= M
            and B * window_size <= M)


def _stratified_domain_check(Bp: int, S: int, n_negative: int,
                             B: int, window_size: int):
    """Shared shape validation for the stratified sampler/scorer.

    Returns (M, g, nbits): the flat frame domain size, the permutation
    stride between consecutive negative slices, and the Feistel width."""
    M = Bp * S
    N = n_negative
    if M & (M - 1):
        raise ValueError(
            f"stratified sampling needs a power-of-two batch*seq frame "
            f"count, got {Bp}x{S}={M}; use negativeSamplingMode=exact")
    if N & (N - 1) or N > M:
        raise ValueError(
            f"stratified sampling needs a power-of-two negativeSamplingExt"
            f" <= batch*seq ({M}), got {N}; use negativeSamplingMode=exact")
    if B * window_size > M:
        raise ValueError("anchor slots exceed the sampling domain")
    return M, M // N, M.bit_length() - 1


def _stratified_scores_impl(preds, pos, z_flat, perm, gblk: int,
                            inv_c: float):
    """Shared forward for `_stratified_score_pair` (primal and fwd rule).

    Returns (pos_score (K, M), neg_score (K, M, N), zp) where anchor rows
    past B*W are zero padding (masked out by `_info_nce_reduce`)."""
    K, B, W, C = preds.shape
    M = perm.shape[0]
    Q = M // gblk                                   # == n_negative
    acc_t = jnp.promote_types(preds.dtype, jnp.float32)
    zp = jnp.take(z_flat, perm.astype(jnp.int32), axis=0)        # (M, C)
    pf = jnp.pad(preds.reshape(K, B * W, C),
                 ((0, 0), (0, M - B * W), (0, 0)))               # (K, M, C)
    ps = jnp.einsum("kbwc,kbwc->kbw", preds, pos,
                    preferred_element_type=acc_t) * inv_c
    ps = jnp.pad(ps.reshape(K, B * W), ((0, 0), (0, M - B * W)))
    # Cyclic block correlation: with u = g*q + r, anchor s = g*q_s + r_s
    # sees candidate blocks (q_s + n) mod Q at its own residue r_s — so
    # the scores against ALL Q blocks at residue r are one r-batched
    # (K*Q, C) x (C, Q) matmul.  The per-anchor rotation n -> (q_s+n)%Q
    # is a bijection of the candidate axis, and the criterion only ever
    # REDUCES over that axis (max / logsumexp / mean), so the un-rotated
    # block scores are exactly equivalent — the rotation gather (and the
    # (B,W,N,C) negatives tensor) never materializes in either direction.
    ns = jnp.einsum("kqgc,pgc->kqgp", pf.reshape(K, Q, gblk, C),
                    zp.reshape(Q, gblk, C),
                    preferred_element_type=acc_t) * inv_c
    return ps, ns.reshape(K, M, Q), zp


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _stratified_score_pair(preds, pos, z_flat, perm, inv, gblk: int,
                           inv_c: float):
    """Fused sample+score for stratified negatives — scatter-free and
    negatives-tensor-free in BOTH directions.

    Semantically identical (as a loss) to materializing
    ``sample_negatives_stratified`` and scoring with ``_score_pair``:
    neg[s, n] = z_flat[pi((s + g*n) mod M)] = zp[(s + g*n) mod M] with
    zp = z_flat o pi, and the candidate axis is only ever reduced over,
    so the rotated re-index is dropped (see `_stratified_scores_impl`).

    Costs: one (M, C) permutation gather + one block-batched score
    matmul forward; two block-batched matmuls + one (M, C)
    inverse-permutation gather backward.  This replaces the reference's
    475k-row scatter-add backward (iteration-bound, 4.87 ms at the bench
    config — /root/reference/cpc/criterion/criterion.py:174-219 pays the
    same scatter in CUDA) and the windowed-gather backward's ~4 ms of
    XLA pad/transpose plumbing (docs/PERFORMANCE.md round 4).

    Like `_score_pair`, the backward casts the f32 score cotangents to
    the compute dtype once, keeping every backward matmul bf16."""
    ps, ns, _ = _stratified_scores_impl(preds, pos, z_flat, perm, gblk,
                                        inv_c)
    return ps, ns


def _stratified_score_pair_fwd(preds, pos, z_flat, perm, inv, gblk, inv_c):
    ps, ns, zp = _stratified_scores_impl(preds, pos, z_flat, perm, gblk,
                                         inv_c)
    return (ps, ns), (preds, pos, zp, inv)


def _stratified_score_pair_bwd(gblk, inv_c, res, cot):
    preds, pos, zp, inv = res
    dps, dns = cot                                   # (K, M), (K, M, N)
    K, B, W, C = preds.shape
    M = zp.shape[0]
    Q = M // gblk
    BW = B * W
    dt = preds.dtype
    dps_c = (dps[:, :BW].reshape(K, B, W) * inv_c).astype(dt)[..., None]
    dns_c = (dns * inv_c).astype(dt).reshape(K, Q, gblk, Q)
    pf = jnp.pad(preds.reshape(K, BW, C), ((0, 0), (0, M - BW), (0, 0)))
    dpn = jnp.einsum("kqgp,pgc->kqgc", dns_c, zp.reshape(Q, gblk, C))
    dpred = (dps_c * pos
             + dpn.reshape(K, M, C)[:, :BW].reshape(K, B, W, C))
    dpos = dps_c * preds
    dzp = jnp.einsum("kqgp,kqgc->pgc", dns_c, pf.reshape(K, Q, gblk, C))
    # zp = z_flat[perm]  =>  dz_flat[j] = dzp[inv[j]] — a gather, never
    # a scatter (perm is a bijection).
    dz = jnp.take(dzp.reshape(M, C).astype(dt), inv.astype(jnp.int32),
                  axis=0)
    zero_perm = np.zeros((M,), dtype=jax.dtypes.float0)
    zero_inv = np.zeros((M,), dtype=jax.dtypes.float0)
    return dpred, dpos, dz, zero_perm, zero_inv


_stratified_score_pair.defvjp(_stratified_score_pair_fwd,
                              _stratified_score_pair_bwd)


def sample_negatives_stratified(key: jax.Array, encoded_data: jax.Array,
                                window_size: int, n_negative: int,
                                pool: Optional[jax.Array] = None) -> jax.Array:
    """Permutation-stratified within-batch negative sampling.

    One keyed Feistel permutation pi of the flat (batch*time) frame
    index [0, M), evaluated at per-slice strided offsets:

        neg[b, w, n] = pool_flat[pi((s + g*n) mod M)],
        s = b*W + w,  g = M / N.

    Statistical properties vs the reference's iid sampler
    (/root/reference/cpc/criterion/criterion.py:174-201):

      * marginally each negative is uniform over all M = B*S frames
        (pi is a keyed permutation; same marginal law as the reference
        except the anchor's own time column is not excluded — a 1/S-mass
        difference; the positive frame was never excluded by either);
      * per ANCHOR the N negatives are pi at N distinct points (g*n are
        distinct mod M), i.e. a uniform without-replacement draw — no
        duplicate negatives inside a softmax (mild variance reduction
        vs iid);
      * per SLICE the destinations are unique, and the strided-offset
        structure makes the backward a block-contiguous cyclic
        correlation (see ``_windowed_permutation_gather``) instead of a
        serial scatter-add.

    The trade vs iid: anchors whose flat slots are congruent mod g share
    most of their negative sets (the structure that buys the streaming
    backward), so per-step gradients are more correlated across anchors.
    Validation status: see docs/PERFORMANCE.md (round 4) for the TPU
    measurement and the fixture-scale learning comparison vs ``exact``.

    Requires the pool's B*S to be a power of two (the Feistel domain)
    and a power-of-two n_negative <= B*S (distinct strided offsets);
    use ``exact`` otherwise.  ``pool`` (default: ``encoded_data``) is the
    (Bp, S, C) tensor negatives are drawn from — the global sampling
    scope passes the all-gathered cross-device batch.
    Returns (B, W, N, C) like ``sample_negatives``.
    """
    B = encoded_data.shape[0]
    if pool is None:
        pool = encoded_data
    Bp, S, C = pool.shape
    N = n_negative
    M, g, nbits = _stratified_domain_check(Bp, S, N, B, window_size)
    keys = jax.random.bits(key, (ROUNDS,), dtype=jnp.uint32)
    s = jnp.arange(B * window_size, dtype=jnp.uint32)[:, None]
    n = jnp.arange(N, dtype=jnp.uint32)[None, :]
    slots = (s + np.uint32(g) * n) & np.uint32(M - 1)         # (B*W, N)
    idx = feistel_permute(slots, keys, nbits)                 # (B*W, N)
    inv = feistel_inverse(jnp.arange(M, dtype=jnp.uint32), keys, nbits)
    return _windowed_permutation_gather(pool.reshape(M, C), idx, inv,
                                        B, window_size, n_negative)


def _info_nce_reduce(pos_score: jax.Array, neg_score: jax.Array,
                     n_valid: int) -> Tuple[jax.Array, jax.Array]:
    """Per-step CE (positive = class 0) and argmax accuracy
    (criterion.py:248-254) over flat anchor rows.

    pos_score: (K, R); neg_score: (K, R, N).  Rows past ``n_valid`` are
    padding (the fused stratified path pads anchors to the permutation
    domain M) and are masked out of both means.  The CE is
    pos - logsumexp over {pos} u negatives — the full log-probability
    tensor never materializes."""
    f32 = jnp.float32
    mx = jnp.max(neg_score, axis=2)                             # (K, R)
    m = jnp.maximum(mx, pos_score)
    lse = m + jnp.log(
        jnp.sum(jnp.exp(neg_score - m[..., None]), axis=2)
        + jnp.exp(pos_score - m))
    ce = pos_score - lse
    # argmax == 0 semantics: ties resolve to the positive (index 0).
    correct = (pos_score >= mx).astype(f32)
    R = pos_score.shape[1]
    if R != n_valid:
        mask = (jnp.arange(R) < n_valid).astype(f32)
        ce = ce * mask
        correct = correct * mask
    losses = -jnp.sum(ce, axis=1) / n_valid                     # (K,)
    acc = jnp.sum(correct, axis=1) / n_valid                    # (K,)
    return losses, acc


def stack_positives(encoded_data: jax.Array, n_predicts: int,
                    window_size: int) -> jax.Array:
    """pos[k] = z[:, k+1 : k+1+W]  (criterion.py:207-215) -> (K, B, W, C).

    STATIC slices, not a gather: the shifts are compile-time constants,
    so the backward lowers to K fusible pad+adds instead of a 0.11
    ms/step scatter-add into z (device trace, round 3)."""
    return jnp.stack([
        jax.lax.slice_in_dim(encoded_data, k + 1, k + 1 + window_size,
                             axis=1)
        for k in range(n_predicts)])


class ModelCriterionCombined(nn.Module):
    """Model + criterion fusion wrapper (criterion.py:358-367; unused by the
    reference trainer but part of its public surface)."""

    model: nn.Module
    criterion: nn.Module

    @nn.compact
    def __call__(self, data, label, train: bool = False):
        c_feature, encoded_data, label, _ = self.model(data, label,
                                                       train=train)
        return self.criterion(c_feature, encoded_data, label, train=train)


class CPCUnsupervisedCriterion(BaseCriterion):
    """K-step InfoNCE with within-batch negatives (criterion.py:139-257).

    ``__call__(c, z, label) -> (losses (K,), accuracies (K,))`` —
    per-step mean CE with the positive as class 0, and argmax accuracy.
    Requires the 'sampling' RNG (and 'dropout' when train with dropout).
    """

    n_predicts: int
    dim_output_ar: int
    dim_output_encoder: int
    negative_sampling_ext: int
    mode: Optional[str] = None            # None | 'reverse'
    rnn_mode: Optional[str] = "transformer"
    dropout: bool = False
    speaker_embedding: int = 0
    n_speakers: int = 0
    size_input_seq: int = 128
    # exact (reference semantics, the library-level default) | stratified
    # (scatter-free fused path; needs power-of-two batch*seq and
    # negatives) | auto (stratified when shapes + scope allow, else
    # exact — the CLI/config default) | rolled (deprecated test hook)
    sampling_mode: str = "exact"
    stop_grad_negatives: bool = False     # opt-in: no grads through negatives
    # 'device' (reference per-shard semantics, train.py:372-375) or
    # 'global': negatives drawn from the ALL-GATHERED cross-device batch
    # (the SURVEY.md §2.9 documented extension).  'global' only takes
    # effect under shard_map with `data_axis` bound; elsewhere (init,
    # single-process eval) the pool is the local batch, which is
    # identical semantics at world size 1.
    negative_sampling_scope: str = "device"
    data_axis: str = "data"

    def setup(self):
        if self.mode not in (None, "reverse"):
            raise ValueError("Invalid mode")
        dim_ar = self.dim_output_ar + self.speaker_embedding
        if self.speaker_embedding > 0:
            self.speaker_emb = nn.Embed(self.n_speakers,
                                        self.speaker_embedding,
                                        name="speakerEmb")
        self.w_prediction = PredictionNetwork(
            self.n_predicts, self.dim_output_encoder, self.rnn_mode,
            self.dropout, size_input_seq=self.size_input_seq - self.n_predicts,
            name="wPrediction")

    def __call__(self, c_feature: jax.Array, encoded_data: jax.Array,
                 label: Optional[jax.Array] = None,
                 train: bool = False) -> Tuple[jax.Array, jax.Array]:
        if self.mode == "reverse":
            encoded_data = jnp.flip(encoded_data, axis=1)
            c_feature = jnp.flip(c_feature, axis=1)

        B, S, _ = c_feature.shape
        K = self.n_predicts
        W = S - K
        c = c_feature[:, :W]

        key = self.make_rng("sampling")
        samplers = {"exact": sample_negatives,
                    "rolled": sample_negatives_rolled,
                    "stratified": sample_negatives_stratified}
        mode = self.sampling_mode
        if mode not in samplers and mode != "auto":
            raise ValueError(
                f"unknown sampling_mode {self.sampling_mode!r}; "
                f"expected one of {sorted(samplers) + ['auto']}")
        if self.negative_sampling_scope not in ("device", "global"):
            raise ValueError(
                f"unknown negative_sampling_scope "
                f"{self.negative_sampling_scope!r}; expected device|global")
        pool = None
        if self.negative_sampling_scope == "global":
            try:
                # (world*B, S, C); differentiable — the all_gather
                # transpose is a psum_scatter, so repulsion gradients
                # flow back to the devices that OWN each negative frame.
                pool = jax.lax.all_gather(encoded_data, self.data_axis,
                                          axis=0, tiled=True)
            except NameError:
                pool = None  # axis unbound: init / single-process eval
        pos = stack_positives(encoded_data, K, W)            # (K,B,W,C)

        if self.speaker_embedding > 0:
            emb = self.speaker_emb(label)                     # (B, E)
            emb = jnp.broadcast_to(emb[:, None, :], (B, W, emb.shape[-1]))
            c = jnp.concatenate([c, emb.astype(c.dtype)], axis=2)

        preds = self.w_prediction(c, train=train)             # (K,B,W,C')

        C = self.dim_output_encoder
        f32 = jnp.float32
        # score = mean over channels of pred*candidate (criterion.py:116).
        # Inputs stay in their compute dtype (bf16 halves the HBM traffic of
        # the gathered negatives); the MXU accumulates in f32; the custom
        # VJPs keep the backward's cotangents bf16 (see _score_pair).
        # Layout: candidates MINOR — neg_score (..., N) keeps the softmax /
        # max reductions on the fast (lane) axis; the reference's
        # (K,B,1+N,W) orientation put them on a strided axis (measured
        # ~1.5 ms/step of select/copy fusions, docs/PERFORMANCE.md).
        if mode == "auto":
            # Config-level default: the fused stratified path when shapes
            # and scope allow (validated metric-neutral-or-better and
            # ~1.8x faster at the bench config — docs/PERFORMANCE.md
            # round 4), the reference's exact iid sampler otherwise.
            mode = ("stratified"
                    if (pool is None and not self.stop_grad_negatives
                        and _stratified_shapes_ok(
                            B, S, self.negative_sampling_ext, B, W))
                    else "exact")
        if (mode == "stratified"
                and not self.stop_grad_negatives and pool is None):
            # Fused sample+score: the (B, W, N, C) negatives tensor and
            # the rotation gather never materialize in either direction
            # (see _stratified_score_pair).  The materialized sampler
            # below stays as the path for the global pool (whose padded
            # anchor domain would waste world_size x FLOPs) and for
            # stop_grad_negatives (where autodiff DCEs the dneg matmul).
            Ce = encoded_data.shape[-1]
            M, g, nbits = _stratified_domain_check(
                B, S, self.negative_sampling_ext, B, W)
            keys = jax.random.bits(key, (ROUNDS,), dtype=jnp.uint32)
            ar = jnp.arange(M, dtype=jnp.uint32)
            perm = feistel_permute(ar, keys, nbits)
            inv = feistel_inverse(ar, keys, nbits)
            pos_score, neg_score = _stratified_score_pair(
                preds, pos, encoded_data.reshape(M, Ce), perm, inv, g,
                1.0 / C)                     # (K, M), (K, M, N) padded
            return _info_nce_reduce(pos_score, neg_score, B * W)

        neg = samplers[mode](key, encoded_data, W,
                             self.negative_sampling_ext,
                             pool=pool)                      # (B,W,N,C)
        if self.stop_grad_negatives:
            # Opt-in objective change: drops the repulsion gradient through
            # negative encodings; kills the ~500k-row scatter-add in the
            # backward (measured ~half the train step on v5e).  Plain
            # einsums so autodiff can DCE the dneg matmul entirely.
            neg = jax.lax.stop_gradient(neg)
            pos_score = jnp.einsum("kbwc,kbwc->kbw", preds, pos,
                                   preferred_element_type=f32) / C
            neg_score = jnp.einsum("kbwc,bwnc->kbwn", preds, neg,
                                   preferred_element_type=f32) / C
        else:
            pos_score, neg_score = _score_pair(preds, pos, neg, 1.0 / C)

        BW = B * W
        N = neg_score.shape[-1]
        return _info_nce_reduce(pos_score.reshape(K, BW),
                                neg_score.reshape(K, BW, N), BW)
