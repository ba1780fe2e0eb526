"""Same-process A/B: f32 vs bf16 cotangents in the criterion hot path.

Hypothesis (docs/PERFORMANCE.md round-2 follow-up): every
``preferred_element_type=f32`` einsum whose output is cast back to bf16
makes the BACKWARD cotangent f32, so all dW/dx matmuls in the backward run
as f32 MXU ops (~3x slower than bf16 on v5e) and the big intermediate
gradients (dneg: 121M elements) materialize at twice the bytes.

Measures, interleaved in one process (slope timing, see CLAUDE.md):
  A. stacked transformer heads fwd+bwd as shipped
  B. same but einsums emit bf16 directly (backward bf16)
  C. negative gather+scoring+CE fwd+bwd as shipped (f32 dscore)
  D. same with a custom-vjp scoring that casts dscore to bf16
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope_time(fn, k1=4, k2=14, reps=3):
    fn(3)
    best1 = best2 = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(k1)
        best1 = min(best1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        fn(k2)
        best2 = min(best2, time.perf_counter() - t0)
    return max((best2 - best1) / (k2 - k1), 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    B, S, C, K, N = 32, 128, 256, 12, 128
    W = S - K
    rng = np.random.RandomState(0)
    bf16 = jnp.bfloat16
    f32 = jnp.float32

    # ---------------- heads: A (pet=f32 + astype) vs B (bf16 out) ---------
    h, dk, F = 8, 32, 2048
    c = jnp.asarray(rng.randn(B, W, C), bf16)
    params = {
        "w_all": jnp.asarray(rng.randn(C, 3 * K * C) * 0.06, f32),
        "krel": jnp.asarray(rng.randn(K, dk, W) * 0.06, f32),
        "wo": jnp.asarray(rng.randn(K, C, C) * 0.06, f32),
        "w1": jnp.asarray(rng.randn(K, C, F) * 0.06, f32),
        "b1": jnp.asarray(rng.randn(K, F) * 0.01, f32),
        "w2": jnp.asarray(rng.randn(K, F, C) * 0.06, f32),
        "b2": jnp.asarray(rng.randn(K, C) * 0.01, f32),
        "ln1w": jnp.ones((K, C), f32), "ln1b": jnp.zeros((K, C), f32),
        "ln2w": jnp.ones((K, C), f32), "ln2b": jnp.zeros((K, C), f32),
    }
    cot = jnp.asarray(rng.randn(K, B, W, C), bf16)
    import math

    def heads(p, c, f32_bwd: bool):
        def mm(eq, a, b):
            if f32_bwd:
                return jnp.einsum(eq, a, b,
                                  preferred_element_type=f32).astype(a.dtype)
            return jnp.einsum(eq, a, b)

        S_ = c.shape[1]
        c2 = c.reshape(B * S_, C)
        qkv = mm("mc,cd->md", c2, p["w_all"].astype(c.dtype))
        qkv = qkv.reshape(B, S_, 3, K, h, dk).transpose(2, 3, 0, 4, 1, 5)
        q, k, v = qkv[0], qkv[1], qkv[2]
        qp = mm("kbhsd,kdr->kbhsr", q, p["krel"].astype(q.dtype))
        z = jnp.zeros((K, B, h, S_, 1), qp.dtype)
        qp = jnp.concatenate([z, qp], axis=4)
        bias = qp.reshape(K, B, h, S_ + 1, S_)[:, :, :, 1:, :]
        logits = jnp.einsum("kbhqd,kbhxd->kbhqx", q, k,
                            preferred_element_type=f32)
        logits = (logits + bias.astype(f32)) / math.sqrt(dk)
        mask = jnp.tril(jnp.ones((S_, S_), bool))
        logits = jnp.where(mask, logits, -jnp.inf)
        attn = jax.nn.softmax(logits, axis=-1).astype(c.dtype)
        y = mm("kbhqx,kbhxd->kbhqd", attn, v)
        y = y.transpose(0, 1, 3, 2, 4).reshape(K, B * S_, C)
        y = mm("kmd,kdo->kmo", y, p["wo"].astype(c.dtype)).reshape(K, B, S_, C)
        x = c[None] + y

        def ln(x, w, b):
            xf = x.astype(f32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.var(xf, axis=-1, keepdims=True)
            yn = ((xf - mu) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)
            return yn * w[:, None, None].astype(x.dtype) \
                + b[:, None, None].astype(x.dtype)

        y1 = ln(x, p["ln1w"], p["ln1b"])
        m = y1.reshape(K, B * S_, C)
        hh = mm("kmd,kdf->kmf", m, p["w1"].astype(c.dtype))
        hh = jax.nn.relu(hh + p["b1"][:, None, :].astype(c.dtype))
        out = mm("kmf,kfd->kmd", hh, p["w2"].astype(c.dtype))
        out = (out + p["b2"][:, None, :].astype(c.dtype)).reshape(K, B, S_, C)
        return ln(y1 + out, p["ln2w"], p["ln2b"])

    def make_heads_fn(f32_bwd):
        @jax.jit
        def fwd_bwd(p, c):
            def loss(p, c):
                preds = heads(p, c, f32_bwd)
                return jnp.sum((preds * cot).astype(f32))
            l, _ = jax.value_and_grad(loss, argnums=(0, 1))(p, c)
            return l

        def run(k):
            l = None
            for _ in range(k):
                l = fwd_bwd(params, c)
            np.asarray(l)
        return run

    # ---------------- scoring: C (f32 dscore) vs D (bf16 dscore) ----------
    from cpc_audio_tpu.criterion.infonce import (sample_negatives,
                                                 stack_positives)
    preds0 = jnp.asarray(rng.randn(K, B, W, C), bf16)
    zz = jnp.asarray(rng.randn(B, S, C), bf16)

    def make_score(p, z, bf16_bwd):
        import functools

        @functools.partial(jax.custom_vjp, nondiff_argnums=())
        def score(preds, pos, neg):
            ps = jnp.einsum("kbwc,kbwc->kbw", preds, pos,
                            preferred_element_type=f32) / C
            ns = jnp.einsum("kbwc,bnwc->kbnw", preds, neg,
                            preferred_element_type=f32) / C
            return jnp.concatenate([ps[:, :, None, :], ns], axis=2)

        def score_fwd(preds, pos, neg):
            return score(preds, pos, neg), (preds, pos, neg)

        def score_bwd(res, dlog):
            preds, pos, neg = res
            dps = (dlog[:, :, 0, :] / C).astype(preds.dtype)
            dns = (dlog[:, :, 1:, :] / C).astype(preds.dtype)
            dpreds = dps[:, :, :, None] * pos \
                + jnp.einsum("kbnw,bnwc->kbwc", dns, neg)
            dpos = dps[:, :, :, None] * preds
            dneg = jnp.einsum("kbnw,kbwc->bnwc", dns, preds)
            return dpreds, dpos, dneg

        score.defvjp(score_fwd, score_bwd)

        @jax.jit
        def fwd_bwd(preds, z, key):
            def loss(preds, z):
                neg = sample_negatives(key, z, W, N)
                pos = stack_positives(z, K, W)
                if bf16_bwd:
                    logits = score(preds, pos, neg)
                else:
                    ps = jnp.einsum("kbwc,kbwc->kbw", preds, pos,
                                    preferred_element_type=f32) / C
                    ns = jnp.einsum("kbwc,bnwc->kbnw", preds, neg,
                                    preferred_element_type=f32) / C
                    logits = jnp.concatenate([ps[:, :, None, :], ns], axis=2)
                lp = jax.nn.log_softmax(logits, axis=2)
                return -jnp.mean(lp[:, :, 0, :])
            l, _ = jax.value_and_grad(loss, argnums=(0, 1))(preds, z)
            return l

        key = jax.random.PRNGKey(5)

        def run(k):
            l = None
            for i in range(k):
                l = fwd_bwd(p, z, jax.random.fold_in(key, i))
            np.asarray(l)
        return run

    runs = {
        "heads_f32bwd": make_heads_fn(True),
        "heads_bf16bwd": make_heads_fn(False),
        "score_f32bwd": make_score(preds0, zz, False),
        "score_bf16bwd": make_score(preds0, zz, True),
    }
    # interleave: measure each twice, alternating, report min
    results = {k: float("inf") for k in runs}
    for _ in range(2):
        for name, fn in runs.items():
            t = slope_time(fn, reps=2)
            results[name] = min(results[name], t)
            print(f"{name}: {t * 1e3:.2f} ms", flush=True)
    print("--- best ---")
    for name, t in results.items():
        print(f"{name}: {t * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
