"""Hardware check: fused relpos attention vs the XLA path, values + grads.

Runs BOTH paths of _StackedMHA (CPC_PALLAS_ATTN toggles per-call via the
module env read) at the bench shapes on the real TPU, no dropout, and
compares outputs and all parameter/input gradients.  Then slope-times the
stacked heads fwd+bwd with the kernel on.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from cpc_audio_tpu.criterion.prediction import PredictionNetwork

    B, W, C, K = 32, 116, 256, 12
    rng = np.random.RandomState(0)
    c = jnp.asarray(rng.randn(B, W, C), jnp.bfloat16)
    cot = jnp.asarray(rng.randn(K, B, W, C), jnp.bfloat16)
    net = PredictionNetwork(K, C, "transformer", False, size_input_seq=W)
    hv = net.init({"params": jax.random.PRNGKey(0)}, c)

    def loss(p, c):
        y = net.apply({"params": p}, c, train=False)
        return jnp.sum((y * cot).astype(jnp.float32))

    grad_fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))

    results = {}
    for flag in ("0", "1"):
        os.environ["CPC_PALLAS_ATTN"] = flag
        jax.clear_caches()
        l, (gp, gc) = grad_fn(hv["params"], c)
        results[flag] = (np.asarray(l),
                         jax.tree_util.tree_map(np.asarray, gp),
                         np.asarray(gc))

    l0, gp0, gc0 = results["0"]
    l1, gp1, gc1 = results["1"]
    print("loss:", l0, l1, "rel diff:", abs(l0 - l1) / abs(l0))
    flat0 = jax.tree_util.tree_leaves_with_path(gp0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(gp1))
    worst = 0.0
    for path, a in flat0:
        b = flat1[path]
        d = np.max(np.abs(a.astype(np.float32) - b.astype(np.float32)))
        s = max(np.max(np.abs(a.astype(np.float32))), 1e-6)
        worst = max(worst, d / s)
        if d / s > 0.02:
            print("  GRAD DIFF", path, d, "scale", s)
    dc = np.max(np.abs(gc0.astype(np.float32) - gc1.astype(np.float32)))
    print(f"worst param-grad rel diff: {worst:.4g}; dc abs diff: {dc:.4g}")

    # timing with kernel on, train=True (dropout on, in-kernel)
    os.environ["CPC_PALLAS_ATTN"] = "1"
    jax.clear_caches()
    from cpc_audio_tpu.parallel.train_step import _rbg_key

    @jax.jit
    def fb(p, c, key):
        def loss2(p, c):
            y = net.apply({"params": p}, c, train=True,
                          rngs={"dropout": _rbg_key(key)})
            return jnp.sum((y * cot).astype(jnp.float32))
        l, gs = jax.value_and_grad(loss2, argnums=(0, 1))(p, c)
        return l + sum(jnp.sum(g.astype(jnp.float32))
                       for g in jax.tree_util.tree_leaves(gs))

    skey = jax.random.PRNGKey(3)

    def run(k):
        l = None
        for _ in range(k):
            l = fb(hv["params"], c, skey)
        np.asarray(l)

    run(3)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); run(4); t1 = time.perf_counter()
        run(14); t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / 10)
    print(f"heads_fb (kernel on): {min(ts) * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
