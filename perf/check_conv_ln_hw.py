"""Hardware check: fused conv+ChannelNorm+ReLU kernel vs the XLA path.

Runs ops/pallas/conv_ln.fused_conv_ln_relu on the real TPU at the two
CPC encoder geometries it supports (kernel == 2*stride,
/root/reference/cpc/model.py:83-93), bf16, values + all grads, against
the lax.conv + ChannelNorm(ddof=1) + relu composition.  Companion to
the interpret-mode tests in tests/test_conv_kernel.py — this one proves
the MOSAIC lowering (not the interpreter) is numerically right.

The kernel is opt-in (measured slower than XLA at the bench config —
see the module docstring / docs/PERFORMANCE.md), but it must stay
correct while opt-in.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from cpc_audio_tpu.ops.pallas.conv_ln import (fused_conv_ln_relu,
                                                  fused_conv_supported)

    def composed(x, w, b, nw, nb, s, k, p, eps=1e-5):
        y = jax.lax.conv_general_dilated(
            x, w.reshape(k, x.shape[-1], -1), window_strides=(s,),
            padding=[(p, p)], dimension_numbers=("NWC", "WIO", "NWC")) + b
        mean = jnp.mean(y, -1, keepdims=True)
        var = jnp.var(y, -1, keepdims=True, ddof=1)
        yn = (y - mean) * jax.lax.rsqrt(var + eps)
        return jnp.maximum(yn * nw + nb, 0.0)

    rng = np.random.RandomState(0)
    B, C = 32, 256
    ok = True
    for (T, k, s, p) in [(4096, 8, 4, 2), (2048, 4, 2, 1)]:
        assert fused_conv_supported(T, C, k, s, p), (T, k, s, p)
        x = jnp.asarray(rng.randn(B, T, C), jnp.float32).astype(jnp.bfloat16)
        w = jnp.asarray(rng.randn(k * C, C) / 30,
                        jnp.float32).astype(jnp.bfloat16)
        b, nw, nb = (jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
                     for _ in range(3))
        ct = jnp.asarray(rng.randn(B, (T + 2 * p) // s - 1, C),
                         jnp.float32).astype(jnp.bfloat16)

        def vj(f):
            return jax.jit(jax.value_and_grad(
                lambda *a: jnp.vdot(f(*a, s, k, p).astype(jnp.float32),
                                    ct.astype(jnp.float32)),
                argnums=(0, 1, 2, 3, 4)))

        yk, gk = vj(fused_conv_ln_relu)(x, w, b, nw, nb)
        yr, gr = vj(composed)(x, w, b, nw, nb)
        rels = []
        for a, bb in zip(gk, gr):
            num = float(jnp.linalg.norm((a - bb).astype(jnp.float32)))
            den = float(jnp.linalg.norm(bb.astype(jnp.float32))) + 1e-9
            rels.append(num / den)
        print(f"T={T} k={k}: loss rel "
              f"{abs(yk - yr) / (abs(yr) + 1e-9):.2e}, grad relL2 "
              f"{['%.2e' % r for r in rels]}")
        ok &= all(r < 5e-2 for r in rels)  # bf16 tolerance
    print("OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
