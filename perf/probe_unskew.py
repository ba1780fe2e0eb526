"""Probe: can Mosaic express the relpos UNSKEW in-kernel?

unskew[t, i, r] = x[t, i, (r + i + 1) mod S]  (adjoint of the skew roll).

Candidates:
  a) pltpu.roll with negative stride:      roll(x, S-1, lanes, stride=-1)
  b) rev-roll-rev: lax.rev on lanes, the forward skew roll, rev again
     (roll(v, 1+i) composed with lane reversals == per-row shift -(1+i)).

Run on TPU: python perf/probe_unskew.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def expected(x):
    T, S, _ = x.shape
    i = np.arange(S)[None, :, None]
    r = np.arange(S)[None, None, :]
    idx = (r + i + 1) % S
    return np.take_along_axis(x, np.broadcast_to(idx, x.shape), axis=2)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, S = 8, 128
    x = np.random.RandomState(0).randn(T, S, S).astype(np.float32)
    exp = expected(x)

    def try_kernel(name, body):
        def kernel(x_ref, o_ref):
            o_ref[:] = body(x_ref[:])
        try:
            y = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((T, S, S), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(jnp.asarray(x))
            y = np.asarray(y)
            ok = np.array_equal(y, exp)
            print(f"{name}: compiled, correct={ok}")
        except Exception as e:
            print(f"{name}: FAILED — {str(e).splitlines()[0][:150]}")

    try_kernel("neg-stride roll",
               lambda v: pltpu.roll(v, S - 1, 2, stride=-1, stride_axis=1))
    try_kernel("rev-roll-rev",
               lambda v: jax.lax.rev(
                   pltpu.roll(jax.lax.rev(v, (2,)), 1, 2,
                              stride=1, stride_axis=1), (2,)))
    try_kernel("rev-roll-rev (flip)",
               lambda v: jnp.flip(
                   pltpu.roll(jnp.flip(v, 2), 1, 2,
                              stride=1, stride_axis=1), 2))


if __name__ == "__main__":
    main()
