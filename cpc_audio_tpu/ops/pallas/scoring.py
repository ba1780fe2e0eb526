"""Pallas kernel: fused negative-gather + InfoNCE scoring.

The InfoNCE hot path gathers ``(B, N, W, C)`` negative candidate frames from
the encoder output and contracts them with K stacked head predictions
(criterion/infonce.py).  Materializing the gather costs ``B*N*W*C`` HBM
traffic (hundreds of MB per step at production batch) and the einsum then
re-reads it.  This kernel keeps the whole encoder output ``z`` resident in
VMEM (a few MB) and computes

    neg_scores[k, b, n, w] = <preds[k, b, w, :], z_flat[idx[b, n, w], :]> / C

by gathering rows directly from VMEM — the (B, N, W, C) tensor never exists
in HBM.

Grid: one program per batch row b.  Per program: preds (K, W, C) block,
idx (N, W) block, the full z_flat (B*S, C), output (K, N, W) block.

STATUS: validated against the XLA path in interpret mode
(tests/test_ops.py).  Mosaic's current gather lowering only accepts
same-shape ``take_along_axis`` (indices.shape == input.shape + (1,)), which
rejects this kernel's shape-changing row gather on real TPUs — so the
criterion defaults to the XLA gather+einsum path and this kernel is kept as
the fusion blueprint until Mosaic grows a general dynamic-gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except ImportError:  # pragma: no cover
    HAVE_PALLAS = False


def _scoring_kernel(idx_ref, preds_ref, z_ref, out_ref):
    # idx_ref:   (1, N, W) int32 (VMEM)
    # preds_ref: (K, 1, C, W)    (VMEM) — channel-major so the gather and the
    #            reduction both run along hardware lanes
    # z_ref:     (C, BS)         (VMEM, full transposed encoder output)
    # out_ref:   (K, 1, N, W) f32
    N = idx_ref.shape[1]
    W = idx_ref.shape[2]
    preds = preds_ref[:, 0].astype(jnp.float32)        # (K, C, W)
    z = z_ref[:]                                        # (C, BS)
    C_dim = z.shape[0]

    def body(n, _):
        idx_row = jnp.broadcast_to(idx_ref[0, n][None, :], (C_dim, W))
        cols = jnp.take_along_axis(z, idx_row, axis=1)  # (C, W) lane gather
        scores = jnp.sum(preds * cols[None].astype(jnp.float32), axis=1)
        out_ref[:, 0, n, :] = scores                    # (K, W)
        return 0

    jax.lax.fori_loop(0, N, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_negative_scores(preds: jax.Array, z_flat: jax.Array,
                          flat_idx: jax.Array,
                          interpret: bool = False) -> jax.Array:
    """preds (K, B, W, C), z_flat (B*S, C), flat_idx (B, N, W) int32
    -> (K, B, N, W) float32 scores (mean over channels)."""
    K, B, W, C = preds.shape
    N = flat_idx.shape[1]
    BS = z_flat.shape[0]
    preds_t = jnp.swapaxes(preds, 2, 3)  # (K, B, C, W)
    z_t = z_flat.T                       # (C, BS)
    out = pl.pallas_call(
        _scoring_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1, C, W), lambda b: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, BS), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, 1, N, W), lambda b: (0, b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, B, N, W), jnp.float32),
        interpret=interpret,
    )(flat_idx.astype(jnp.int32), preds_t, z_t)
    return out / C


def reference_negative_scores(preds: jax.Array, z_flat: jax.Array,
                              flat_idx: jax.Array) -> jax.Array:
    """XLA gather+einsum path (what the criterion does by default)."""
    K, B, W, C = preds.shape
    N = flat_idx.shape[1]
    neg = jnp.take(z_flat, flat_idx.reshape(-1), axis=0)
    neg = neg.reshape(B, N, W, C)
    return jnp.einsum("kbwc,bnwc->kbnw", preds.astype(jnp.float32),
                      neg.astype(jnp.float32)) / C
