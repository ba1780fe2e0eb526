"""Keyed format-preserving permutations of [0, 2**nbits) (Feistel network).

Used by the stratified negative sampler (criterion/infonce.py): each
negative slice draws its destinations as a keyed permutation of the flat
(batch*time) frame index, so the InfoNCE backward can route gradients
with analytic inverse-permutation GATHERS instead of a serial 475k-row
scatter-add (docs/PERFORMANCE.md — the scatter is iteration-bound at
~9.6 cycles/row because iid sampling makes duplicate destinations
possible; a permutation makes every slice's destinations provably
unique).

The network is an alternating unbalanced Feistel over the high/low bit
halves with a murmur-style round function — the standard cycle-free
construction for power-of-two domains, invertible by running the rounds
backward.  All ops are elementwise u32 (wrapping arithmetic), so a
(128, 4096) permutation table costs microseconds on the VPU.

No reference counterpart: the torch reference samples iid uniform
(/root/reference/cpc/criterion/criterion.py:174-201) and pays the
scatter in cuda; see docs/DESIGN.md for the distribution analysis.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

ROUNDS = 5

_M1 = np.uint32(0x9E3779B1)
_M2 = np.uint32(0x85EBCA6B)


def _mix(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Murmur3-style avalanche of a u32 word under key k."""
    h = (x ^ k) * _M1
    h = h ^ (h >> 15)
    h = h * _M2
    return h ^ (h >> 13)


def _split(nbits: int):
    lb = nbits // 2
    hb = nbits - lb
    return hb, lb, np.uint32((1 << hb) - 1), np.uint32((1 << lb) - 1)


def feistel_permute(x: jnp.ndarray, keys: jnp.ndarray,
                    nbits: int) -> jnp.ndarray:
    """Apply the keyed permutation of [0, 2**nbits) elementwise.

    x: u32 values in [0, 2**nbits); keys: u32 (..., ROUNDS), broadcast
    against x's leading dims (e.g. x (1, M) with keys (N, ROUNDS) yields
    (N, M) — one independent permutation per key row)."""
    hb, lb, mask_l, mask_r = _split(nbits)
    x = x.astype(jnp.uint32)
    left = (x >> lb) & mask_l
    right = x & mask_r
    for i in range(keys.shape[-1]):
        k = keys[..., i][..., None]
        if i % 2 == 0:
            left = (left + _mix(right, k)) & mask_l
        else:
            right = (right + _mix(left, k)) & mask_r
    return (left << lb) | right


def feistel_inverse(y: jnp.ndarray, keys: jnp.ndarray,
                    nbits: int) -> jnp.ndarray:
    """Inverse of :func:`feistel_permute` (same keys)."""
    hb, lb, mask_l, mask_r = _split(nbits)
    y = y.astype(jnp.uint32)
    left = (y >> lb) & mask_l
    right = y & mask_r
    for i in reversed(range(keys.shape[-1])):
        k = keys[..., i][..., None]
        if i % 2 == 0:
            left = (left - _mix(right, k)) & mask_l
        else:
            right = (right - _mix(left, k)) & mask_r
    return (left << lb) | right
