"""Row scatter-add as sorted range-chunked one-hot matmuls (Pallas).

The InfoNCE negative-gather backward scatter-adds ~475k C-wide rows into a
(B*S, C) table.  XLA's TPU scatter serializes the row updates (device
trace: 4.9 ms at the bench config, ~50 GB/s effective).  Here the updates
are sorted by destination once (XLA argsort + permutation gather), and a
Pallas kernel turns each destination-range chunk into one-hot matmuls on
the MXU:

    out[r0:r0+Rt] += sum_q OH(keys_q) @ rows_q

OH is built from an iota==key compare, so duplicate destinations
accumulate inside the matmul — no serial read-modify-write.  Each chunk
streams a fixed-capacity window of sorted updates; sub-tiles beyond the
chunk's count are skipped, and rows whose key falls outside the chunk's
destination range (spill-over from the aligned window start, or the
padded tail) match no one-hot row.

Exactness: pure sums of the same terms, reassociated; accumulation is
f32.  Capacity: counts beyond the per-chunk window would be dropped, so
the wrapper falls back to the XLA scatter (lax.cond) whenever
max_chunk_count exceeds it — uniform keys make that astronomically
unlikely at the shipped sizes, but correctness never depends on it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_ALIGN = 1024  # window starts align here: keys DMA offsets stay legal


def _kernel(starts_ref, ends_ref, supd_ref, skeys_ref, out_ref, *,
            Rt: int, U: int, n_sub: int):
    """grid: (n_chunks,). starts_ref: (n_chunks,) _ALIGN-aligned window
    starts; ends_ref: (n_chunks,) TRUE chunk end positions (aligning the
    end down would drop each chunk's tail updates).  supd_ref: (Jp, C)
    updates sorted by key (HBM); skeys_ref: (Jp / 128, 128) sorted keys
    (HBM); out block: (Rt, C) f32."""
    c = pl.program_id(0)
    start = pl.multiple_of(starts_ref[c], _ALIGN)
    end = ends_ref[c]
    base = c * Rt

    def body(acc, rows_vmem, keys_vmem, sem_r, sem_k):
        acc[:] = jnp.zeros_like(acc)

        def sub(i, carry):
            off = pl.multiple_of(start + i * U, _ALIGN)

            @pl.when(off < end)
            def _():
                cp_r = pltpu.make_async_copy(
                    supd_ref.at[pl.ds(off, U), :], rows_vmem, sem_r)
                cp_k = pltpu.make_async_copy(
                    skeys_ref.at[pl.ds(off // _LANE, U // _LANE), :],
                    keys_vmem, sem_k)
                cp_r.start()
                cp_k.start()
                cp_r.wait()
                cp_k.wait()

                def one_q(q, carry2):
                    # rows outside [base, base+Rt) (neighbor chunks or the
                    # padded tail) match no one-hot row -> masked
                    rel = keys_vmem[q, :] - base              # (128,)
                    row_ids = jax.lax.broadcasted_iota(
                        jnp.int32, (Rt, _LANE), 0)
                    oh = (row_ids == rel[None, :]).astype(jnp.bfloat16)
                    rows = rows_vmem[pl.ds(q * _LANE, _LANE), :]
                    acc[:] += jax.lax.dot_general(
                        oh, rows.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    return carry2

                jax.lax.fori_loop(0, U // _LANE, one_q, None)

            return carry

        jax.lax.fori_loop(0, n_sub, sub, None)
        out_ref[:] = acc[:]

    C = supd_ref.shape[1]
    pl.run_scoped(
        body,
        acc=pltpu.VMEM((Rt, C), jnp.float32),
        rows_vmem=pltpu.VMEM((U, C), supd_ref.dtype),
        keys_vmem=pltpu.VMEM((U // _LANE, _LANE), jnp.int32),
        sem_r=pltpu.SemaphoreType.DMA(()),
        sem_k=pltpu.SemaphoreType.DMA(()),
    )


def _scatter_sorted(supd, skeys2d, starts, ends, R, Rt, U, n_sub,
                    interpret=False):
    n_chunks = R // Rt
    C = supd.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((Rt, C), lambda c, starts, ends: (c, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_kernel, Rt=Rt, U=U, n_sub=n_sub),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        interpret=interpret,
    )(starts, ends, supd, skeys2d)


def scatter_add_rows(updates: jax.Array, keys: jax.Array, n_rows: int,
                     *, chunk_rows: int = 128, sub_updates: int = 4096,
                     capacity_factor: float = 2.0,
                     interpret: bool = False) -> jax.Array:
    """sum-scatter `updates` (J, C) into an (n_rows, C) f32 table at row
    `keys` (J,) int32.  Exact (f32 accumulation); MXU-based."""
    J, C = updates.shape
    R = n_rows
    assert R % chunk_rows == 0 and sub_updates % _ALIGN == 0
    n_chunks = R // chunk_rows
    mean = J / n_chunks
    cap = int(capacity_factor * mean + 8 * (mean ** 0.5)) \
        + sub_updates + _ALIGN
    cap = -(-cap // sub_updates) * sub_updates  # round up to sub tile
    n_sub = cap // sub_updates

    # sort_key_val: sorted keys come out of the sort itself (a separate
    # keys[order] scalar re-gather measured 3.4 ms on v5e)
    skeys, order = jax.lax.sort_key_val(keys.astype(jnp.int32),
                                        jnp.arange(J, dtype=jnp.int32))
    supd = updates[order]
    # pad so every in-capacity window read is in bounds and lane-packable
    Jp = (-(-(J + cap) // _ALIGN)) * _ALIGN
    supd = jnp.pad(supd, ((0, Jp - J), (0, 0)))
    skeys_p = jnp.pad(skeys, (0, Jp - J), constant_values=R + 1)
    bounds = jnp.arange(n_chunks + 1, dtype=jnp.int32) * chunk_rows
    positions = jnp.searchsorted(skeys, bounds).astype(jnp.int32)
    counts = positions[1:] - positions[:-1]
    # align window starts down so DMA offsets satisfy the tiling rules;
    # ends stay TRUE positions (masking handles the pre-start spill-over)
    starts = (positions[:-1] // _ALIGN) * _ALIGN
    ends = positions[1:]

    def fast(_):
        return _scatter_sorted(supd, skeys_p.reshape(-1, _LANE), starts,
                               ends, R, chunk_rows, sub_updates, n_sub,
                               interpret=interpret)

    def slow(_):
        return jnp.zeros((R, C), jnp.float32).at[keys].add(
            updates.astype(jnp.float32))

    return jax.lax.cond(jnp.max(counts) <= cap - _ALIGN, fast, slow, None)
