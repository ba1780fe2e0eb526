"""Probe: which dynamic-gather forms does Mosaic accept on this TPU?

Feasibility test for a fused InfoNCE scoring kernel that keeps the whole
(B*S, C) z table in VMEM and gathers candidate rows/score columns
in-kernel (docs/PERFORMANCE.md round-1 item 3 follow-up).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    try:
        out = fn()
        out = np.asarray(out)
        print(f"{name}: OK {out.shape} {out.dtype}", flush=True)
        return out
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
        return None


def main():
    # 1. take_along_axis along lanes (last dim), 2-D
    def k1(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=-1)

    x = jnp.arange(8 * 512, dtype=jnp.float32).reshape(8, 512)
    idx = jnp.asarray(np.random.RandomState(0).randint(0, 512, (8, 128)),
                      jnp.int32)

    def run1():
        return pl.pallas_call(
            k1, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)
    r = probe("take_along_axis lanes (8,512)->(8,128)", run1)
    if r is not None:
        exp = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=-1)
        print("   correct:", np.array_equal(r, exp))

    # 2. take_along_axis along sublanes (row gather)
    def k2(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

    idx2 = jnp.asarray(np.random.RandomState(1).randint(0, 8, (8, 512)),
                       jnp.int32)

    def run2():
        return pl.pallas_call(
            k2, out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx2)
    r = probe("take_along_axis sublanes (8,512)", run2)
    if r is not None:
        exp = np.take_along_axis(np.asarray(x), np.asarray(idx2), axis=0)
        print("   correct:", np.array_equal(r, exp))

    # 3. jnp.take of full rows by dynamic 1-D index vector (row gather from
    #    a (4096, 256) table)
    def k3(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], i_ref[0, :], axis=0)

    tbl = jnp.asarray(np.random.RandomState(2).randn(4096, 256), jnp.float32)
    ridx = jnp.asarray(np.random.RandomState(3).randint(0, 4096, (1, 128)),
                       jnp.int32)

    def run3():
        return pl.pallas_call(
            k3, out_shape=jax.ShapeDtypeStruct((128, 256), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tbl, ridx)
    r = probe("row take (4096,256)[idx(128)]", run3)
    if r is not None:
        exp = np.asarray(tbl)[np.asarray(ridx)[0]]
        print("   correct:", np.array_equal(r, exp))

    # 4. per-row dynamic slice loop (fori + pl.ds row read)
    def k4(x_ref, i_ref, o_ref):
        def body(n, _):
            j = i_ref[0, n]
            o_ref[pl.ds(n, 1), :] = x_ref[pl.ds(j, 1), :]
            return 0
        jax.lax.fori_loop(0, 128, body, 0)

    def run4():
        return pl.pallas_call(
            k4, out_shape=jax.ShapeDtypeStruct((128, 256), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tbl, ridx)
    r = probe("fori dynamic-slice rows", run4)
    if r is not None:
        exp = np.asarray(tbl)[np.asarray(ridx)[0]]
        print("   correct:", np.array_equal(r, exp))

    # 5. 3-D take_along_axis along lanes (TB, S, 4096) -> (TB, S, 128)
    def k5(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=-1)

    x5 = jnp.asarray(np.random.RandomState(4).randn(4, 8, 512), jnp.float32)
    i5 = jnp.asarray(np.random.RandomState(5).randint(0, 512, (4, 8, 128)),
                     jnp.int32)

    def run5():
        return pl.pallas_call(
            k5, out_shape=jax.ShapeDtypeStruct((4, 8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x5, i5)
    r = probe("take_along_axis 3-D lanes", run5)
    if r is not None:
        exp = np.take_along_axis(np.asarray(x5), np.asarray(i5), axis=-1)
        print("   correct:", np.array_equal(r, exp))


def main2():
    """Sublane take_along_axis beyond one vreg: row-gather from a
    (4096, 256) VMEM table via idx broadcast along lanes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tbl = jnp.asarray(np.random.RandomState(2).randn(4096, 256), jnp.float32)
    idx = jnp.asarray(np.random.RandomState(9).randint(0, 4096, (512, 1)),
                      jnp.int32)

    def k6(x_ref, i_ref, o_ref):
        ib = jnp.broadcast_to(i_ref[:], (512, 256))
        o_ref[:] = jnp.take_along_axis(x_ref[:], ib, axis=0)

    def run6():
        return pl.pallas_call(
            k6, out_shape=jax.ShapeDtypeStruct((512, 256), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tbl, idx)
    r = probe("sublane take_along_axis (4096,256)[idx 512]", run6)
    if r is not None:
        exp = np.asarray(tbl)[np.asarray(idx)[:, 0]]
        print("   correct:", np.array_equal(r, exp))


if __name__ == "__main__":
    import sys
    main2() if "2" in sys.argv[1:] else main()
