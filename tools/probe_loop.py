"""Decompose Mosaic scalar-loop costs: loop overhead vs op cost vs unroll.

Cases (each a tiny pallas kernel, N iterations):
  empty        : fori_loop body = SREG arithmetic only
  empty_u8     : same with unroll=8
  smem_chase   : dependent SMEM scalar reads (SZ=4096)
  smem_u8      : same with unroll=8
  smem_big     : SMEM chase at SZ=32768 (capacity probe)
  slab         : dynamic-sublane (8,256) VMEM slab read + vector add
  slab_u8      : same with unroll=8
  mwrite       : masked (1,128) VMEM row write per iteration
  mread_u8     : masked VMEM lane read with unroll=8

Interpretation:
  empty per-iter ~= loop overhead.  If unroll removes it, hot loops get
  unroll.  If smem ops are cheap after subtracting overhead, node metadata
  moves to SMEM.  slab cost bounds the fill's HH/EE access floor.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def bench(name, fn, args, n_ops, reps=5):
    try:
        t0 = time.time()
        np.asarray(fn(*args))
        comp = time.time() - t0
        ts = []
        for _ in range(reps):
            t0 = time.time()
            np.asarray(fn(*args))
            ts.append(time.time() - t0)
        per = min(ts) / n_ops * 1e9
        print(f"{name:12s}: compile={comp:5.1f}s warm={min(ts)*1e3:7.2f}ms "
              f"per-op={per:6.0f}ns", flush=True)
    except Exception as e:
        print(f"{name:12s}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from smoothxg_tpu.ops.poa_jax import ensure_backend
    ensure_backend()
    DT = jnp.int32

    # --- empty loops ---
    def mk_empty(unroll):
        def kernel(out):
            def body(i, v):
                return (v * 5 + 1) & 0xFFFF
            acc = jax.lax.fori_loop(0, N, body, jnp.int32(1),
                                    unroll=unroll)
            out[:, :] = jnp.full((1, 128), acc, DT)
        return jax.jit(pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((1, 128), DT)))

    bench("empty", mk_empty(1), (), N)
    bench("empty_u8", mk_empty(8), (), N)

    # --- SMEM scalar chase ---
    def mk_smem(SZ, unroll):
        def kernel(out, sm):
            def init(i, _):
                sm[i] = (i * 97 + 13) % SZ
                return 0
            jax.lax.fori_loop(0, SZ, init, 0)

            def body(i, v):
                return sm[v]
            acc = jax.lax.fori_loop(0, N, body, jnp.int32(0),
                                    unroll=unroll)
            out[:, :] = jnp.full((1, 128), acc, DT)
        return jax.jit(pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((1, 128), DT),
            scratch_shapes=[pltpu.SMEM((SZ,), DT)]))

    bench("smem_chase", mk_smem(4096, 1), (), N)
    bench("smem_u8", mk_smem(4096, 8), (), N)
    bench("smem_32k", mk_smem(32768, 1), (), N)

    # --- dynamic-sublane slab read (the HH/EE fill pattern) ---
    def mk_slab(unroll):
        def kernel(inp, out):
            def body(i, acc):
                return acc + inp[pl.ds(8 * (i % 512), 8), :]
            acc = jax.lax.fori_loop(0, N, body,
                                    jnp.zeros((8, 256), DT), unroll=unroll)
            out[:, :] = acc[0:1, 0:128]
        return jax.jit(pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((1, 128), DT)))

    x = np.arange(4096 * 256, dtype=np.int32).reshape(4096, 256) % 11
    xj = jnp.asarray(x)
    bench("slab", mk_slab(1), (xj,), N)
    bench("slab_u8", mk_slab(8), (xj,), N)

    # --- masked row write ---
    def mk_mwrite():
        def kernel(out, pln):
            lane128 = jax.lax.broadcasted_iota(DT, (1, 128), 1)

            def body(i, acc):
                v = (i * 13) % 4096
                r = v // 128
                m = lane128 == (v % 128)
                row = pln[pl.ds(r, 1), :]
                pln[pl.ds(r, 1), :] = jnp.where(m, acc, row)
                return acc + 1
            acc = jax.lax.fori_loop(0, N, body, jnp.int32(0))
            out[:, :] = pln[0:1, :] + acc
        return jax.jit(pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((1, 128), DT),
            scratch_shapes=[pltpu.VMEM((32, 128), DT)]))

    bench("mwrite", mk_mwrite(), (), N)

    # --- masked lane read, unrolled ---
    def mk_mread(unroll):
        def kernel(inp, out):
            lane128 = jax.lax.broadcasted_iota(DT, (1, 128), 1)

            def body(i, acc):
                v = (i * 13) % 4096
                row = inp[pl.ds(v // 128, 1), :]
                return acc + jnp.max(jnp.where(lane128 == (v % 128), row,
                                               -(1 << 30)))
            acc = jax.lax.fori_loop(0, N, body, jnp.int32(0),
                                    unroll=unroll)
            out[:, :] = jnp.full((1, 128), acc, DT)
        return jax.jit(pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((1, 128), DT)))

    y = np.arange(32 * 128, dtype=np.int32).reshape(32, 128) % 7
    yj = jnp.asarray(y)
    bench("mread_u8", mk_mread(8), (yj,), N)


if __name__ == "__main__":
    main()
