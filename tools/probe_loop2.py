"""Slope-based loop-cost probe: run each kernel at two N, report
(slope ns/op, intercept ms).  Also manual 8x-unrolled bodies."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

N1, N2 = 65536, 524288


def measure(fn, args, reps=5):
    np.asarray(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(fn(*args))
        ts.append(time.time() - t0)
    return min(ts)


def slope(name, mk, args=()):
    try:
        t1 = measure(mk(N1), args)
        t2 = measure(mk(N2), args)
        per = (t2 - t1) / (N2 - N1) * 1e9
        inter = t1 - per * N1 * 1e-9
        print(f"{name:14s}: slope={per:6.1f}ns/op floor={inter*1e3:6.2f}ms "
              f"(t1={t1*1e3:.1f}ms t2={t2*1e3:.1f}ms)", flush=True)
    except Exception as e:
        print(f"{name:14s}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from smoothxg_tpu.ops.poa_jax import ensure_backend
    ensure_backend()
    DT = jnp.int32

    def mk_empty(N):
        def kernel(out):
            def body(i, v):
                return (v * 5 + 1) & 0xFFFF
            acc = jax.lax.fori_loop(0, N, body, jnp.int32(1))
            out[:, :] = jnp.full((1, 128), acc, DT)
        return jax.jit(pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((1, 128), DT)))

    def mk_smem(N):
        SZ = 4096
        def kernel(out, sm):
            def init(i, _):
                sm[i] = (i * 97 + 13) % SZ
                return 0
            jax.lax.fori_loop(0, SZ, init, 0)
            def body(i, v):
                return sm[v]
            acc = jax.lax.fori_loop(0, N, body, jnp.int32(0))
            out[:, :] = jnp.full((1, 128), acc, DT)
        return jax.jit(pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((1, 128), DT),
            scratch_shapes=[pltpu.SMEM((SZ,), DT)]))

    def mk_smem_u8(N):
        SZ = 4096
        def kernel(out, sm):
            def init(i, _):
                sm[i] = (i * 97 + 13) % SZ
                return 0
            jax.lax.fori_loop(0, SZ, init, 0)
            def body(i, v):
                for _ in range(8):
                    v = sm[v]
                return v
            acc = jax.lax.fori_loop(0, N // 8, body, jnp.int32(0))
            out[:, :] = jnp.full((1, 128), acc, DT)
        return jax.jit(pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((1, 128), DT),
            scratch_shapes=[pltpu.SMEM((SZ,), DT)]))

    def mk_mread(N):
        def kernel(inp, out):
            lane128 = jax.lax.broadcasted_iota(DT, (1, 128), 1)
            def body(i, acc):
                v = (i * 13) % 4096
                row = inp[pl.ds(v // 128, 1), :]
                return acc + jnp.max(jnp.where(lane128 == (v % 128), row,
                                               -(1 << 30)))
            acc = jax.lax.fori_loop(0, N, body, jnp.int32(0))
            out[:, :] = jnp.full((1, 128), acc, DT)
        return jax.jit(pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((1, 128), DT)))

    def mk_mread_u8(N):
        def kernel(inp, out):
            lane128 = jax.lax.broadcasted_iota(DT, (1, 128), 1)
            def body(i, acc):
                for k in range(8):
                    v = (i * 8 + k) * 13 % 4096
                    row = inp[pl.ds(v // 128, 1), :]
                    acc = acc + jnp.max(jnp.where(lane128 == (v % 128), row,
                                                  -(1 << 30)))
                return acc
            acc = jax.lax.fori_loop(0, N // 8, body, jnp.int32(0))
            out[:, :] = jnp.full((1, 128), acc, DT)
        return jax.jit(pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((1, 128), DT)))

    def mk_chase(N):
        def kernel(inp, out):
            lane128 = jax.lax.broadcasted_iota(DT, (1, 128), 1)
            def body(i, v):
                row = inp[pl.ds(v // 128, 1), :]
                return jnp.max(jnp.where(lane128 == (v % 128), row,
                                         -(1 << 30)))
            acc = jax.lax.fori_loop(0, N, body, jnp.int32(0))
            out[:, :] = jnp.full((1, 128), acc, DT)
        return jax.jit(pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((1, 128), DT)))

    def mk_slab_u8(N):
        def kernel(inp, out):
            def body(i, acc):
                for k in range(8):
                    acc = acc + inp[pl.ds(8 * ((i * 8 + k) % 512), 8), :]
                return acc
            acc = jax.lax.fori_loop(0, N // 8, body,
                                    jnp.zeros((8, 256), DT))
            out[:, :] = acc[0:1, 0:128]
        return jax.jit(pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((1, 128), DT)))

    def mk_vecrow(N):
        # representative fill-row body: slab read + ~20 vector ops on (8,256)
        def kernel(inp, out):
            def body(i, acc):
                x = inp[pl.ds(8 * (i % 512), 8), :]
                for _ in range(5):
                    x = jnp.maximum(x, acc) + 1
                    acc = jnp.where(x > acc, x - 3, acc)
                return acc
            acc = jax.lax.fori_loop(0, N, body, jnp.zeros((8, 256), DT))
            out[:, :] = acc[0:1, 0:128]
        return jax.jit(pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((1, 128), DT)))

    x7 = jnp.asarray(np.arange(32 * 128, dtype=np.int32).reshape(32, 128) % 7)
    xs = jnp.asarray((np.arange(4096 * 256, dtype=np.int32)
                      .reshape(4096, 256)) % 11)
    slope("empty", mk_empty)
    slope("smem_chase", mk_smem)
    slope("smem_chase_u8", mk_smem_u8)
    slope("mread", mk_mread, (x7,))
    slope("mread_u8", mk_mread_u8, (x7,))
    slope("mchase", mk_chase, (x7,))
    slope("slab_u8", mk_slab_u8, (xs,))
    slope("vecrow", mk_vecrow, (xs,))


if __name__ == "__main__":
    main()
