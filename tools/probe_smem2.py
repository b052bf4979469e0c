"""Probe: (a) SMEM capacity with the fused-kernel's target scratch layout,
(b) SMEM read-modify-write slope, (c) masked VMEM row-write slope,
(d) mixed body: SMEM ops + slab read + vector ops (fill-row candidate)."""
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
        print(f"{name:14s}: slope={per:6.1f}ns/op floor="
              f"{(t1 - per * N1 * 1e-9) * 1e3:6.2f}ms", flush=True)
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
    VW = 4096

    # (a) capacity: bpp/ring/nxt/npred/nsucc (VW each) + preds (VW*8)
    #     + tgt/path (2048 each) = 56K words = 224KB
    def mk_cap(N):
        def kernel(out, bpp, ring, nxt, npred, nsucc, preds, tgt, path):
            def init(i, _):
                bpp[i] = i
                ring[i] = i
                nxt[i] = i + 1
                npred[i] = 1
                nsucc[i] = 1
                preds[i] = i
                return 0
            jax.lax.fori_loop(0, VW, init, 0)

            def body(i, v):
                j = v & (VW - 1)
                w = bpp[j] + ring[j] + nxt[j] + npred[j] + preds[j]
                nsucc[j] = w & 0xFF
                return (v * 5 + w) & 0xFFFF
            acc = jax.lax.fori_loop(0, N, body, jnp.int32(1))
            out[:, :] = jnp.full((1, 128), acc + nsucc[0], DT)
        return jax.jit(pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((1, 128), DT),
            scratch_shapes=[pltpu.SMEM((VW,), DT)] * 5
            + [pltpu.SMEM((VW * 8,), DT), pltpu.SMEM((2048,), DT),
               pltpu.SMEM((2048,), DT)]))

    slope("cap_224KB", mk_cap)

    # (b) SMEM rmw
    def mk_rmw(N):
        SZ = 4096
        def kernel(out, sm):
            def init(i, _):
                sm[i] = i % 7
                return 0
            jax.lax.fori_loop(0, SZ, init, 0)
            def body(i, acc):
                j = i & (SZ - 1)
                v = sm[j]
                sm[j] = v + 1
                return acc + v
            acc = jax.lax.fori_loop(0, N, body, jnp.int32(0))
            out[:, :] = jnp.full((1, 128), acc, DT)
        return jax.jit(pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((1, 128), DT),
            scratch_shapes=[pltpu.SMEM((4096,), DT)]))

    slope("smem_rmw", mk_rmw)

    # (c) masked VMEM row write (scalar -> lane blend)
    def mk_mwrite(N):
        def kernel(out, pln):
            lane128 = jax.lax.broadcasted_iota(DT, (1, 128), 1)
            def body(i, acc):
                v = (i * 13) & 4095
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

    slope("mwrite", mk_mwrite)

    # (d) fill-row candidate body: 4 SMEM reads + 1 SMEM write + slab read
    #     + ~25 vector ops on (8,256) + slab write
    def mk_fillrow(N):
        def kernel(inp, out, sm, hh):
            def init(i, _):
                sm[i] = (i * 97 + 13) & 4095
                return 0
            jax.lax.fori_loop(0, 4096, init, 0)

            def body(i, st):
                v, acc = st
                a = sm[v]
                b = sm[(v + 1) & 4095]
                c = sm[(v + 2) & 4095]
                sm[(v + 3) & 4095] = a + 1
                x = inp[pl.ds(8 * (a % 512), 8), :]
                y = hh[pl.ds(8 * (b & 255), 8), :]
                for _ in range(6):
                    x = jnp.maximum(x, acc) + 1
                    acc = jnp.where(x > acc, x - 3, acc + y)
                hh[pl.ds(8 * (c & 255), 8), :] = acc
                return (sm[v], acc)
            _, acc = jax.lax.fori_loop(
                0, N, body, (jnp.int32(0), jnp.zeros((8, 256), DT)))
            out[:, :] = acc[0:1, 0:128]
        return jax.jit(pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((1, 128), DT),
            scratch_shapes=[pltpu.SMEM((4096,), DT),
                            pltpu.VMEM((2048, 256), DT)]))

    xs = jnp.asarray((np.arange(4096 * 256, dtype=np.int32)
                      .reshape(4096, 256)) % 11)
    slope("fillrow", mk_fillrow, (xs,))


if __name__ == "__main__":
    main()
