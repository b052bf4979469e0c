"""Probe: is a Mosaic scalar loop of masked plane reads latency-bound?

Three kernels, each doing N masked (1,128)-row reads from a (VWr,128)
plane inside a fori_loop:
  chase : each read's row index depends on the previous read's value
          (pointer chase — worst case, nothing can overlap)
  indep : row index is i % VWr (independent — hardware can pipeline)
  indep4: 4 independent reads per iteration (N/4 iterations — tests
          whether more independent work per iteration hides latency)

If indep ~= chase, per-read latency dominates and interleaving K blocks
per grid step will NOT help; if indep << chase, restructuring the fused
kernel for independent addressing / K-way interleave is the right lever.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    reps = 5
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from smoothxg_tpu.ops.poa_jax import ensure_backend
    ensure_backend()

    VWr = 32
    DT = jnp.int32

    def mk(kind):
        def kernel(inp, out):
            lane128 = jax.lax.broadcasted_iota(DT, (1, 128), 1)

            def pread(v):
                row = inp[pl.ds(v // 128, 1), :]
                return jnp.max(jnp.where(lane128 == (v % 128), row,
                                         -(1 << 30)))

            if kind == "chase":
                def body(i, v):
                    return pread(v)
                acc = jax.lax.fori_loop(0, N, body, jnp.int32(0))
            elif kind == "indep":
                def body(i, acc):
                    return acc + pread(i % (VWr * 128))
                acc = jax.lax.fori_loop(0, N, body, jnp.int32(0))
            else:                      # indep4
                def body(i, acc):
                    j = 4 * i
                    M = VWr * 128
                    return (acc + pread(j % M) + pread((j + 1) % M)
                            + pread((j + 2) % M) + pread((j + 3) % M))
                acc = jax.lax.fori_loop(0, N // 4, body, jnp.int32(0))
            out[:, :] = jnp.full((1, 128), acc, DT)

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
        )

    x = np.arange(VWr * 128, dtype=np.int32).reshape(VWr, 128) % 7
    xj = jnp.asarray(x)
    for kind in ("chase", "indep", "indep4"):
        fn = jax.jit(mk(kind))
        t0 = time.time()
        np.asarray(fn(xj))
        comp = time.time() - t0
        ts = []
        for _ in range(reps):
            t0 = time.time()
            np.asarray(fn(xj))
            ts.append(time.time() - t0)
        per = min(ts) / N * 1e9
        print(f"{kind}: compile={comp:.1f}s warm={min(ts)*1e3:.2f}ms "
              f"per-read={per:.0f}ns", flush=True)


if __name__ == "__main__":
    main()
