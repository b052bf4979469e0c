"""Probe for the round-3 stacked-block kernel plan (docs/DESIGN.md "Next
multiplier"): is a shift-max prefix step still issue-bound (timing-neutral)
when the tile stacks K blocks' rows — (K*8, 256) for K = 1, 2, 4, 8?

Each kernel runs N iterations of one cummax-style step (masked roll + max,
the fused kernel's dominant op) on a (K*8, 256) int32 plane held in VMEM
scratch.  Slope ns/op vs K tells us the free stacking factor.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from probe_loop2 import slope  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from smoothxg_tpu.ops.poa_jax import ensure_backend
    ensure_backend()
    DT = jnp.int32

    def mk_step(K):
        ROWS, LANES = 8 * K, 256

        def mk(N):
            def kernel(out, pl_buf):
                lanef = jax.lax.broadcasted_iota(DT, (ROWS, LANES), 1)
                pl_buf[:, :] = lanef

                def body(i, v):
                    x = pl_buf[:, :]
                    k = 1 + (i & 7)
                    r = pltpu.roll(x, 1, axis=1)
                    x = jnp.maximum(x, jnp.where(lanef >= k, r, -16000))
                    pl_buf[:, :] = x
                    return v + 1
                acc = jax.lax.fori_loop(0, N, body, jnp.int32(0))
                out[:, :] = jnp.full((1, 128), acc, DT) + pl_buf[0:1, 0:128]

            return jax.jit(pl.pallas_call(
                kernel, out_shape=jax.ShapeDtypeStruct((1, 128), DT),
                scratch_shapes=[pltpu.VMEM((ROWS, LANES), DT)]))
        return mk

    for K in (1, 2, 4, 8):
        slope(f"step K={K}", mk_step(K))


if __name__ == "__main__":
    main()
