"""Probe SMEM scalar access cost + feasible scratch sizes on the TPU.

Kernels allocate an SMEM int32 scratch of SZ words, initialize a stride
pattern, then do N dynamic scalar reads (chase = dependent, indep =
independent) and N/4 read+write round-trips.  Compares against the ~700ns
masked-VMEM pattern (tools/probe_scalar_latency.py).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    SZ = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    reps = 5
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from smoothxg_tpu.ops.poa_jax import ensure_backend
    ensure_backend()

    def mk(kind):
        def kernel(out, sm):
            def init(i, _):
                sm[i] = (i * 97 + 13) % SZ
                return 0

            jax.lax.fori_loop(0, SZ, init, 0)
            if kind == "chase":
                def body(i, v):
                    return sm[v]
                acc = jax.lax.fori_loop(0, N, body, jnp.int32(0))
            elif kind == "indep":
                def body(i, acc):
                    return acc + sm[i % SZ]
                acc = jax.lax.fori_loop(0, N, body, jnp.int32(0))
            else:                      # rmw: read-modify-write pairs
                def body(i, acc):
                    j = i % SZ
                    v = sm[j]
                    sm[j] = v + 1
                    return acc + v
                acc = jax.lax.fori_loop(0, N, body, jnp.int32(0))
            out[:, :] = jnp.full((1, 128), acc, jnp.int32)

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
            scratch_shapes=[pltpu.SMEM((SZ,), jnp.int32)],
        )

    for kind in ("chase", "indep", "rmw"):
        try:
            fn = jax.jit(mk(kind))
            t0 = time.time()
            np.asarray(fn())
            comp = time.time() - t0
            ts = []
            for _ in range(reps):
                t0 = time.time()
                np.asarray(fn())
                ts.append(time.time() - t0)
            per = min(ts) / N * 1e9
            print(f"SMEM[{SZ}] {kind}: compile={comp:.1f}s "
                  f"warm={min(ts)*1e3:.2f}ms per-op={per:.0f}ns", flush=True)
        except Exception as e:
            print(f"SMEM[{SZ}] {kind}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
