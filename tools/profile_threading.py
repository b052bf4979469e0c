"""Attribute fused-kernel threading cost by workload composition.

Reuses the already-compiled (VW, LW, RW, local, B) stage-0 variant on
synthetic blocks:
  A: R identical sequences      -> pure reuse path (hit0 every position)
  C: 5% substitutions           -> realistic mix (some ring scans/creations)
  B: random sequences           -> worst case (ring scan + node + edge per pos)

Usage: python tools/profile_threading.py [R] [L] [reps]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def pack(blocks, B, VW, LW, RW, FOLD):
    nseq = np.zeros((B, 1, 1), np.int32)
    par = np.zeros((B, 1, 6), np.int32)
    slen = np.zeros((B, 1, 128), np.int16)
    seed = np.full((B, VW // 128, 128), -1, np.int8)
    seqs = np.full((B, RW, LW), -1, np.int8)
    for b, (sq, w, p) in enumerate(blocks):
        nseq[b, 0, 0] = len(sq)
        par[b, 0] = [p.m, p.n, p.g, p.e, p.q, p.c]
        for r, s in enumerate(sq):
            slen[b, 0, r] = len(s)
            seqs[b, r, 1:len(s) + 1] = s
        seed[b].reshape(-1)[:len(sq[0])] = sq[0]
    seqs = seqs.reshape(B, RW * FOLD, LW // FOLD)
    import jax.numpy as jnp
    return (jnp.asarray(nseq), jnp.asarray(par), jnp.asarray(slen),
            jnp.asarray(seed), jnp.asarray(seqs))


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    from smoothxg_tpu.ops.poa_host import POAParams
    from smoothxg_tpu.ops.poa_pallas_fused import (FOLD, FusedPallasEngine,
                                                   _compiled_fused)

    eng = FusedPallasEngine(max_batch=32)
    B, VW, LW, RW = 32, eng.VW, eng.LW, eng.RW
    params = POAParams(local=True)
    rng = np.random.default_rng(7)
    base = rng.integers(0, 4, size=L).astype(np.int8)

    def mutate(frac):
        s = base.copy()
        k = int(L * frac)
        ix = rng.choice(L, size=k, replace=False)
        s[ix] = (s[ix] + rng.integers(1, 4, size=k)) % 4
        return s

    cases = {
        "A_identical": [base.copy() for _ in range(R)],
        "C_mut5": [base] + [mutate(0.05) for _ in range(R - 1)],
        "B_random": [base] + [rng.integers(0, 4, size=L).astype(np.int8)
                              for _ in range(R - 1)],
    }
    fn = _compiled_fused(VW, LW, RW, True, False, B, 0)
    for name, sq in cases.items():
        blocks = [(sq, [1] * R, params)] * B
        args = pack(blocks, B, VW, LW, RW, FOLD)
        meta, exp, paths = fn(*args)
        np.asarray(meta)
        times = []
        for _ in range(reps):
            t0 = time.time()
            meta, exp, paths = fn(*args)
            m = np.asarray(meta)
            times.append(time.time() - t0)
        per_pos = min(times) / (B * (R - 1) * L) * 1e9
        print(f"{name}: warm={min(times)*1e3:.0f}ms  V={int(m[0,0])} "
              f"ovf={int(m[0,1])}  per-position={per_pos:.0f}ns", flush=True)


if __name__ == "__main__":
    main()
