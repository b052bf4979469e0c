"""Deep-block fixture: device all-pairs mash matrix vs one host core.

Fixture: n mutated copies of one sequence (a deep block after dedup) —
the shape where the reference's greedy clusterer goes mash-based
(src/breaks.cpp:447-464).  Host comparator: uint64 kmer_hashes once per
seq + mash_distance per pair (exactly what _split_block does on the
host route).  Device: DeviceMinHash.distance_matrix, warm (second call).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def family(n, L, frac=0.06, seed=3):
    rng = np.random.default_rng(seed)
    base = "".join("ACGT"[c] for c in rng.integers(0, 4, L))
    out = [base]
    for _ in range(n - 1):
        s = list(base)
        for i in rng.choice(L, int(L * frac), replace=False):
            s[i] = "ACGT"[rng.integers(0, 4)]
        out.append("".join(s))
    return out


def main():
    from smoothxg_tpu.ops.minhash import kmer_hashes, mash_distance
    from smoothxg_tpu.ops.minhash_jax import DeviceMinHash

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 700
    seqs = family(n, L)
    npairs = n * (n - 1) // 2

    t0 = time.time()
    hs = [kmer_hashes(s, 17) for s in seqs]
    t_hash = time.time() - t0
    t0 = time.time()
    dm_host = np.zeros((n, n))
    for i in range(n):
        for j in range(i + 1, n):
            dm_host[i, j] = mash_distance(hs[i], hs[j], 17)
    t_host = time.time() - t0 + t_hash

    dm = DeviceMinHash(k=16)
    t0 = time.time()
    dm.distance_matrix(seqs)
    t_cold = time.time() - t0
    t0 = time.time()
    got = dm.distance_matrix(seqs)
    t_dev = time.time() - t0
    # sanity vs the uint64 route: same matrix up to hash collisions
    err = np.abs(got[:n, :n] - (dm_host + dm_host.T)).max()
    print(f"n={n} L={L} pairs={npairs}: host 1-core {t_host:.2f}s "
          f"({t_hash:.2f}s hashing) | device warm {t_dev:.2f}s "
          f"(cold {t_cold:.1f}s) -> speedup {t_host / t_dev:.1f}x | "
          f"max |d32-d64| {err:.4f}", flush=True)


if __name__ == "__main__":
    main()
