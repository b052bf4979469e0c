"""Device banded-identity kernel vs the one-core host WFA route.

Fixture: n pairs of ~L bp sequences at ~6% divergence — the split
stage's alignment-identity workload.  Host comparator: the actual host
route (native WFA + gap-compressed identity, one core).  Device: warm
DeviceBandedIdentity.identities over the same pairs.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pairs(n, L, frac=0.06, seed=9):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        a = "".join("ACGT"[c] for c in rng.integers(0, 4, L))
        b = list(a)
        for i in rng.choice(L, int(L * frac), replace=False):
            b[i] = "ACGT"[rng.integers(0, 4)]
        for _ in range(2):
            p = rng.integers(0, len(b))
            del b[p]
        out.append((a, "".join(b)))
    return out


def rand_pairs(n, L, seed=4):
    rng = np.random.default_rng(seed)

    def rnd():
        return "".join("ACGT"[c] for c in rng.integers(0, 4, L))

    return [(rnd(), rnd()) for _ in range(n)]


def main():
    """Measured (2026-08-20, v5e): similar pairs n=1024 L=500 -> host
    WFA 0.19 s vs device 2.76 s (0.1x: WFA is O(s^2), tiny when pairs
    match); dissimilar n=256 L=500 -> 1.3x; dissimilar n=256 L=2000 ->
    72.9x (bounded WFA degenerates to O(L^2) per failed comparison,
    the banded DP stays O(L*B)).  The device route's domain is the
    heterogeneous deep block, where most greedy-cluster comparisons
    FAIL and each failure costs the host route its full score bound."""
    from smoothxg_tpu.ops.ident_jax import DeviceBandedIdentity
    from smoothxg_tpu.ops.wfa import gap_compressed_identity, wfa_align

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    if len(sys.argv) > 3 and sys.argv[3] == "rand":
        ps = rand_pairs(n, L)
    else:
        ps = pairs(n, L)

    t0 = time.time()
    host = []
    for a, b in ps:
        sc, cig = wfa_align(a, b, max_score=len(a))
        host.append(gap_compressed_identity(cig)
                    if sc is not None and sc < len(a) else 0.0)
    t_host = time.time() - t0

    dev = DeviceBandedIdentity()
    ms = [len(a) for a, _ in ps]
    dev.identities(ps, max_score=ms)
    t0 = time.time()
    got = dev.identities(ps, max_score=ms)
    t_dev = time.time() - t0
    err = max(abs(g - h) for g, h in zip(got, host))
    print(f"n={n} L={L}: host(native WFA) 1-core {t_host:.2f}s | "
          f"device warm {t_dev:.2f}s -> speedup {t_host / t_dev:.1f}x | "
          f"max |banded - wfa| identity delta {err:.4f}", flush=True)


if __name__ == "__main__":
    main()
