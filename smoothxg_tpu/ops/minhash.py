"""k-mer hashing and mash distance estimation.

Equivalent capability to the reference's mkmh/rkmh MinHash dependency
(reference: src/breaks.cpp:378-399,451-456 and src/smooth.cpp:1978-1998 use
rkmh::hash_sequences + rkmh::compare to estimate pairwise identity).

We hash canonical k-mers with a 64-bit splitmix-style mixer over a rolling
2-bit encoding, keep the sorted hash set, and estimate distance with the
mash formula  d = -1/k * ln(2*j/(1+j))  where j is the Jaccard similarity
of the two hash sets.  numpy-vectorized; k-mer hashing of a whole block
batch is a natural JAX kernel later.
"""
from __future__ import annotations

import numpy as np

from ..utils.dna import revcomp

_BASE_CODE = np.full(256, 255, dtype=np.uint8)
for i, c in enumerate("ACGT"):
    _BASE_CODE[ord(c)] = i
    _BASE_CODE[ord(c.lower())] = i


def _mix64(x: np.ndarray) -> np.ndarray:
    # splitmix64 finalizer
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def kmer_hashes(seq: str | bytes, k: int) -> np.ndarray:
    """Sorted unique 64-bit hashes of canonical k-mers."""
    if isinstance(seq, str):
        seq = seq.encode()
    arr = _BASE_CODE[np.frombuffer(bytes(seq), dtype=np.uint8)]
    n = len(arr) - k + 1
    if n <= 0:
        return np.zeros(0, dtype=np.uint64)
    valid = arr != 255
    # rolling pack: kmer value as k 2-bit codes (k<=31)
    codes = arr.astype(np.uint64)
    fwd = np.zeros(n, dtype=np.uint64)
    rev = np.zeros(n, dtype=np.uint64)
    ok = np.ones(n, dtype=bool)
    for i in range(k):
        fwd = (fwd << np.uint64(2)) | codes[i:i + n]
        rev = rev | ((np.uint64(3) ^ codes[i:i + n]) << np.uint64(2 * i))
        ok &= valid[i:i + n]
    canon = np.minimum(fwd, rev)
    h = _mix64(canon[ok])
    return np.unique(h)


def mash_distance(h1: np.ndarray, h2: np.ndarray, k: int) -> float:
    """Mash distance between two sorted hash sets; 1.0 when disjoint/empty."""
    if len(h1) == 0 or len(h2) == 0:
        return 1.0
    inter = len(np.intersect1d(h1, h2, assume_unique=True))
    union = len(h1) + len(h2) - inter
    if inter == 0:
        return 1.0
    j = inter / union
    d = -np.log(2.0 * j / (1.0 + j)) / k
    return float(min(max(d, 0.0), 1.0))
