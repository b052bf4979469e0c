"""DNA utilities: reverse complement with IUPAC support, byte encoding.

Equivalent capability to the reference's 256-entry complement tables
(reference: src/dna.cpp:5-62) but built on numpy byte tables so revcomp of
large sequences is a single vectorized gather.
"""
from __future__ import annotations

import numpy as np

# 256-entry complement table (IUPAC-aware, case-preserving).
_COMP = np.arange(256, dtype=np.uint8)
_pairs = {
    "A": "T", "T": "A", "C": "G", "G": "C", "U": "A",
    "R": "Y", "Y": "R", "S": "S", "W": "W", "K": "M", "M": "K",
    "B": "V", "V": "B", "D": "H", "H": "D", "N": "N",
}
for a, b in list(_pairs.items()):
    _COMP[ord(a)] = ord(b)
    _COMP[ord(a.lower())] = ord(b.lower())


def revcomp_bytes(seq: np.ndarray) -> np.ndarray:
    """Reverse complement of a uint8 byte array."""
    return _COMP[seq[::-1]]


def revcomp(seq: str | bytes) -> str:
    if isinstance(seq, str):
        seq = seq.encode()
    arr = np.frombuffer(seq, dtype=np.uint8)
    return revcomp_bytes(arr).tobytes().decode()


def encode_seq(seq: str | bytes) -> np.ndarray:
    """Encode a sequence as raw uint8 bytes (POA compares raw byte equality,
    like spoa does on raw chars)."""
    if isinstance(seq, str):
        seq = seq.encode()
    return np.frombuffer(seq, dtype=np.uint8).copy()


def decode_seq(arr: np.ndarray) -> str:
    return arr.tobytes().decode()
