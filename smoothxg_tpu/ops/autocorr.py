"""Symbol autocorrelation VNTR period detection.

Equivalent capability to the reference's sautocorr dependency
(reference: src/breaks.cpp:218-264 calls sautocorr::repeat with
min/max copy length, a z-score threshold, and a lag stride).

For each candidate lag L (sampled every `stride` between min and max lag),
the autocorrelation is the fraction of matching symbols between seq[:-L] and
seq[L:].  A lag is reported as a repeat period when its z-score against the
distribution over all sampled lags is >= min_z; we return the best such lag.
Vectorized with numpy on the host: the screen runs once per oversized block
inside the (already pooled) break stage, where sequences are short and the
host cost is noise next to the POA fill (see DESIGN.md).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class Repeat:
    length: float
    z_score: float


def repeat(seq: np.ndarray | bytes | str,
           min_lag: int,
           max_lag: int,
           min_z: float = 5.0,
           stride: int = 50) -> Repeat:
    if isinstance(seq, str):
        seq = seq.encode()
    if isinstance(seq, (bytes, bytearray)):
        seq = np.frombuffer(bytes(seq), dtype=np.uint8)
    n = len(seq)
    hi = min(max_lag, n // 2)
    if hi <= min_lag:
        return Repeat(0.0, 0.0)
    lags = np.arange(min_lag, hi + 1, max(stride, 1))
    if len(lags) < 3:
        return Repeat(0.0, 0.0)
    corrs = np.empty(len(lags), dtype=np.float64)
    for i, lag in enumerate(lags):
        corrs[i] = float(np.mean(seq[:-lag] == seq[lag:]))
    mu = corrs.mean()
    sd = corrs.std()
    if sd <= 0:
        return Repeat(0.0, 0.0)
    z = (corrs - mu) / sd
    best = int(np.argmax(z))
    if z[best] >= min_z:
        return Repeat(float(lags[best]), float(z[best]))
    return Repeat(0.0, float(z[best]))
