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


# ---------------------------------------------------------------------------
# Batched device route (SURVEY §7.5: "batched autocorrelation ... kernel").
#
# The device computes exact integer MATCH COUNTS per (sequence, lag) —
# a (G, B, L) compare/reduce scanned over the lag grid — and the float
# statistics (corr = count / window, mu/sd/z in float64) run on the host
# exactly as in `repeat` above, so results are BIT-IDENTICAL to the host
# oracle (counts are integers; no device float rounding can leak in).
# Worth dispatching when many oversized sequences screen at once at pod
# scale; the host loop stays the default (and the only route inside
# jax-free native-engine pool workers).
# ---------------------------------------------------------------------------

_JIT_CACHE: dict = {}


def _counts_fn(Lpad: int, G: int):
    key = (Lpad, G)
    fn = _JIT_CACHE.get(key)
    if fn is not None:
        return fn
    import jax
    import jax.numpy as jnp

    def counts(seqs, lens, lags):
        # seqs: (B, Lpad) uint8 (0-padded); lens: (B,); lags: (G,)
        pos = jnp.arange(Lpad, dtype=jnp.int32)[None, :]

        def one_lag(lag):
            sh = jnp.roll(seqs, -lag, axis=1)
            ok = (seqs == sh) & (pos + lag < lens[:, None])
            return jnp.sum(ok, axis=1, dtype=jnp.int32)

        return jax.lax.map(one_lag, lags).T      # (B, G)

    fn = jax.jit(counts)
    _JIT_CACHE[key] = fn
    return fn


def repeat_batch(seqs: list, min_lag: int, max_lag: int,
                 min_z: float = 5.0, stride: int = 50) -> list[Repeat]:
    """Batched `repeat` over many sequences in one device dispatch.
    Same per-sequence lag grid, windows, and z statistics as the host
    loop — bit-identical results (asserted in tests/test_poa.py)."""
    if not seqs:
        return []
    enc = []
    for s in seqs:
        if isinstance(s, str):
            s = s.encode()
        if isinstance(s, (bytes, bytearray)):
            s = np.frombuffer(bytes(s), dtype=np.uint8)
        enc.append(np.asarray(s, dtype=np.uint8))
    lens = np.array([len(s) for s in enc], dtype=np.int32)
    # shared lag grid: covers every sequence's range; per-sequence
    # validity masks off lags past its own hi = min(max_lag, n//2)
    hi_all = int(min(max_lag, int(lens.max()) // 2))
    if hi_all <= min_lag:
        return [Repeat(0.0, 0.0) for _ in enc]
    lags = np.arange(min_lag, hi_all + 1, max(stride, 1)).astype(np.int32)
    # pad to power-of-two-ish buckets to bound jit variants
    Lpad = 1 << int(np.ceil(np.log2(max(int(lens.max()), 256))))
    G = len(lags)
    buf = np.zeros((len(enc), Lpad), dtype=np.uint8)
    for i, s in enumerate(enc):
        buf[i, :len(s)] = s
    cnt = np.asarray(_counts_fn(Lpad, G)(buf, lens, lags))
    out: list[Repeat] = []
    for b in range(len(enc)):
        n = int(lens[b])
        hi = min(max_lag, n // 2)
        if hi <= min_lag:
            out.append(Repeat(0.0, 0.0))
            continue
        sel = lags <= hi
        if int(sel.sum()) < 3:
            out.append(Repeat(0.0, 0.0))
            continue
        windows = (n - lags[sel]).astype(np.float64)
        corrs = cnt[b, sel].astype(np.float64) / windows
        mu = corrs.mean()
        sd = corrs.std()
        if sd <= 0:
            out.append(Repeat(0.0, 0.0))
            continue
        z = (corrs - mu) / sd
        best = int(np.argmax(z))
        if z[best] >= min_z:
            out.append(Repeat(float(lags[sel][best]), float(z[best])))
        else:
            out.append(Repeat(0.0, float(z[best])))
    return out
