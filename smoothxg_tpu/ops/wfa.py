"""Bounded affine wavefront alignment (WFA) with gap-compressed identity.

Equivalent capability to the reference's WFA dependency (reference:
src/breaks.cpp:186-196,474-502 uses bounded reduced WFA with penalties
{match 0, mismatch 7, gap_open 11, gap_ext 1} to compute a gap-compressed
identity for block splitting, bailing out when the score exceeds a bound).

The wavefront recurrences operate per score over diagonals and are fully
numpy-vectorized across each wavefront.  Traceback over the stored
wavefronts recovers the alignment classes (M/X/I/D) from which the
gap-compressed identity (matches / (matches+mismatches+gap_openings)) is
computed.
"""
from __future__ import annotations

import numpy as np

NEG = np.iinfo(np.int32).min // 2

_NATIVE = None
_NATIVE_TRIED = False


def _native_lib():
    """Load native/libwfa.so (same algorithm in C++, fuzz-verified
    identical); None when unavailable — callers fall back to the numpy
    route below."""
    global _NATIVE, _NATIVE_TRIED
    if _NATIVE is not None or _NATIVE_TRIED:
        return _NATIVE
    _NATIVE_TRIED = True
    import ctypes
    import os
    d = os.environ.get("SMOOTHXG_NATIVE_DIR")
    if not d:
        d = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), "native")
    path = os.path.join(d, "libwfa.so")
    if not os.path.exists(path):
        try:
            import subprocess
            subprocess.run(["make", "-C", os.path.dirname(path)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    i64 = ctypes.c_int64
    lib.wfa_align_c.restype = i64
    lib.wfa_align_c.argtypes = [
        ctypes.c_char_p, i64, ctypes.c_char_p, i64,
        i64, i64, i64, i64, i64, i64,
        ctypes.c_char_p, ctypes.POINTER(i64)]
    _NATIVE = lib
    return _NATIVE


class _WF:
    __slots__ = ("lo", "hi", "m", "i", "d")

    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi
        n = hi - lo + 1
        self.m = np.full(n, NEG, dtype=np.int64)
        self.i = np.full(n, NEG, dtype=np.int64)
        self.d = np.full(n, NEG, dtype=np.int64)

    def get(self, which: str, k: np.ndarray | int) -> np.ndarray:
        arr = getattr(self, which)
        idx = np.asarray(k) - self.lo
        idx = np.asarray(idx)
        ok = (idx >= 0) & (idx < len(arr))
        out = np.full(np.shape(idx), NEG, dtype=np.int64)
        out[ok] = arr[idx[ok]]
        return out


_EXT_CHUNK = 16


def _extend(m: np.ndarray, ks: np.ndarray, a: np.ndarray,
            b: np.ndarray) -> np.ndarray:
    """Greedy diagonal extension: m holds offsets (position in a).

    Vectorized across the wavefront's active diagonals: each pass gathers
    a 16-byte window per diagonal and counts its leading matches; only
    diagonals whose whole window matched survive to the next pass.  The
    sequences are padded with two DIFFERENT sentinels so the h==la /
    v==lb stop conditions fall out of the comparison itself (the
    reference's extension is a per-diagonal scalar loop,
    src/breaks.cpp:474-502 via wfa::WFAlignerGapAffine)."""
    out = m.copy()
    idx = np.nonzero(out > NEG // 2)[0]
    if len(idx) == 0:
        return out
    C = _EXT_CHUNK
    ap = np.empty(len(a) + C, np.int16)
    ap[:len(a)] = a
    ap[len(a):] = 256
    bp = np.empty(len(b) + C, np.int16)
    bp[:len(b)] = b
    bp[len(b):] = 257
    h = out[idx].astype(np.int64)
    v = h - ks[idx]
    win = np.arange(C)
    while len(idx):
        eq = ap[h[:, None] + win] == bp[v[:, None] + win]
        full = eq.all(axis=1)
        ml = np.where(full, C, np.argmin(eq, axis=1))
        h = h + ml
        out[idx] = h
        idx = idx[full]
        h = h[full]
        v = v[full] + C
    return out


def wfa_align(a_str: str | bytes, b_str: str | bytes,
              mismatch: int = 7, gap_open: int = 11, gap_ext: int = 1,
              max_score: int | None = None,
              min_wavefront_length: int = 10,
              max_distance_threshold: int = 50,
              force_python: bool = False):
    """Align a vs b with affine-gap WFA. Returns (score, cigar_ops) where
    cigar_ops is a string over M/X/I/D, or (None, None) if max_score exceeded.
    Diagonal k = h - v (position in a minus position in b).

    Wavefronts longer than min_wavefront_length are adaptively REDUCED:
    boundary diagonals whose remaining distance to the target cell lags
    the best diagonal by more than max_distance_threshold are trimmed —
    the reference's "bounded reduced WFA" heuristic (src/breaks.cpp:
    474-502; WFA-adaptive defaults 10/50).  Pass
    max_distance_threshold=0 to disable and get exact WFA.

    Runs on the native C++ tier (native/wfa.cpp — the reference links
    native WFA too) when built; this module is the oracle/fallback.
    Set force_python=True to pin the numpy route (parity tests)."""
    if not force_python:
        lib = _native_lib()
        if lib is not None:
            import ctypes
            ab = a_str.encode() if isinstance(a_str, str) else bytes(a_str)
            bb = b_str.encode() if isinstance(b_str, str) else bytes(b_str)
            cap = len(ab) + len(bb) + 1
            buf = ctypes.create_string_buffer(cap)
            clen = ctypes.c_int64(0)
            sc = lib.wfa_align_c(
                ab, len(ab), bb, len(bb),
                mismatch, gap_open, gap_ext,
                -1 if max_score is None else max_score,
                min_wavefront_length, max_distance_threshold,
                buf, ctypes.byref(clen))
            if sc < 0:
                return None, None
            return int(sc), buf.raw[:clen.value].decode()
    a = np.frombuffer(a_str.encode() if isinstance(a_str, str) else bytes(a_str), np.uint8)
    b = np.frombuffer(b_str.encode() if isinstance(b_str, str) else bytes(b_str), np.uint8)
    la, lb = len(a), len(b)
    k_final = la - lb
    off_final = la
    if max_score is None:
        max_score = mismatch * max(la, lb)

    wfs: dict[int, _WF] = {}
    w0 = _WF(0, 0)
    w0.m[0] = 0
    w0.m[0] = _extend(w0.m[:1], np.array([0]), a, b)[0]
    wfs[0] = w0
    if w0.m[0] >= off_final and k_final == 0:
        return 0, "M" * la

    for s in range(1, max_score + 1):
        src_x = wfs.get(s - mismatch)
        src_o = wfs.get(s - gap_open - gap_ext)
        src_e = wfs.get(s - gap_ext)
        if src_x is None and src_o is None and src_e is None:
            continue
        los, his = [], []
        for w in (src_x, src_o, src_e):
            if w is not None:
                los.append(w.lo)
                his.append(w.hi)
        lo, hi = min(los) - 1, max(his) + 1
        w = _WF(lo, hi)
        ks = np.arange(lo, hi + 1)
        # I (insertion in a: h advances) from k-1; D from k+1
        i_from_m = src_o.get("m", ks - 1) if src_o is not None else np.full(len(ks), NEG)
        i_from_i = src_e.get("i", ks - 1) if src_e is not None else np.full(len(ks), NEG)
        w.i = np.maximum(i_from_m, i_from_i) + 1
        w.i[w.i <= NEG // 2] = NEG
        d_from_m = src_o.get("m", ks + 1) if src_o is not None else np.full(len(ks), NEG)
        d_from_d = src_e.get("d", ks + 1) if src_e is not None else np.full(len(ks), NEG)
        w.d = np.maximum(d_from_m, d_from_d)
        w.d[w.d <= NEG // 2] = NEG
        x_from_m = src_x.get("m", ks) if src_x is not None else np.full(len(ks), NEG)
        xm = x_from_m + 1
        xm[x_from_m <= NEG // 2] = NEG
        w.m = np.maximum.reduce([xm, w.i, w.d])
        # clip to valid cells: h <= la, v = h-k <= lb
        hs = w.m
        valid = (hs > NEG // 2) & (hs <= la) & (hs - ks <= lb) & (hs >= 0) & (hs - ks >= 0)
        w.m = np.where(valid, w.m, NEG)
        w.m = _extend(w.m, ks, a, b)
        wfs[s] = w
        if lo <= k_final <= hi and w.m[k_final - lo] >= off_final:
            return s, _traceback(wfs, s, k_final, a, b, mismatch, gap_open, gap_ext)
        if max_distance_threshold and len(ks) > min_wavefront_length:
            _reduce(w, ks, la, lb, max_distance_threshold)
    return None, None


def _reduce(w: _WF, ks: np.ndarray, la: int, lb: int, thr: int) -> None:
    """Adaptive wavefront reduction: NEG out boundary diagonals whose
    remaining distance to (la, lb) exceeds the wavefront's best by thr.
    Only the M offsets drive the distance (matching WFA-adaptive); the
    trim zeroes boundary entries in place so later wavefronts stop
    growing from them."""
    live = w.m > NEG // 2
    if not live.any():
        return
    h = np.where(live, w.m, 0)
    d = np.where(live, (la - h) + (lb - (h - ks)), 1 << 60)
    lim = d.min() + thr
    drop = d > lim
    # trim only a contiguous prefix/suffix (keeps wavefronts compact
    # without punching interior holes, as WFA-adaptive does), and SLICE
    # the arrays so later wavefronts stop growing from trimmed diagonals
    n = len(ks)
    i = int(np.argmin(drop))            # first kept
    j = n - 1 - int(np.argmin(drop[::-1]))   # last kept
    if i > 0 or j < n - 1:
        w.lo += i
        w.hi = w.lo + (j - i)
        w.m = w.m[i:j + 1]
        w.i = w.i[i:j + 1]
        w.d = w.d[i:j + 1]


def _traceback(wfs, s, k, a, b, mismatch, gap_open, gap_ext) -> str:
    ops = []
    h = len(a)
    state = "m"
    while True:
        w = wfs.get(s)
        if s == 0 and state == "m":
            # extend along diagonal 0 to origin
            while h > 0:
                ops.append("M")
                h -= 1
            break
        if state == "m":
            off = w.get("m", k).item() if w is not None else NEG
            # count matches extended beyond the originating offset
            src_x = wfs.get(s - mismatch)
            src = NEG
            if src_x is not None:
                src = src_x.get("m", k).item()
            i_off = w.get("i", k).item() if w is not None else NEG
            d_off = w.get("d", k).item() if w is not None else NEG
            # offset before extension:
            cands = []
            if src > NEG // 2:
                cands.append(("x", src + 1))
            if i_off > NEG // 2:
                cands.append(("i", i_off))
            if d_off > NEG // 2:
                cands.append(("d", d_off))
            base = max((c[1] for c in cands), default=NEG)
            while h > base:
                ops.append("M")
                h -= 1
            choice = next(c for c in cands if c[1] == base)
            if choice[0] == "x":
                ops.append("X")
                h -= 1
                s -= mismatch
            else:
                state = choice[0]
        elif state == "i":
            ops.append("I")
            src_o = wfs.get(s - gap_open - gap_ext)
            src_e = wfs.get(s - gap_ext)
            from_m = src_o.get("m", k - 1).item() if src_o is not None else NEG
            from_i = src_e.get("i", k - 1).item() if src_e is not None else NEG
            h -= 1
            k -= 1
            if from_m >= from_i:
                s -= gap_open + gap_ext
                state = "m"
            else:
                s -= gap_ext
        else:  # d
            ops.append("D")
            src_o = wfs.get(s - gap_open - gap_ext)
            src_e = wfs.get(s - gap_ext)
            from_m = src_o.get("m", k + 1).item() if src_o is not None else NEG
            from_d = src_e.get("d", k + 1).item() if src_e is not None else NEG
            k += 1
            if from_m >= from_d:
                s -= gap_open + gap_ext
                state = "m"
            else:
                s -= gap_ext
    return "".join(reversed(ops))


def gap_compressed_identity(cigar: str) -> float:
    """matches / (matches + mismatches + gap_openings)
    (reference: wfa_gap_compressed_identity, src/breaks.cpp:72-102)."""
    matches = mismatches = indels = 0
    last_gap = False
    for c in cigar:
        if c == "M":
            matches += 1
            last_gap = False
        elif c == "X":
            mismatches += 1
            last_gap = False
        else:
            if not last_gap:
                indels += 1
                last_gap = True
    denom = matches + mismatches + indels
    return matches / denom if denom else 0.0
