"""Batched banded affine alignment identity on the device.

The split stage's second distance estimator (besides MinHash) is a
bounded affine alignment whose GAP-COMPRESSED IDENTITY
(matches / (matches + mismatches + gap_openings)) gates the greedy
clustering (reference: wfa_gap_compressed_identity,
/root/reference/src/breaks.cpp:72-102, driven at :465-502 with penalties
{match 0, mismatch 7, gap_open 11, gap_ext 1} and a score bound).  The
host route (ops/wfa.py + native/wfa.cpp) is adaptive-reduced WFA with a
traceback; its per-diagonal greedy extension and trim heuristics are
host-shaped, so the device route is a different, well-defined estimator
— exactly the ops/minhash_jax.py precedent:

  **Banded affine DP that carries the count triple of the optimal
  path through the forward pass** — no traceback, no backpointers:

  * rows = positions of the LONGER sequence, one `lax.scan` step per
    row; a B-wide window slides along the shorter sequence following
    the (la, lb) diagonal (window shift per row is 0 or 1 because
    lb <= la), with the window's slice of b carried in-register and
    advanced by one shifted-in character per row;
  * each DP channel stores, besides its score, the (matches,
    mismatches, gap_openings) of the optimal path reaching it; argmin
    selections carry the payload, with a FIXED tie-break order
    (diagonal > in-row gap > cross-row gap; earlier opening first) so
    the numpy mirror is bit-identical;
  * the in-row gap channel D[i,j] = min_{k<j} Hq[i,k] + o + e*(j-k)
    collapses to one exclusive `associative_scan` (min-plus prefix with
    payload) — the same closed form as the POA kernel's F channel,
    exact because re-opening inside a gap is never cheaper (o >= 0);
  * identity is computed on the HOST in float64 from the device's
    integer counts, so values are bit-identical to the mirror's.

The estimator is exact affine-gap alignment whenever the optimal path
stays within the band (|i - j - center| <= B/2); paths that leave the
band are scored worse, which under-reports identity — conservative for
the split (a too-low identity splits a group, never merges one).
"""
from __future__ import annotations

import functools

import numpy as np

INF = np.int32(1 << 28)


def _prep_pair(a: bytes | str, b: bytes | str):
    ab = a.encode() if isinstance(a, str) else bytes(a)
    bb = b.encode() if isinstance(b, str) else bytes(b)
    if len(bb) > len(ab):
        ab, bb = bb, ab            # identity is symmetric in (a, b)
    return np.frombuffer(ab, np.uint8), np.frombuffer(bb, np.uint8)


def identity_from_counts(matches: int, mism: int, gapruns: int) -> float:
    denom = matches + mism + gapruns
    return matches / denom if denom else 0.0


@functools.lru_cache(maxsize=16)
def _compiled(P: int, L: int, B: int, x: int, o: int, e: int):
    import jax
    import jax.numpy as jnp

    NEG_CH = jnp.int32(-1)         # shifted-in b sentinel: never matches

    def combine(lt, rt):
        """min-plus prefix combine, LEFT preferred on ties (earlier
        opening column wins, matching the mirror)."""
        lv, lm, lx, lg = lt
        rv, rm, rx, rg = rt
        take_r = rv < lv
        return (jnp.where(take_r, rv, lv), jnp.where(take_r, rm, lm),
                jnp.where(take_r, rx, lx), jnp.where(take_r, rg, lg))

    def run(a, b, la, lb):
        # a, b: [P, L] int32 codes (negative = invalid); la, lb: [P]
        # window center at row i: c_i = clip(floor(i*lb/la) - B/2, 0, max(lb-B+1, 0))
        cmax = jnp.maximum(lb - B + 1, 0)

        def center(i):
            ci = jnp.where(la > 0, (i * lb) // jnp.maximum(la, 1), 0)
            return jnp.clip(ci - B // 2, 0, cmax)

        pidx = jnp.arange(B, dtype=jnp.int32)[None, :]     # [1, B]

        # row 0: H[0, j] = gap cost to consume j chars of b (one opening)
        c0 = center(jnp.int32(0))                          # [P]
        j0 = c0[:, None] + pidx
        H0 = jnp.where(j0 == 0, 0,
                       jnp.where(j0 <= lb[:, None],
                                 o + e * j0, INF)).astype(jnp.int32)
        zero = jnp.zeros((P, B), jnp.int32)
        Hm0, Hx0, Hg0 = zero, zero, jnp.where(j0 > 0, 1, 0)
        I0 = jnp.full((P, B), INF, jnp.int32)
        bwin0 = jnp.take_along_axis(
            jnp.pad(b, ((0, 0), (0, B)), constant_values=-1),
            j0, axis=1).astype(jnp.int32)

        def step(carry, i):
            H, Hm, Hx, Hg, I, Im, Ix, Ig, bwin, cprev = carry
            i = i.astype(jnp.int32)
            ci = center(i)                                  # [P]
            d = (ci - cprev)[:, None]                       # 0 or 1
            live = (i <= la)[:, None]

            def shift1(X, fill):
                return jnp.where(d == 1,
                                 jnp.concatenate(
                                     [X[:, 1:], jnp.full((P, 1), fill,
                                                         X.dtype)], axis=1),
                                 X)

            # realign prev-row planes into this row's window frame
            Hp = shift1(H, INF)
            Hpm, Hpx, Hpg = (shift1(Hm, 0), shift1(Hx, 0), shift1(Hg, 0))
            Ip = shift1(I, INF)
            Ipm, Ipx, Ipg = (shift1(Im, 0), shift1(Ix, 0), shift1(Ig, 0))
            # b window advances with the frame; shifted-in char gathered
            newchar = jnp.take_along_axis(
                jnp.pad(b, ((0, 0), (0, B)), constant_values=-1),
                (ci + B - 1)[:, None], axis=1).astype(jnp.int32)
            bwin = jnp.where(d == 1,
                             jnp.concatenate([bwin[:, 1:], newchar],
                                             axis=1), bwin)

            jcol = ci[:, None] + pidx                       # [P, B]
            # row i consumes a's (i-1)-th character
            achar = jnp.take_along_axis(
                a, jnp.full((P, 1), i - 1, jnp.int32), axis=1)  # [P, 1]

            # I: gap consuming a (cross-row, same j)
            fromH = Hp + (o + e)
            fromI = Ip + e
            useH = fromH <= fromI                  # H preferred on ties
            Iv = jnp.minimum(fromH, fromI)
            Ivm = jnp.where(useH, Hpm, Ipm)
            Ivx = jnp.where(useH, Hpx, Ipx)
            Ivg = jnp.where(useH, Hpg + 1, Ipg)

            # M: diagonal (j-1 of prev row = right-shift of realigned)
            def rsh(X, fill):
                return jnp.concatenate(
                    [jnp.full((P, 1), fill, X.dtype), X[:, :-1]], axis=1)

            # the j = ci column's diagonal pred sits at window pos -1;
            # only valid when ci == 0 is false... handled by fill INF
            # except ci==0, j==0 has no diagonal pred either -> INF ok;
            # the first row's H0 covers the j==0 boundary via I channel
            Hd = rsh(Hp, INF)
            Hdm, Hdx, Hdg = rsh(Hpm, 0), rsh(Hpx, 0), rsh(Hpg, 0)
            # the diagonal move into (i, j) consumes b[j-1]: window pos
            # p holds b[ci+p], so compare against the right-shifted
            # window (p=0's fill is moot — its diagonal pred is INF)
            bprev = rsh(bwin, -3)
            ismatch = (achar == bprev) & (achar >= 0) & (bprev >= 0)
            sub = jnp.where(ismatch, 0, x).astype(jnp.int32)
            Mv = jnp.where(Hd >= INF, INF, Hd + sub)
            Mm = Hdm + jnp.where(ismatch, 1, 0)
            Mx_ = Hdx + jnp.where(ismatch, 0, 1)
            Mg = Hdg

            # Hq = min(M, I), M preferred on ties
            useM = Mv <= Iv
            Hq = jnp.minimum(Mv, Iv)
            Hqm = jnp.where(useM, Mm, Ivm)
            Hqx = jnp.where(useM, Mx_, Ivx)
            Hqg = jnp.where(useM, Mg, Ivg)

            # D: in-row gap, exclusive min-plus prefix over the window
            w = jnp.where(Hq >= INF, INF, Hq - e * pidx)
            pref = jax.lax.associative_scan(combine, (w, Hqm, Hqx, Hqg),
                                            axis=1)
            # exclusive: shift right (k < j), then D = e*j + o + pref
            pv = rsh(pref[0], INF)
            pm, px, pg = rsh(pref[1], 0), rsh(pref[2], 0), rsh(pref[3], 0)
            Dv = jnp.where(pv >= INF, INF, pv + o + e * pidx)
            Dg = pg + 1

            # H = min(Hq, D), Hq preferred on ties
            useQ = Hq <= Dv
            Hn = jnp.minimum(Hq, Dv)
            Hnm = jnp.where(useQ, Hqm, pm)
            Hnx = jnp.where(useQ, Hqx, px)
            Hng = jnp.where(useQ, Hqg, Dg)
            # cells outside b's range are invalid
            bad = (jcol > lb[:, None]) | (jcol < 0)
            Hn = jnp.where(bad, INF, Hn)
            Iv = jnp.where(bad, INF, Iv)

            out = tuple(
                jnp.where(live, n, old) for n, old in (
                    (Hn, H), (Hnm, Hm), (Hnx, Hx), (Hng, Hg),
                    (Iv, I), (Ivm, Im), (Ivx, Ix), (Ivg, Ig),
                    (bwin, carry[8])))
            return out + (jnp.where(i <= la, ci, cprev),), None

        init = (H0, Hm0, Hx0, Hg0, I0, zero, zero, zero, bwin0, c0)
        (H, Hm, Hx, Hg, *_rest), _ = jax.lax.scan(
            step, init, jnp.arange(1, L + 1))
        clast = _rest[-1]
        # final cell j = lb in the last live row's frame
        pfin = jnp.clip(lb - clast, 0, B - 1)[:, None]
        take = lambda X: jnp.take_along_axis(X, pfin, axis=1)[:, 0]  # noqa
        return take(H), take(Hm), take(Hx), take(Hg)

    import jax as _jax
    return _jax.jit(run)


class DeviceBandedIdentity:
    """Gap-compressed identities for a batch of sequence pairs via the
    banded counts-carrying DP; bit-identical to host_banded_identity."""

    def __init__(self, band: int = 128, mismatch: int = 7,
                 gap_open: int = 11, gap_ext: int = 1):
        assert band % 2 == 0
        self.B = band
        self.x, self.o, self.e = mismatch, gap_open, gap_ext

    def identities(self, pairs: list[tuple[bytes | str, bytes | str]],
                   max_score: int | list[int] | None = None) -> list[float]:
        """One float per pair; pairs whose banded score exceeds
        max_score (scalar or per-pair) report identity 0.0 (the host
        route's bail)."""
        if not pairs:
            return []
        ms = (list(max_score)
              if isinstance(max_score, (list, tuple, np.ndarray))
              else [max_score] * len(pairs))
        import jax.numpy as jnp
        pr = [_prep_pair(a, b) for a, b in pairs]
        # fixed chunk height + power-of-two length: a handful of jit
        # variants serves every workload, and the [P, L] state planes
        # stay bounded.  Chunks dispatch before any collection (the
        # device queue pipelines them, one sync at the end).
        P = min(256, 1 << (len(pr) - 1).bit_length()) if len(pr) > 1 else 8
        P = max(P, 8)
        out: list[float] = [0.0] * len(pr)
        order = sorted(range(len(pr)), key=lambda i: len(pr[i][0]))
        pending = []
        for s in range(0, len(order), P):
            chunk = order[s:s + P]
            L = 256
            maxlen = max(len(pr[i][0]) for i in chunk)
            while L < maxlen:
                L *= 2
            A = np.full((P, L), -1, np.int32)
            Bm = np.full((P, L), -2, np.int32)
            la = np.zeros(P, np.int32)
            lb = np.zeros(P, np.int32)
            for row, i in enumerate(chunk):
                a, b = pr[i]
                A[row, :len(a)] = a
                Bm[row, :len(b)] = b
                la[row], lb[row] = len(a), len(b)
            fn = _compiled(P, L, self.B, self.x, self.o, self.e)
            pending.append((chunk, fn(jnp.asarray(A), jnp.asarray(Bm),
                                      jnp.asarray(la), jnp.asarray(lb))))
        for chunk, res in pending:
            sc, m, xx, g = (np.asarray(v) for v in res)
            for row, i in enumerate(chunk):
                if sc[row] >= INF or (ms[i] is not None
                                      and sc[row] >= ms[i]):
                    out[i] = 0.0
                else:
                    out[i] = identity_from_counts(
                        int(m[row]), int(xx[row]), int(g[row]))
        return out


def host_banded_identity(a: bytes | str, b: bytes | str, *, band: int = 128,
                         mismatch: int = 7, gap_open: int = 11,
                         gap_ext: int = 1,
                         max_score: int | None = None,
                         return_counts: bool = False):
    """Numpy mirror of the device kernel (same band, recurrences and
    tie-breaks) — the parity oracle and small-batch fallback."""
    av, bv = _prep_pair(a, b)
    la, lb = len(av), len(bv)
    B2 = band
    x, o, e = mismatch, gap_open, gap_ext
    cmax = max(lb - B2 + 1, 0)

    def center(i):
        ci = (i * lb) // max(la, 1) if la > 0 else 0
        return min(max(ci - B2 // 2, 0), cmax)

    ap = np.full(la + 1, -1, np.int64)
    ap[:la] = av
    bp = np.full(lb + B2 + 1, -2, np.int64)
    bp[:lb] = bv
    c = center(0)
    j0 = c + np.arange(B2)
    H = np.where(j0 == 0, 0, np.where(j0 <= lb, o + e * j0, INF)).astype(np.int64)
    Hm = np.zeros(B2, np.int64)
    Hx = np.zeros(B2, np.int64)
    Hg = np.where(j0 > 0, 1, 0).astype(np.int64)
    Iv = np.full(B2, INF, np.int64)
    Im = np.zeros(B2, np.int64)
    Ix = np.zeros(B2, np.int64)
    Ig = np.zeros(B2, np.int64)

    for i in range(1, la + 1):
        ci = center(i)
        d = ci - c
        c = ci

        def sh(X, fill):
            if d == 1:
                return np.concatenate([X[1:], [fill]])
            return X

        H, Hm, Hx, Hg = sh(H, INF), sh(Hm, 0), sh(Hx, 0), sh(Hg, 0)
        Iv, Im, Ix, Ig = sh(Iv, INF), sh(Im, 0), sh(Ix, 0), sh(Ig, 0)
        jcol = ci + np.arange(B2)
        bwin = bp[jcol]
        achar = ap[i - 1]

        fromH = H + (o + e)
        fromI = Iv + e
        useH = fromH <= fromI
        Iv2 = np.minimum(fromH, fromI)
        Im2 = np.where(useH, Hm, Im)
        Ix2 = np.where(useH, Hx, Ix)
        Ig2 = np.where(useH, Hg + 1, Ig)

        def rsh(X, fill):
            return np.concatenate([[fill], X[:-1]])

        Hd, Hdm, Hdx, Hdg = rsh(H, INF), rsh(Hm, 0), rsh(Hx, 0), rsh(Hg, 0)
        bprev = rsh(bwin, -3)
        ismatch = (achar == bprev) & (achar >= 0) & (bprev >= 0)
        Mv = np.where(Hd >= INF, INF, Hd + np.where(ismatch, 0, x))
        Mm = Hdm + np.where(ismatch, 1, 0)
        Mx_ = Hdx + np.where(ismatch, 0, 1)
        Mg = Hdg

        useM = Mv <= Iv2
        Hq = np.minimum(Mv, Iv2)
        Hqm = np.where(useM, Mm, Im2)
        Hqx = np.where(useM, Mx_, Ix2)
        Hqg = np.where(useM, Mg, Ig2)

        # exclusive min-plus prefix with payload, left preferred on ties:
        # find, for every p, the earliest q <= p achieving the running
        # minimum of w (strict improvement => earlier index wins ties)
        w = np.where(Hq < INF, Hq - e * np.arange(B2), INF)
        run_incl = np.minimum.accumulate(w)
        prev_best = np.concatenate([[np.int64(INF) + 1], run_incl[:-1]])
        new_best = w < prev_best
        best_at = np.maximum.accumulate(
            np.where(new_best, np.arange(B2), -1))
        safe = np.maximum(best_at, 0)
        pv_i = np.where(best_at >= 0, run_incl, INF)
        pm_i = np.where(best_at >= 0, Hqm[safe], 0)
        px_i = np.where(best_at >= 0, Hqx[safe], 0)
        pg_i = np.where(best_at >= 0, Hqg[safe], 0)

        def excl(X, fill):
            return np.concatenate([[fill], X[:-1]])

        pv = excl(pv_i, INF)
        pm = excl(pm_i, 0)
        px = excl(px_i, 0)
        pg = excl(pg_i, 0)
        Dv = np.where(pv >= INF, INF, pv + o + e * np.arange(B2))
        Dg = pg + 1

        useQ = Hq <= Dv
        H = np.minimum(Hq, Dv)
        Hm = np.where(useQ, Hqm, pm)
        Hx = np.where(useQ, Hqx, px)
        Hg = np.where(useQ, Hqg, Dg)
        bad = (jcol > lb) | (jcol < 0)
        H = np.where(bad, INF, H)
        Iv, Im, Ix, Ig = Iv2, Im2, Ix2, Ig2
        Iv = np.where(bad, INF, Iv)

    p = min(max(lb - c, 0), B2 - 1)
    sc, m, xx, g = int(H[p]), int(Hm[p]), int(Hx[p]), int(Hg[p])
    if return_counts:
        return sc, m, xx, g
    if sc >= INF or (max_score is not None and sc >= max_score):
        return 0.0
    return identity_from_counts(m, xx, g)
