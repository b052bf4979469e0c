"""Windowed-storage stacked POA kernel: banded long blocks on device, and
more stacking for ordinary blocks, from the same mechanism.

This generalizes ops/poa_pallas_stacked.py in two ways:

1. **Windowed DP storage.**  Each DP row stores only W columns at a
   per-row offset ``off[v]`` (a multiple of 128 lanes).  In banded mode
   (abPOA adaptive band, ops/poa_host.POAParams.wb/wf_milli) the window is
   anchored at the row's band ``[blo, bhi]`` — out-of-band cells are the
   floor by banded semantics, so storing only the window is EXACT whenever
   the band fits it (else the per-block overflow flag redoes the block on
   the native engine, as for node-capacity overflow).  Predecessor rows
   are realigned into the current row's frame with one dynamic sublane
   roll + mask per pred read; the in-row F prefix scan needs no cross-
   window carry because out-of-band source cells are already the floor.
   This removes the LW <= 2048 ceiling of the full-width kernels: the
   default ``-l 4000`` pipeline's long blocks (SURVEY §5.7's
   max_poa_length upper bucket; reference src/main.cpp:376) run on device
   in banded mode at W = 1408 stored lanes against sequences up to
   LW ~ 10k.  Unbanded blocks use off = 0 with W >= L+1 — full-width is
   the trivial window, so ONE kernel serves both.

2. **6 bytes/cell.**  The stacked kernel stores H|E1 + E2|CODE16
   (8 B/cell).  Here plane A holds H|CODE16 and the gap channels are
   stored as per-cell DELTAS d1 = H - E1 (6 bits) and d2 = H - E2
   (7 bits), two rows' deltas packed per int32 word in a half-height
   plane — 6 B/cell, which buys ~1.33x more K*VW*W under the ~110 MB
   scoped-VMEM budget.  The encoding is EXACT, not approximate: a delta
   at the field cap decodes to the floor, and a capped E can never win
   against the open-gap path from the same predecessor's H, because
   cap > max(gap_open - gap_ext) over every adaptive-penalty tier
   (max g-e = 36 < 63, max q-c = 80 < 127 — pipeline/smooth.py tiers);
   cross-predecessor argmax shifts are equally dominated, so every value
   the DP or traceback can observe is bit-identical to the full-width
   engines (asserted by tests/test_poa_pallas_win.py against the numpy
   oracle).

Everything else — seed, provenance-code traceback (flattened F-scan),
guarded-ring threading, K-lockstep divergence masking, CODE16 layout with
PCAP = 4 pred slots — matches ops/poa_pallas_stacked.py and the oracle
spec in ops/poa_fused.py (reference semantics: spoa Align/AddAlignment
per sequence, src/smooth.cpp:744-753, driven per block by the OMP loop at
src/smooth.cpp:1904).
"""
from __future__ import annotations

import functools

import numpy as np

NEG16 = -16000
NEGBIG = -(1 << 30)
RING_CAP = 8
PCAP = 4
# debug: when True (interpret-only), the kernel emits a 4th output with
# the final round's packed H|CODE16 plane and the per-node window
# offsets, so tests can compare the DP against the oracle row by row
DEBUG_DUMP = False
D1CAP = 63        # 6-bit E1 delta field (max g-e is 36 across tiers)
D2CAP = 127       # 7-bit E2 delta field (max q-c is 80 across tiers)


@functools.lru_cache(maxsize=16)
def _win_core(K: int, VW: int, LW: int, W: int, RW: int, local: bool,
              interpret: bool, B: int, banded: bool = False):
    """B = number of GRID steps; the dispatch covers B*K blocks.

    LW   = sequence-length capacity (multiple of 128; columns run 0..LW-1)
    W    = stored window width per DP row (multiple of 128, <= LW for
           banded tiers; W >= L+1 required for unbanded blocks — the
           engine routes accordingly)
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    DT = jnp.int32
    assert VW < (1 << 15), "pending-splice packing needs node ids < 2^15"
    assert K * 4 <= 32, "packed base-char scalar holds K 4-bit fields"
    assert W % 128 == 0 and LW % 128 == 0
    VWr = VW // 128
    LWr = LW // 128
    FW = W // 128              # stored sublane rows per DP row
    SL = LW // 128             # seq-plane rows per sequence
    KF = K * FW
    # Window offsets quantize to 128 lanes (one sublane row).  DP-plane
    # slab reads are 8-row aligned by construction (starts are FW * u
    # with FW a multiple of 8 on production tiers); the one read whose
    # start depends on the raw offset — the seq-plane window — reads
    # from an 8-aligned row and realigns with a dynamic sublane roll.
    ALIGNED8 = FW % 8 == 0 and SL % 8 == 0
    OQ = 128
    OFF = 16384
    TB_CAP = 2 * (VW + LW + 8) + LW
    NB = VW + 1
    NEGU = (VW + 1) * K        # row-unit of the shared NEG16 DP row
    NPAIR = (VW + 2) // 2      # d-plane pairs for plane rows 0..VW
    DNEGU = NPAIR * K          # row-unit of the shared sentinel d row
    DSENT = D1CAP | (D2CAP << 6)

    def kernel(nseq_s, par_s, slen_r, seqs_r,
               meta_r, exp_r, paths_r, *rest):
        if DEBUG_DUMP:
            dbg_r = rest[0]
            rest = rest[1:]
        (HA, DD, baseA, posA, nodeat, ringA, nxtA, npredA, nsuccA,
         preds8, tgtA, bchA, *extraA) = rest
        if banded:
            mrA, MrA, offA = extraA
        lane128 = jax.lax.broadcasted_iota(DT, (1, 128), 1)
        subW = jax.lax.broadcasted_iota(DT, (FW, 128), 0)
        subK = jax.lax.broadcasted_iota(DT, (KF, 128), 0)
        lanef = jax.lax.broadcasted_iota(DT, (KF, 128), 1)
        subKh = subK % FW
        blkidx = subK // FW
        colidx = subKh * 128 + lanef      # per-block WINDOW-LOCAL column
        sub2 = jax.lax.broadcasted_iota(DT, (2 * KF, 128), 0)
        lanef2 = jax.lax.broadcasted_iota(DT, (2 * KF, 128), 1)
        sub2h = sub2 % FW

        NEGROW = jnp.full((KF, 128), NEG16, DT)
        ZROW = jnp.zeros((KF, 128), DT)

        def b1(x):
            return jnp.where(x, 1, 0)

        def fshift1(x, fill):
            """out[c] = x[c-1] (window-local c >= 1) per block, else fill.
            The value entering local column 0 is the global column off-1,
            which is out of band by window construction (off <= blo)."""
            r1 = pltpu.roll(x, 1, axis=1)
            fixed = jnp.where(lanef == 0, pltpu.roll(r1, 1, axis=0), r1)
            return jnp.where(colidx >= 1, fixed, fill)

        def cummax2(x, y):
            """Per-block window-local prefix max of two channel stacks in
            one (2*KF, 128) shift-max chain."""
            s = jnp.concatenate([x, y], axis=0)
            k = 1
            while k < 128:
                r = pltpu.roll(s, k, axis=1)
                s = jnp.maximum(s, jnp.where(lanef2 >= k, r, NEG16))
                k *= 2
            rm = jnp.broadcast_to(jnp.max(s, axis=1, keepdims=True),
                                  (2 * KF, 128))
            ex = jnp.where(sub2h >= 1, pltpu.roll(rm, 1, axis=0), NEG16)
            k = 1
            while k < FW:
                ex = jnp.maximum(
                    ex, jnp.where(sub2h >= k, pltpu.roll(ex, k, axis=0),
                                  NEG16))
                k *= 2
            s = jnp.maximum(s, ex)
            return s[:KF, :], s[KF:, :]

        lanefr = jax.lax.broadcasted_iota(DT, (1, 128), 1)

        def off_of(k, node):
            if banded:
                return offA[k * NB + jnp.maximum(node, 0)]
            return jnp.int32(0)

        def ccell(k, row, node, j):
            """CODE16 of block k at DP row `row` at GLOBAL column j (the
            code lives in the hi half of the HA word; window-local
            position derives from the row's stored offset)."""
            jl = j - off_of(k, node)
            jc = jnp.clip(jl, 0, W - 1)
            r = HA[pl.ds(row * KF + k * FW + jc // 128, 1), :]
            w = jnp.sum(jnp.where(lanefr == (jc % 128), r, 0))
            return jnp.where((jl >= 0) & (jl < W), (w >> 16) & 0xFFFF,
                             jnp.int32(-1))

        def hcell(k, row, node, j):
            jl = j - off_of(k, node)
            jc = jnp.clip(jl, 0, W - 1)
            r = HA[pl.ds(row * KF + k * FW + jc // 128, 1), :]
            v = jnp.max(jnp.where(lanefr == (jc % 128), r & 0xFFFF,
                                  NEGBIG))
            return jnp.where((jl >= 0) & (jl < W), v - OFF,
                             jnp.int32(NEG16))

        Rs = [nseq_s[k, 0, 0] for k in range(K)]
        pars = [[par_s[k, 0, t] for t in range(8)] for k in range(K)]

        def slen_at(k, r_):
            return jnp.max(jnp.where(lane128 == r_, slen_r[k, 0:1, :], 0))

        def per_block_plane(vals):
            p = jnp.full((KF, 128), vals[0], DT)
            for k in range(1, K):
                p = jnp.where(blkidx == k, vals[k], p)
            return p

        mP = per_block_plane([pars[k][0] for k in range(K)])
        nP = per_block_plane([pars[k][1] for k in range(K)])
        gP = per_block_plane([pars[k][2] for k in range(K)])
        eP = per_block_plane([pars[k][3] for k in range(K)])
        qP = per_block_plane([pars[k][4] for k in range(K)])
        cP = per_block_plane([pars[k][5] for k in range(K)])

        CROWS = 16 if ALIGNED8 else 2
        iotc = jax.lax.broadcasted_iota(DT, (CROWS, 128), 0) * 128 + \
            jax.lax.broadcasted_iota(DT, (CROWS, 128), 1)

        def chars8(k, r_, jbase):
            """Chars of positions jbase..jbase+7 of block k's sequence r_,
            packed 4 bits each as (char+1).  The seq plane stores char j
            at flat position j+1 (128-lane rows); the slab start is
            8-row-aligned for Mosaic (production shapes), covering the at
            most two rows the eight positions span."""
            row0 = (jbase + 1) // 128
            if ALIGNED8:
                r8 = (row0 // 8) * 8
            else:
                r8 = row0
            slab = seqs_r[k, pl.ds(r_ * SL + r8, CROWS), :]
            kk = (r8 * 128 + iotc) - (jbase + 1)
            win = (kk >= 0) & (kk < 8)
            kc = jnp.where(win, kk, 0)
            w = jnp.where((kc & 1) > 0, 16, 1)
            w = w * jnp.where((kc & 2) > 0, 256, 1)
            w = w * jnp.where((kc & 4) > 0, 65536, 1)
            return jnp.sum(jnp.where(win, (slab + 1) * w, 0))

        # shared NEG16 DP row (out-of-range pred slots) + sentinel d row
        HA[pl.ds(NEGU * FW, FW), :] = jnp.full((FW, 128),
                                               (0 << 16) | (NEG16 + OFF), DT)
        DD[pl.ds(DNEGU * FW, FW), :] = jnp.full((FW, 128),
                                                DSENT | (DSENT << 13), DT)

        # ================= seed every block from its sequence 0 ==========
        L0s = [slen_at(k, 0) for k in range(K)]
        iol = (jax.lax.broadcasted_iota(DT, (LWr, 128), 0) * 128
               + jax.lax.broadcasted_iota(DT, (LWr, 128), 1))
        for k in range(K):
            paths_r[k, 0:LWr, :] = jnp.where(iol < L0s[k], iol, -1)
        L0max = L0s[0]
        for k in range(1, K):
            L0max = jnp.maximum(L0max, L0s[k])

        def seed_chunk(ci, _):
            jb = ci * 8
            for k in range(K):
                packed = chars8(k, 0, jb)
                L0 = L0s[k]
                kb = k * NB
                for t in range(8):
                    i = jb + t
                    bch = ((packed >> (4 * t)) & 15) - 1
                    ii = kb + jnp.where(i < L0, i, VW)
                    baseA[ii] = bch
                    posA[ii] = i
                    ringA[ii] = i
                    nxtA[ii] = jnp.where(i < L0 - 1, i + 1, -1)
                    npredA[ii] = jnp.where(i >= 1, 1, 0)
                    nsuccA[ii] = jnp.where(i < L0 - 1, 1, 0)
                    preds8[PCAP * ii] = i - 1
            return 0

        jax.lax.fori_loop(0, (L0max + 7) // 8, seed_chunk, 0)

        # ================= per-sequence rounds ==========================
        def _round_work(r, carry):
            heads, Vcs, ovfs, gss = carry
            Ls = [slen_at(k, r) for k in range(K)]
            ract = [(r < Rs[k]) & (~ovfs[k]) for k in range(K)]
            Lplane = per_block_plane(
                [jnp.where(ract[k], Ls[k], 0) for k in range(K)])
            Vmax = jnp.int32(0)
            for k in range(K):
                Vmax = jnp.maximum(Vmax, jnp.where(ract[k], Vcs[k], 0))

            if banded:
                bws, adls, adrs = [], [], []

                def rank_body(i, st):
                    vs = list(st[:K])
                    Ds = list(st[K:])
                    for k in range(K):
                        kb = k * NB
                        act = ract[k] & (i < Vcs[k])
                        v = vs[k]
                        np_ = npredA[kb + v]

                        def rploop(p, acc, kb=kb, v=v, np_=np_):
                            lo_, hi_ = acc
                            pid = jnp.maximum(
                                preds8[PCAP * (kb + v)
                                       + jnp.minimum(p, PCAP - 1)], 0)
                            ok = p < np_
                            return (jnp.where(ok, jnp.minimum(
                                        lo_, mrA[kb + pid]), lo_),
                                    jnp.where(ok, jnp.maximum(
                                        hi_, MrA[kb + pid]), hi_))

                        lo_, hi_ = jax.lax.fori_loop(
                            0, jnp.maximum(np_, 1), rploop,
                            (jnp.int32(1 << 28), jnp.int32(0)))
                        mv = jnp.where(np_ == 0, 1, lo_ + 1)
                        Mv = jnp.where(np_ == 0, 1, hi_ + 1)
                        ii = kb + jnp.where(act, v, VW)
                        mrA[ii] = mv
                        MrA[ii] = Mv
                        vs[k] = jnp.where(act, jnp.maximum(nxtA[kb + v], 0),
                                          v)
                        Ds[k] = jnp.where(act, jnp.maximum(Ds[k], Mv),
                                          Ds[k])
                    return tuple(vs) + tuple(Ds)

                st = jax.lax.fori_loop(
                    0, Vmax, rank_body,
                    tuple(heads) + (jnp.int32(0),) * K)
                Dgs = st[K:]
                for k in range(K):
                    bws.append(pars[k][6] + (pars[k][7] * Ls[k]) // 1000)
                    adls.append(jnp.maximum(0, Dgs[k] - Ls[k]))
                    adrs.append(jnp.maximum(0, Ls[k] - Dgs[k]))

            # ---- DP row 0 (off = 0 window) ----
            colmask0 = colidx <= Lplane
            if local:
                row0 = jnp.where(colmask0, 0, NEG16)
            else:
                gap1 = -(gP + (colidx - 1) * eP)
                gap2 = -(qP + (colidx - 1) * cP)
                row0 = jnp.maximum(gap1, gap2)
                row0 = jnp.where(colidx == 0, 0, row0)
                row0 = jnp.where(colmask0, row0, NEG16)
            HA[pl.ds(0, KF), :] = (jnp.maximum(row0, NEG16) + OFF) \
                .astype(DT)
            # d pair 0, low half: row 0's gap channels are the floor
            DD[pl.ds(0, KF), :] = jnp.full((KF, 128), DSENT, DT)
            if banded:
                for k in range(K):
                    offA[k * NB + VW] = 0      # dummy slot

            # ---- fill: K lockstep topo walks; DP row = topo pos + 1 ----
            def fill_body(i, st):
                vs = list(st[0])
                bbest, brow = list(st[1]), list(st[2])
                ovfb = list(st[3])
                dcarry = st[4]
                bb = jnp.int32(0)
                ab = jnp.int32(0)
                nps = []
                npm = jnp.int32(1)
                offs = []
                for k in range(K):
                    kb = k * NB
                    v = vs[k]
                    act = ract[k] & (i < Vcs[k])
                    bb = bb | ((baseA[kb + v] + 1) << (4 * k))
                    ab = ab | (jnp.where(act, 1, 0) << k)
                    ia = kb + jnp.where(act, v, VW)
                    posA[ia] = i
                    nodeat[kb + jnp.where(act, jnp.minimum(i, VW - 1), VW)] \
                        = v
                    np_ = npredA[kb + v]
                    nps.append(np_)
                    npm = jnp.maximum(npm, jnp.where(act, np_, 0))
                    if banded:
                        # window anchor: 128-aligned at (band floor - 1):
                        # the match
                        # move at column blo reads the predecessor's
                        # value at blo-1, which lies in the PRED's band
                        # (its floor is lower), so it must be stored.
                        # A band wider than the stored window overflows
                        # (native redo), same contract as node capacity
                        blo_k = jnp.maximum(
                            0, mrA[kb + v] - bws[k] - adls[k])
                        bhi_k = jnp.minimum(
                            Ls[k], MrA[kb + v] + bws[k] + adrs[k])
                        off_k = (jnp.maximum(blo_k - 1, 0) // OQ) * OQ
                        ovfb[k] = ovfb[k] | (act &
                                             ((bhi_k - off_k) >= W))
                        offA[ia] = off_k
                        offs.append(off_k)
                    else:
                        offs.append(jnp.int32(0))

                offP = per_block_plane(offs)
                colg = colidx + offP             # GLOBAL column index
                colmask = colg <= Lplane
                ej = eP * colg
                cj = cP * colg

                def ploop(p, acc):
                    hmax, e1mx, e2mx, hs, e1s, e2s = acc
                    hps, e1ps, e2ps = [], [], []
                    for k in range(K):
                        kb = k * NB
                        okp = p < nps[k]
                        pid = preds8[PCAP * (kb + vs[k])
                                     + jnp.minimum(p, PCAP - 1)]
                        use0 = (p == 0) & (nps[k] == 0)
                        pidc = jnp.maximum(pid, 0)
                        prow = posA[kb + pidc] + 1
                        u = jnp.where(
                            okp, prow * K + k,
                            jnp.where(use0, k, NEGU))
                        hh = HA[pl.ds(FW * u, FW), :]
                        pp = jnp.where(okp, prow, 0)
                        du = jnp.where(okp | use0, (pp // 2) * K + k,
                                       DNEGU)
                        dd = DD[pl.ds(FW * du, FW), :]
                        dx = (dd >> (13 * (pp & 1))) & 0x1FFF
                        if banded:
                            # realign pred window frame -> current frame:
                            # out[s] = slab[s + delta].  delta is USUALLY
                            # >= 0 (min-rank grows along edges) but can be
                            # NEGATIVE: a node's min-rank comes via its
                            # shallowest pred while ANOTHER pred sits
                            # deeper with a higher window (the bug class
                            # caught by the -l 4000 parity check)
                            offp = jnp.where(
                                okp, offA[kb + pidc], 0)
                            delta = (offs[k] - offp) // 128
                            sh = jnp.mod(-delta, FW)
                            dmask = (subW + delta >= 0) & \
                                (subW + delta < FW)
                            hh = jnp.where(
                                dmask, pltpu.roll(hh, sh, axis=0),
                                (NEG16 + OFF))
                            dx = jnp.where(
                                dmask, pltpu.roll(dx, sh, axis=0), DSENT)
                        h = (hh & 0xFFFF) - OFF
                        d1 = dx & 63
                        d2 = (dx >> 6) & 127
                        e1 = jnp.where(d1 == D1CAP, NEG16, h - d1)
                        e2 = jnp.where(d2 == D2CAP, NEG16, h - d2)
                        hps.append(h)
                        e1ps.append(e1)
                        e2ps.append(e2)
                    h = jnp.concatenate(hps, axis=0)
                    x1 = jnp.concatenate(e1ps, axis=0)
                    x2 = jnp.concatenate(e2ps, axis=0)
                    uh = h > hmax
                    u1 = x1 > e1mx
                    u2 = x2 > e2mx
                    return (jnp.maximum(hmax, h), jnp.maximum(e1mx, x1),
                            jnp.maximum(e2mx, x2),
                            jnp.where(uh, p, hs), jnp.where(u1, p, e1s),
                            jnp.where(u2, p, e2s))

                hmax, e1mx, e2mx, hs, e1s, e2s = jax.lax.fori_loop(
                    0, npm, ploop,
                    (NEGROW, NEGROW, NEGROW, ZROW, ZROW, ZROW))

                # seq chars at the window's global columns (char j sits
                # at seq-plane flat position j+1 == global column index).
                # The row start r*SL + off/128 is not 8-aligned in
                # general; read from the aligned floor and realign with a
                # dynamic sublane roll (Mosaic-friendly)
                svs = []
                for k in range(K):
                    strow = r * SL + offs[k] // 128
                    if ALIGNED8:
                        a8 = (strow // 8) * 8
                        d8 = strow - a8
                        slab = seqs_r[k, pl.ds(a8, FW + 8), :]
                        sh = jnp.where(d8 > 0, (FW + 8) - d8, 0)
                        rolled = pltpu.roll(slab, sh, axis=0)
                        svs.append(rolled[0:FW, :])
                    else:
                        svs.append(seqs_r[k, pl.ds(strow, FW), :])
                seqv32 = jnp.concatenate(svs, axis=0)
                basep = ((bb >> (4 * blkidx)) & 15) - 1
                sub = jnp.where(seqv32 == basep, mP, -nP)
                M = fshift1(hmax, NEG16) + sub
                mslotr = fshift1(hs, 0)
                e1_open = hmax - gP
                e1_ext = e1mx - eP
                e1o = e1_open >= e1_ext
                e1r = jnp.maximum(jnp.maximum(e1_open, e1_ext), NEG16)
                e1slotr = jnp.where(e1o, hs, e1s)
                e2_open = hmax - qP
                e2_ext = e2mx - cP
                e2o = e2_open >= e2_ext
                e2r = jnp.maximum(jnp.maximum(e2_open, e2_ext), NEG16)
                e2slotr = jnp.where(e2o, hs, e2s)
                hq = jnp.maximum(M, jnp.maximum(e1r, e2r))
                if local:
                    hq = jnp.maximum(hq, 0)
                    hqz = b1(hq == 0)
                else:
                    hqz = ZROW
                hqselr = jnp.where(M == hq, 0, jnp.where(e1r == hq, 1, 2))
                if banded:
                    bloP = per_block_plane(
                        [jnp.maximum(0, mrA[k * NB + vs[k]] - bws[k]
                                     - adls[k]) for k in range(K)])
                    bhiP = per_block_plane(
                        [jnp.minimum(Ls[k], MrA[k * NB + vs[k]] + bws[k]
                                     + adrs[k]) for k in range(K)])
                    bandm = (colg >= bloP) & (colg <= bhiP)
                else:
                    bandm = colmask
                hq = jnp.where(bandm, hq, NEG16)
                e1r = jnp.where(bandm, e1r, NEG16)
                e2r = jnp.where(bandm, e2r, NEG16)
                g1in = hq + ej
                g2in = hq + cj
                G1, G2 = cummax2(g1in, g2in)
                f1new = g1in == G1
                F1 = fshift1(G1, NEG16) + (eP - gP - ej)
                f2new = g2in == G2
                F2 = fshift1(G2, NEG16) + (cP - qP - cj)
                Hrow = jnp.maximum(hq, jnp.maximum(F1, F2))
                Hrow = jnp.where(bandm, Hrow, NEG16)
                code = (mslotr | (e1slotr << 2) | (b1(e1o) << 4)
                        | (e2slotr << 5) | (b1(e2o) << 7)
                        | (hqselr << 8) | (b1(hq == Hrow) << 10)
                        | (b1(F1 == Hrow) << 11)
                        | (b1(F2 == Hrow) << 12)
                        | (b1(f1new) << 13) | (b1(f2new) << 14)
                        | (hqz << 15))
                Hc = jnp.maximum(Hrow, NEG16)
                HA[pl.ds(FW * ((i + 1) * K), KF), :] = \
                    ((code << 16) | (Hc + OFF)).astype(DT)
                # gap deltas, two plane rows per word (this row p = i+1)
                d1w = jnp.minimum(Hc - jnp.maximum(e1r, NEG16), D1CAP)
                d2w = jnp.minimum(Hc - jnp.maximum(e2r, NEG16), D2CAP)
                dpair = d1w | (d2w << 6)
                podd = ((i + 1) & 1) == 1
                word = jnp.where(podd, dcarry | (dpair << 13), dpair)
                DD[pl.ds(FW * (((i + 1) // 2) * K), KF), :] = \
                    word.astype(DT)
                ndcarry = jnp.where(podd, ZROW, dpair)
                if local:
                    # per-row best for the end cell: window offsets differ
                    # across rows, so the running max is kept as scalars
                    # (first row achieving the strict max wins — the
                    # oracle's flat argmax order)
                    actp = ((ab >> blkidx) & 1) == 1
                    Hm = jnp.where(colmask & actp & bandm, Hrow, NEGBIG)
                    for k in range(K):
                        sl = slice(k * FW, (k + 1) * FW)
                        rv = jnp.max(Hm[sl])
                        upd = rv > bbest[k]
                        bbest[k] = jnp.where(upd, rv, bbest[k])
                        brow[k] = jnp.where(upd, i, brow[k])
                for k in range(K):
                    kb = k * NB
                    adv = ract[k] & (i + 1 < Vcs[k])
                    vs[k] = jnp.where(adv, jnp.maximum(nxtA[kb + vs[k]], 0),
                                      vs[k])
                return (tuple(vs), bbest, brow, ovfb, ndcarry)

            st = jax.lax.fori_loop(
                0, Vmax, fill_body,
                (tuple(heads), [jnp.int32(NEGBIG)] * K,
                 [jnp.int32(-1)] * K,
                 [jnp.bool_(False)] * K,
                 # pair-0 carry = row 0's sentinel deltas (row 0's gap
                 # channels are the floor; the i=0 store completes pair 0)
                 jnp.full((KF, 128), DSENT, DT)))
            bbest, brow, ovfb = st[1], st[2], st[3]

            # ---- end cells ----
            bis, bjs, done0 = [], [], []
            if local:
                for k in range(K):
                    # recover the min column achieving the max by
                    # re-reading the winning row (one slab read per block)
                    rstar = jnp.clip(brow[k], 0, VW - 1)
                    bn = nodeat[k * NB + rstar]
                    u = (rstar + 1) * K + k
                    hh = HA[pl.ds(FW * u, FW), :]
                    hvals = (hh & 0xFFFF) - OFF
                    offw = off_of(k, bn)
                    colgw = (subW * 128 +
                             jax.lax.broadcasted_iota(DT, (FW, 128), 1)
                             + offw)
                    okm = (hvals == bbest[k]) & (colgw <= Ls[k])
                    bj = jnp.min(jnp.where(okm, colgw, LW))
                    bis.append((jnp.maximum(bn, 0), brow[k] + 1))
                    bjs.append(bj)
                    done0.append((bbest[k] <= 0) | (Ls[k] == 0)
                                 | (~ract[k]))
            else:
                def sink_body(i, st):
                    vs = list(st[:K])
                    rest = list(st[K:])
                    for k in range(K):
                        kb = k * NB
                        act = ract[k] & (i < Vcs[k])
                        v = vs[k]
                        hv = jax.lax.cond(
                            act & (nsuccA[kb + v] == 0),
                            lambda _, k=k, v=v, i=i: hcell(
                                k, i + 1, v, Ls[k]),
                            lambda _: jnp.int32(NEGBIG), None)
                        better = hv > rest[3 * k]
                        rest[3 * k] = jnp.where(better, hv, rest[3 * k])
                        rest[3 * k + 1] = jnp.where(better, v,
                                                    rest[3 * k + 1])
                        rest[3 * k + 2] = jnp.where(better, i,
                                                    rest[3 * k + 2])
                        vs[k] = jnp.where(act, jnp.maximum(nxtA[kb + v], 0),
                                          v)
                    return tuple(vs) + tuple(rest)

                st = jax.lax.fori_loop(
                    0, Vmax, sink_body,
                    tuple(heads) + (jnp.int32(NEGBIG), jnp.int32(0),
                                    jnp.int32(0)) * K)
                for k in range(K):
                    bis.append((st[K + 3 * k + 1], st[K + 3 * k + 2] + 1))
                    bjs.append(Ls[k])
                    done0.append((Ls[k] == 0) | (~ract[k]))

            # ---- clear targets; stage this round's chars into SMEM ----
            Lmax = jnp.int32(0)
            for k in range(K):
                Lmax = jnp.maximum(Lmax, jnp.where(ract[k], Ls[k], 0))

            def tclr(j2, _):
                for k in range(K):
                    kt = k * (LW + 8)
                    packed = chars8(k, r, j2 * 8)
                    for t in range(8):
                        tgtA[kt + j2 * 8 + t] = -1
                        bchA[kt + j2 * 8 + t] = \
                            ((packed >> (4 * t)) & 15) - 1
                return 0

            jax.lax.fori_loop(0, (Lmax + 7) // 8, tclr, 0)

            # ---- traceback: K lockstep provenance chases ----
            def tb_cond(st):
                it = st[0]
                any_undone = jnp.bool_(False)
                for k in range(K):
                    any_undone = any_undone | (~st[4][k])
                return any_undone & (it < TB_CAP)

            def tb_body(st):
                it, nid, irow, jj, done, chan, mode, f1b, f2b, bad = st
                nid, irow, jj = list(nid), list(irow), list(jj)
                done, chan, mode = list(done), list(chan), list(mode)
                f1b, f2b, bad = list(f1b), list(f2b), list(bad)
                cws = []
                for k in range(K):
                    rowc = jnp.clip(irow[k], 1, VW)
                    jc = jnp.clip(jj[k], 0, LW - 1)
                    cws.append(ccell(k, rowc, nid[k], jc))
                for k in range(K):
                    kb = k * NB
                    kt = k * (LW + 8)
                    cw = cws[k]
                    i_, j_, ch, md = irow[k], jj[k], chan[k], mode[k]
                    live = ~done[k]
                    scan = live & (md == 1)
                    norm = live & (md == 0)
                    # out-of-window code read: the path left the stored
                    # window (cannot happen when the band fits) — redo
                    oow = (scan | norm) & (cw < 0) & (i_ > 0)
                    s_hit = scan & (~oow) & (
                        (f1b[k] & (((cw >> 13) & 1) == 1)) |
                        (f2b[k] & (((cw >> 14) & 1) == 1)))
                    s_miss = scan & (~s_hit)
                    s_bad = s_miss & (j_ <= 0)
                    hlike = ch <= 1
                    i0 = i_ == 0
                    if local:
                        stop = norm & hlike & i0
                        lead = jnp.bool_(False)
                    else:
                        stop = norm & hlike & i0 & (j_ == 0)
                        lead = norm & hlike & i0 & (~stop)
                    act = norm & hlike & (~i0) & (~oow)
                    hqeq_c = ((cw >> 10) & 1) == 1
                    hq_route = act & ((ch == 1) | ((ch == 0) & hqeq_c))
                    if local:
                        stop2 = hq_route & (((cw >> 15) & 1) == 1)
                        hq_go = hq_route & (~stop2)
                    else:
                        stop2 = jnp.bool_(False)
                        hq_go = hq_route
                    hqsel_c = (cw >> 8) & 3
                    nidc = jnp.maximum(nid[k], 0)
                    np_ = npredA[kb + nidc]

                    def slotpid(s, kb=kb, nidc=nidc, np_=np_):
                        pid8 = preds8[PCAP * (kb + nidc)
                                      + jnp.minimum(s, PCAP - 1)]
                        return jnp.where(s < np_, pid8, -1)

                    m_take = hq_go & (hqsel_c == 0)
                    e1_in = (hq_go & (hqsel_c == 1)) | \
                        (norm & (~oow) & (ch == 2))
                    e2_in = (hq_go & (hqsel_c == 2)) | \
                        (norm & (~oow) & (ch == 3))
                    f_route = act & (ch == 0) & (~hqeq_c)
                    jm1 = jnp.maximum(j_ - 1, 0)
                    mpid = slotpid(cw & 3)
                    tgtA[jnp.where(m_take, kt + jm1, kt + LW)] = nid[k]
                    e1pid = slotpid((cw >> 2) & 3)
                    e1open_c = ((cw >> 4) & 1) == 1
                    e2pid = slotpid((cw >> 5) & 3)
                    e2open_c = ((cw >> 7) & 1) == 1
                    f1h_c = ((cw >> 11) & 1) == 1
                    f2h_c = ((cw >> 12) & 1) == 1

                    def rowof(pid):
                        return jnp.where(
                            pid < 0, 0,
                            posA[kb + jnp.maximum(pid, 0)] + 1)

                    nn, ni, nj, nch, nmd = nid[k], i_, j_, ch, md
                    nn = jnp.where(m_take, mpid, nn)
                    ni = jnp.where(m_take, rowof(mpid), ni)
                    nj = jnp.where(m_take, j_ - 1, nj)
                    nch = jnp.where(m_take, 0, nch)
                    nn = jnp.where(e1_in, e1pid, nn)
                    ni = jnp.where(e1_in, rowof(e1pid), ni)
                    nch = jnp.where(e1_in, jnp.where(e1open_c, 0, 2), nch)
                    nn = jnp.where(e2_in, e2pid, nn)
                    ni = jnp.where(e2_in, rowof(e2pid), ni)
                    nch = jnp.where(e2_in, jnp.where(e2open_c, 0, 3), nch)
                    nj = jnp.where(f_route, j_ - 1, nj)
                    nmd = jnp.where(f_route, 1, nmd)
                    f1b[k] = jnp.where(f_route, f1h_c, f1b[k])
                    f2b[k] = jnp.where(f_route, f2h_c, f2b[k])
                    nj = jnp.where(s_miss, j_ - 1, nj)
                    nch = jnp.where(s_hit, 1, nch)
                    nmd = jnp.where(s_hit, 0, nmd)
                    nj = jnp.where(lead, j_ - 1, nj)
                    nch = jnp.where(lead, 0, nch)
                    nbad = bad[k] | s_bad | oow | (
                        f_route & (j_ - 1 < 0))
                    ndone = done[k] | stop | stop2 | nbad
                    nid[k], irow[k], jj[k] = nn, ni, nj
                    chan[k], mode[k] = nch, nmd
                    done[k], bad[k] = ndone, nbad
                return (it + 1, tuple(nid), tuple(irow), tuple(jj),
                        tuple(done), tuple(chan), tuple(mode),
                        tuple(f1b), tuple(f2b), tuple(bad))

            st = jax.lax.while_loop(
                tb_cond, tb_body,
                (jnp.int32(0),
                 tuple(b[0] for b in bis),
                 tuple(b[1] for b in bis),
                 tuple(bjs),
                 tuple(done0),
                 (jnp.int32(0),) * K,
                 (jnp.int32(0),) * K,
                 (jnp.bool_(False),) * K,
                 (jnp.bool_(False),) * K,
                 (jnp.bool_(False),) * K))
            tb_bads = [st[9][k] | (~st[4][k]) for k in range(K)]

            # ---- threading: K lockstep guarded-ring walks ----
            def pos_body(j, st2):
                prev = list(st2[0])
                prevpos = list(st2[1])
                guard = list(st2[2])
                Vc_ = list(st2[3])
                head_ = list(st2[4])
                ovf_ = list(st2[5])
                nspl = list(st2[6])
                gspl = list(st2[7])
                prow = list(st2[8])
                for k in range(K):
                    kb = k * NB
                    kt = k * (LW + 8)
                    act = ract[k] & (j < Ls[k])
                    bch = bchA[kt + jnp.minimum(j, LW - 1)]
                    t = tgtA[kt + jnp.minimum(j, LW - 1)]
                    tvalid = act & (t >= 0)
                    t0 = jnp.maximum(t, 0)
                    b0 = baseA[kb + t0]
                    p0 = posA[kb + t0]
                    hit0 = tvalid & (b0 == bch) & (p0 > guard[k])

                    def ring_rest(_, kb=kb, t0=t0, bch=bch, gk=guard[k]):
                        def rbody(s, st3):
                            found, vsel, psel, sawb, cand, wrapped = st3
                            okc = (~found) & (~wrapped)
                            pc = posA[kb + cand]
                            bm = baseA[kb + cand] == bch
                            sawb = sawb | (okc & bm)
                            ok = okc & bm & (pc > gk)
                            vsel = jnp.where(ok, cand, vsel)
                            psel = jnp.where(ok, pc, psel)
                            found = found | ok
                            cn = ringA[kb + cand]
                            wrapped = wrapped | (cn == t0)
                            cand = jnp.where(okc, cn, cand)
                            return (found, vsel, psel, sawb, cand, wrapped)

                        c1 = ringA[kb + t0]
                        found, vsel, psel, sawb, _, _ = jax.lax.fori_loop(
                            0, RING_CAP - 1, rbody,
                            (jnp.bool_(False), jnp.int32(-1),
                             jnp.int32(-1), jnp.bool_(False), c1,
                             c1 == t0))
                        return (found, vsel, psel, sawb)

                    found_r, vsel_r, psel_r, sawb_r = jax.lax.cond(
                        tvalid & (~hit0), ring_rest,
                        lambda _: (jnp.bool_(False), jnp.int32(-1),
                                   jnp.int32(-1), jnp.bool_(False)), None)
                    found = hit0 | found_r
                    vsel = jnp.where(hit0, t0, vsel_r)
                    possel = jnp.where(hit0, p0, psel_r)
                    saw_base = (tvalid & (b0 == bch)) | sawb_r

                    def mk_new(_, k=k, kb=kb, t0=t0, tvalid=tvalid,
                               bch=bch):
                        vnew = Vc_[k]
                        o = vnew >= VW
                        vc = jnp.minimum(vnew, VW - 1)
                        prevc = jnp.maximum(prev[k], 0)
                        baseA[kb + vc] = bch
                        posA[kb + vc] = prevpos[k]
                        npredA[kb + vc] = 0
                        nsuccA[kb + vc] = 0
                        ringA[kb + vc] = jnp.where(tvalid,
                                                   ringA[kb + t0], vc)
                        nxtA[kb + vc] = jnp.where(prev[k] < 0, head_[k],
                                                  nxtA[kb + prevc])

                        @pl.when(prev[k] >= 0)
                        def _():
                            nxtA[kb + prevc] = vc
                        nh = jnp.where(prev[k] < 0, vc, head_[k])
                        return (vc, nh, Vc_[k] + 1, o)

                    create = act & (~found)
                    v, nh, nVc, o = jax.lax.cond(
                        create, mk_new,
                        lambda _: (jnp.where(found, vsel, prev[k]),
                                   head_[k], Vc_[k], jnp.bool_(False)),
                        None)
                    vc0 = jnp.maximum(v, 0)
                    nguard = jnp.where(act & found, possel, guard[k])

                    newspl = create & tvalid

                    @pl.when(newspl)
                    def _(kt=kt, t0=t0, v=v):
                        tgtA[kt + nspl[k]] = t0 | (v << 15)
                    nnspl = jnp.where(newspl, nspl[k] + 1, nspl[k])

                    np_v = npredA[kb + vc0]

                    def hb(p, f, kb=kb, vc0=vc0, np_v=np_v, k=k):
                        return f | ((p < np_v)
                                    & (preds8[PCAP * (kb + vc0)
                                              + jnp.minimum(p, PCAP - 1)]
                                       == prev[k]))

                    has = jax.lax.fori_loop(0, jnp.minimum(np_v, PCAP), hb,
                                            jnp.bool_(False))
                    do_add = act & (prev[k] >= 0) & (~has)

                    def add_edge(_, kb=kb, vc0=vc0, np_v=np_v, k=k):
                        prevc = jnp.maximum(prev[k], 0)
                        preds8[PCAP * (kb + vc0)
                               + jnp.minimum(np_v, PCAP - 1)] = prev[k]
                        npredA[kb + vc0] = np_v + 1
                        nsuccA[kb + prevc] = nsuccA[kb + prevc] + 1
                        return np_v >= PCAP

                    o = o | jax.lax.cond(do_add, add_edge,
                                         lambda _: jnp.bool_(False), None)

                    prow[k] = jnp.where(act & (lane128 == (j & 127)), v,
                                        prow[k])

                    @pl.when(act & (((j & 127) == 127) | (j == Ls[k] - 1)))
                    def _(k=k, j=j):
                        paths_r[k, pl.ds(r * LWr + j // 128, 1), :] = \
                            prow[k]

                    prow[k] = jnp.where((j & 127) == 127,
                                        jnp.full((1, 128), -1, DT),
                                        prow[k])
                    prev[k] = jnp.where(act, v, prev[k])
                    prevpos[k] = jnp.where(act & found, possel,
                                           prevpos[k])
                    guard[k] = nguard
                    Vc_[k] = nVc
                    head_[k] = nh
                    ovf_[k] = ovf_[k] | o
                    nspl[k] = nnspl
                    gspl[k] = jnp.where(create & saw_base, gspl[k] + 1,
                                        gspl[k])
                return tuple(map(tuple, (prev, prevpos, guard, Vc_, head_,
                                         ovf_, nspl, gspl))) + \
                    (tuple(prow),)

            st2 = jax.lax.fori_loop(
                0, Lmax, pos_body,
                ((jnp.int32(-1),) * K, (jnp.int32(-1),) * K,
                 (jnp.int32(-1),) * K, tuple(Vcs), tuple(heads),
                 tuple(ovfs[k] | tb_bads[k] | ovfb[k] for k in range(K)),
                 (jnp.int32(0),) * K, tuple(gss),
                 tuple(jnp.full((1, 128), -1, DT) for _ in range(K))))
            Vc2, head2, ovf2, nspl2, gs2 = (st2[3], st2[4], st2[5],
                                            st2[6], st2[7])

            nsmax = jnp.int32(0)
            for k in range(K):
                nsmax = jnp.maximum(nsmax, nspl2[k])

            def spl_body(k2, _):
                for k in range(K):
                    kb = k * NB
                    kt = k * (LW + 8)
                    ok = k2 < nspl2[k]
                    w = tgtA[kt + jnp.where(ok, k2, LW)]
                    ringA[kb + jnp.where(ok, w & 0x7FFF, VW)] = w >> 15
                return 0

            jax.lax.fori_loop(0, nsmax, spl_body, 0)
            return (tuple(jnp.where(ract[k], head2[k], heads[k])
                          for k in range(K)),
                    tuple(jnp.where(ract[k], Vc2[k], Vcs[k])
                          for k in range(K)),
                    tuple(ovf2[k] for k in range(K)),
                    tuple(gs2))

        Rmax = Rs[0]
        for k in range(1, K):
            Rmax = jnp.maximum(Rmax, Rs[k])
        heads, Vcs, ovfs, gss = jax.lax.fori_loop(
            1, Rmax, _round_work,
            ((jnp.int32(0),) * K, tuple(L0s),
             (jnp.bool_(False),) * K, (jnp.int32(0),) * K))

        # ================= export =================
        Vccs = [jnp.minimum(Vcs[k], VW) for k in range(K)]
        Vcmax = Vccs[0]
        for k in range(1, K):
            Vcmax = jnp.maximum(Vcmax, Vccs[k])

        def expb(i2, _):
            for k in range(K):
                kb = k * NB
                act = i2 < Vccs[k]
                rr = i2 // 128
                mm = (lane128 == (i2 % 128)) & act
                cur0 = exp_r[k, pl.ds(rr, 1), :]
                exp_r[k, pl.ds(rr, 1), :] = jnp.where(
                    mm, baseA[kb + jnp.minimum(i2, VW)], cur0)
                cur1 = exp_r[k, pl.ds(VWr + rr, 1), :]
                exp_r[k, pl.ds(VWr + rr, 1), :] = jnp.where(
                    mm, ringA[kb + jnp.minimum(i2, VW)], cur1)
            return 0

        jax.lax.fori_loop(0, Vcmax, expb, 0)

        def ord_body(i2, vs):
            vs = list(vs)
            for k in range(K):
                kb = k * NB
                act = i2 < Vccs[k]
                rr = 2 * VWr + i2 // 128
                cur = exp_r[k, pl.ds(rr, 1), :]
                exp_r[k, pl.ds(rr, 1), :] = jnp.where(
                    (lane128 == (i2 % 128)) & act, vs[k], cur)
                vs[k] = jnp.where(act, jnp.maximum(nxtA[kb + vs[k]], 0),
                                  vs[k])
            return tuple(vs)

        jax.lax.fori_loop(0, Vcmax, ord_body, tuple(heads))

        for k in range(K):
            meta_r[k, 0, 0] = Vcs[k]
            meta_r[k, 0, 1] = jnp.where(ovfs[k], 1, 0)
            meta_r[k, 0, 2] = Rs[k]
            meta_r[k, 0, 3] = gss[k]

        if DEBUG_DUMP:
            # final round's H|CODE16 plane + per-node offsets (row VW of
            # the dump holds offA for nodes 0..VW-1 as a lane table)
            dbg_r[0, 0:(VW + 1) * KF, :] = HA[pl.ds(0, (VW + 1) * KF), :]

            def offdump(i2, _):
                val = offA[i2] if banded else jnp.int32(0)
                rr = (VW + 1) * KF + i2 // 128
                cur = dbg_r[0, pl.ds(rr, 1), :]
                dbg_r[0, pl.ds(rr, 1), :] = jnp.where(
                    lane128 == (i2 % 128), val, cur)
                return 0

            jax.lax.fori_loop(0, VW, offdump, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((K, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),       # nseq
            pl.BlockSpec((K, 1, 8), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),       # params
            pl.BlockSpec((K, 1, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),       # seq lengths
            pl.BlockSpec((K, RW * SL + FW, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),       # sequences
        ],
        out_specs=[
            pl.BlockSpec((K, 1, 4), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),       # meta
            pl.BlockSpec((K, 3 * VWr, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),       # base/ring/order
            pl.BlockSpec((K, RW * LWr, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),       # paths
        ] + ([pl.BlockSpec((1, (VW + 1) * KF + VWr, 128),
                           lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)]
             if DEBUG_DUMP else []),
        scratch_shapes=[
            pltpu.VMEM(((VW + 1) * KF + FW, 128), DT),   # HA = H | CODE16
            pltpu.VMEM((NPAIR * KF + FW, 128), DT),      # DD = d1|d2 pairs
            pltpu.SMEM((K * (VW + 1),), DT),       # base
            pltpu.SMEM((K * (VW + 1),), DT),       # topo pos
            pltpu.SMEM((K * (VW + 1),), DT),       # pos -> node inverse
            pltpu.SMEM((K * (VW + 1),), DT),       # ring
            pltpu.SMEM((K * (VW + 1),), DT),       # nxt
            pltpu.SMEM((K * (VW + 1),), DT),       # npred
            pltpu.SMEM((K * (VW + 1),), DT),       # nsucc
            pltpu.SMEM((PCAP * K * (VW + 1),), DT),   # pred slots
            pltpu.SMEM((K * (LW + 8),), DT),       # targets / splices
            pltpu.SMEM((K * (LW + 8),), DT),       # round's chars
        ] + ([pltpu.SMEM((K * (VW + 1),), DT),     # min rank
              pltpu.SMEM((K * (VW + 1),), DT),     # max rank
              pltpu.SMEM((K * (VW + 1),), DT)]     # window offsets
             if banded else []),
    )

    pallas_fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B * K, 1, 4), jnp.int32),
            jax.ShapeDtypeStruct((B * K, 3 * VWr, 128), jnp.int32),
            jax.ShapeDtypeStruct((B * K, RW * LWr, 128), jnp.int32),
        ] + ([jax.ShapeDtypeStruct((B, (VW + 1) * KF + VWr, 128),
                                   jnp.int32)] if DEBUG_DUMP else []),
        interpret=interpret,
    )
    return pallas_fn


def _win_fn(K: int, VW: int, LW: int, W: int, RW: int, local: bool,
            interpret: bool, B: int, banded: bool = False):
    import jax.numpy as jnp

    pallas_fn = _win_core(K, VW, LW, W, RW, local, interpret, B, banded)

    def fn(nseq, par, slen, seqs):
        out = pallas_fn(nseq, par, slen.astype(jnp.int32),
                        seqs.astype(jnp.int32))
        meta, exp, paths = out[:3]
        if DEBUG_DUMP:                  # pragma: no cover - debug only
            fn.debug_dump = out[3]
        return meta[:, 0, :], exp.astype(jnp.int16), paths.astype(jnp.int16)

    return fn


@functools.lru_cache(maxsize=64)
def _compiled_win(K: int, VW: int, LW: int, W: int, RW: int, local: bool,
                  interpret: bool, B: int, banded: bool = False):
    import jax

    fn = _win_fn(K, VW, LW, W, RW, local, interpret, B, banded)
    jfn = jax.jit(fn)
    holder = {}

    def call(*args):
        if "c" not in holder:
            lowered = jfn.lower(*args)
            try:
                holder["c"] = lowered.compile(compiler_options={
                    "xla_tpu_scoped_vmem_limit_kib": 112640})
            except Exception:
                holder["c"] = lowered.compile()
        return holder["c"](*args)

    return call


@functools.lru_cache(maxsize=16)
def _compiled_win_sharded(K: int, VW: int, LW: int, W: int, RW: int,
                          local: bool, interpret: bool, B: int,
                          n_dev: int, banded: bool = False):
    """Data-parallel windowed kernel over a 1-D device mesh (SURVEY §5.8)."""
    import jax
    import numpy as np_
    from jax.sharding import Mesh, PartitionSpec as P

    fn = _win_fn(K, VW, LW, W, RW, local, interpret, B, banded=banded)
    devs = jax.devices()
    if len(devs) < n_dev:
        raise RuntimeError(
            f"sharded windowed engine needs {n_dev} devices, "
            f"backend has {len(devs)}")
    mesh = Mesh(np_.array(devs[:n_dev]), ("blocks",))
    sfn = jax.shard_map(fn, mesh=mesh, in_specs=(P("blocks"),) * 4,
                        out_specs=(P("blocks"),) * 3, check_vma=False)
    jfn = jax.jit(sfn)
    holder = {}

    def call(*args):
        if "c" not in holder:
            lowered = jfn.lower(*args)
            try:
                holder["c"] = lowered.compile(compiler_options={
                    "xla_tpu_scoped_vmem_limit_kib": 112640})
            except Exception:
                holder["c"] = lowered.compile()
        return holder["c"](*args)

    return call
