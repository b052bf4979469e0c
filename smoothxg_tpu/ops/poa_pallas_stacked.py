"""Stacked-block fused Pallas kernel: K blocks' POA loops in LOCKSTEP.

The fused kernel (ops/poa_pallas_fused.py) is INSTRUCTION-ISSUE-bound:
probes put ~34 ns of issue overhead on every vector op regardless of tile
size ((16,256) is timing-neutral vs (8,256); a masked roll+max step costs
98/89/100/112 ns at (8/16/32/64, 256) — tools/probe_stack.py on a real
v5e).  Its folded (8, LANES) DP row is 2-8 VREGs of real data riding ~50
vector ops that could each carry 8x the data for free.  This kernel stacks
K blocks per grid step: their current DP rows form ONE (K*8, LANES) plane,
K independent SMEM topo walks advance in lockstep, and every vector op in
the fill carries K blocks.  Measured: K=8 carries 8x the data for +14%
per-op cost.

Key structural change vs the unstacked kernel: DP planes are indexed by
TOPOLOGICAL POSITION, not node id.  At fill step i all K blocks write
their (different) current nodes' rows — by position they are all "row i",
so the three plane writes per step are single (K*8, LANES) stores at
offset (i+1)*K*8 instead of 3K scattered stores.  Predecessor rows are
read per block at (posA[pred]+1) — the topo walk refreshes posA before
any successor reads it, exactly as the unstacked kernel already relies on
for its threading guard.  The traceback chases (node, position) pairs:
node ids resolve pred slots in SMEM, positions index the code plane.

Divergence across the K lockstep blocks is handled branch-free:
  * different node counts: the fill runs to max(Vc_k); a block whose walk
    ended keeps writing into its plane rows PAST its own Vc — garbage
    beyond the region any later stage reads (traceback/sink reads stop at
    its own fill extent) — while its SMEM stores route to the per-block
    dummy slot and its best-cell vectors are masked by an active-bit
    plane (one packed scalar -> 3 vector ops);
  * different round counts / pred counts: rounds run to max(R_k) with
    L=0 masking the finished blocks; the pred loop runs to max(npred_k)
    with out-of-range slots loading a shared NEG16 row (a reserved plane
    region) so they can never win a max;
  * the per-sequence F-scan of the traceback is FLATTENED into the main
    while loop (one code-plane read per block per iteration, the K reads
    independent so they hoist) instead of a nested data-dependent scan.

Per-block parameters (adaptive penalties differ across blocks!) become
(K*8, LANES) planes built once per grid step; the per-row base-character
match uses one packed scalar (4 bits per block) broadcast + variable
shift instead of K selects.

Semantics are bit-identical to ops/poa_fused.py (numpy oracle) /
native/cpoa.cpp / ops/poa_pallas_fused.py — the same seed / fill /
provenance-code traceback / guarded-ring threading spec (reference:
src/smooth.cpp:744-753 spoa Align/AddAlignment per sequence, the whole
per-block loop of src/smooth.cpp:1904 OMP tasks).  Mosaic constraints and
the int16 packed score range are as documented in poa_pallas_fused.py.

A second memory lever beyond stacking: the unstacked kernel stores THREE
int32 planes per cell (H|Hq, E1|E2, code) but its Hq half is write-only —
the traceback reads codes, never Hq.  This kernel stores TWO planes —
H|E1 and E2|CODE16 — at 8 bytes/cell, which buys 1.5x more K*VW*LANES
under the ~110 MB scoped-VMEM budget (the binding constraint at DRB1
block sizes, where final V runs 1300-2700).  The 16-bit code requires
2-bit pred-slot fields, so pred slots are capped at 4 per node (PCAP);
a 5th distinct predecessor overflows to the native redo exactly like
node-capacity overflow.  Measured DRB1: zero blocks have >4-pred nodes.

Capacity overflow (node count past VW, a PCAP+1'th pred slot, traceback
trouble) sets the per-block meta flag and the engine redoes that block on
the native C++ engine — never a silent truncation.
"""
from __future__ import annotations

import functools

import numpy as np

NEG16 = -16000
NEGBIG = -(1 << 30)
RING_CAP = 8
FOLD = 8
PCAP = 4          # pred slots per node (2-bit slot fields in CODE16)


@functools.lru_cache(maxsize=16)
def _stacked_core(K: int, VW: int, LW: int, RW: int, local: bool,
                  interpret: bool, B: int, stage: int = 0,
                  banded: bool = False):
    """B = number of GRID steps; the dispatch covers B*K blocks.
    stage: profiling knob (0 full, 1 fill+end-cell only, 2 skip
    threading) — invalid graphs by design when != 0."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    DT = jnp.int32
    assert VW < (1 << 15), "pending-splice packing needs node ids < 2^15"
    assert K * 4 <= 32, "packed base-char scalar holds K 4-bit fields"
    VWr = VW // 128
    LWr = LW // 128
    LANES = LW // FOLD
    KF = K * FOLD
    OFF = 16384
    # flattened F-scans add <= LW steps per trace
    TB_CAP = 2 * (VW + LW + 8) + LW
    NB = VW + 1          # per-block SMEM array stride (slot VW = dummy)
    NEGOFF = (VW + 1) * KF   # shared NEG16 row region in the DP planes

    def kernel(nseq_s, par_s, slen_r, seqs_r,
               meta_r, exp_r, paths_r,
               HA, EB,
               baseA, posA, nodeat, ringA, nxtA, npredA, nsuccA, preds8,
               tgtA, bchA, *rankA):
        if banded:
            mrA, MrA = rankA
        lane128 = jax.lax.broadcasted_iota(DT, (1, 128), 1)
        subf = jax.lax.broadcasted_iota(DT, (FOLD, LANES), 0)
        lanef1 = jax.lax.broadcasted_iota(DT, (FOLD, LANES), 1)
        colidx1 = subf * LANES + lanef1        # per-block folded col index
        subK = jax.lax.broadcasted_iota(DT, (KF, LANES), 0)
        lanef = jax.lax.broadcasted_iota(DT, (KF, LANES), 1)
        subKh = subK % FOLD
        blkidx = subK // FOLD
        colidx = subKh * LANES + lanef         # per-block col, stacked
        sub2 = jax.lax.broadcasted_iota(DT, (2 * KF, LANES), 0)
        lanef2 = jax.lax.broadcasted_iota(DT, (2 * KF, LANES), 1)
        sub2h = sub2 % FOLD

        NEGROW = jnp.full((KF, LANES), NEG16, DT)
        ZROW = jnp.zeros((KF, LANES), DT)

        def pack2(lo, hi):
            return ((jnp.maximum(hi, NEG16) + OFF) << 16) | \
                   (jnp.maximum(lo, NEG16) + OFF)

        def lo16(v):
            return (v & 0xFFFF) - OFF

        def b1(x):
            return jnp.where(x, 1, 0)

        def fshift1(x, fill):
            """out[c] = x[c-1] (c >= 1) per block, else fill.  The sublane
            roll crosses block boundaries only into rows whose per-block
            column 0 is masked to fill."""
            r1 = pltpu.roll(x, 1, axis=1)
            fixed = jnp.where(lanef == 0, pltpu.roll(r1, 1, axis=0), r1)
            return jnp.where(colidx >= 1, fixed, fill)

        def cummax2(x, y):
            """Per-block-column prefix max of two (KF, LANES) channel
            stacks in ONE (2*KF, LANES) shift-max chain."""
            s = jnp.concatenate([x, y], axis=0)
            k = 1
            while k < LANES:
                r = pltpu.roll(s, k, axis=1)
                s = jnp.maximum(s, jnp.where(lanef2 >= k, r, NEG16))
                k *= 2
            rm = jnp.broadcast_to(jnp.max(s, axis=1, keepdims=True),
                                  (2 * KF, LANES))
            ex = jnp.where(sub2h >= 1, pltpu.roll(rm, 1, axis=0), NEG16)
            k = 1
            while k < FOLD:
                ex = jnp.maximum(
                    ex, jnp.where(sub2h >= k, pltpu.roll(ex, k, axis=0),
                                  NEG16))
                k *= 2
            s = jnp.maximum(s, ex)
            return s[:KF, :], s[KF:, :]

        lanefr = jax.lax.broadcasted_iota(DT, (1, LANES), 1)

        def ccell(k, row, j):
            """CODE16 of block k at DP row `row` (= topo pos + 1),
            column j — the hi half of the EB word.  Sum-extract: the EB
            word's sign bit can be set (hqz lives at code bit 15), so a
            max-reduce against a filler would be wrong."""
            r = EB[pl.ds(row * KF + k * FOLD + j // LANES, 1), :]
            w = jnp.sum(jnp.where(lanefr == (j % LANES), r, 0))
            return (w >> 16) & 0xFFFF

        def hcell(k, row, j):
            r = HA[pl.ds(row * KF + k * FOLD + j // LANES, 1), :]
            return jnp.max(jnp.where(lanefr == (j % LANES), r, NEGBIG))

        Rs = [nseq_s[k, 0, 0] for k in range(K)]
        pars = [[par_s[k, 0, t] for t in range(8)] for k in range(K)]

        def slen_at(k, r_):
            return jnp.max(jnp.where(lane128 == r_, slen_r[k, 0:1, :], 0))

        def per_block_plane(vals):
            """(KF, LANES) plane holding vals[k] on block k's rows."""
            p = jnp.full((KF, LANES), vals[0], DT)
            for k in range(1, K):
                p = jnp.where(blkidx == k, vals[k], p)
            return p

        mP = per_block_plane([pars[k][0] for k in range(K)])
        nP = per_block_plane([pars[k][1] for k in range(K)])
        gP = per_block_plane([pars[k][2] for k in range(K)])
        eP = per_block_plane([pars[k][3] for k in range(K)])
        qP = per_block_plane([pars[k][4] for k in range(K)])
        cP = per_block_plane([pars[k][5] for k in range(K)])
        ej = eP * colidx
        cj = cP * colidx
        f1cP = eP - gP - ej          # F1 = fshift1(G1) + f1cP
        f2cP = cP - qP - cj

        def chars8(k, r_, jbase):
            """Chars of positions jbase..jbase+7 of block k's sequence r_,
            packed 4 bits each as (char+1) — see poa_pallas_fused.chars8."""
            slab = seqs_r[k, pl.ds(r_ * FOLD, FOLD), :]
            kk = colidx1 - (jbase + 1)
            win = (kk >= 0) & (kk < 8)
            kc = jnp.where(win, kk, 0)
            w = jnp.where((kc & 1) > 0, 16, 1)
            w = w * jnp.where((kc & 2) > 0, 256, 1)
            w = w * jnp.where((kc & 4) > 0, 65536, 1)
            return jnp.sum(jnp.where(win, (slab + 1) * w, 0))

        # shared NEG16 pred row (out-of-range pred slots load this):
        # H = E1 = E2 = NEG16, code irrelevant
        HA[pl.ds(NEGOFF, FOLD), :] = jnp.full(
            (FOLD, LANES), pack2(NEG16, NEG16), DT)
        EB[pl.ds(NEGOFF, FOLD), :] = jnp.full(
            (FOLD, LANES), pack2(NEG16, 0), DT)

        # ================= seed every block from its sequence 0 =========
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
            heads, Vcs, ovfs, gss = carry     # tuples of K scalars
            Ls = [slen_at(k, r) for k in range(K)]
            # a block is live this round iff it still has sequences and
            # hasn't overflowed (the unstacked kernel skips the whole
            # round for overflowed blocks; here we mask instead)
            ract = [(r < Rs[k]) & (~ovfs[k]) for k in range(K)]
            Lplane = per_block_plane(
                [jnp.where(ract[k], Ls[k], 0) for k in range(K)])
            colmask = colidx <= Lplane
            Vmax = jnp.int32(0)
            for k in range(K):
                Vmax = jnp.maximum(Vmax, jnp.where(ract[k], Vcs[k], 0))
            seqv32 = jnp.concatenate(
                [seqs_r[k, pl.ds(r * FOLD, FOLD), :] for k in range(K)],
                axis=0)

            if banded:
                # rank prepass (oracle: poa_host.node_ranks), K lockstep
                # scalar walks
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
                        Ds[k] = jnp.where(act, jnp.maximum(Ds[k], Mv), Ds[k])
                    return tuple(vs) + tuple(Ds)

                st = jax.lax.fori_loop(
                    0, Vmax, rank_body,
                    tuple(heads) + (jnp.int32(0),) * K)
                Dgs = st[K:]
                for k in range(K):
                    bws.append(pars[k][6] + (pars[k][7] * Ls[k]) // 1000)
                    adls.append(jnp.maximum(0, Dgs[k] - Ls[k]))
                    adrs.append(jnp.maximum(0, Ls[k] - Dgs[k]))

            # ---- DP row 0 (all K blocks) ----
            if local:
                row0 = jnp.where(colmask, 0, NEG16)
            else:
                gap1 = -(gP + (colidx - 1) * eP)
                gap2 = -(qP + (colidx - 1) * cP)
                row0 = jnp.maximum(gap1, gap2)
                row0 = jnp.where(colidx == 0, 0, row0)
                row0 = jnp.where(colmask, row0, NEG16)
            # boundary row: H = row0, E1 = E2 = NEG16, code 0
            HA[pl.ds(0, KF), :] = pack2(row0, NEG16).astype(DT)
            EB[pl.ds(0, KF), :] = jnp.full((KF, LANES),
                                           pack2(NEG16, 0), DT)

            # ---- fill: K lockstep topo walks; DP row = topo pos + 1 ----
            def fill_body(i, st):
                vs = list(st[0])
                bvec, bfill = st[1], st[2]
                bb = jnp.int32(0)    # packed base chars, 4 bits per block
                ab = jnp.int32(0)    # packed active bits
                nps = []
                npm = jnp.int32(1)
                for k in range(K):
                    kb = k * NB
                    v = vs[k]
                    act = ract[k] & (i < Vcs[k])
                    bb = bb | ((baseA[kb + v] + 1) << (4 * k))
                    ab = ab | (jnp.where(act, 1, 0) << k)
                    ia = kb + jnp.where(act, v, VW)
                    posA[ia] = i
                    # pos -> node inverse: the end-cell / traceback start
                    # recovers the best node from its fill step without a
                    # per-row vector carry
                    nodeat[kb + jnp.where(act, jnp.minimum(i, VW - 1), VW)] \
                        = v
                    np_ = npredA[kb + v]
                    nps.append(np_)
                    npm = jnp.maximum(npm, jnp.where(act, np_, 0))

                def ploop(p, acc):
                    hmax, e1mx, e2mx, hs, e1s, e2s = acc
                    hhp, eep = [], []
                    for k in range(K):
                        kb = k * NB
                        okp = p < nps[k]
                        pid = preds8[PCAP * (kb + vs[k])
                                     + jnp.minimum(p, PCAP - 1)]
                        use0 = (p == 0) & (nps[k] == 0)
                        prow = posA[kb + jnp.maximum(pid, 0)] + 1
                        # row-unit index x FOLD at the ds site so Mosaic
                        # can prove the sublane offset is 8-aligned
                        u = jnp.where(
                            okp, prow * K + k,
                            jnp.where(use0, k, (VW + 1) * K))
                        hhp.append(HA[pl.ds(FOLD * u, FOLD), :])
                        eep.append(EB[pl.ds(FOLD * u, FOLD), :])
                    hh = jnp.concatenate(hhp, axis=0)
                    ee = jnp.concatenate(eep, axis=0)
                    h = lo16(hh)
                    x1 = ((hh >> 16) & 0xFFFF) - OFF
                    x2 = lo16(ee)
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
                    bandm = (colidx >= bloP) & (colidx <= bhiP)
                    hq = jnp.where(bandm, hq, NEG16)
                    e1r = jnp.where(bandm, e1r, NEG16)
                    e2r = jnp.where(bandm, e2r, NEG16)
                g1in = hq + ej
                g2in = hq + cj
                G1, G2 = cummax2(g1in, g2in)
                f1new = g1in == G1
                F1 = fshift1(G1, NEG16) + f1cP
                f2new = g2in == G2
                F2 = fshift1(G2, NEG16) + f2cP
                Hrow = jnp.maximum(hq, jnp.maximum(F1, F2))
                if banded:
                    Hrow = jnp.where(bandm, Hrow, NEG16)
                # CODE16 layout: mslot:0-1 e1slot:2-3 e1o:4 e2slot:5-6
                # e2o:7 hqsel:8-9 hqH:10 f1H:11 f2H:12 f1new:13 f2new:14
                # hqz:15  (2-bit slots <- PCAP = 4)
                code = (mslotr | (e1slotr << 2) | (b1(e1o) << 4)
                        | (e2slotr << 5) | (b1(e2o) << 7)
                        | (hqselr << 8) | (b1(hq == Hrow) << 10)
                        | (b1(F1 == Hrow) << 11)
                        | (b1(F2 == Hrow) << 12)
                        | (b1(f1new) << 13) | (b1(f2new) << 14)
                        | (hqz << 15))
                HA[pl.ds(FOLD * ((i + 1) * K), KF), :] = \
                    pack2(Hrow, e1r).astype(DT)
                EB[pl.ds(FOLD * ((i + 1) * K), KF), :] = (
                    (code << 16) |
                    (jnp.maximum(e2r, NEG16) + OFF)).astype(DT)
                if local:
                    actp = ((ab >> blkidx) & 1) == 1
                    Hm = jnp.where(colmask & actp, Hrow, NEG16)
                    upd = Hm > bvec
                    bvec = jnp.where(upd, Hm, bvec)
                    bfill = jnp.where(upd, i, bfill)
                for k in range(K):
                    kb = k * NB
                    adv = ract[k] & (i + 1 < Vcs[k])
                    vs[k] = jnp.where(adv, jnp.maximum(nxtA[kb + vs[k]], 0),
                                      vs[k])
                return (tuple(vs), bvec, bfill)

            st = jax.lax.fori_loop(
                0, Vmax, fill_body,
                (tuple(heads), NEGROW, ZROW - 1))
            bvec, bfill = st[1], st[2]

            # ---- end cells ----
            bis, bjs, done0 = [], [], []
            if local:
                for k in range(K):
                    sl = slice(k * FOLD, (k + 1) * FOLD)
                    bv = jnp.max(bvec[sl])
                    eqm = bvec[sl] == bv
                    rstar = jnp.min(jnp.where(eqm, bfill[sl], VW + LW))
                    m2 = eqm & (bfill[sl] == rstar)
                    bj = jnp.min(jnp.where(m2, colidx1, LW))
                    # start row = rstar + 1 (the best cell's fill step);
                    # the node there comes from the pos->node inverse map
                    bn = nodeat[k * NB + jnp.clip(rstar, 0, VW - 1)]
                    bis.append((jnp.maximum(bn, 0),
                                jnp.maximum(rstar, -1) + 1))
                    bjs.append(bj)
                    done0.append((bv <= 0) | (Ls[k] == 0) | (~ract[k]))
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
                            lambda _, k=k, i=i: lo16(
                                hcell(k, i + 1, Ls[k])),
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
                        bchA[kt + j2 * 8 + t] = ((packed >> (4 * t)) & 15) - 1
                return 0

            jax.lax.fori_loop(0, (Lmax + 7) // 8, tclr, 0)

            # ---- traceback: K lockstep provenance chases; the F scan is
            # flattened into the main loop (mode 1) so each iteration does
            # exactly ONE independent code read per block ----
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
                    cws.append(ccell(k, rowc, jc))
                for k in range(K):
                    kb = k * NB
                    kt = k * (LW + 8)
                    cw = cws[k]
                    i_, j_, ch, md = irow[k], jj[k], chan[k], mode[k]
                    live = ~done[k]
                    scan = live & (md == 1)
                    norm = live & (md == 0)
                    # --- scan mode: look for the F-renewal cell ---
                    s_hit = scan & (
                        (f1b[k] & (((cw >> 13) & 1) == 1)) |
                        (f2b[k] & (((cw >> 14) & 1) == 1)))
                    s_miss = scan & (~s_hit)
                    s_bad = s_miss & (j_ <= 0)
                    # --- normal mode ---
                    hlike = ch <= 1
                    i0 = i_ == 0
                    if local:
                        stop = norm & hlike & i0
                        lead = jnp.bool_(False)
                    else:
                        stop = norm & hlike & i0 & (j_ == 0)
                        lead = norm & hlike & i0 & (~stop)
                    act = norm & hlike & (~i0)
                    hqeq_c = ((cw >> 10) & 1) == 1
                    hq_route = act & ((ch == 1) | ((ch == 0) & hqeq_c))
                    if local:
                        stop2 = hq_route & (((cw >> 15) & 1) == 1)
                        hq_go = hq_route & (~stop2)
                    else:
                        stop2 = jnp.bool_(False)
                        hq_go = hq_route
                    hqsel_c = (cw >> 8) & 3
                    # nid can be -1 (boundary row) on done/leading states:
                    # clamp every SMEM index derived from it
                    nidc = jnp.maximum(nid[k], 0)
                    np_ = npredA[kb + nidc]

                    def slotpid(s, kb=kb, nidc=nidc, np_=np_):
                        pid8 = preds8[PCAP * (kb + nidc)
                                      + jnp.minimum(s, PCAP - 1)]
                        return jnp.where(s < np_, pid8, -1)

                    m_take = hq_go & (hqsel_c == 0)
                    e1_in = (hq_go & (hqsel_c == 1)) | (norm & (ch == 2))
                    e2_in = (hq_go & (hqsel_c == 2)) | (norm & (ch == 3))
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
                    # entering the F scan: j starts at j-1, remember which
                    # renewal bits count
                    nj = jnp.where(f_route, j_ - 1, nj)
                    nmd = jnp.where(f_route, 1, nmd)
                    f1b[k] = jnp.where(f_route, f1h_c, f1b[k])
                    f2b[k] = jnp.where(f_route, f2h_c, f2b[k])
                    # scan stepping
                    nj = jnp.where(s_miss, j_ - 1, nj)
                    nch = jnp.where(s_hit, 1, nch)
                    nmd = jnp.where(s_hit, 0, nmd)
                    # global leading gap
                    nj = jnp.where(lead, j_ - 1, nj)
                    nch = jnp.where(lead, 0, nch)
                    nbad = bad[k] | s_bad | (
                        f_route & (j_ - 1 < 0))
                    ndone = done[k] | stop | stop2 | nbad
                    nid[k], irow[k], jj[k] = nn, ni, nj
                    chan[k], mode[k] = nch, nmd
                    done[k], bad[k] = ndone, nbad
                return (it + 1, tuple(nid), tuple(irow), tuple(jj),
                        tuple(done), tuple(chan), tuple(mode),
                        tuple(f1b), tuple(f2b), tuple(bad))

            if stage == 1:
                tb_bads = [jnp.bool_(False)] * K
            else:
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

            if stage == 1:
                return (tuple(heads), tuple(Vcs),
                        tuple(ovfs[k] | tb_bads[k] for k in range(K)),
                        tuple(gss))

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
                             jnp.int32(-1), jnp.bool_(False), c1, c1 == t0))
                        return (found, vsel, psel, sawb)

                    found_r, vsel_r, psel_r, sawb_r = jax.lax.cond(
                        tvalid & (~hit0), ring_rest,
                        lambda _: (jnp.bool_(False), jnp.int32(-1),
                                   jnp.int32(-1), jnp.bool_(False)), None)
                    found = hit0 | found_r
                    vsel = jnp.where(hit0, t0, vsel_r)
                    possel = jnp.where(hit0, p0, psel_r)
                    # guard-split detection (see ops/poa_pallas_fused)
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
                        ringA[kb + vc] = jnp.where(tvalid, ringA[kb + t0],
                                                   vc)
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
                                        jnp.full((1, 128), -1, DT), prow[k])
                    prev[k] = jnp.where(act, v, prev[k])
                    prevpos[k] = jnp.where(act & found, possel, prevpos[k])
                    guard[k] = nguard
                    Vc_[k] = nVc
                    head_[k] = nh
                    ovf_[k] = ovf_[k] | o
                    nspl[k] = nnspl
                    gspl[k] = jnp.where(create & saw_base, gspl[k] + 1,
                                        gspl[k])
                return tuple(map(tuple, (prev, prevpos, guard, Vc_, head_,
                                         ovf_, nspl, gspl))) + (tuple(prow),)

            if stage == 2:
                return (tuple(heads), tuple(Vcs),
                        tuple(ovfs[k] | tb_bads[k] for k in range(K)),
                        tuple(gss))

            st2 = jax.lax.fori_loop(
                0, Lmax, pos_body,
                ((jnp.int32(-1),) * K, (jnp.int32(-1),) * K,
                 (jnp.int32(-1),) * K, tuple(Vcs), tuple(heads),
                 tuple(ovfs[k] | tb_bads[k] for k in range(K)),
                 (jnp.int32(0),) * K, tuple(gss),
                 tuple(jnp.full((1, 128), -1, DT) for _ in range(K))))
            Vc2, head2, ovf2, nspl2, gs2 = (st2[3], st2[4], st2[5], st2[6],
                                            st2[7])

            # apply the deferred ring splices (per block)
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
            pl.BlockSpec((K, RW * FOLD, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),       # sequences
        ],
        out_specs=[
            pl.BlockSpec((K, 1, 4), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),       # meta
            pl.BlockSpec((K, 3 * VWr, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),       # base/ring/order
            pl.BlockSpec((K, RW * LWr, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),       # paths
        ],
        scratch_shapes=[
            pltpu.VMEM(((VW + 1) * KF + FOLD, LANES), DT),   # HA = H | E1
            pltpu.VMEM(((VW + 1) * KF + FOLD, LANES), DT),   # EB = E2|CODE
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
        ] + ([pltpu.SMEM((K * (VW + 1),), DT),
              pltpu.SMEM((K * (VW + 1),), DT)] if banded else []),
    )

    pallas_fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B * K, 1, 4), jnp.int32),
            jax.ShapeDtypeStruct((B * K, 3 * VWr, 128), jnp.int32),
            jax.ShapeDtypeStruct((B * K, RW * LWr, 128), jnp.int32),
        ],
        interpret=interpret,
    )
    return pallas_fn


def _stacked_fn(K: int, VW: int, LW: int, RW: int, local: bool,
                interpret: bool, B: int, stage: int = 0,
                banded: bool = False):
    import jax.numpy as jnp

    pallas_fn = _stacked_core(K, VW, LW, RW, local, interpret, B, stage,
                              banded)

    def fn(nseq, par, slen, seqs):
        meta, exp, paths = pallas_fn(nseq, par, slen.astype(jnp.int32),
                                     seqs.astype(jnp.int32))
        return meta[:, 0, :], exp.astype(jnp.int16), paths.astype(jnp.int16)

    return fn


@functools.lru_cache(maxsize=64)
def _compiled_stacked(K: int, VW: int, LW: int, RW: int, local: bool,
                      interpret: bool, B: int, stage: int = 0,
                      banded: bool = False):
    import jax

    fn = _stacked_fn(K, VW, LW, RW, local, interpret, B, stage, banded)
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
def _compiled_stacked_sharded(K: int, VW: int, LW: int, RW: int,
                              local: bool, interpret: bool, B: int,
                              n_dev: int, banded: bool = False):
    """Data-parallel stacked kernel: global batch (B*n_dev grid steps)
    sharded over a 1-D device mesh via shard_map (SURVEY §5.8)."""
    import jax
    import numpy as np_
    from jax.sharding import Mesh, PartitionSpec as P

    fn = _stacked_fn(K, VW, LW, RW, local, interpret, B, banded=banded)
    devs = jax.devices()
    if len(devs) < n_dev:
        raise RuntimeError(
            f"sharded stacked engine needs {n_dev} devices, "
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
