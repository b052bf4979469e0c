"""Fused Pallas TPU kernel: the ENTIRE per-block POA loop in one dispatch.

Round 1 dispatched one device call per POA *round* (align one sequence of
every block, update graphs on host, repeat) — 52 dispatches per DRB1
iteration with ~0.3 s tunnel latency each, 77% of smoothing time spent
waiting (VERDICT.md).  This kernel instead runs, per block, the reference's
whole sequential loop (align sequence r against the growing POA graph,
thread it in, repeat — reference: src/smooth.cpp:744-753 spoa
Align/AddAlignment per sequence) ON DEVICE, over the fused semantics
specified by ops/poa_fused.py (numpy oracle; native/cpoa.cpp is the C++
twin).  One pallas_call processes a whole batch of blocks (grid=B) and
returns final graphs: bit-for-bit identical to the oracle.

Performance structure (v3 — shaped by the slope-based probes in
tools/probe_loop2.py / probe_smem2.py):
  * The v5e scalar-cost hierarchy: SMEM scalar read 3.6ns, dynamic-sublane
    slab read 4.7ns, masked VMEM row write 2.6ns, empty loop iteration
    4.4ns — but a masked VMEM LANE READ (row load + lane mask + max-reduce
    into an SREG) costs ~235ns in a dependent chain (~45ns when 8
    independent ones are hoisted together).  v2 did 3-6 such reads per DP
    row / traceback step / threading position, which made the kernel
    scalar-extraction-bound (~1.65us/row).
  * v3 therefore keeps ALL per-node scalar metadata in SMEM scratch —
    base, topo position, ring, next-in-topo-list, pred/succ counts, and
    the first 8 predecessor ids (preds8) — so the fill's topo walk, the
    traceback's provenance chase, and the threading loop do pure-scalar
    SMEM work.  Predecessor slots >= 8 overflow into a VMEM plane read by
    a (rare) masked lane read behind a lax.cond.
  * DP rows stay FOLDED to (FOLD, LW/FOLD) int32 with two packed int16
    scores per word: column j lives at (sublane j//LANES, lane j%LANES);
    the +1 column shift crosses the fold with a lane-roll + sublane-roll
    blend, and the F-channel prefix max is a lane scan + cross-sublane
    exclusive prefix.
  * The local-mode best-cell search is carried as per-column VECTORS
    (best value / fill position / node id) updated in the fill and reduced
    ONCE per round (4 reduces) instead of a per-row max-reduce.
  * Sequence characters are extracted 8 at a time with a single packed
    sum-reduce ((char+1) * 8^k over an 8-column window) for the seed loop
    and the threading loop.
  * The fill records PROVENANCE CODES per cell (one int32 plane: argmax
    pred slots for M/E1/E2, open-vs-extend bits, hq/H channel selectors,
    F cummax-renewal bits).  The traceback is a pure code chase — its one
    remaining dependent masked read per step (the code word) is the
    kernel's scalar floor.

Per grid step (= one block): seed the graph from sequence 0 as a chain;
for each later sequence walk the topo linked list filling the DP, locate
the end cell, chase the code plane writing match targets into an SMEM
target array, then thread the sequence (guarded aligned-ring reuse or
new-node creation with O(1) linked-list insertion — see poa_fused.py for
why this keeps the list topological).  Export base/ring/order planes and
per-sequence node paths; everything else (edges, weights, consensus, MSA)
is reconstructed on host from the paths (ops/poa_fused.rehydrate).

Mosaic constraints (no dynamic lane indexing, no scalar stores to VMEM,
masked row blends for writes) are the same as ops/poa_pallas.py.

Score range: packed int16 halves with floor NEG16 = -16000.  Provenance
bits become meaningless for cells whose E chains hit the clamp floor, but
such cells score below any real alignment path for LW <= 2048 with
smoothxg penalty sets (|min score| ~ g + (LW-1)*e ~ 4.1k), so the traced
path never visits them.  Revisit before raising LW past ~6k.

Overflow (node capacity, pred slots, a traceback overrun) sets a meta
flag; the engine redoes that block on the native C++ engine — never a
silent truncation.
"""
from __future__ import annotations

import functools
import os

import numpy as np

NEG16 = -16000
NEGBIG = -(1 << 30)
RING_CAP = 8
FOLD = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=8)
def _pallas_core(VW: int, LW: int, RW: int, local: bool, interpret: bool,
                 B: int, stage: int = 0, banded: bool = False):
    # stage is a PROFILING knob (tools/profile_fused.py): 0 = full kernel,
    # 1 = fill + end-cell only (skip traceback + threading), 2 = skip
    # threading only, 3 = threading without the ring scan, 4 = threading
    # without node creation / edge bookkeeping (reuse-only), to attribute
    # threading time to its branches.  stage != 0 produces invalid graphs
    # by design.
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    DT = jnp.int32
    assert VW < (1 << 15), "pending-splice packing needs node ids < 2^15"
    VWr = VW // 128
    LWr = LW // 128
    LANES = LW // FOLD
    OFF = 16384
    TB_CAP = 2 * (VW + LW + 8)   # traceback iteration safety cap

    def kernel(nseq_s, par_s, slen_r, seqs_r,
               meta_r, exp_r, paths_r,
               HH, EE, CC,
               baseA, posA, ringA, nxtA, npredA, nsuccA, preds8, tgtA,
               bchA, *rankA):
        # Branch-free hot loops: Mosaic lowers lax.cond to predicated
        # execution of BOTH sides, so a cond whose untaken side holds a
        # masked VMEM lane read (~235ns) costs the read every iteration.
        # All per-node state lives in SMEM; conditional scalar stores are
        # unconditional stores whose INDEX selects a dummy slot (VW / 8*VW
        # / L) when inactive.  Predecessor slots are capped at 8 — a ninth
        # edge sets ovf and the block redoes on the native engine.
        if banded:
            mrA, MrA = rankA       # SMEM min/max topological rank per node
        lane128 = jax.lax.broadcasted_iota(DT, (1, 128), 1)
        subf = jax.lax.broadcasted_iota(DT, (FOLD, LANES), 0)
        lanef = jax.lax.broadcasted_iota(DT, (FOLD, LANES), 1)
        colidx = subf * LANES + lanef          # folded column index

        def pack2(lo, hi):
            return ((jnp.maximum(hi, NEG16) + OFF) << 16) | \
                   (jnp.maximum(lo, NEG16) + OFF)

        def lo16(v):
            return (v & 0xFFFF) - OFF

        def b1(x):
            return jnp.where(x, 1, 0)

        # ---- folded-row helpers ----
        def fshift1(x, fill):
            """out[c] = x[c-1] (c >= 1), else fill — across the fold."""
            r1 = pltpu.roll(x, 1, axis=1)
            fixed = jnp.where(lanef == 0, pltpu.roll(r1, 1, axis=0), r1)
            return jnp.where(colidx >= 1, fixed, fill)

        def row_shift_right(x, k):
            r = pltpu.roll(x, k, axis=1)
            return jnp.where(lanef >= k, r, NEG16)

        subf2 = jax.lax.broadcasted_iota(DT, (2 * FOLD, LANES), 0)
        lanef2 = jax.lax.broadcasted_iota(DT, (2 * FOLD, LANES), 1)
        subf2h = subf2 % FOLD          # row index within each stacked half

        def cummax_f(x):
            """Prefix max over folded columns."""
            k = 1
            while k < LANES:
                x = jnp.maximum(x, row_shift_right(x, k))
                k *= 2
            rm = jnp.broadcast_to(jnp.max(x, axis=1, keepdims=True),
                                  (FOLD, LANES))
            ex = jnp.where(subf >= 1, pltpu.roll(rm, 1, axis=0), NEG16)
            k = 1
            while k < FOLD:
                ex = jnp.maximum(
                    ex, jnp.where(subf >= k, pltpu.roll(ex, k, axis=0),
                                  NEG16))
                k *= 2
            return jnp.maximum(x, ex)

        def cummax2_f(x, y):
            """Prefix max of TWO independent rows in ONE stacked
            (2*FOLD, LANES) chain: each shift-max step costs ~34ns of
            issue overhead regardless of tile size, so one double-height
            chain halves the step count vs two chains.  The fold-prefix
            masks use subf2h (= row % FOLD) so it never crosses the
            boundary between the halves."""
            s = jnp.concatenate([x, y], axis=0)
            k = 1
            while k < LANES:
                r = pltpu.roll(s, k, axis=1)
                s = jnp.maximum(s, jnp.where(lanef2 >= k, r, NEG16))
                k *= 2
            rm = jnp.broadcast_to(jnp.max(s, axis=1, keepdims=True),
                                  (2 * FOLD, LANES))
            ex = jnp.where(subf2h >= 1, pltpu.roll(rm, 1, axis=0), NEG16)
            k = 1
            while k < FOLD:
                ex = jnp.maximum(
                    ex, jnp.where(subf2h >= k, pltpu.roll(ex, k, axis=0),
                                  NEG16))
                k *= 2
            s = jnp.maximum(s, ex)
            return s[:FOLD, :], s[FOLD:, :]

        lanefr = jax.lax.broadcasted_iota(DT, (1, LANES), 1)

        # folded cell reads at dynamic (row i, col j): only the single
        # (1, LANES) sublane holding column j is touched
        def cellf(ref, i, j):
            row = ref[pl.ds(FOLD * i + j // LANES, 1), :]
            return jnp.max(jnp.where(lanefr == (j % LANES), row, NEGBIG))

        def ccell(i, j):
            row = CC[pl.ds(FOLD * i + j // LANES, 1), :]
            return jnp.max(jnp.where(lanefr == (j % LANES), row, -1))

        R = nseq_s[0, 0, 0]
        m = par_s[0, 0, 0]
        n = par_s[0, 0, 1]
        g = par_s[0, 0, 2]
        e = par_s[0, 0, 3]
        q = par_s[0, 0, 4]
        c = par_s[0, 0, 5]
        wb = par_s[0, 0, 6]
        wfm = par_s[0, 0, 7]

        slen_row = slen_r[0, 0:1, :]

        def slen_at(r_):
            return jnp.max(jnp.where(lane128 == r_, slen_row, 0))

        ej = e * colidx
        cj = c * colidx

        def chars8(r_, jbase):
            """Chars of positions jbase..jbase+7 of sequence r_, packed 4
            bits each as (char+1) — 0 = pad sentinel.  ONE sum-reduce
            instead of 8 masked lane reads (sequence position j sits at
            folded column j+1).  Chars are COMPACT CODES 0..14 (the engine
            maps the block's distinct raw bytes to codes; equality is all
            POA needs).  The k=7 field overflows into the int32 sign bit —
            harmless: disjoint bit fields can't carry, and extraction masks
            after the arithmetic shift."""
            slab = seqs_r[0, pl.ds(r_ * FOLD, FOLD), :]
            k = colidx - (jbase + 1)
            win = (k >= 0) & (k < 8)
            kc = jnp.where(win, k, 0)
            w = jnp.where((kc & 1) > 0, 16, 1)
            w = w * jnp.where((kc & 2) > 0, 256, 1)
            w = w * jnp.where((kc & 4) > 0, 65536, 1)
            return jnp.sum(jnp.where(win, (slab + 1) * w, 0))

        # ================= seed from sequence 0 =================
        L0 = slen_at(0)
        iol = (jax.lax.broadcasted_iota(DT, (LWr, 128), 0) * 128
               + jax.lax.broadcasted_iota(DT, (LWr, 128), 1))
        paths_r[0, 0:LWr, :] = jnp.where(iol < L0, iol, -1)

        def seed_chunk(ci, _):
            jb = ci * 8
            packed = chars8(0, jb)
            for k in range(8):
                i = jb + k
                bch = ((packed >> (4 * k)) & 15) - 1
                ii = jnp.where(i < L0, i, VW)       # dummy slot when past L0
                baseA[ii] = bch
                posA[ii] = i
                ringA[ii] = i
                nxtA[ii] = jnp.where(i < L0 - 1, i + 1, -1)
                npredA[ii] = jnp.where(i >= 1, 1, 0)
                nsuccA[ii] = jnp.where(i < L0 - 1, 1, 0)
                preds8[8 * ii] = i - 1
            return 0

        jax.lax.fori_loop(0, (L0 + 7) // 8, seed_chunk, 0)

        # ================= per-sequence rounds =================
        def _round_work(r, carry):
            head, Vc, ovf, gs = carry
            L = slen_at(r)
            seqv32 = seqs_r[0, pl.ds(r * FOLD, FOLD), :]   # folded chars

            colmask = colidx <= L

            if banded:
                # ---- rank prepass (ops/poa_host.node_ranks): min/max
                # topological rank per node, recomputed each round over the
                # current graph; pure SMEM walk ----
                def rank_body(_, st):
                    v, D = st
                    np_ = npredA[v]

                    def rploop(p, acc):
                        lo_, hi_ = acc
                        pid = jnp.maximum(preds8[8 * v + jnp.minimum(p, 7)],
                                          0)
                        pm = mrA[pid]
                        pM = MrA[pid]
                        ok = p < np_
                        return (jnp.where(ok, jnp.minimum(lo_, pm), lo_),
                                jnp.where(ok, jnp.maximum(hi_, pM), hi_))

                    lo_, hi_ = jax.lax.fori_loop(
                        0, jnp.maximum(np_, 1), rploop,
                        (jnp.int32(1 << 28), jnp.int32(0)))
                    mv = jnp.where(np_ == 0, 1, lo_ + 1)
                    Mv = jnp.where(np_ == 0, 1, hi_ + 1)
                    mrA[v] = mv
                    MrA[v] = Mv
                    return (jnp.maximum(nxtA[v], 0), jnp.maximum(D, Mv))

                _, Dg = jax.lax.fori_loop(0, Vc, rank_body,
                                          (head, jnp.int32(0)))
                bw = wb + (wfm * L) // 1000
                adj_l = jnp.maximum(0, Dg - L)
                adj_r = jnp.maximum(0, L - Dg)

            # ---- DP row 0 ----
            if local:
                row0 = jnp.where(colmask, 0, NEG16)
                HH[0:FOLD, :] = pack2(row0, row0).astype(DT)
            else:
                gap1 = -(g + (colidx - 1) * e)
                gap2 = -(q + (colidx - 1) * c)
                row0 = jnp.maximum(gap1, gap2)
                row0 = jnp.where(colidx == 0, 0, row0)
                HH[0:FOLD, :] = pack2(
                    jnp.where(colmask, row0, NEG16),
                    jnp.where(colidx == 0, 0, NEG16)).astype(DT)
            EE[0:FOLD, :] = jnp.full((FOLD, LANES), pack2(NEG16, NEG16), DT)

            NEGROW = jnp.full((FOLD, LANES), NEG16, DT)
            ZROW = jnp.zeros((FOLD, LANES), DT)

            # ---- fill (walk the topo list; DP row = node id + 1) ----
            def fill_body(i, st):
                v, bvec, bfill, bnode = st
                base_v = baseA[v]
                posA[v] = i            # refresh topo position (guard reads)
                np_ = npredA[v]

                def ploop(p, acc):
                    hmax, e1mx, e2mx, hs, e1s, e2s = acc
                    pid = jnp.where(p < np_,
                                    preds8[8 * v + jnp.minimum(p, 7)], -1)
                    hh = HH[pl.ds(FOLD * (pid + 1), FOLD), :]
                    ee = EE[pl.ds(FOLD * (pid + 1), FOLD), :]
                    h = lo16(hh)
                    x1 = lo16(ee)
                    x2 = ((ee >> 16) & 0xFFFF) - OFF
                    uh = h > hmax
                    u1 = x1 > e1mx
                    u2 = x2 > e2mx
                    return (jnp.maximum(hmax, h), jnp.maximum(e1mx, x1),
                            jnp.maximum(e2mx, x2),
                            jnp.where(uh, p, hs), jnp.where(u1, p, e1s),
                            jnp.where(u2, p, e2s))

                if stage == 7:     # ablation: ploop cost by difference
                    hmax, e1mx, e2mx, hs, e1s, e2s = (
                        NEGROW + np_, NEGROW, NEGROW, ZROW, ZROW, ZROW)
                else:
                    hmax, e1mx, e2mx, hs, e1s, e2s = jax.lax.fori_loop(
                        0, jnp.maximum(np_, 1), ploop,
                        (NEGROW, NEGROW, NEGROW, ZROW, ZROW, ZROW))
                sub = jnp.where(seqv32 == base_v, m, -n)
                M = fshift1(hmax, NEG16) + sub
                mslotr = fshift1(hs, 0)
                e1_open = hmax - g
                e1_ext = e1mx - e
                e1o = e1_open >= e1_ext
                e1r = jnp.maximum(jnp.maximum(e1_open, e1_ext), NEG16)
                e1slotr = jnp.where(e1o, hs, e1s)
                e2_open = hmax - q
                e2_ext = e2mx - c
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
                    # adaptive band (oracle: poa_host.fill): out-of-band
                    # cells masked to the floor BEFORE the F prefix scan
                    blo = jnp.maximum(0, mrA[v] - bw - adj_l)
                    bhi = jnp.minimum(L, MrA[v] + bw + adj_r)
                    bandm = (colidx >= blo) & (colidx <= bhi)
                    hq = jnp.where(bandm, hq, NEG16)
                    e1r = jnp.where(bandm, e1r, NEG16)
                    e2r = jnp.where(bandm, e2r, NEG16)
                if stage == 5:     # ablation: cummax/F cost by difference
                    f1new = hq == hq
                    f2new = f1new
                    Hrow = hq
                    F1 = hq
                    F2 = hq
                else:
                    g1in = hq + ej
                    g2in = hq + cj
                    G1, G2 = cummax2_f(g1in, g2in)
                    f1new = g1in == G1
                    F1 = fshift1(G1, NEG16) - g - ej + e
                    f2new = g2in == G2
                    F2 = fshift1(G2, NEG16) - q - cj + c
                    Hrow = jnp.maximum(hq, jnp.maximum(F1, F2))
                if banded:
                    Hrow = jnp.where(bandm, Hrow, NEG16)
                HH[pl.ds(FOLD * (v + 1), FOLD), :] = pack2(Hrow, hq).astype(DT)
                EE[pl.ds(FOLD * (v + 1), FOLD), :] = pack2(e1r, e2r).astype(DT)
                if stage != 6:     # ablation 6: code compute+write cost
                    code = (mslotr | (e1slotr << 7) | (b1(e1o) << 14)
                            | (e2slotr << 15) | (b1(e2o) << 22)
                            | (hqselr << 23) | (b1(hq == Hrow) << 25)
                            | (b1(F1 == Hrow) << 26)
                            | (b1(F2 == Hrow) << 27)
                            | (b1(f1new) << 28) | (b1(f2new) << 29)
                            | (hqz << 30))
                    CC[pl.ds(FOLD * (v + 1), FOLD), :] = code
                if local:
                    Hm = jnp.where(colmask, Hrow, NEG16)
                    upd = Hm > bvec
                    bvec = jnp.where(upd, Hm, bvec)
                    bfill = jnp.where(upd, i, bfill)
                    bnode = jnp.where(upd, v, bnode)
                vn = jnp.maximum(nxtA[v], 0)   # clamp: ovf blocks only
                return (vn, bvec, bfill, bnode)

            _, bvec, bfill, bnode = jax.lax.fori_loop(
                0, Vc, fill_body, (head, NEGROW, ZROW - 1, ZROW - 1))

            # ---- end cell ----
            if local:
                # per-column vectors -> oracle's (first fill row achieving
                # the global max, min column in that row) in 4 reduces
                bv = jnp.max(bvec)
                eqm = bvec == bv
                rstar = jnp.min(jnp.where(eqm, bfill, VW + LW))
                m2 = eqm & (bfill == rstar)
                bj = jnp.min(jnp.where(m2, colidx, LW))
                bn = jnp.max(jnp.where(m2 & (colidx == bj), bnode, -1))
                bi = jnp.maximum(bn, 0) + 1
            else:
                def sink_body(i, st):
                    v, bv_, bn_ = st
                    hv = jax.lax.cond(
                        nsuccA[v] == 0,
                        lambda _: lo16(cellf(HH, v + 1, L)),
                        lambda _: jnp.int32(NEGBIG), None)
                    better = hv > bv_
                    vn = jnp.maximum(nxtA[v], 0)
                    return (vn, jnp.where(better, hv, bv_),
                            jnp.where(better, v, bn_))
                _, bv, bn = jax.lax.fori_loop(
                    0, Vc, sink_body, (head, jnp.int32(NEGBIG), jnp.int32(0)))
                bi = bn + 1
                bj = L

            # ---- clear targets; stage the round's chars into SMEM (8 at
            # a time; keeps the threading loop free of packed-window
            # bookkeeping — an SMEM read per position is ~free) ----
            def tclr(j2, _):
                packed = chars8(r, j2 * 8)
                for k in range(8):
                    tgtA[j2 * 8 + k] = -1
                    bchA[j2 * 8 + k] = ((packed >> (4 * k)) & 15) - 1
                return 0

            jax.lax.fori_loop(0, (L + 7) // 8, tclr, 0)
            # (tgtA[L] itself is never read: targets/splices index < L)

            # ---- traceback: chase the provenance codes ----
            # chan: 0=H, 1=Hq (post-F, no F allowed), 2=E1, 3=E2
            def tb_cond(st):
                return (~st[3]) & (st[4] < TB_CAP)

            def tb_body(st):
                i, j, chan, done, it, bad = st
                hlike = chan <= 1
                i0 = i == 0
                if local:
                    stop = hlike & i0
                    lead = jnp.bool_(False)
                else:
                    stop = hlike & i0 & (j == 0)
                    lead = hlike & i0 & (~stop)
                act = hlike & (~i0)
                ii = jnp.maximum(i, 1)
                nid = ii - 1
                cw = ccell(ii, j)
                hqeq_c = ((cw >> 25) & 1) == 1
                hq_route = act & ((chan == 1) | ((chan == 0) & hqeq_c))
                if local:
                    stop2 = hq_route & (((cw >> 30) & 1) == 1)
                    hq_go = hq_route & (~stop2)
                else:
                    stop2 = jnp.bool_(False)
                    hq_go = hq_route
                hqsel_c = (cw >> 23) & 3
                np_ = npredA[nid]

                def slotpid(s):
                    # preds capped at 8 slots (9th edge -> ovf -> native
                    # redo), so the SMEM read is always authoritative
                    pid8 = preds8[8 * nid + jnp.minimum(s, 7)]
                    return jnp.where(s < np_, pid8, -1)

                m_take = hq_go & (hqsel_c == 0)
                e1_in = (hq_go & (hqsel_c == 1)) | (chan == 2)
                e2_in = (hq_go & (hqsel_c == 2)) | (chan == 3)
                f_route = act & (chan == 0) & (~hqeq_c)

                jm1 = jnp.maximum(j - 1, 0)
                mpid = slotpid(cw & 127)

                @pl.when(m_take)
                def _():
                    tgtA[jm1] = nid

                e1pid = slotpid((cw >> 7) & 127)
                e1open_c = ((cw >> 14) & 1) == 1
                e2pid = slotpid((cw >> 15) & 127)
                e2open_c = ((cw >> 22) & 1) == 1
                f1h_c = ((cw >> 26) & 1) == 1
                f2h_c = ((cw >> 27) & 1) == 1

                def f_scan(_):
                    def fc(kk):
                        return (~kk[1]) & (kk[0] >= 0)

                    def fb(kk):
                        k, _ = kk
                        ck = ccell(ii, k)
                        hit = (f1h_c & (((ck >> 28) & 1) == 1)) | \
                              (f2h_c & (((ck >> 29) & 1) == 1))
                        return (jnp.where(hit, k, k - 1), hit)

                    return jax.lax.while_loop(
                        fc, fb, (j - 1, jnp.bool_(False)))

                fk, fok = jax.lax.cond(
                    f_route, f_scan,
                    lambda _: (jnp.int32(0), jnp.bool_(True)), None)

                ni, nj, nchan = i, j, chan
                ni = jnp.where(m_take, mpid + 1, ni)
                nj = jnp.where(m_take, j - 1, nj)
                nchan = jnp.where(m_take, 0, nchan)
                ni = jnp.where(e1_in, e1pid + 1, ni)
                nchan = jnp.where(e1_in, jnp.where(e1open_c, 0, 2), nchan)
                ni = jnp.where(e2_in, e2pid + 1, ni)
                nchan = jnp.where(e2_in, jnp.where(e2open_c, 0, 3), nchan)
                nj = jnp.where(f_route, fk, nj)
                nchan = jnp.where(f_route, 1, nchan)
                nj = jnp.where(lead, j - 1, nj)
                nchan = jnp.where(lead, 0, nchan)
                ndone = done | stop | stop2
                nbad = bad | (f_route & (~fok))
                return (ni, nj, nchan, ndone, it + 1, nbad)

            done0 = (bv <= 0) if local else jnp.bool_(False)
            done0 = done0 | (L == 0)
            if stage == 1 or stage >= 5:
                tb_bad = jnp.bool_(False)
            else:
                st = jax.lax.while_loop(
                    tb_cond, tb_body,
                    (bi, bj, jnp.int32(0), done0, jnp.int32(0),
                     jnp.bool_(False)))
                tb_bad = st[5] | (~st[3])     # bad chase or iteration overrun

            if stage in (1, 2) or stage >= 5:
                return (head, Vc, ovf | tb_bad, gs)

            # ---- threading ----
            def pos_body(j, st2):
                (prev, prevpos, guard, Vc_, head_, ovf_, nspl, gspl,
                 prow) = st2
                bch = bchA[j]             # staged by tclr; SMEM read ~free
                act = jnp.bool_(True)     # loop runs exactly L positions
                t = tgtA[j]
                tvalid = act & (t >= 0)
                t0 = jnp.maximum(t, 0)
                b0 = baseA[t0]
                p0 = posA[t0]
                hit0 = tvalid & (b0 == bch) & (p0 > guard)

                def ring_rest(_):
                    def rbody(s, st3):
                        found, vsel, psel, sawb, cand, wrapped = st3
                        okc = (~found) & (~wrapped)
                        pc = posA[cand]
                        bm = baseA[cand] == bch
                        sawb = sawb | (okc & bm)
                        ok = okc & bm & (pc > guard)
                        vsel = jnp.where(ok, cand, vsel)
                        psel = jnp.where(ok, pc, psel)
                        found = found | ok
                        cn = ringA[cand]
                        wrapped = wrapped | (cn == t0)
                        cand = jnp.where(okc, cn, cand)
                        return (found, vsel, psel, sawb, cand, wrapped)

                    c1 = ringA[t0]
                    found, vsel, psel, sawb, _, _ = jax.lax.fori_loop(
                        0, RING_CAP - 1, rbody,
                        (jnp.bool_(False), jnp.int32(-1), jnp.int32(-1),
                         jnp.bool_(False), c1, c1 == t0))
                    return (found, vsel, psel, sawb)

                if stage == 3:
                    found_r, vsel_r, psel_r, sawb_r = (
                        jnp.bool_(False), jnp.int32(-1), jnp.int32(-1),
                        jnp.bool_(False))
                else:
                    found_r, vsel_r, psel_r, sawb_r = jax.lax.cond(
                        tvalid & (~hit0), ring_rest,
                        lambda _: (jnp.bool_(False), jnp.int32(-1),
                                   jnp.int32(-1), jnp.bool_(False)), None)
                found = hit0 | found_r
                vsel = jnp.where(hit0, t0, vsel_r)
                possel = jnp.where(hit0, p0, psel_r)
                # base match existed in the scan window but was rejected
                # (guard rule / ring cap): spoa would reuse, the fused
                # semantics split — counted per block (ops/poa_fused)
                saw_base = (tvalid & (b0 == bch)) | sawb_r

                def mk_new(_):
                    vnew = Vc_
                    o = vnew >= VW
                    vc = jnp.minimum(vnew, VW - 1)
                    prevc = jnp.maximum(prev, 0)
                    baseA[vc] = bch
                    # new node inherits prev's topo position (carried in
                    # prevpos — no extra read)
                    posA[vc] = prevpos
                    npredA[vc] = 0
                    nsuccA[vc] = 0
                    # ring[vc] points at the round-start ring[t0] (no scan
                    # reaches vc yet); the ring[t0] -> vc half of the
                    # splice is deferred to the end of the position loop so
                    # lookups see round-start rings (poa_fused.thread)
                    ringA[vc] = jnp.where(tvalid, ringA[t0], vc)
                    nxtA[vc] = jnp.where(prev < 0, head_, nxtA[prevc])

                    @pl.when(prev >= 0)
                    def _():
                        nxtA[prevc] = vc
                    nh = jnp.where(prev < 0, vc, head_)
                    return (vc, nh, Vc_ + 1, o)

                create = act & (~found)
                if stage == 4:
                    v = jnp.maximum(vsel, 0)
                    nh, nVc, o = head_, Vc_, jnp.bool_(False)
                    create = jnp.bool_(False)
                else:
                    v, nh, nVc, o = jax.lax.cond(
                        create, mk_new,
                        lambda _: (jnp.where(found, vsel, prev), head_, Vc_,
                                   jnp.bool_(False)), None)
                vc0 = jnp.maximum(v, 0)
                nguard = jnp.where(act & found, possel, guard)

                # record the deferred ring[t] -> v splice; index nspl <= j
                # of the target array is already consumed, so it doubles
                # as the pending-splice buffer (packed t | v << 15)
                nnspl = nspl
                if stage != 4:
                    newspl = create & tvalid

                    @pl.when(newspl)
                    def _():
                        tgtA[nspl] = t0 | (v << 15)
                    nnspl = jnp.where(newspl, nspl + 1, nspl)

                # edge prev -> v (dedup over pred slots; SMEM scan for the
                # common <= 8 case, masked row reduce above it)
                np_v = npredA[vc0]

                def hb(p, f):
                    return f | ((p < np_v)
                                & (preds8[8 * vc0 + jnp.minimum(p, 7)]
                                   == prev))

                has = jax.lax.fori_loop(0, jnp.minimum(np_v, 8), hb,
                                        jnp.bool_(False))
                do_add = act & (prev >= 0) & (~has)

                def add_edge(_):
                    npv = np_v
                    prevc = jnp.maximum(prev, 0)
                    preds8[8 * vc0 + jnp.minimum(npv, 7)] = prev
                    npredA[vc0] = npv + 1
                    nsuccA[prevc] = nsuccA[prevc] + 1
                    return npv >= 8

                if stage != 4:
                    o = o | jax.lax.cond(do_add, add_edge,
                                         lambda _: jnp.bool_(False), None)

                # accumulate the path row in a VECTOR carry and flush every
                # 128 positions: a per-position VMEM read-blend-write of
                # the same row would serialize through memory
                prow = jnp.where(lane128 == (j & 127), v, prow)

                @pl.when(((j & 127) == 127) | (j == L - 1))
                def _():
                    paths_r[0, pl.ds(r * LWr + j // 128, 1), :] = prow

                nprow = jnp.where((j & 127) == 127,
                                  jnp.full((1, 128), -1, DT), prow)
                nprev = jnp.where(act, v, prev)
                nprevpos = jnp.where(act & found, possel, prevpos)
                ngspl = jnp.where(create & saw_base, gspl + 1, gspl)
                return (nprev, nprevpos, nguard, nVc, nh, ovf_ | o, nnspl,
                        ngspl, nprow)

            st2 = jax.lax.fori_loop(
                0, L, pos_body,
                (jnp.int32(-1), jnp.int32(-1), jnp.int32(-1), Vc, head,
                 ovf | tb_bad, jnp.int32(0), gs,
                 jnp.full((1, 128), -1, DT)))
            Vc2, head2, ovf2, nspl2, gs2 = (st2[3], st2[4], st2[5], st2[6],
                                            st2[7])

            # apply the deferred ring splices (targets are distinct within
            # a round, so order is immaterial; buffer order == position
            # order, matching the oracle)
            def spl_body(k2, _):
                w = tgtA[k2]
                ringA[w & 0x7FFF] = w >> 15
                return 0

            jax.lax.fori_loop(0, nspl2, spl_body, 0)
            return (head2, Vc2, ovf2, gs2)

        def round_body(r, carry):
            # a block that overflowed (node/pred capacity, traceback
            # trouble) is redone on host anyway — skip its remaining
            # rounds instead of filling garbage (a real branch at this
            # granularity, not predication)
            return jax.lax.cond(carry[2], lambda c: c,
                                lambda c: _round_work(r, c), carry)

        head, Vc, ovf, gsplits = jax.lax.fori_loop(
            1, R, round_body, (jnp.int32(0), L0, jnp.bool_(False),
                               jnp.int32(0)))

        # ================= export =================
        Vcc = jnp.minimum(Vc, VW)

        def expb(i2, _):
            rr = i2 // 128
            mm = lane128 == (i2 % 128)
            cur0 = exp_r[0, pl.ds(rr, 1), :]
            exp_r[0, pl.ds(rr, 1), :] = jnp.where(mm, baseA[i2], cur0)
            cur1 = exp_r[0, pl.ds(VWr + rr, 1), :]
            exp_r[0, pl.ds(VWr + rr, 1), :] = jnp.where(mm, ringA[i2], cur1)
            return 0

        jax.lax.fori_loop(0, Vcc, expb, 0)

        def ord_body(i2, v):
            rr = 2 * VWr + i2 // 128
            cur = exp_r[0, pl.ds(rr, 1), :]
            exp_r[0, pl.ds(rr, 1), :] = jnp.where(
                lane128 == (i2 % 128), v, cur)
            return jnp.maximum(nxtA[v], 0)

        jax.lax.fori_loop(0, Vcc, ord_body, head)

        meta_r[0, 0, 0] = Vc
        meta_r[0, 0, 1] = jnp.where(ovf, 1, 0)
        meta_r[0, 0, 2] = R
        meta_r[0, 0, 3] = gsplits

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),       # nseq
            pl.BlockSpec((1, 1, 8), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),       # params
            pl.BlockSpec((1, 1, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),       # seq lengths
            pl.BlockSpec((1, RW * FOLD, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),       # sequences (folded)
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 4), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),       # meta
            pl.BlockSpec((1, 3 * VWr, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),       # base/ring/order
            pl.BlockSpec((1, RW * LWr, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),       # paths (planes)
        ],
        scratch_shapes=[
            pltpu.VMEM(((VW + 1) * FOLD, LANES), DT),    # HH (folded)
            pltpu.VMEM(((VW + 1) * FOLD, LANES), DT),    # EE (folded)
            pltpu.VMEM(((VW + 1) * FOLD, LANES), DT),    # CC codes (folded)
            # +1 slots: index VW / 8*VW / >=L are DUMMY sinks for the
            # branch-free unconditional stores (see kernel comment)
            pltpu.SMEM((VW + 1,), DT),       # base
            pltpu.SMEM((VW + 1,), DT),       # topo pos
            pltpu.SMEM((VW + 1,), DT),       # ring
            pltpu.SMEM((VW + 1,), DT),       # nxt (topo list)
            pltpu.SMEM((VW + 1,), DT),       # npred
            pltpu.SMEM((VW + 1,), DT),       # nsucc
            pltpu.SMEM((8 * (VW + 1),), DT),  # pred slots 0..7
            pltpu.SMEM((LW + 8,), DT),       # targets / pending splices
            pltpu.SMEM((LW + 8,), DT),       # current round's seq chars
        ] + ([pltpu.SMEM((VW + 1,), DT),     # min rank (banded only)
              pltpu.SMEM((VW + 1,), DT)]     # max rank
             if banded else []),
    )

    pallas_fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, 4), jnp.int32),
            jax.ShapeDtypeStruct((B, 3 * VWr, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, RW * LWr, 128), jnp.int32),
        ],
        interpret=interpret,
    )
    return pallas_fn


def _fused_fn(VW: int, LW: int, RW: int, local: bool, interpret: bool,
              B: int, stage: int = 0, banded: bool = False):
    import jax.numpy as jnp

    pallas_fn = _pallas_core(VW, LW, RW, local, interpret, B, stage, banded)

    def fn(nseq, par, slen, seqs):
        # sequences ship int8 over the tunnel; upcast on device.  Outputs
        # downcast to int16 on device before D2H (node ids < VW < 32768).
        meta, exp, paths = pallas_fn(nseq, par, slen.astype(jnp.int32),
                                     seqs.astype(jnp.int32))
        return meta[:, 0, :], exp.astype(jnp.int16), paths.astype(jnp.int16)

    return fn


@functools.lru_cache(maxsize=64)
def _compiled_fused(VW: int, LW: int, RW: int, local: bool, interpret: bool,
                    B: int, stage: int = 0, banded: bool = False):
    import jax

    fn = _fused_fn(VW, LW, RW, local, interpret, B, stage, banded)
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
def _compiled_fused_sharded(VW: int, LW: int, RW: int, local: bool,
                            interpret: bool, B: int, n_dev: int,
                            banded: bool = False):
    """Data-parallel fused kernel: global batch B*n_dev sharded over a 1-D
    device mesh via shard_map — each device runs the grid=B kernel on its
    shard.  The TPU-native mapping of the reference's OMP-over-blocks loop
    (src/smooth.cpp:1904; SURVEY §5.8)."""
    import jax
    import numpy as np_
    from jax.sharding import Mesh, PartitionSpec as P

    fn = _fused_fn(VW, LW, RW, local, interpret, B, banded=banded)
    devs = jax.devices()
    if len(devs) < n_dev:
        raise RuntimeError(
            f"sharded fused engine needs {n_dev} devices, "
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


@functools.lru_cache(maxsize=16)
def _paths_slicer(RW: int, LWr: int, rcap: int, lcapr: int):
    """Device-side slice of the paths planes to the chunk's actual
    sequence-count/length tier before D2H: the axon tunnel runs at
    single-digit MB/s under contention, so shipping (RW, LW) int16 when
    (16, 1024) suffices costs seconds per call.  A separate tiny jit so
    the expensive Mosaic kernel compiles once per `local` variant — slice
    tiers never touch its cache."""
    import jax

    def f(paths):
        p = paths.reshape(paths.shape[0], RW, LWr, 128)
        return p[:, :rcap, :lcapr, :]

    return jax.jit(f)


@functools.lru_cache(maxsize=8)
def _exp_slicer(VWr: int, vr: int):
    """Device-side slice of the export planes to ceil(Vmax/128) rows
    before D2H (the planes are (B, 3*VWr, 128) but only the first Vmax
    nodes of each plane carry data)."""
    import jax

    def f(exp):
        e = exp.reshape(exp.shape[0], 3, VWr, 128)
        return e[:, :, :vr, :]

    return jax.jit(f)


def rehydrate_device_raw(seqs, weights, payload, validate: bool = True):
    """Build a POAGraph from a "raw" poa_block_batch_iter payload.
    Module-level so finalize pool workers can run it off the main
    process."""
    from .poa_fused import rehydrate
    base, ring, order, blk_paths = payload[:4]
    if validate:
        # fail fast on any kernel bug: every path must spell its sequence
        V = len(base)
        for s, pth in zip(seqs, blk_paths):
            pa = np.asarray(pth)
            if (pa.min(initial=0) < 0 or pa.max(initial=-1) >= V or
                    not np.array_equal(base[pa], np.asarray(s, np.int32))):
                raise RuntimeError(
                    "fused kernel produced an invalid path")
    g = rehydrate(base, ring, [int(v) for v in order], blk_paths,
                  list(weights))
    if len(payload) > 4:
        g.guard_splits = int(payload[4])
    return g


class FusedPallasEngine:
    """Block-level device engine: ONE dispatch per batch of blocks.

    Blocks route to a TIER FAMILY of stacked kernels (K blocks per grid
    step, ops/poa_pallas_stacked.py) by predicted final node count: the
    fill is instruction-issue-bound, so stacking K blocks' DP rows into
    one (K*8, LANES) plane multiplies throughput by ~K at near-constant
    issue cost.  Tier VW bounds satisfy the 2-plane VMEM budget
    (K*VW*LW <= ~13.7M cells); routing uses the mash growth estimate
    scaled by ROUTE_MARGIN (the estimate is a measured upper bound —
    V/est ran 0.57-1.00 across all 59 DRB1 ctest blocks, so 0.85 places
    most blocks one tier lower with zero observed overflows).

    Blocks that fit no tier (sequence too long, too many sequences,
    >15 distinct symbols, predicted V past the top tier) or that
    overflow mid-kernel (node/pred capacity, traceback trouble) run on
    the native C++ engine with identical semantics.

    Engines built with a custom `shape` (tests) keep the single-tier
    unstacked kernel exactly as before.
    """

    SHAPE = (4096, 2048)      # legacy single-tier (VW, LW)

    # (K, VW, LW, W) windowed-kernel tiers, smallest first.  W = stored
    # DP window (= LW for full-width tiers).  The 6 B/cell layout
    # (ops/poa_pallas_win.py) buys K*VW*W <= ~18M cells under the scoped
    # VMEM budget, so K=4 rides VW=2304 — covering the bulk of real
    # blocks (measured DRB1 ctest: 19/24 target-700 blocks fit
    # V<=2304 & L<=1919) — and the K=1 top tier reaches VW=8704.
    # The LONG tier stores a 1408-lane banded window against sequences
    # up to 10k: the default `-l 4000` pipeline's long blocks run on
    # device in abPOA-band mode instead of always falling back to the
    # host pool (VERDICT r3 #1; reference max_poa_length upper bucket,
    # src/main.cpp:376).
    # The long tier's window must cover the band PLUS the per-row rank
    # spread (Mr - mr), which on length-heterogeneous long blocks runs
    # ~1.3-1.7x the sequence-length spread (measured on the DRB1 -l 4000
    # blocks: len spreads 559-3516 -> rank spreads 945-5198) — hence
    # W = 3072 with a spread-aware router (see _route)
    # The (1, 4352, 4096, 4096) tier runs full-width spoa semantics for
    # sequences up to 4095 — the range the 2048-wide tiers cannot hold
    # and the long-block band policy (default threshold 4k) does not
    # convert: the reference's -l 1100..-l 2000 length targets and most
    # of the default -l 4000 blockset land exactly there.
    # The (3, 2944, 2048) tier covers the bulk of the default ctest
    # workload at 1.5x the K2 stacking: measured on the -l 700 DRB1
    # blockset, final V is <= 2944 for 23/24 blocks (routing estimate:
    # 21/24) while only 11/24 fit the K4 tier's 2176 budget — K3xVW2944
    # is the largest (K, VW) with K >= 3 under the ~110 MB scoped-VMEM
    # plane budget (K*VW*W*6 B; see ops/poa_pallas_win.py).
    # The (1, 6144, 3072) tier serves mid-length high-V FULL-WIDTH blocks
    # (maxlen 2048..3071, est V to 6144) that previously fell to the host
    # pool: measured on the default `-l 4000` DRB1 blockset, block [2]
    # (maxL 2825, true V 5720) and the l1100 big block (maxL 2895, true V
    # 4400) land exactly there (tools/probe_blockstats.py).  Candidate
    # higher-K tiers with narrower windows (K6xV2176xW1408 etc.) were
    # measured and REJECTED: a window stride that is not a multiple of 8
    # sublanes costs ~2.4x per grid row (154k vs 340-400k rows/s,
    # tools/probe_tierisolate.py) — Mosaic realigns every dynamic slab
    # read — which eats the extra stacking; under the ~115 MB scoped-VMEM
    # budget the aligned-stride full-width family below is optimal.
    TIERS = ((4, 2176, 2048, 2048), (3, 2944, 2048, 2048),
             (2, 4352, 2048, 2048),
             (1, 8704, 2048, 2048), (1, 6144, 3072, 3072),
             (1, 4352, 4096, 4096),
             (1, 5888, 10240, 3072))
    ROUTE_MARGIN = 0.85   # legacy est scale (kept for compat callers)
    GROWTH_CAL = 0.65     # growth-term calibration (see _route); at 0.65
    #                       the ctest fixture routes 14/24 blocks to K4
    #                       with zero overflow redos (0.75: 11/24; 0.55:
    #                       17/24 but 2 redos) — measured true-V vs est
    # long (banded-window) tiers ship smaller side buffers: fewer
    # sequences and a shorter batch (long blocks are rare and huge)
    LONG_RW = 16
    LONG_BATCH = 8

    # D2H slice tiers (see _fused_fn rcap/lcap): few enough that the thin
    # XLA wrapper variants stay cheap, fine enough to cut most of the
    # padded paths-buffer transfer
    RCAPS = (16, 48)
    LCAPS = (512, 1024, 1536, 2048, 4096, 6144, 8192, 10240)
    VRS = (8, 16, 24, 32, 48, 64, 96)

    # host-steal calibration: per-WORKER native fill rate under load
    # (native/cpoa.cpp measures ~90 M cells/s single-thread unloaded; pool
    # workers share cores with extraction/finalize, so start lower) and
    # fused-kernel DP rows/s through the axon tunnel.  Both rates are
    # re-estimated online (EMA) from watcher threads that time actual
    # kernel completion / stolen-batch completion, so the constants only
    # steer the first run; runs that trigger fresh jit compiles are
    # excluded from the device EMA.
    NATIVE_CELLS_PS = 60e6    # per pool worker, contended
    DEV_ROWS_PS = 400e3       # converged EMA on the ctest x16 workload
    #                           (tools/probe_steal.py: 350-410k)

    def __init__(self, max_seqs: int = 48, max_batch: int = 32,
                 shape: tuple = SHAPE, interpret: bool = False,
                 validate: bool = True, devices: int | None = None,
                 threads: int = 1, steal: bool | None = None,
                 tiers: tuple | None = None, kernel: str = "win"):
        # kernel="stacked" dispatches the round-3 stacked kernel family
        # (full-width tiers only) for A/B comparisons against the
        # windowed kernel; "win" (default) is the production path
        self.kernel = kernel
        from . import poa_native
        from .poa_fused import FusedHostEngine
        self.VW, self.LW = shape
        # tier selection: production default = the windowed family; a
        # custom shape (tests, ablations) = one legacy unstacked tier
        if tiers is None:
            if tuple(shape) == self.SHAPE and not interpret:
                tiers = self.TIERS
            else:
                tiers = ((1, shape[0], shape[1]),)
            self.legacy = tuple(shape) != self.SHAPE or interpret
        else:
            self.legacy = False
        # normalize: 3-tuples (K, VW, LW) mean full-width windows (W = LW)
        self.tiers = tuple(
            (t[0], t[1], t[2], t[3] if len(t) > 3 else t[2])
            for t in tiers)
        for K, VW, LW, W in self.tiers:
            assert max_batch >= K, (max_batch, K)
        self.VW = max(t[1] for t in self.tiers)
        self.LW = max(t[2] for t in self.tiers)
        self.RW = max_seqs
        self.max_batch = max_batch
        self.interpret = interpret
        self.validate = validate
        self.threads = threads
        # host-steal: route a cost-balanced tail of device-eligible blocks
        # to the native CPU pool so idle host cores shorten the device's
        # critical path (reference analogue: OMP dynamic scheduling over
        # blocks uses EVERY core, src/smooth.cpp:1904).  Defaults on for
        # real-device multi-thread runs.
        self.steal = (threads > 1 and not interpret) if steal is None \
            else steal
        self.stolen = 0
        self._dev_rows_ps = float(self.DEV_ROWS_PS)
        self._dev_brows_ps = float(self.DEV_ROWS_PS)
        self._host_cells_ps = float(self.NATIVE_CELLS_PS)  # per worker
        self._warm_keys: set = set()   # jit variants already compiled
        self._fresh_compile = False
        if devices is None:
            try:
                import jax
                devices = len(jax.devices())
            except Exception:   # pragma: no cover - backend init failure
                devices = 1
        self.n_dev = max(1, devices)
        if poa_native.available():
            self.fallback = poa_native.NativePOAEngine(threads=threads)
        else:                    # pragma: no cover - native always builds
            self.fallback = FusedHostEngine()
        self.calls = 0
        self.device_blocks = 0
        self.guard_splits = 0    # spoa-divergence counter (PARITY.md)
        self.tier_blocks: dict = {}
        self.fallbacks = 0
        self.redo = 0            # device-overflow blocks redone on host
        self.vcap_redo = 0       # export slice under true V (bound miss)
        self.predicted_overflow = 0   # pre-routed by the growth estimate
        self._last_vbound = 1 << 30
        self.device_s = 0.0
        # backend-loss failover: when the TPU tunnel ABORTs mid-run, the
        # failed + remaining blocks reroute to the native pool and the
        # device is marked dead for the rest of the process — a lost
        # backend degrades throughput, never correctness or completion
        # (the axon terminal sporadically aborts long sessions)
        self.device_lost: str | None = None
        if not interpret:
            from .poa_jax import ensure_backend, _enable_compile_cache
            _enable_compile_cache()
            ensure_backend()

    def stats(self) -> dict:
        return {
            "calls": self.calls,
            "device_blocks": self.device_blocks,
            "tier_blocks": {
                f"K{K}xV{VW}" + ("xW" + str(W) if W < LW else ""):
                    self.tier_blocks.get(ti, 0)
                for ti, (K, VW, LW, W) in enumerate(self.tiers)},
            "fallbacks": self.fallbacks,
            "guard_splits": self.guard_splits,
            "redo": self.redo,
            "vcap_redo": self.vcap_redo,
            "stolen": self.stolen,
            "predicted_overflow": self.predicted_overflow,
            "device_wait_s": round(self.device_s, 3),
            "dev_rows_per_s": round(self._dev_rows_ps),
            "dev_block_rows_per_s": round(self._dev_brows_ps),
            "host_cells_per_s": round(self._host_cells_ps),
            "device_lost": self.device_lost,
        }

    @staticmethod
    def _is_backend_loss(e: Exception) -> bool:
        """True for runtime-backend failures (tunnel abort, server gone,
        watchdog-detected hang), False for programming errors that must
        propagate."""
        name = type(e).__name__
        if name not in ("JaxRuntimeError", "XlaRuntimeError",
                        "RuntimeError", "InternalError", "OSError",
                        "TimeoutError"):
            return False
        msg = str(e)
        # deliberately narrow: only runtime-transport failures.  Config
        # errors that happen to mention "backend"/"device" must still
        # propagate (e.g. a mesh asking for more devices than exist).
        return any(t in msg for t in (
            "ABORTED", "Aborted", "UNAVAILABLE", "INTERNAL",
            "DEADLINE", "Socket closed", "connection reset",
            "terminated", "stalled"))

    # The axon tunnel wedges occasionally (a device call blocks forever
    # rather than raising).  Every blocking device interaction runs under
    # this watchdog; a stall is classified as backend loss and the run
    # completes on the native pool.  Generous default: a cold-cache
    # compile of the largest tier can legitimately take minutes.
    DEV_TIMEOUT_S = float(os.environ.get("SMXG_DEV_TIMEOUT_S", "600"))

    @classmethod
    def _dev_call(cls, fn, what: str):
        import threading as _t
        out: dict = {}

        def run():
            try:
                out["v"] = fn()
            except Exception as e:          # re-raised on the caller
                out["e"] = e

        th = _t.Thread(target=run, daemon=True)
        th.start()
        th.join(cls.DEV_TIMEOUT_S)
        if th.is_alive():
            raise TimeoutError(
                f"device {what} stalled >{cls.DEV_TIMEOUT_S:.0f}s "
                f"(tunnel hang)")
        if "e" in out:
            raise out["e"]
        return out["v"]

    def _steal_costs(self, seqs, ti: int | None = None) -> tuple[float, float]:
        """(native_cost, device_cost) estimates for one block.  Native DP
        fills ~V x L cells per alignment round (V ~ len(seq0) + growth);
        the device kernel's per-GRID-row cost is L-independent (fixed
        folded row) and each grid row carries K stacked blocks, so device
        cost is rows = rounds x V / K(tier)."""
        L0 = float(len(seqs[0]))
        nat = sum(L0 * len(s) for s in seqs[1:])
        dev = L0 * max(len(seqs) - 1, 1)
        if ti is not None:
            dev /= self.tiers[ti][0]
        return nat, dev

    def _select_steal(self, blocks, dev: dict) -> list[int]:
        """Pick device-eligible blocks for the host pool while the pool's
        estimated time stays under the device's estimated time for the
        remainder.  Candidates are taken by DESCENDING device-rows-freed
        per host-cell-spent (du/nat — the fractional-knapsack order): a
        K1-tier block frees K times the device rows of an equally-sized
        K4-stacked block, so the low-K stragglers that set the device
        wall leave first and the well-stacked bulk stays on the chip
        (round-4's cheapest-native-first order stole exactly the K4
        blocks and skewed the tier histogram).  Mutates dev's lists."""
        w_eff = max(1, self.threads - 1)   # one worker stays on finalize
        host_ps = self._host_cells_ps * w_eff
        cand = []
        dev_total = 0.0
        for key, idxs in dev.items():
            for i in idxs:
                nat, du = self._steal_costs(blocks[i][0], key[2])
                cand.append((du / max(nat, 1.0), nat, du, i, key))
                dev_total += du
        cand.sort(key=lambda t: t[0], reverse=True)
        host_t = 0.0
        stolen: list[int] = []
        drop: set[int] = set()
        for _, nat, du, i, key in cand:
            t_host = host_t + nat / host_ps
            t_dev = (dev_total - du) / self._dev_rows_ps
            if t_host > t_dev:
                # this candidate would overfill the host lane; a smaller
                # later candidate may still fit
                continue
            host_t = t_host
            dev_total -= du
            stolen.append(i)
            drop.add(i)
        if stolen:
            for key in list(dev):
                dev[key] = [i for i in dev[key] if i not in drop]
                if not dev[key]:
                    del dev[key]
        return stolen

    def warmup(self, locals_=(True,), banded=(False,), tiers=None):
        """Compile (and run once) every (tier, local, banded) kernel
        variant.  `tiers` limits to specific tier indexes when the
        caller knows the workload (each variant is its own ~10 s axon
        compile)."""
        import jax.numpy as jnp
        from .poa_pallas_win import _compiled_win, _compiled_win_sharded
        tis = range(len(self.tiers)) if tiers is None else tiers
        for ti in tis:
          if self.device_lost:
              return
          K, VW, LW, W = self.tiers[ti]
          RW = self._tier_rw(ti)
          mb = self._tier_batch(ti)
          B = mb * self.n_dev
          nseq = np.ones((B, 1, 1), np.int32)
          par = np.tile(np.array([[[1, 4, 6, 2, 26, 1, 0, 30]]], np.int32),
                        (B, 1, 1))
          slen = np.zeros((B, 1, 128), np.int16)
          slen[:, 0, 0] = 1
          if self.legacy:
              seqs = np.full((B, RW * FOLD, LW // FOLD), -1, np.int8)
          else:
              seqs = np.full((B, RW * (LW // 128) + W // 128, 128), -1,
                             np.int8)
          seqs[:, 0, 1] = 0
          # banded-window tiers exist only in banded-global mode (the
          # long-block policy converts long default-mode blocks to abPOA
          # band semantics, pipeline/smooth.py), so warm exactly that
          # variant regardless of the caller's flags
          bds = (True,) if W < LW else banded
          lcs = (False,) if W < LW else locals_
          for local in lcs:
            for bd in bds:
                if self.legacy:
                    if self.n_dev > 1:
                        fn = _compiled_fused_sharded(
                            VW, LW, RW, local, self.interpret,
                            mb, self.n_dev, bd)
                    else:
                        fn = _compiled_fused(VW, LW, RW, local,
                                             self.interpret, B, banded=bd)
                elif self.n_dev > 1:
                    fn = _compiled_win_sharded(
                        K, VW, LW, W, RW, local, self.interpret,
                        mb // K, self.n_dev, banded=bd)
                else:
                    fn = _compiled_win(K, VW, LW, W, RW, local,
                                       self.interpret, B // K,
                                       banded=bd)
                if self.interpret:
                    meta, exp, paths = fn(
                        jnp.asarray(nseq), jnp.asarray(par),
                        jnp.asarray(slen), jnp.asarray(seqs))
                    np.asarray(meta)
                else:
                    try:
                        self._dev_call(
                            lambda: np.asarray(fn(
                                jnp.asarray(nseq), jnp.asarray(par),
                                jnp.asarray(slen), jnp.asarray(seqs))[0]),
                            f"warmup tier{ti}")
                    except Exception as e:
                        if not self._is_backend_loss(e):
                            raise
                        # a dead backend at warmup: engine degrades to
                        # the native pool instead of failing the caller
                        self.device_lost = str(e)[:200]
                        return
                self._warm_keys.add(("k", local, bd, B, ti))

    def warmup_async(self, locals_=(True,), banded=(False,), tiers=None):
        """Background-thread warmup so kernel compiles overlap the prep /
        indexing / block-finding stages (VERDICT r2: cold start was 96%
        compile).  Dispatches are thread-safe; the tunnel serializes
        execution, so a concurrent foreground dispatch just queues.

        Tiers compile LARGEST-CAPACITY FIRST: once the top tier is up,
        every device-eligible block can run (any block that fits tier i
        fits tier j>i), so the pipeline's cold start waits for ONE
        compile; the smaller (more-stacked, faster) tiers come online
        mid-run via _promote_tier and later batches use them."""
        import threading

        if tiers is None:
            # the common LW<=2048 full-width family first, largest
            # capacity first (its top tier is the cold-start collapse
            # target: once compiled, every `-l <= 2000` block can
            # dispatch via promotion), then the rare big-LW full-width
            # tiers, banded-window long tiers last
            fw = [ti for ti, t in enumerate(self.tiers) if t[3] >= t[2]]
            lg = [ti for ti, t in enumerate(self.tiers) if t[3] < t[2]]
            fw2k = [ti for ti in fw if self.tiers[ti][2] <= 2048]
            fwbig = [ti for ti in fw if self.tiers[ti][2] > 2048]
            tiers = (tuple(reversed(fw2k)) + tuple(reversed(fwbig))
                     + tuple(lg))
        t = threading.Thread(target=self.warmup,
                             args=(locals_, banded, tiers), daemon=True)
        t.start()
        return t

    def _promote_tier(self, ti: int, local: bool, banded: bool) -> int:
        """The routed tier, or — while its kernel variant is still
        compiling in the warmup thread — the smallest ALREADY-COMPILED
        larger tier (the tier family is monotone in (VW, LW), so a
        larger tier holds anything a smaller one does; guarded anyway).
        With nothing compiled yet (cold first dispatch), collapse to the
        TOP tier: warmup_async compiles that one first, so the dispatch
        joins the in-flight compile instead of adding 2-3 more to the
        critical path.  Steady state always returns ti."""
        if self.interpret:           # no compile cost to dodge
            return ti

        def warm(tj):
            return ("k", local, banded,
                    self._tier_batch(tj) * self.n_dev,
                    tj) in self._warm_keys

        def fits_up(tj):
            return (self.tiers[tj][1] >= self.tiers[ti][1]
                    and self.tiers[tj][2] >= self.tiers[ti][2]
                    and self.tiers[tj][3] >= self.tiers[ti][3])

        if warm(ti):
            return ti
        for tj in range(ti + 1, len(self.tiers)):
            if warm(tj) and fits_up(tj):
                return tj
        # cold-start collapse target: the largest FULL-WIDTH tier (the
        # banded-window long tier cannot absorb full-width blocks)
        top = max((tj for tj, t in enumerate(self.tiers) if t[3] >= t[2]),
                  default=len(self.tiers) - 1)
        return top if fits_up(top) else ti

    @staticmethod
    def _alphabet(seqs) -> np.ndarray:
        """Sorted distinct byte values across the block's sequences: the
        byte -> compact-code map (code = rank).  The kernel only tests base
        equality, so any bijection works; sorted-distinct is rebuilt
        identically at decode time (no state to thread)."""
        return np.unique(np.concatenate([np.asarray(s, np.uint8)
                                         for s in seqs]))

    @staticmethod
    def _estimate_final_v(seqs, k: int = 16, alpha: float = 3.0) -> float:
        """Estimate of the POA node count after all rounds: seed L0 plus
        per-sequence unaligned growth ~ len * mash_distance(seq, seq0) *
        alpha (alpha absorbs indel clustering and transitive growth;
        DRB1-measured actual growth sits at 0.4-0.7x this estimate, so it
        is conservative by ~2x).  Only worth calling when sum(len) > VW —
        below that, overflow is impossible."""
        from .minhash import kmer_hashes, mash_distance
        # anchor on the LONGEST sequence: anchoring on seqs[0] degenerates
        # when it is shorter than k (empty hash set -> mash distance 1.0
        # for everything -> systematic overflow false positives)
        a = max(range(len(seqs)), key=lambda i: len(seqs[i]))
        h0 = kmer_hashes(np.asarray(seqs[a], np.uint8).tobytes(), k)
        if len(h0) == 0:
            return 0.0      # every sequence < k: too short to predict
        est = float(len(seqs[0]))
        for i, s in enumerate(seqs):
            if i == 0:
                continue
            d = mash_distance(
                h0, kmer_hashes(np.asarray(s, np.uint8).tobytes(), k), k)
            est += len(s) * min(1.0, d * alpha)
        return est

    def _route(self, seqs, params=None) -> int | None:
        """Smallest tier index this block fits, or None (host fallback).

        A block fits tier (K, VW, LW, W) when every sequence fits the
        seq capacity LW, its seed fits the node budget, its PREDICTED
        final node count (sum of lengths as the cheap absolute bound,
        else the mash growth estimate x ROUTE_MARGIN) fits VW, and the
        stored window W covers it: full width (W = LW) always does;
        a banded-window tier (W < LW) takes only banded-params blocks
        whose band plausibly fits (2*band_w + alignment slack <= W —
        the per-row rank spread is unknown until fill time, so this is
        optimistic).  A misroute is never wrong — the in-kernel
        overflow flag redoes the block on the native engine with
        identical semantics."""
        if not seqs:
            return None
        # upper bound on the block's final node count, recorded for the
        # launch-time export-plane slice (see _launch): sum of lengths is
        # a PROVEN bound (each round adds at most len(s) nodes); the raw
        # mash estimate (uncalibrated — measured V/est 0.57-1.00) tightens
        # it when available.  A block whose true V exceeds the sliced cap
        # is redone natively (vcap_redo), so a too-tight bound costs
        # throughput, never correctness.
        self._last_vbound = sum(len(s) for s in seqs)
        maxlen = 0
        for s in seqs:
            if len(s) == 0:
                return None
            maxlen = max(maxlen, len(s))
        # chars8 packs (code+1) in 4-bit fields -> at most 15 distinct bytes
        if len(self._alphabet(seqs)) > 15:
            return None
        banded = params is not None and params.wb >= 0
        L0 = len(seqs[0])
        minlen = min(len(s) for s in seqs)
        sumlen = sum(len(s) for s in seqs)
        est = None
        fits_shape = False
        for ti, (K, VW, LW, W) in enumerate(self.tiers):
            if len(seqs) > self._tier_rw(ti):
                continue
            if maxlen + 1 > LW or L0 > VW:
                continue
            if W < LW:
                # banded-window tier: banded params only.  The window
                # must hold band + per-row rank spread; the LOWER bound
                # of the spread is the sequence-length spread (measured
                # rank spreads run 1.3-1.7x it), and V >= maxlen always.
                # The mash growth estimate is SKIPPED here: it is ~2x
                # conservative and would reject every real long block,
                # while a banded-tier misroute costs only ~a round of
                # fill before the in-kernel overflow bail redoes the
                # block natively (round-granular skip).
                if not banded:
                    continue
                bw = params.wb + (params.wf_milli * maxlen) // 1000
                if 2 * bw + (maxlen - minlen) + 129 > W:
                    continue
                if maxlen > VW:
                    continue
                return ti
            elif maxlen + 1 > W:
                continue
            fits_shape = True
            if sumlen <= VW:
                return ti
            if est is None:
                # growth-calibrated node estimate: the mash estimate's
                # GROWTH term (est - L0) overshoots the real growth
                # (V - L0) by design; measured across all 59 DRB1 blocks
                # at 4 length targets the growth ratio is p50 0.43 /
                # p90 0.74 / max 0.96, so scaling it by GROWTH_CAL
                # routes the typical block one tier lower with ~10%
                # residual overflow risk on borderline blocks — and an
                # overflow redo costs about what the next tier up would
                # have (round-granular in-kernel bail + native pool)
                raw = self._estimate_final_v(seqs)
                if raw > 0:
                    self._last_vbound = min(self._last_vbound, int(raw) + 1)
                est = L0 + (raw - L0) * self.GROWTH_CAL
            if est <= VW:
                return ti
        if fits_shape:
            # growth predictor: a block whose graph will outgrow every
            # tier burns device rows up to the overflow bail and STILL
            # redoes on the native pool — route it straight there
            self.predicted_overflow += 1
        return None

    def _eligible(self, seqs, params=None) -> bool:
        return self._route(seqs, params) is not None

    def poa_block_batch(self, blocks):
        results = [None] * len(blocks)
        for i, kind, payload in self.poa_block_batch_iter(blocks):
            if kind == "graph":
                results[i] = payload
            else:
                seqs, weights, _ = blocks[i]
                results[i] = rehydrate_device_raw(seqs, weights, payload,
                                                  self.validate)
        return results

    def poa_block_batch_iter(self, blocks):
        """Lazy engine: yields (index, kind, payload) as results arrive —
        kind "raw" = (base, ring, order, blk_paths) device output (caller
        rehydrates+validates via rehydrate_device_raw, possibly in a pool
        worker), kind "graph" = finished POAGraph (host fallback /
        overflow redo).  All device chunks are dispatched up front, so
        work done while consuming a yield overlaps the remaining chunks'
        device execution."""
        # keyed by (params.local, banded, tier) — each is a separate
        # kernel variant (banded adds the rank prepass + band mask)
        dev: dict[tuple, list[int]] = {}
        fb: list[int] = []
        vbounds: dict[int, int] = {}
        for i, (seqs, weights, params) in enumerate(blocks):
            ti = None if self.device_lost else self._route(seqs, params)
            if ti is not None:
                vbounds[i] = self._last_vbound
                ti = self._promote_tier(ti, params.local, params.wb >= 0)
                dev.setdefault((params.local, params.wb >= 0, ti),
                               []).append(i)
            else:
                self.fallbacks += 1
                fb.append(i)
        cap = self.max_batch * self.n_dev
        stolen: list[int] = []
        if self.steal and sum(len(v) for v in dev.values()) > cap:
            stolen = self._select_steal(blocks, dev)
            self.stolen += len(stolen)
        import threading as _threading
        import time as _time
        t_devstart = _time.perf_counter()
        dev_rows = 0.0
        dev_brows = 0.0      # undivided by K: true block rows (rounds x V)
        self._fresh_compile = False
        handles = []
        lost: list[int] = []          # chunks lost to a backend failure
        todo: list[tuple[list[int], int]] = []
        for key, idxs in dev.items():
            # cost-sort so each stacked grid step's K lockstep blocks
            # carry similar round counts / row counts
            idxs.sort(key=lambda i: (len(blocks[i][0]),
                                     len(blocks[i][0][0])), reverse=True)
            for i in idxs:
                dev_rows += self._steal_costs(blocks[i][0], key[2])[1]
                dev_brows += self._steal_costs(blocks[i][0])[1]
            capt = self._tier_batch(key[2]) * self.n_dev
            for s in range(0, len(idxs), capt):
                todo.append((idxs[s:s + capt], key[2]))
        for ci, (chunk_i, ti_i) in enumerate(todo):
            try:
                vcap = max(vbounds.get(i, 1 << 30) for i in chunk_i)
                handles.append(self._launch(blocks, chunk_i, ti_i, vcap))
            except Exception as e:
                if not self._is_backend_loss(e):
                    raise
                self.device_lost = str(e)[:200]
                for chunk_j, _ in todo[ci:]:
                    lost.extend(chunk_j)
                break
        # watcher: time actual kernel completion (meta readiness) off the
        # main thread so the device-rate EMA isn't polluted by consumer
        # decode/finalize work interleaved with the yields below; runs
        # that compiled a fresh jit variant are excluded entirely
        if handles and dev_rows and not self._fresh_compile \
                and not self.interpret:
            def _watch_dev(hs=list(handles), rows=dev_rows,
                           brows=dev_brows, t0=t_devstart):
                try:
                    for h in hs:
                        h[2].block_until_ready()
                except Exception:       # pragma: no cover - backend loss
                    return
                dt = max(_time.perf_counter() - t0, 1e-6)
                self._dev_rows_ps = 0.5 * self._dev_rows_ps + \
                    0.5 * (rows / dt)
                self._dev_brows_ps = 0.5 * self._dev_brows_ps + \
                    0.5 * (brows / dt)
            _threading.Thread(target=_watch_dev, daemon=True).start()
        # start every handle's D2H as soon as its kernel finishes, so
        # transfers of chunk k ride behind kernel k+1 instead of
        # serializing with the decode loop (the tunnel is the slow link).
        # All three outputs are already final-size: _launch slices paths
        # AND exp on device right after each chunk's kernel dispatch, so
        # nothing here waits on a post-meta slicer that the in-order
        # device stream would queue behind every later chunk's kernel.
        for h in handles:
            for arr in h[2:5]:
                try:
                    arr.copy_to_host_async()
                except (AttributeError, RuntimeError):  # pragma: no cover
                    break
        # fallback blocks compute on host (native C++, pooled when
        # threads>1) while the device runs
        def _async(idxs):
            batch = [blocks[i] for i in idxs]
            if hasattr(self.fallback, "poa_block_batch_async"):
                return self.fallback.poa_block_batch_async(batch)
            res = self.fallback.poa_block_batch(batch)
            return [lambda g=g: g for g in res]

        fb_futs = _async(fb) if fb else []
        steal_futs = _async(stolen) if stolen else []
        # watcher: time the stolen batch's actual completion (Future.result
        # is idempotent/thread-safe) to keep the per-worker host-rate EMA
        # honest under real contention with extraction/finalize
        if stolen and self.threads > 1:
            s_cells = sum(self._steal_costs(blocks[i][0])[0]
                          for i in stolen)
            w_eff = max(1, self.threads - 1)
            t_steal = _time.perf_counter()

            def _watch_host(futs=list(steal_futs), cells=s_cells):
                try:
                    for f in futs:
                        f()
                except Exception:       # pragma: no cover - worker error
                    return
                dt = max(_time.perf_counter() - t_steal, 1e-6)
                self._host_cells_ps = 0.5 * self._host_cells_ps + \
                    0.5 * (cells / dt / w_eff)
            _threading.Thread(target=_watch_host, daemon=True).start()
        redo: list[int] = []
        redo_futs: list = []
        for chunk, ti, meta, exp, paths, vcap in handles:
            t0 = _time.perf_counter()
            _, VW_t, LW_t, _W_t = self.tiers[ti]
            try:
                meta = (np.asarray(meta) if self.interpret else
                        self._dev_call(lambda m=meta: np.asarray(m),
                                       "meta D2H"))
                if self.interpret:
                    exp = np.asarray(exp).reshape(len(meta), 3, -1)
                    paths = np.asarray(paths)
                else:
                    exp = self._dev_call(
                        lambda a=exp: np.asarray(a),
                        "exp D2H").reshape(len(meta), 3, -1)
                    paths = self._dev_call(
                        lambda a=paths: np.asarray(a), "paths D2H")
            except Exception as e:
                if not self._is_backend_loss(e):
                    raise
                self.device_lost = str(e)[:200]
                lost.extend(chunk)
                continue
            if paths.ndim == 4:      # sliced (B, rcap, lcapr, 128) planes
                paths = paths.reshape(paths.shape[0], paths.shape[1], -1)
            else:                    # full (B, RW*LWr, 128) planes
                paths = paths.reshape(paths.shape[0], self._tier_rw(ti),
                                      LW_t)
            self.device_s += _time.perf_counter() - t0
            # kick overflow redos onto the pool NOW so they overlap the
            # remaining handles' device wait + decode.  V > vcap means the
            # launch-time export slice (routing upper bound) was too
            # tight — the kernel result is fine but its export planes were
            # truncated, so the block redoes natively (counted separately:
            # it indicts the bound, not the kernel)
            h_redo = [i for b, i in enumerate(chunk)
                      if meta[b, 1] != 0 or int(meta[b, 0]) > VW_t]
            h_vred = [i for b, i in enumerate(chunk)
                      if i not in h_redo and int(meta[b, 0]) > vcap]
            self.vcap_redo += len(h_vred)
            h_redo += h_vred
            if h_redo:
                redo.extend(h_redo)
                redo_futs.extend(_async(h_redo))
            for b, i in enumerate(chunk):
                seqs, weights, params = blocks[i]
                V = int(meta[b, 0])
                if meta[b, 1] != 0 or V > VW_t or V > vcap:
                    continue
                planes = exp[b]
                # decode compact codes back to raw bytes (same sorted-
                # distinct map _launch used)
                base = self._alphabet(seqs)[planes[0, :V]].astype(np.int32)
                ring = planes[1, :V]
                order = planes[2, :V]
                # ship numpy slices, not python lists: the pipelined path
                # pickles payloads to pool workers and list-of-int is ~10x
                # the bytes and cost of an int16 array
                blk_paths = [paths[b, r, :len(s)] for r, s in enumerate(seqs)]
                self.device_blocks += 1
                self.guard_splits += int(meta[b, 3])
                yield i, "raw", (base, ring, order, blk_paths,
                                 int(meta[b, 3]))
        for i, f in zip(stolen, steal_futs):
            g = f()
            self.guard_splits += getattr(g, "guard_splits", 0)
            yield i, "graph", g
        for i, f in zip(fb, fb_futs):
            g = f()
            self.guard_splits += getattr(g, "guard_splits", 0)
            yield i, "graph", g
        self.redo += len(redo)
        for i, f in zip(redo, redo_futs):
            g = f()
            self.guard_splits += getattr(g, "guard_splits", 0)
            yield i, "graph", g
        if lost:
            # backend died mid-run: finish the lost chunks on the native
            # pool so the caller still gets every block (device_lost in
            # stats() records the first failure)
            import sys as _sys
            print(f"[smoothxg_tpu::engine] TPU backend lost mid-run "
                  f"({self.device_lost}); rerouting {len(lost)} blocks "
                  f"to the native pool", file=_sys.stderr)
            for i, f in zip(lost, _async(lost)):
                g = f()
                self.guard_splits += getattr(g, "guard_splits", 0)
                yield i, "graph", g

    def _tier_rw(self, ti: int) -> int:
        return self.LONG_RW if self.tiers[ti][2] > 2048 else self.RW

    def _tier_batch(self, ti: int) -> int:
        K = self.tiers[ti][0]
        mb = self.LONG_BATCH if self.tiers[ti][2] > 2048 \
            else self.max_batch
        # the stacked grid packs K blocks per step: round the dispatch
        # batch down to a K multiple (e.g. 30 for K=3 at max_batch 32)
        return max((mb // K) * K, K)

    def _launch(self, blocks, chunk, ti: int = 0, vcap: int | None = None):
        import jax.numpy as jnp
        K, VW, LW, W = self.tiers[ti]
        mb = self._tier_batch(ti)
        # small tail on a multi-device mesh: one single-device dispatch
        # instead of a full shard_map batch padded n_dev-fold (VERDICT r3
        # weak #7 — a 5-block tail burned an 8x32 padded dispatch)
        n_dev = self.n_dev if len(chunk) > mb else 1
        if n_dev > 1:
            B = mb * n_dev                    # shard_map needs full batches
        else:
            B = len(chunk) if self.interpret else mb
        B = ((B + K - 1) // K) * K            # stacked grid = B // K
        RW = self._tier_rw(ti)
        nseq = np.ones((B, 1, 1), np.int32)
        par = np.zeros((B, 1, 8), np.int32)
        slen = np.zeros((B, 1, 128), np.int16)
        slen[:, 0, 0] = 1                     # pad blocks: 1 seq of len 1
        local = blocks[chunk[0]][2].local
        banded = blocks[chunk[0]][2].wb >= 0
        if self.legacy:
            # empty+fill, not np.full: broadcast-fill is ~25x slower for
            # multi-MB planes on lazily-backed VM memory (docs/DESIGN.md)
            seqs = np.empty((B, RW, LW), np.int8)
            seqs.fill(-1)
            seqs[:, 0, 1] = 0
        else:
            # windowed-kernel layout: char j of sequence r at flat
            # position j+1 of 128-lane rows (ops/poa_pallas_win.py)
            SL = LW // 128
            FW = W // 128
            seqs = np.empty((B, RW * SL + FW, 128), np.int8)
            seqs.fill(-1)
            seqs[:, 0, 1] = 0
        for b, i in enumerate(chunk):
            sq, weights, p = blocks[i]
            nseq[b, 0, 0] = len(sq)
            par[b, 0] = [p.m, p.n, p.g, p.e, p.q, p.c,
                         max(p.wb, 0), p.wf_milli]
            alpha = self._alphabet(sq)
            for r, s in enumerate(sq):
                slen[b, 0, r] = len(s)
                codes = np.searchsorted(alpha, np.asarray(s, np.uint8))
                if self.legacy:
                    seqs[b, r, 1:len(s) + 1] = codes
                else:
                    flat = seqs[b, r * SL:(r + 1) * SL].reshape(-1)
                    flat[1:len(s) + 1] = codes
        key = ("k", local, banded, B, ti)
        if key not in self._warm_keys:
            self._warm_keys.add(key)
            self._fresh_compile = True
        if self.legacy:
            seqs = seqs.reshape(B, RW * FOLD, LW // FOLD)
            if n_dev > 1:
                fn = _compiled_fused_sharded(
                    VW, LW, RW, local, self.interpret, mb,
                    n_dev, banded)
            else:
                fn = _compiled_fused(VW, LW, RW, local, self.interpret, B,
                                     banded=banded)
        elif self.kernel == "stacked":
            assert W == LW, "stacked kernel is full-width only"
            from .poa_pallas_stacked import (_compiled_stacked,
                                             _compiled_stacked_sharded)
            if n_dev > 1:
                fn = _compiled_stacked_sharded(
                    K, VW, LW, RW, local, self.interpret,
                    mb // K, n_dev, banded=banded)
            else:
                fn = _compiled_stacked(K, VW, LW, RW, local,
                                       self.interpret, B // K,
                                       banded=banded)
            # windowed seq layout -> stacked folded layout (char j sits
            # at flat position j+1 in both; drop the window pad rows)
            seqs = np.ascontiguousarray(
                seqs[:, :RW * (LW // 128), :]).reshape(
                    B, RW, LW).reshape(B, RW * FOLD, LW // FOLD)
        else:
            from .poa_pallas_win import (_compiled_win,
                                         _compiled_win_sharded)
            if n_dev > 1:
                fn = _compiled_win_sharded(
                    K, VW, LW, W, RW, local, self.interpret,
                    mb // K, n_dev, banded=banded)
            else:
                fn = _compiled_win(K, VW, LW, W, RW, local,
                                   self.interpret, B // K,
                                   banded=banded)
        if self.interpret:
            meta, exp, paths = fn(jnp.asarray(nseq), jnp.asarray(par),
                                  jnp.asarray(slen), jnp.asarray(seqs))
        else:
            meta, exp, paths = self._dev_call(
                lambda: fn(jnp.asarray(nseq), jnp.asarray(par),
                           jnp.asarray(slen), jnp.asarray(seqs)),
                f"dispatch tier{ti}")
        # slice the paths D2H to the chunk's tier while still on device
        maxr = max(len(blocks[i][0]) for i in chunk)
        maxl = max(len(s) for i in chunk for s in blocks[i][0])
        rcap = next((t for t in self.RCAPS if t >= maxr), RW)
        lcap = next((t for t in self.LCAPS if t >= maxl), LW)
        if not self.interpret and (rcap < RW or lcap < LW):
            skey = ("s", min(rcap, RW), min(lcap, LW), LW)
            if skey not in self._warm_keys:
                self._warm_keys.add(skey)
                self._fresh_compile = True
            paths = _paths_slicer(RW, LW // 128, min(rcap, RW),
                                  min(lcap, LW) // 128)(paths)
        # slice the export planes EAGERLY to the chunk's routing upper
        # bound: dispatched here — right behind this chunk's kernel in the
        # in-order device stream — the slicer runs as soon as the kernel
        # finishes, instead of queueing behind every later chunk's kernel
        # as the old post-meta slice did.  A block whose true V exceeds
        # the bound redoes natively (vcap_redo in the consume loop).
        VWr = VW // 128
        if vcap is None:
            vcap = VW
        vcap = min(vcap, VW)
        vr = next((t for t in self.VRS if t * 128 >= vcap), VWr)
        vr = min(vr, VWr)
        if not self.interpret and vr < VWr:
            ekey = ("e", VWr, vr)
            if ekey not in self._warm_keys:
                self._warm_keys.add(ekey)
                self._fresh_compile = True
            exp = _exp_slicer(VWr, vr)(exp)
        self.calls += 1
        self.tier_blocks[ti] = self.tier_blocks.get(ti, 0) + len(chunk)
        return chunk, ti, meta, exp, paths, vr * 128
