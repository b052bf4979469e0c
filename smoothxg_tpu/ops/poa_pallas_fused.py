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

Per grid step (= one block):
  * seed the graph from sequence 0 as a chain (vectorized plane writes),
  * for each later sequence: walk the topo linked list refreshing pos[],
    fill the DP (rows indexed by node id + 1; identical recurrences to
    ops/poa_pallas), locate the end cell, traceback writing only the
    match targets into a column-indexed tgt plane, then thread the
    sequence: guarded aligned-ring reuse or new-node creation with O(1)
    linked-list insertion (see poa_fused.py for why this keeps the list
    topological), edge appends into 128-lane pred rows,
  * export base/ring planes, the final topo order, and per-sequence node
    paths.  Everything else (edges, weights, consensus, MSA) is
    reconstructed on host from the paths (ops/poa_fused.rehydrate).

Graph state lives in VMEM scratch planes (node v -> row v//128, lane
v%128); predecessor slots of node v are the 128 lanes of row v of a
(VW, 128) plane, so edge dedup/append is one vector compare + blend.
Mosaic constraints (no dynamic lane indexing, no scalar stores, masked
row reductions/blends) are the same as ops/poa_pallas.py.

Overflow (node capacity, pred slots, a stuck traceback) sets a meta flag;
the engine redoes that block on the native C++ engine — never a silent
truncation.
"""
from __future__ import annotations

import functools

import numpy as np

NEG16 = -16000
NEGBIG = -(1 << 30)
RING_CAP = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=8)
def _fused_fn(VW: int, LW: int, RW: int, local: bool, interpret: bool,
              B: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    DT = jnp.int32
    VWr = VW // 128
    LWr = LW // 128
    OFF = 16384
    TB_CAP = 2 * (VW + LW + 8)   # traceback iteration safety cap

    def kernel(nseq_s, par_s, slen_r, seqs_r,
               meta_r, exp_r, paths_r,
               HH, EE, predp, npredp, nsuccp, basep, ringp, nxtp, posp,
               tgtp):
        lane = jax.lax.broadcasted_iota(DT, (1, LW), 1)
        lane128 = jax.lax.broadcasted_iota(DT, (1, 128), 1)

        def pack2(lo, hi):
            return ((jnp.maximum(hi, NEG16) + OFF) << 16) | \
                   (jnp.maximum(lo, NEG16) + OFF)

        def lo16(v):
            return (v & 0xFFFF) - OFF

        def hi16(v):
            return ((v >> 16) & 0xFFFF) - OFF

        def shift_right(x, k, fill):
            r = pltpu.roll(x, k, axis=1)
            return jnp.where(lane >= k, r, fill)

        def cummax_lanes(x):
            k = 1
            while k < LW:
                x = jnp.maximum(x, shift_right(x, k, NEG16))
                k *= 2
            return x

        # ---- plane access helpers (node-indexed (VWr,128) planes) ----
        def pread(ref, v):
            row = ref[pl.ds(v // 128, 1), :]
            return jnp.max(jnp.where(lane128 == (v % 128), row, NEGBIG))

        def pwrite(ref, v, val):
            r = v // 128
            m = lane128 == (v % 128)
            row = ref[pl.ds(r, 1), :]
            ref[pl.ds(r, 1), :] = jnp.where(m, val, row)

        def tread(j):
            row = tgtp[pl.ds(j // 128, 1), :]
            return jnp.max(jnp.where(lane128 == (j % 128), row, NEGBIG))

        def twrite(j, val):
            r = j // 128
            m = lane128 == (j % 128)
            row = tgtp[pl.ds(r, 1), :]
            tgtp[pl.ds(r, 1), :] = jnp.where(m, val, row)

        # DP cell at dynamic (row i, col j)
        def cell(ref, i, j):
            row = ref[pl.ds(i, 1), :]
            return jnp.max(jnp.where(lane == j, row, NEGBIG))

        R = nseq_s[0, 0, 0]
        m = par_s[0, 0, 0]
        n = par_s[0, 0, 1]
        g = par_s[0, 0, 2]
        e = par_s[0, 0, 3]
        q = par_s[0, 0, 4]
        c = par_s[0, 0, 5]

        slen_row = slen_r[0, 0:1, :]

        def slen_at(r_):
            return jnp.max(jnp.where(lane128 == r_, slen_row, 0))

        ej = e * lane
        cj = c * lane

        # ================= seed from sequence 0 =================
        L0 = slen_at(0)
        seq0 = seqs_r[0, 0:1, :]
        s0 = pltpu.roll(seq0, LW - 1, axis=1)    # lane v = char at pos v
        for k in range(LWr):
            basep[k:k + 1, :] = s0[:, k * 128:(k + 1) * 128]

        iov = (jax.lax.broadcasted_iota(DT, (VWr, 128), 0) * 128
               + jax.lax.broadcasted_iota(DT, (VWr, 128), 1))
        nxtp[:, :] = jnp.where(iov < L0 - 1, iov + 1, -1)
        ringp[:, :] = iov
        posp[:, :] = iov
        npredp[:, :] = jnp.where((iov >= 1) & (iov < L0), 1, 0)
        nsuccp[:, :] = jnp.where(iov < L0 - 1, 1, 0)
        iovp = jax.lax.broadcasted_iota(DT, (VW, 128), 0)
        lanesp = jax.lax.broadcasted_iota(DT, (VW, 128), 1)
        predp[:, :] = jnp.where((lanesp == 0) & (iovp >= 1) & (iovp < L0),
                                iovp - 1, -9)
        paths_r[0, 0:1, :] = jnp.where(lane < L0, lane, -1)

        # ================= per-sequence rounds =================
        def round_body(r, carry):
            head, Vc, ovf = carry
            L = slen_at(r)
            seqv = seqs_r[0, pl.ds(r, 1), :]      # char of pos j at lane j+1

            def seqat(j):
                return jnp.max(jnp.where(lane == j, seqv, -8))

            colmask = lane <= L

            # ---- DP row 0 ----
            if local:
                row0 = jnp.where(colmask, 0, NEG16)
                HH[0:1, :] = pack2(row0, row0).astype(DT)
            else:
                gap1 = -(g + (lane - 1) * e)
                gap2 = -(q + (lane - 1) * c)
                row0 = jnp.maximum(gap1, gap2)
                row0 = jnp.where(lane == 0, 0, row0)
                HH[0:1, :] = pack2(jnp.where(colmask, row0, NEG16),
                                   jnp.where(lane == 0, 0, NEG16)).astype(DT)
            EE[0:1, :] = jnp.full((1, LW), pack2(NEG16, NEG16), DT)

            NEGROW = jnp.full((1, LW), NEG16, DT)

            # ---- fill (walk the topo list; DP row = node id + 1) ----
            def fill_body(i, st):
                v, best_val, best_node = st
                pwrite(posp, v, i)
                np_ = pread(npredp, v)
                predrow = predp[pl.ds(v, 1), :]

                def ploop(p, acc):
                    hmax, e1mx, e2mx = acc
                    slot = jnp.max(jnp.where(lane128 == p, predrow, NEGBIG))
                    pid = jnp.where(p < np_, slot, -1)
                    hh = HH[pl.ds(pid + 1, 1), :]
                    ee = EE[pl.ds(pid + 1, 1), :]
                    return (jnp.maximum(hmax, lo16(hh)),
                            jnp.maximum(e1mx, lo16(ee)),
                            jnp.maximum(e2mx, hi16(ee)))

                hmax, e1mx, e2mx = jax.lax.fori_loop(
                    0, jnp.maximum(np_, 1), ploop, (NEGROW, NEGROW, NEGROW))
                base_v = pread(basep, v)
                sub = jnp.where(seqv == base_v, m, -n)
                M = shift_right(hmax, 1, NEG16) + sub
                e1 = jnp.maximum(jnp.maximum(hmax - g, e1mx - e), NEG16)
                e2 = jnp.maximum(jnp.maximum(hmax - q, e2mx - c), NEG16)
                hq = jnp.maximum(M, jnp.maximum(e1, e2))
                if local:
                    hq = jnp.maximum(hq, 0)
                G1 = cummax_lanes(hq + ej)
                G2 = cummax_lanes(hq + cj)
                F1 = shift_right(G1, 1, NEG16) - g - ej + e
                F2 = shift_right(G2, 1, NEG16) - q - cj + c
                Hrow = jnp.maximum(hq, jnp.maximum(F1, F2))
                HH[pl.ds(v + 1, 1), :] = pack2(Hrow, hq).astype(DT)
                EE[pl.ds(v + 1, 1), :] = pack2(e1, e2).astype(DT)
                if local:
                    rmax = jnp.max(jnp.where(colmask, Hrow, NEG16))
                    better = rmax > best_val
                    best_val = jnp.where(better, rmax, best_val)
                    best_node = jnp.where(better, v, best_node)
                vn = pread(nxtp, v)
                return (vn, best_val, best_node)

            _, best_val, best_node = jax.lax.fori_loop(
                0, Vc, fill_body, (head, jnp.int32(NEG16), jnp.int32(-1)))

            # ---- end cell ----
            if local:
                bi = jnp.maximum(best_node, 0) + 1
                row = lo16(HH[pl.ds(bi, 1), :])
                eqm = (row == best_val) & colmask
                bj = jnp.min(jnp.where(eqm, lane, LW))
                bv = best_val
            else:
                def sink_body(i, st):
                    v, bv_, bn_ = st
                    hv = lo16(cell(HH, v + 1, L))
                    better = (pread(nsuccp, v) == 0) & (hv > bv_)
                    vn = pread(nxtp, v)
                    return (vn, jnp.where(better, hv, bv_),
                            jnp.where(better, v, bn_))
                _, bv, bn = jax.lax.fori_loop(
                    0, Vc, sink_body, (head, jnp.int32(NEGBIG), jnp.int32(0)))
                bi = bn + 1
                bj = L

            # ---- clear targets ----
            tgtp[:, :] = jnp.full((LWr, 128), -2, DT)

            # ---- traceback (writes match targets only) ----
            def getH(i, j):
                return lo16(cell(HH, i, j))

            def getHq(i, j):
                return hi16(cell(HH, i, j))

            def getE1(i, j):
                return lo16(cell(EE, i, j))

            def getE2(i, j):
                return hi16(cell(EE, i, j))

            def tb_cond(st):
                return (~st[4]) & (st[5] < TB_CAP)

            def tb_body(st):
                i, j, chan, val, done, it, stuck = st
                ni, nj, nchan, nval = i, j, chan, val
                ndone = done

                hlike = (chan <= 1)
                i0 = i == 0
                if local:
                    stop = hlike & (val == 0)
                else:
                    stop = hlike & i0 & (j == 0)
                ndone = ndone | stop

                lead = hlike & i0 & (~stop) & (jnp.bool_(not local))
                act = hlike & (~i0) & (~stop)

                ii = jnp.maximum(i, 1)
                nid = ii - 1                     # node id of the DP row
                jm1 = jnp.maximum(j - 1, 0)
                base_v = pread(basep, nid)
                subv = jnp.where(seqat(j) == base_v, m, -n)

                np_ = pread(npredp, nid)
                predrow = predp[pl.ds(nid, 1), :]

                def slot_at(p):
                    s = jnp.max(jnp.where(lane128 == p, predrow, NEGBIG))
                    return jnp.where(p < np_, s, -1)

                def mloop(p, st2):
                    mfound, mrow = st2
                    pr = slot_at(p) + 1
                    ok = act & (j > 0) & (~mfound) & \
                        (getH(pr, jm1) + subv == val)
                    return (mfound | ok, jnp.where(ok, pr, mrow))

                mfound, mpred = jax.lax.fori_loop(
                    0, jnp.maximum(np_, 1), mloop,
                    (jnp.bool_(False), jnp.int32(0)))
                take_m = act & mfound
                e1v = getE1(i, j)
                e2v = getE2(i, j)
                take_e1 = act & (~mfound) & (e1v == val)
                take_e2 = act & (~mfound) & (~take_e1) & (e2v == val)
                take_f = act & (chan == 0) & (~mfound) & (~take_e1) & \
                    (~take_e2)

                # --- F: locate nearest origin k (channel 1 first per k) ---
                def f_scan(_):
                    def cond(kk):
                        k, f1, f2 = kk
                        return (~f1) & (~f2) & (k >= 0)

                    def body(kk):
                        k, f1, f2 = kk
                        hqk = getHq(i, k)
                        c1 = hqk - g - e * (j - 1 - k) == val
                        c2 = (~c1) & (hqk - q - c * (j - 1 - k) == val)
                        stay = c1 | c2
                        return (jnp.where(stay, k, k - 1), c1, c2)

                    k, f1, f2 = jax.lax.while_loop(
                        cond, body,
                        (j - 1, jnp.bool_(False), jnp.bool_(False)))
                    return jnp.maximum(k, 0)

                forigin = jax.lax.cond(take_f, f_scan,
                                       lambda _: jnp.int32(0), None)
                nj = jnp.where(take_f, forigin, nj)
                nchan = jnp.where(take_f, 1, nchan)
                nval = jnp.where(take_f, getHq(i, forigin), nval)

                # --- E channel step ---
                in_e = (chan == 2) | (chan == 3)
                op = jnp.where(chan == 2, g, q)
                ex = jnp.where(chan == 2, e, c)

                def eoloop(p, st2):
                    eopen, erow = st2
                    pr = slot_at(p) + 1
                    ok = in_e & (~eopen) & (getH(pr, j) - op == val)
                    return (eopen | ok, jnp.where(ok, pr, erow))

                eopen, epred_o = jax.lax.fori_loop(
                    0, jnp.maximum(np_, 1), eoloop,
                    (jnp.bool_(False), jnp.int32(0)))

                def exloop(p, st2):
                    eext, erow = st2
                    pr = slot_at(p) + 1
                    ev = jnp.where(chan == 2, getE1(pr, j), getE2(pr, j))
                    ok = in_e & (~eopen) & (~eext) & (ev - ex == val)
                    return (eext | ok, jnp.where(ok, pr, erow))

                eext, epred_x = jax.lax.fori_loop(
                    0, jnp.maximum(np_, 1), exloop,
                    (jnp.bool_(False), jnp.int32(0)))
                epred = jnp.where(eopen, epred_o, epred_x)
                ekick = in_e & (eopen | eext)
                ni = jnp.where(ekick, epred, ni)
                nchan = jnp.where(in_e & eopen, 0, nchan)
                nval = jnp.where(in_e & eopen, getH(epred, j), nval)
                eext_only = in_e & eext & (~eopen)
                nval = jnp.where(eext_only & (chan == 2),
                                 getE1(epred, j), nval)
                nval = jnp.where(eext_only & (chan == 3),
                                 getE2(epred, j), nval)
                ndone = ndone | (in_e & (~eopen) & (~eext))

                # --- E switches ---
                nchan = jnp.where(take_e1, 2, nchan)
                nchan = jnp.where(take_e2, 3, nchan)

                # --- M move: the only move recorded in targets ---
                @pl.when(take_m)
                def _():
                    twrite(jm1, nid)
                ni = jnp.where(take_m, mpred, ni)
                nj = jnp.where(take_m, j - 1, nj)
                nchan = jnp.where(take_m, 0, nchan)
                nval = jnp.where(take_m, getH(mpred, jm1), nval)

                # --- global leading insertion through row 0 ---
                nj = jnp.where(lead, j - 1, nj)
                nval = jnp.where(lead, getH(0, jm1), nval)
                nchan = jnp.where(lead, 0, nchan)

                stuck_now = act & (~take_m) & (~take_e1) & (~take_e2) & \
                    (~take_f) & (chan == 1)
                ndone = ndone | stuck_now

                return (ni, nj, nchan, nval, ndone, it + 1,
                        stuck | stuck_now)

            done0 = (bv <= 0) if local else jnp.bool_(False)
            done0 = done0 | (L == 0)
            st = jax.lax.while_loop(
                tb_cond, tb_body,
                (bi, bj, jnp.int32(0), bv, done0, jnp.int32(0),
                 jnp.bool_(False)))
            tb_bad = st[6] | (~st[4])     # stuck or iteration overrun

            # ---- threading ----
            pathrow0 = jnp.full((1, LW), -1, DT)

            def thr_body(j, st2):
                prev, guard, Vc_, head_, pathrow, ovf_ = st2
                b = seqat(j + 1)
                t = tread(j)
                tvalid = t >= 0
                t0 = jnp.maximum(t, 0)

                hit0 = tvalid & (pread(basep, t0) == b) & \
                    (pread(posp, t0) > guard)

                def ring_rest(_):
                    def rbody(s, st3):
                        found, vsel, cand, wrapped = st3
                        okc = (~found) & (~wrapped)
                        ok = okc & (pread(basep, cand) == b) & \
                            (pread(posp, cand) > guard)
                        vsel = jnp.where(ok, cand, vsel)
                        found = found | ok
                        cn = pread(ringp, cand)
                        wrapped = wrapped | (cn == t0)
                        cand = jnp.where(okc, cn, cand)
                        return (found, vsel, cand, wrapped)

                    c1 = pread(ringp, t0)
                    found, vsel, _, _ = jax.lax.fori_loop(
                        0, RING_CAP - 1, rbody,
                        (jnp.bool_(False), jnp.int32(-1), c1, c1 == t0))
                    return (found, vsel)

                found_r, vsel_r = jax.lax.cond(
                    tvalid & (~hit0), ring_rest,
                    lambda _: (jnp.bool_(False), jnp.int32(-1)), None)
                found = hit0 | found_r
                vsel = jnp.where(hit0, t0, vsel_r)

                def mk_new(_):
                    vnew = Vc_
                    o = vnew >= VW
                    vc = jnp.minimum(vnew, VW - 1)
                    pwrite(basep, vc, b)

                    @pl.when(tvalid)
                    def _():
                        rt = pread(ringp, t0)
                        pwrite(ringp, vc, rt)
                        pwrite(ringp, t0, vc)

                    prevc = jnp.maximum(prev, 0)
                    nxt_t = jnp.where(prev < 0, head_, pread(nxtp, prevc))
                    pwrite(nxtp, vc, nxt_t)

                    @pl.when(prev >= 0)
                    def _():
                        pwrite(nxtp, prevc, vc)
                    posv = jnp.where(prev < 0, -1, pread(posp, prevc))
                    pwrite(posp, vc, posv)
                    nh = jnp.where(prev < 0, vc, head_)
                    return (vc, nh, Vc_ + 1, o)

                v, nh, nVc, o = jax.lax.cond(
                    found,
                    lambda _: (vsel, head_, Vc_, jnp.bool_(False)),
                    mk_new, None)
                nguard = jnp.where(found, pread(posp, jnp.maximum(v, 0)),
                                   guard)

                # edge prev -> v (dedup in the 128-lane pred row)
                predrow = predp[pl.ds(v, 1), :]
                has = jnp.max(jnp.where(predrow == prev, 1, 0)) > 0
                npv = pread(npredp, v)
                do_add = (prev >= 0) & (~has)
                o = o | (do_add & (npv >= 128))
                slotm = lane128 == jnp.minimum(npv, 127)
                predp[pl.ds(v, 1), :] = jnp.where(
                    do_add & slotm, prev, predrow)

                @pl.when(do_add)
                def _():
                    pwrite(npredp, v, npv + 1)
                    prevc = jnp.maximum(prev, 0)
                    ns = pread(nsuccp, prevc)
                    pwrite(nsuccp, prevc, ns + 1)

                pathrow = jnp.where(lane == j, v, pathrow)
                return (v, nguard, nVc, nh, pathrow, ovf_ | o)

            prev, guard, Vc2, head2, pathrow, ovf2 = jax.lax.fori_loop(
                0, L, thr_body,
                (jnp.int32(-1), jnp.int32(-1), Vc, head, pathrow0,
                 ovf | tb_bad))
            paths_r[0, pl.ds(r, 1), :] = pathrow
            return (head2, Vc2, ovf2)

        head, Vc, ovf = jax.lax.fori_loop(
            1, R, round_body, (jnp.int32(0), L0, jnp.bool_(False)))

        # ================= export =================
        exp_r[0, 0:VWr, :] = basep[:, :]
        exp_r[0, VWr:2 * VWr, :] = ringp[:, :]

        def ord_body(i, v):
            row = 2 * VWr + i // 128
            cur = exp_r[0, pl.ds(row, 1), :]
            exp_r[0, pl.ds(row, 1), :] = jnp.where(
                lane128 == (i % 128), v, cur)
            return pread(nxtp, v)

        jax.lax.fori_loop(0, Vc, ord_body, head)

        meta_r[0, 0, 0] = Vc
        meta_r[0, 0, 1] = jnp.where(ovf, 1, 0)
        meta_r[0, 0, 2] = R
        meta_r[0, 0, 3] = 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),       # nseq
            pl.BlockSpec((1, 1, 6), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),       # params
            pl.BlockSpec((1, 1, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),       # seq lengths
            pl.BlockSpec((1, RW, LW), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),       # sequences
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 4), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),       # meta
            pl.BlockSpec((1, 3 * VWr, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),       # base/ring/order
            pl.BlockSpec((1, RW, LW), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),       # paths
        ],
        scratch_shapes=[
            pltpu.VMEM((VW + 1, LW), DT),    # HH
            pltpu.VMEM((VW + 1, LW), DT),    # EE
            pltpu.VMEM((VW, 128), DT),       # pred slots
            pltpu.VMEM((VWr, 128), DT),      # npred
            pltpu.VMEM((VWr, 128), DT),      # nsucc
            pltpu.VMEM((VWr, 128), DT),      # base
            pltpu.VMEM((VWr, 128), DT),      # ring
            pltpu.VMEM((VWr, 128), DT),      # nxt
            pltpu.VMEM((VWr, 128), DT),      # pos
            pltpu.VMEM((LWr, 128), DT),      # targets
        ],
    )

    pallas_fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, 4), jnp.int32),
            jax.ShapeDtypeStruct((B, 3 * VWr, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, RW, LW), jnp.int32),
        ],
        interpret=interpret,
    )

    def fn(nseq, par, slen, seqs):
        # sequences ship int8 over the tunnel; upcast on device.  Outputs
        # downcast to int16 on device before D2H (node ids < VW < 32768).
        meta, exp, paths = pallas_fn(nseq, par, slen.astype(jnp.int32),
                                     seqs.astype(jnp.int32))
        return meta[:, 0, :], exp.astype(jnp.int16), paths.astype(jnp.int16)

    return fn


@functools.lru_cache(maxsize=8)
def _compiled_fused(VW: int, LW: int, RW: int, local: bool, interpret: bool,
                    B: int):
    import jax

    fn = _fused_fn(VW, LW, RW, local, interpret, B)
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


class FusedPallasEngine:
    """Block-level device engine: ONE dispatch per batch of blocks.

    Pinned shape (VW, LW, RW) + fixed batch B = one axon AOT compile per
    `local` variant.  Blocks that don't fit (sequence too long, too many
    sequences, empty sequences) or that overflow mid-kernel (node/pred
    capacity, traceback trouble) run on the native C++ engine with
    identical semantics.
    """

    SHAPE = (4096, 2048)      # (VW, LW)

    def __init__(self, max_seqs: int = 48, max_batch: int = 32,
                 shape: tuple = SHAPE, interpret: bool = False,
                 validate: bool = True):
        from . import poa_native
        from .poa_fused import FusedHostEngine
        self.VW, self.LW = shape
        self.RW = max_seqs
        self.max_batch = max_batch
        self.interpret = interpret
        self.validate = validate
        if poa_native.available():
            self.fallback = poa_native.NativePOAEngine()
        else:                    # pragma: no cover - native always builds
            self.fallback = FusedHostEngine()
        self.calls = 0
        self.device_blocks = 0
        self.fallbacks = 0
        self.redo = 0            # device-overflow blocks redone on host
        self.device_s = 0.0
        if not interpret:
            from .poa_jax import ensure_backend, _enable_compile_cache
            _enable_compile_cache()
            ensure_backend()

    def stats(self) -> dict:
        return {
            "calls": self.calls,
            "device_blocks": self.device_blocks,
            "fallbacks": self.fallbacks,
            "redo": self.redo,
            "device_wait_s": round(self.device_s, 3),
        }

    def warmup(self, locals_=(True,)):
        import jax.numpy as jnp
        B = self.max_batch
        nseq = np.ones((B, 1, 1), np.int32)
        par = np.tile(np.array([[[1, 4, 6, 2, 26, 1]]], np.int32), (B, 1, 1))
        slen = np.zeros((B, 1, 128), np.int16)
        slen[:, 0, 0] = 1
        seqs = np.full((B, self.RW, self.LW), -1, np.int8)
        seqs[:, 0, 1] = 0
        for local in locals_:
            fn = _compiled_fused(self.VW, self.LW, self.RW, local,
                                 self.interpret, B)
            meta, exp, paths = fn(jnp.asarray(nseq), jnp.asarray(par),
                                  jnp.asarray(slen), jnp.asarray(seqs))
            np.asarray(meta)

    def _eligible(self, seqs) -> bool:
        if not seqs or len(seqs) > self.RW:
            return False
        for s in seqs:
            if len(s) == 0 or len(s) + 1 > self.LW:
                return False
        return True

    def poa_block_batch(self, blocks):
        from .poa_fused import rehydrate
        import jax.numpy as jnp

        results = [None] * len(blocks)
        dev: dict[bool, list[int]] = {}      # keyed by params.local
        fb: list[int] = []
        for i, (seqs, weights, params) in enumerate(blocks):
            if self._eligible(seqs):
                dev.setdefault(params.local, []).append(i)
            else:
                self.fallbacks += 1
                fb.append(i)
        handles = []
        for idxs in dev.values():
            for s in range(0, len(idxs), self.max_batch):
                handles.append(self._launch(blocks, idxs[s:s + self.max_batch]))
        # fallback blocks compute on host (native C++) while the device runs
        if fb:
            fb_res = self.fallback.poa_block_batch([blocks[i] for i in fb])
            for i, g in zip(fb, fb_res):
                results[i] = g
        redo: list[int] = []
        import time as _time
        for chunk, meta, exp, paths in handles:
            t0 = _time.perf_counter()
            meta = np.asarray(meta)
            exp = np.asarray(exp).astype(np.int32)
            paths = np.asarray(paths).astype(np.int32)
            self.device_s += _time.perf_counter() - t0
            for b, i in enumerate(chunk):
                seqs, weights, params = blocks[i]
                V = int(meta[b, 0])
                if meta[b, 1] != 0 or V > self.VW:
                    redo.append(i)
                    continue
                VWr = self.VW // 128
                planes = exp[b].reshape(3, VWr * 128)
                base = planes[0, :V]
                ring = planes[1, :V]
                order = planes[2, :V]
                blk_paths = [paths[b, r, :len(s)].tolist()
                             for r, s in enumerate(seqs)]
                if self.validate:
                    # fail fast on any kernel bug: every path must spell
                    # its sequence exactly
                    for s, pth in zip(seqs, blk_paths):
                        pa = np.asarray(pth)
                        if (pa.min(initial=0) < 0 or
                                pa.max(initial=-1) >= V or
                                not np.array_equal(base[pa],
                                                   np.asarray(s, np.int32))):
                            raise RuntimeError(
                                "fused kernel produced an invalid path "
                                f"(block {i})")
                results[i] = rehydrate(base, ring,
                                       [int(v) for v in order],
                                       blk_paths, list(weights))
                self.device_blocks += 1
        if redo:
            self.redo += len(redo)
            rd = self.fallback.poa_block_batch([blocks[i] for i in redo])
            for i, g in zip(redo, rd):
                results[i] = g
        return results

    def _launch(self, blocks, chunk):
        import jax.numpy as jnp
        B = len(chunk) if self.interpret else self.max_batch
        RW, LW = self.RW, self.LW
        nseq = np.zeros((B, 1, 1), np.int32)
        par = np.zeros((B, 1, 6), np.int32)
        slen = np.zeros((B, 1, 128), np.int16)
        seqs = np.full((B, RW, LW), -1, np.int8)
        for b, i in enumerate(chunk):
            sq, weights, p = blocks[i]
            nseq[b, 0, 0] = len(sq)
            par[b, 0] = [p.m, p.n, p.g, p.e, p.q, p.c]
            for r, s in enumerate(sq):
                slen[b, 0, r] = len(s)
                seqs[b, r, 1:len(s) + 1] = s
        local = blocks[chunk[0]][2].local
        fn = _compiled_fused(self.VW, self.LW, RW, local, self.interpret, B)
        meta, exp, paths = fn(jnp.asarray(nseq), jnp.asarray(par),
                              jnp.asarray(slen), jnp.asarray(seqs))
        self.calls += 1
        return chunk, meta, exp, paths
