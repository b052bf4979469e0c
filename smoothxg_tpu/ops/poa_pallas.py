"""Pallas TPU kernel for sequence-to-POA-graph alignment.

One grid program per block; the entire DP state (H, Hq, E1, E2) lives in
VMEM (v5e exposes ~128 MB), so the fill performs no HBM traffic and the
traceback walks VMEM values, emitting only the move list. Loop bounds are
the block's *actual* V and L (dynamic fori/while), so padded batch slots
cost almost nothing — the engine pins ONE uniform shape and a fixed batch
size, so the expensive axon remote-AOT compile happens once per
(P, local) variant.

Recurrences identical to the scalar oracle (ops/poa_host.py):
  M[v]  = shift(maxP H[pred]) + sub
  E*[v] = maxP max(H[pred] - open, E*[pred] - ext)
  Hq[v] = max(M, E1, E2 [, 0 local])
  F*[v] = shift(cummax(Hq[v] + ext*j)) - open - ext*(j-1)
  H[v]  = max(Hq, F1, F2)

cummax is a log-shift scan over lanes (pltpu.roll).  The traceback is a
scalar state machine re-deriving provenance from stored values with explicit
value passing, mirroring poa_host.align; F moves locate their origin with an
inner backward scan before emitting, so channel choice is exact.

Mosaic TPU constraints shape the memory layout (discovered empirically):
  * no dynamic *lane* indexing — DP cells at dynamic column j are read with
    a masked lane-reduction over the row;
  * SMEM is ~1 MB with huge per-element padding — arrays cannot live there;
    per-node records (base, sink, preds) are packed as int32 *planes* of
    128 nodes per VMEM row (node v -> row v//128, lane v%128) and read by
    masked lane-reduction; only true scalars (V, L, params) stay in SMEM;
  * no scalar stores to VMEM — each traceback move is emitted as a packed
    int32 code ((i+2)<<15 | (j+2)) broadcast-masked into lane 0 of its own
    row of a VMEM moves buffer; XLA slices lane 0 before the D2H transfer;
  * VMEM block slices need 128-aligned trailing dims;
  * int16 (16,128) tiling breaks single-row dynamic loads and int16 scalar
    arithmetic miscompiles — all state is int32.
"""
from __future__ import annotations

import functools

import numpy as np

NEG16 = -16000
NEGBIG = -(1 << 30)
SHIFT = 15
MASK = (1 << SHIFT) - 1


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=64)
def _pallas_fn(VW: int, LW: int, P: int, local: bool, interpret: bool,
               B: int):
    """The traceable (un-jitted) batched kernel callable — usable directly
    or inside shard_map for multi-chip block sharding (parallel/mesh.py)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    DT = jnp.int32
    S = VW + LW + 8
    MW = 8          # moves-buffer lane width (full trailing dim -> tiny DMA)
    NI = 2 + P      # per-node record fields: base, sink, P predecessor rows
    VWr = VW // 128  # plane rows per field

    OFF = 16384   # bias so clamped scores pack into unsigned 16-bit halves

    def kernel(slen_s, nv_s, par_s, ninfo_r, seq_r,
               moves_r, meta_r, HH, EE):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LW), 1)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        # two scores per int32 word: lo half = H / E1, hi half = Hq / E2;
        # everything is clamped to >= NEG16 before packing (same clamp the
        # scalar oracle applies to its E channels), so halves are unsigned
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

        # node record field k of DP row i (i>=1): plane row + masked reduce
        def nrec(k, i):
            t = i - 1
            row = ninfo_r[0, pl.ds(k * VWr + (t // 128), 1), :]
            return jnp.max(jnp.where(lane128 == (t % 128), row, NEGBIG))

        def npred(i, p):
            return nrec(2 + p, i)

        # DP cell at dynamic (i, j): row slice + masked lane reduction
        def cell(ref, i, j):
            row = ref[pl.ds(i, 1), :]
            return jnp.max(jnp.where(lane == j, row, NEGBIG))

        laneM = jax.lax.broadcasted_iota(jnp.int32, (1, MW), 1)

        def emit(pos, i, jv):
            code = ((i + 2) << SHIFT) | (jv + 2)
            moves_r[0, pl.ds(pos, 1), :] = jnp.where(laneM == 0, code, 0)

        L = slen_s[0, 0, 0]
        V = nv_s[0, 0, 0]
        m = par_s[0, 0, 0]
        n = par_s[0, 0, 1]
        g = par_s[0, 0, 2]
        e = par_s[0, 0, 3]
        q = par_s[0, 0, 4]
        c = par_s[0, 0, 5]

        colmask = lane <= L
        ej = e * lane
        cj = c * lane

        # seq is packed with column j's character at lane j (host shifts by
        # one at packing time); lane 0 holds -1 (the j=0 boundary)
        seqv = seq_r[0, 0:1, :]

        def seqat(j):
            return jnp.max(jnp.where(lane == j, seqv, -8))

        # ---- row 0 ----
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

        # ---- fill ----
        def fill_row(v, best):
            best_val, best_row = best
            pr0 = npred(v, 0)
            hh = HH[pl.ds(pr0, 1), :]
            ee = EE[pl.ds(pr0, 1), :]
            hmax = lo16(hh)
            e1mx = lo16(ee)
            e2mx = hi16(ee)
            for p in range(1, P):
                pr = npred(v, p)
                hh = HH[pl.ds(pr, 1), :]
                ee = EE[pl.ds(pr, 1), :]
                hmax = jnp.maximum(hmax, lo16(hh))
                e1mx = jnp.maximum(e1mx, lo16(ee))
                e2mx = jnp.maximum(e2mx, hi16(ee))
            base_v = nrec(0, v)
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
            HH[pl.ds(v, 1), :] = pack2(Hrow, hq).astype(DT)
            EE[pl.ds(v, 1), :] = pack2(e1, e2).astype(DT)
            if local:
                rmax = jnp.max(jnp.where(colmask, Hrow, NEG16))
                better = rmax > best_val
                best_val = jnp.where(better, rmax, best_val)
                best_row = jnp.where(better, v, best_row)
            return best_val, best_row

        best_val, best_row = jax.lax.fori_loop(
            1, V + 1, fill_row, (jnp.int32(NEG16), jnp.int32(0)))

        # ---- end cell ----
        if local:
            bi = best_row
            row = lo16(HH[pl.ds(jnp.maximum(bi, 0), 1), :])
            eqm = (row == best_val) & colmask
            bj = jnp.min(jnp.where(eqm, lane, LW))
            bv = best_val
        else:
            def scan_sinks(v, acc):
                bv_, bi_ = acc
                hv = lo16(cell(HH, v, L))
                better = (nrec(1, v) > 0) & (hv > bv_)
                return (jnp.where(better, hv, bv_),
                        jnp.where(better, v, bi_))
            bv, bi = jax.lax.fori_loop(1, V + 1, scan_sinks,
                                       (jnp.int32(NEGBIG), jnp.int32(1)))
            bj = L

        # ---- traceback ----
        def getH(i, j):
            return lo16(cell(HH, i, j))

        def getHq(i, j):
            return hi16(cell(HH, i, j))

        def getE1(i, j):
            return lo16(cell(EE, i, j))

        def getE2(i, j):
            return hi16(cell(EE, i, j))

        # chan: 0=H, 1=Hq (no F allowed), 2=E1, 3=E2
        def tb_cond(st):
            return (~st[5]) & (st[6] < 2 * S)

        def tb_body(st):
            i, j, chan, val, npos, done, it = st[:7]
            ni, nj, nchan, nval, nnpos = i, j, chan, val, npos
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

            ii = jnp.maximum(i, 1)   # safe row for node-record reads
            jm1 = jnp.maximum(j - 1, 0)
            base_v = nrec(0, ii)
            subv = jnp.where(seqat(j) == base_v, m, -n)

            mfound = jnp.bool_(False)
            mpred = jnp.int32(0)
            for p in range(P):
                pr = npred(ii, p)
                ok = act & (j > 0) & (~mfound) & \
                    (getH(pr, jm1) + subv == val)
                mpred = jnp.where(ok, pr, mpred)
                mfound = mfound | ok
            take_m = act & mfound
            e1v = getE1(i, j)
            e2v = getE2(i, j)
            take_e1 = act & (~mfound) & (e1v == val)
            take_e2 = act & (~mfound) & (~take_e1) & (e2v == val)
            take_f = act & (chan == 0) & (~mfound) & (~take_e1) & (~take_e2)

            # --- F: locate origin k (both channels) then emit j-k inserts ---
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

                k, f1, f2 = jax.lax.while_loop(cond, body, (j - 1,
                                                            jnp.bool_(False),
                                                            jnp.bool_(False)))
                return jnp.maximum(k, 0)

            forigin = jax.lax.cond(take_f, f_scan, lambda _: jnp.int32(0),
                                   None)

            @pl.when(take_f)
            def _():
                def emit_ins(t, _):
                    emit(npos + t, -1, j - 1 - t)
                    return 0
                jax.lax.fori_loop(0, j - forigin, emit_ins, 0)

            nf = j - forigin
            nnpos = jnp.where(take_f, npos + nf, nnpos)
            nj = jnp.where(take_f, forigin, nj)
            nchan = jnp.where(take_f, 1, nchan)
            nval = jnp.where(take_f, getHq(i, forigin), nval)

            # --- E channel step ---
            in_e = (chan == 2) | (chan == 3)
            op = jnp.where(chan == 2, g, q)
            ex = jnp.where(chan == 2, e, c)
            eopen = jnp.bool_(False)
            eext = jnp.bool_(False)
            epred = jnp.int32(0)
            for p in range(P):
                pr = npred(ii, p)
                ok = in_e & (~eopen) & (getH(pr, j) - op == val)
                epred = jnp.where(ok, pr, epred)
                eopen = eopen | ok
            for p in range(P):
                pr = npred(ii, p)
                ev = jnp.where(chan == 2, getE1(pr, j), getE2(pr, j))
                ok = in_e & (~eopen) & (~eext) & (ev - ex == val)
                epred = jnp.where(ok, pr, epred)
                eext = eext | ok
            ekick = in_e & (eopen | eext)

            @pl.when(ekick)
            def _():
                emit(npos, i, -1)
            nnpos = jnp.where(ekick, npos + 1, nnpos)
            ni = jnp.where(ekick, epred, ni)
            nchan = jnp.where(in_e & eopen, 0, nchan)
            nval = jnp.where(in_e & eopen, getH(epred, j), nval)
            eext_only = in_e & eext & (~eopen)
            nval = jnp.where(eext_only & (chan == 2), getE1(epred, j), nval)
            nval = jnp.where(eext_only & (chan == 3), getE2(epred, j), nval)
            ndone = ndone | (in_e & (~eopen) & (~eext))

            # --- E switches (no emit) ---
            nchan = jnp.where(take_e1, 2, nchan)
            nchan = jnp.where(take_e2, 3, nchan)

            # --- M move ---
            @pl.when(take_m)
            def _():
                emit(npos, i, j - 1)
            nnpos = jnp.where(take_m, npos + 1, nnpos)
            ni = jnp.where(take_m, mpred, ni)
            nj = jnp.where(take_m, j - 1, nj)
            nchan = jnp.where(take_m, 0, nchan)
            nval = jnp.where(take_m, getH(mpred, jm1), nval)

            # --- global leading insertion through row 0 ---
            @pl.when(lead)
            def _():
                emit(npos, -1, j - 1)
            nnpos = jnp.where(lead, npos + 1, nnpos)
            nj = jnp.where(lead, j - 1, nj)
            nval = jnp.where(lead, getH(0, jm1), nval)
            nchan = jnp.where(lead, 0, nchan)

            # H cell whose value came from nothing we know -> stop, but FLAG
            # it: a silent partial alignment would corrupt the POA graph
            # quietly (the host falls back to the oracle on this flag)
            stuck = act & (~take_m) & (~take_e1) & (~take_e2) & (~take_f) & \
                (chan == 1)
            ndone = ndone | stuck
            nstuck = st[7] | stuck

            return (ni, nj, nchan, nval, nnpos, ndone, it + 1, nstuck)

        done0 = (bv <= 0) if local else jnp.bool_(False)
        done0 = done0 | (V == 0) | (L == 0)   # padded batch slots
        st = jax.lax.while_loop(
            tb_cond, tb_body,
            (bi, bj, jnp.int32(0), bv, jnp.int32(0), done0, jnp.int32(0),
             jnp.bool_(False)))
        meta_r[0, 0, 0] = st[4]
        meta_r[0, 0, 1] = bv
        # slot 2: stuck traceback (1) or iteration-limit overrun (2)
        meta_r[0, 0, 2] = jnp.where(st[7], 1, jnp.where(~st[5], 2, 0))
        meta_r[0, 0, 3] = 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),       # slen
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),       # nvalid
            pl.BlockSpec((1, 1, 6), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),       # par
            pl.BlockSpec((1, NI * VWr, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),       # ninfo planes
            pl.BlockSpec((1, 1, LW), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),       # seq
        ],
        out_specs=[
            pl.BlockSpec((1, S, MW), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),       # moves (lane 0)
            pl.BlockSpec((1, 1, 4), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),       # meta
        ],
        scratch_shapes=[
            pltpu.VMEM((VW + 1, LW), DT),   # HH: Hq<<16 | H (biased)
            pltpu.VMEM((VW + 1, LW), DT),   # EE: E2<<16 | E1 (biased)
        ],
    )

    pallas_fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, S, MW), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 4), jnp.int32),
        ],
        interpret=interpret,
    )

    def fn(slen, nv, par, ninfo, seq):
        # node planes ship as int16 and seq as int8 (H2D over the tunnel is
        # a dominant per-call cost); XLA upcasts on device before the kernel
        moves, meta = pallas_fn(slen, nv, par, ninfo.astype(jnp.int32),
                                seq.astype(jnp.int32))
        # lane-0 slice on device: only (B, S) codes cross the PCIe/tunnel
        return moves[:, :, 0], meta[:, 0, :]

    return fn


@functools.lru_cache(maxsize=32)
def _compiled_pallas(VW: int, LW: int, P: int, local: bool, interpret: bool,
                     B: int):
    import jax

    fn = _pallas_fn(VW, LW, P, local, interpret, B)
    jfn = jax.jit(fn)
    holder = {}

    def call(*args):
        if "c" not in holder:
            lowered = jfn.lower(*args)
            try:
                # the DP scratch exceeds XLA's default 16MB scoped-vmem
                # budget; v5e has 128MB VMEM — raise the limit per-compile
                # (TPU-only debug option; CPU/interpret rejects it)
                holder["c"] = lowered.compile(compiler_options={
                    "xla_tpu_scoped_vmem_limit_kib": 112640})
            except Exception:
                holder["c"] = lowered.compile()
        return holder["c"](*args)

    return call


class PallasPOAEngine:
    """Device engine backed by the Pallas kernel.

    One uniform (VW, LW) shape and a fixed batch size pin the compile count
    to one per (P, local) variant; actual V/L are dynamic loop bounds inside
    the kernel so padding costs almost nothing. Oversized tasks fall back to
    the host DP (rare by construction: the pipeline bounds POA length)."""

    # wide (most blocks) + tall-thin (high-divergence POA graphs, V ~ 2L);
    # a single merged (6144, 2048) shape measured WORSE: per-call cost is
    # dominated by the H2D size of the predecessor planes, which scales
    # with P*VW — keep the planes as small as each block class needs
    SHAPES = ((4096, 2048), (6144, 1408))

    def __init__(self, max_pred: int = 8, uniform_shapes: tuple = SHAPES,
                 max_batch: int = 32, interpret: bool = False):
        from . import poa_host
        from .poa_jax import ensure_backend, _enable_compile_cache
        self.max_pred = max_pred
        self.uniform_shapes = tuple(uniform_shapes)
        self.max_batch = max_batch
        self.interpret = interpret
        self.host = poa_host
        self.fallbacks = 0
        self.fallback_reasons = {"V": 0, "L": 0, "P": 0}
        self.stuck_fallbacks = 0
        self.device_tasks = 0
        self.calls = 0
        self.device_s = 0.0          # blocking time waiting on device results
        self.bucket_tasks = {}       # (VW, LW, P, local) -> task count
        if not interpret:
            _enable_compile_cache()
            ensure_backend()

    def _dims(self, V: int, L: int):
        """Smallest pinned shape that fits (None -> host fallback)."""
        if self.interpret:
            return max(_round_up(V, 128), 128), max(_round_up(L + 1, 128), 128)
        for VW, LW in self.uniform_shapes:
            if V <= VW and L + 1 <= LW:
                return VW, LW
        return None

    def _dims_reject_reason(self, V: int, L: int) -> str:
        """Attribute a _dims() rejection to the V or the L bound."""
        if any(V <= VW for VW, _ in self.uniform_shapes):
            return "L"
        return "V"

    def warmup(self, locals_=(True,), preds=(4, 8)):
        """Pre-compile the pinned kernel variants (axon AOT costs minutes;
        do it once, up front)."""
        import jax.numpy as jnp
        B = self.max_batch
        for (VW, LW) in self.uniform_shapes:
          for local in locals_:
            for PB in preds:
                fn = _compiled_pallas(VW, LW, PB, local, self.interpret, B)
                NI = 2 + PB
                z = np.zeros((B, 1, 1), np.int32)
                par = np.tile(np.array([[[1, 4, 6, 2, 26, 1]]], np.int32),
                              (B, 1, 1))
                ninfo = np.zeros((B, NI * (VW // 128), 128), np.int16)
                seq = np.full((B, 1, LW), -1, np.int8)
                moves, meta = fn(jnp.asarray(z), jnp.asarray(z),
                                 jnp.asarray(par), jnp.asarray(ninfo),
                                 jnp.asarray(seq))
                np.asarray(meta)

    def stats(self) -> dict:
        """Observability counters (per-bucket task counts, dispatches,
        blocking device wait) — the per-bucket blocks/s view the reference
        exposed only as POA_DEBUG timing (src/smooth.cpp:2095)."""
        return {
            "device_tasks": self.device_tasks,
            "fallbacks": self.fallbacks,
            "fallback_reasons": dict(self.fallback_reasons),
            "stuck_fallbacks": self.stuck_fallbacks,
            "calls": self.calls,
            "device_wait_s": round(self.device_s, 3),
            "bucket_tasks": {str(k): v for k, v in self.bucket_tasks.items()},
        }

    def align_batch_async(self, tasks):
        """Launch all device work for `tasks` and return a handle; host
        fallbacks are computed eagerly. jax dispatch is async, so the caller
        can do host work (graph updates, next-wave packing) while the device
        executes, then call finish(handle)."""
        from collections import defaultdict
        results: list = [None] * len(tasks)
        buckets = defaultdict(list)
        for t, (graph, seq, p) in enumerate(tasks):
            order = graph.topo_order()
            V, L = len(order), len(seq)
            if V == 0 or L == 0:
                results[t] = []
                continue
            maxp = max((len(graph.preds[v]) for v in order), default=1)
            dims = self._dims(V, L)
            if dims is None or maxp > self.max_pred:
                results[t] = self.host.align(graph, seq, p)
                self.fallbacks += 1
                if dims is None:
                    self.fallback_reasons[self._dims_reject_reason(V, L)] += 1
                if maxp > self.max_pred:
                    self.fallback_reasons["P"] += 1
                continue
            VW, LW = dims
            PB = 4 if maxp <= 4 else 8
            buckets[(VW, LW, PB, p.local)].append(t)
        inflight = []
        for (VW, LW, PB, local), idxs in buckets.items():
            for s in range(0, len(idxs), self.max_batch):
                inflight.append(self._launch(
                    tasks, idxs[s:s + self.max_batch], VW, LW, PB, local))
        return results, inflight

    def finish(self, handle):
        """Block on and decode a handle from align_batch_async."""
        results, inflight = handle
        for h in inflight:
            self._decode(h, results)
        return results

    def align_batch(self, tasks):
        return self.finish(self.align_batch_async(tasks))

    def _launch(self, tasks, chunk, VW, LW, PB, local):
        import jax.numpy as jnp
        # compiled mode pins B = max_batch (padded); interpret keeps B small
        B = len(chunk) if self.interpret else self.max_batch
        slen, nv, par, ninfo, seq, orders = self._pack(
            tasks, chunk, VW, LW, PB, B)
        fn = _compiled_pallas(VW, LW, PB, local, self.interpret, B)
        codes, meta = fn(jnp.asarray(slen), jnp.asarray(nv),
                         jnp.asarray(par), jnp.asarray(ninfo),
                         jnp.asarray(seq))
        self.calls += 1
        key = (VW, LW, PB, local)
        self.bucket_tasks[key] = self.bucket_tasks.get(key, 0) + len(chunk)
        return tasks, chunk, orders, codes, meta

    @staticmethod
    def _pack(tasks, chunk, VW, LW, PB, B):
        """Pack `chunk` task indices into the kernel's device arrays."""
        NI = 2 + PB
        VWr = VW // 128
        slen = np.zeros((B, 1, 1), dtype=np.int32)
        nv = np.zeros((B, 1, 1), dtype=np.int32)
        par = np.zeros((B, 1, 6), dtype=np.int32)
        ninfo = np.zeros((B, NI * VWr, 128), dtype=np.int16)
        seq = np.full((B, 1, LW), -1, dtype=np.int8)
        orders = []
        for b, t in enumerate(chunk):
            graph, sq, p = tasks[t]
            order = graph.topo_order()
            orders.append(order)
            V, L = len(order), len(sq)
            order_a = np.asarray(order, dtype=np.int64)
            row_of = np.zeros(graph.n_nodes() + 1, dtype=np.int64)
            row_of[order_a] = np.arange(1, V + 1)
            plens = np.fromiter((len(graph.preds[v]) for v in order),
                                dtype=np.int64, count=V)
            kept = np.minimum(plens, PB)
            flat = np.fromiter(
                (u for v in order for u in graph.preds[v][:PB]),
                dtype=np.int64, count=int(kept.sum()))
            rows = np.repeat(np.arange(V), kept)
            cols = (np.arange(len(flat))
                    - np.repeat(np.cumsum(kept) - kept, kept))
            pm = np.zeros((V, PB), dtype=np.int64)
            pm[rows, cols] = row_of[flat]
            first = pm[:, 0]
            for k in range(1, PB):
                empty = kept <= k
                pm[empty, k] = first[empty]
            planes = ninfo[b].reshape(NI, VWr * 128)
            planes[0, :V] = np.asarray(graph.base, dtype=np.int16)[order_a]
            planes[1, :V] = np.fromiter(
                (0 if graph.succs[v] else 1 for v in order),
                dtype=np.int16, count=V)
            planes[2:2 + PB, :V] = pm.T
            # seq column 0 is the DP j=0 boundary; chars live at j=1..L
            seq[b, 0, 1:L + 1] = sq
            slen[b, 0, 0] = L
            nv[b, 0, 0] = V
            par[b, 0] = [p.m, p.n, p.g, p.e, p.q, p.c]
        return slen, nv, par, ninfo, seq, orders

    def _decode(self, handle, results):
        import time as _time
        tasks, chunk, orders, codes, meta = handle
        t0 = _time.perf_counter()
        codes = np.asarray(codes)
        meta = np.asarray(meta)
        self.device_s += _time.perf_counter() - t0
        self.device_tasks += len(chunk)
        for b, t in enumerate(chunk):
            if meta[b, 2] != 0:
                # kernel flagged a stuck/overrun traceback: a truncated move
                # list would corrupt the POA graph silently — recompute on
                # the host oracle instead (and count it)
                graph, sq, p = tasks[t]
                results[t] = self.host.align(graph, sq, p)
                self.stuck_fallbacks += 1
                continue
            order = orders[b]
            k = int(meta[b, 0])
            arr = codes[b, :k][::-1]
            rs = ((arr >> SHIFT) - 2).tolist()
            sps = ((arr & MASK) - 2).tolist()
            results[t] = [
                (order[r - 1] if r >= 1 else None, sp if sp >= 0 else None)
                for r, sp in zip(rs, sps)]
