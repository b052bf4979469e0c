"""Windowed-storage stacked kernel (interpret mode) vs the numpy fused
oracle: bit-for-bit parity on bases, rings, topo order, per-sequence
paths, and the guard-split counter — for full-width windows (off = 0),
REAL banded windows with nonzero per-row offsets, and K-lockstep
stacking.  Oracle: ops/poa_fused.FusedPOA + ops/poa_host banded fill."""
import numpy as np
import pytest

from smoothxg_tpu.ops.poa_fused import FusedPOA
from smoothxg_tpu.ops.poa_host import POAParams
from smoothxg_tpu.ops.poa_pallas_win import _win_fn

from test_poa_jax import CASES


def encode(s):
    return np.frombuffer(s.encode() if isinstance(s, str) else bytes(s),
                         dtype=np.uint8).astype(np.int8)


CODE = {c: i for i, c in enumerate("ACGT")}


def codes(s):
    return np.array([CODE[c] for c in s], dtype=np.int8)


def run_win(blocks, K, VW, LW, W, RW, local, banded, wb=-1, wf_milli=30):
    """blocks: list of lists of int8 code arrays. Returns per real block
    (meta_row, base, ring, order, paths)."""
    nb = len(blocks)
    B = max(1, -(-nb // K))
    total = B * K
    SL = LW // 128
    FW = W // 128
    LWr = LW // 128
    nseq = np.ones((total, 1, 1), np.int32)
    par = np.zeros((total, 1, 8), np.int32)
    slen = np.zeros((total, 1, 128), np.int16)
    slen[:, 0, 0] = 1
    seqs = np.full((total, RW * SL + FW, 128), -1, np.int8)
    seqs[:, 0, 1] = 0
    p = POAParams(1, 4, 6, 2, 26, 1, local=local, wb=wb, wf_milli=wf_milli)
    for b, sq in enumerate(blocks):
        nseq[b, 0, 0] = len(sq)
        par[b, 0] = [p.m, p.n, p.g, p.e, p.q, p.c, max(p.wb, 0),
                     p.wf_milli]
        for r, s in enumerate(sq):
            slen[b, 0, r] = len(s)
            flat = np.full(SL * 128, -1, np.int8)
            flat[1:len(s) + 1] = s
            seqs[b, r * SL:(r + 1) * SL] = flat.reshape(SL, 128)
    fn = _win_fn(K, VW, LW, W, RW, local, True, B, banded)
    meta, exp, paths = fn(nseq, par, slen, np.asarray(seqs))
    meta = np.asarray(meta)
    exp = np.asarray(exp).astype(np.int32).reshape(total, 3, -1)
    paths = np.asarray(paths).astype(np.int32).reshape(total, RW, LWr * 128)
    out = []
    for b, sq in enumerate(blocks):
        V = int(meta[b, 0])
        out.append((meta[b], exp[b, 0, :V], exp[b, 1, :V], exp[b, 2, :V],
                    [paths[b, r, :len(s)] for r, s in enumerate(sq)]))
    return out, p


def oracle(sq, p):
    f = FusedPOA()
    for s in sq:
        f.add_sequence(np.asarray(s, np.int8), p)
    return f


def assert_parity(blocks, K, VW, LW, W, RW, local, banded, wb=-1,
                  wf_milli=30, expect_window_offsets=False):
    res, p = run_win(blocks, K, VW, LW, W, RW, local, banded, wb, wf_milli)
    saw_off = False
    for sq, (meta, base, ring, order, paths) in zip(blocks, res):
        f = oracle(sq, p)
        assert meta[1] == 0, "unexpected overflow"
        assert meta[0] == f.n_nodes()
        assert base.tolist() == f.base
        assert ring.tolist() == f.ring
        assert order.tolist() == f.topo_order()
        for got, want in zip(paths, f.paths):
            assert got.tolist() == want
        assert meta[3] == f.guard_splits
        if banded and f.n_nodes() > W:
            saw_off = True
    if expect_window_offsets:
        assert saw_off, "fixture too small: no row ever moved its window"


def mutate(base, rng, n_sub=4, p_ins=0.5, p_del=0.4):
    s = list(base)
    for _ in range(n_sub):
        pos = int(rng.integers(0, len(s)))
        s[pos] = int(rng.integers(0, 4))
    if rng.random() < p_ins:
        pos = int(rng.integers(3, len(s) - 3))
        s = s[:pos] + [int(rng.integers(0, 4))
                       for _ in range(int(rng.integers(1, 4)))] + s[pos:]
    if rng.random() < p_del:
        pos = int(rng.integers(3, len(s) - 6))
        del s[pos:pos + int(rng.integers(1, 4))]
    return np.array(s, dtype=np.int8)


def family(rng, L, n):
    base = rng.integers(0, 4, L).astype(np.int8)
    return [base] + [mutate(base, rng) for _ in range(n - 1)]


@pytest.mark.parametrize("local", [True, False])
@pytest.mark.parametrize("seqs", CASES)
def test_win_fullwidth_matches_oracle(seqs, local):
    blocks = [[codes(s) for s in seqs]]
    assert_parity(blocks, K=1, VW=512, LW=256, W=256, RW=16, local=local,
                  banded=False)


@pytest.mark.parametrize("local", [True, False])
def test_win_fullwidth_stacked_k2(local):
    rng = np.random.default_rng(5)
    blocks = [family(rng, 90, 4), family(rng, 70, 5), family(rng, 50, 3)]
    assert_parity(blocks, K=2, VW=512, LW=256, W=256, RW=16, local=local,
                  banded=False)


@pytest.mark.parametrize("local", [True, False])
def test_win_banded_offsets_match_oracle(local):
    """W < V: late rows anchor their window past lane block 0 — the
    dynamic realignment path is genuinely exercised."""
    rng = np.random.default_rng(11)
    blocks = [family(rng, 600, 4)]
    assert_parity(blocks, K=1, VW=1024, LW=768, W=384, RW=8, local=local,
                  banded=True, wb=40, wf_milli=30,
                  expect_window_offsets=True)


def test_win_banded_stacked_k2():
    rng = np.random.default_rng(23)
    blocks = [family(rng, 500, 4), family(rng, 420, 5)]
    assert_parity(blocks, K=2, VW=1024, LW=640, W=384, RW=8, local=False,
                  banded=True, wb=40, wf_milli=30,
                  expect_window_offsets=True)


def test_win_band_wider_than_window_overflows():
    """A band that cannot fit the stored window must set the overflow
    flag (native redo), never truncate silently."""
    rng = np.random.default_rng(3)
    blocks = [family(rng, 500, 3)]
    res, p = run_win(blocks, 1, 1024, 640, 256, 8, False, True,
                     wb=200, wf_milli=30)
    assert res[0][0][1] == 1


def test_win_adaptive_param_tiers():
    """Per-block penalty params (the adaptive tier extremes) stay exact
    through the delta-packed gap channels (d1/d2 field caps)."""
    rng = np.random.default_rng(7)
    blocks = [family(rng, 120, 4), family(rng, 100, 4)]
    # run each block with a different extreme tier in one K=2 dispatch
    nb = len(blocks)
    K, VW, LW, W, RW = 2, 512, 256, 256, 16
    B = -(-nb // K)
    SL, FW, LWr = LW // 128, W // 128, LW // 128
    tiers = [POAParams(1, 19, 39, 3, 81, 1, local=False),
             POAParams(1, 4, 6, 2, 26, 1, local=False)]
    total = B * K
    nseq = np.ones((total, 1, 1), np.int32)
    par = np.zeros((total, 1, 8), np.int32)
    slen = np.zeros((total, 1, 128), np.int16)
    slen[:, 0, 0] = 1
    seqs = np.full((total, RW * SL + FW, 128), -1, np.int8)
    seqs[:, 0, 1] = 0
    for b, (sq, p) in enumerate(zip(blocks, tiers)):
        nseq[b, 0, 0] = len(sq)
        par[b, 0] = [p.m, p.n, p.g, p.e, p.q, p.c, 0, p.wf_milli]
        for r, s in enumerate(sq):
            slen[b, 0, r] = len(s)
            flat = np.full(SL * 128, -1, np.int8)
            flat[1:len(s) + 1] = s
            seqs[b, r * SL:(r + 1) * SL] = flat.reshape(SL, 128)
    fn = _win_fn(K, VW, LW, W, RW, False, True, B, False)
    meta, exp, paths = fn(nseq, par, slen, seqs)
    meta = np.asarray(meta)
    exp = np.asarray(exp).astype(np.int32).reshape(total, 3, -1)
    paths = np.asarray(paths).astype(np.int32).reshape(total, RW,
                                                       LWr * 128)
    for b, (sq, p) in enumerate(zip(blocks, tiers)):
        f = FusedPOA()
        for s in sq:
            f.add_sequence(s, p)
        V = int(meta[b, 0])
        assert meta[b, 1] == 0
        assert V == f.n_nodes()
        assert exp[b, 0, :V].tolist() == f.base
        assert exp[b, 2, :V].tolist() == f.topo_order()
        for r, s in enumerate(sq):
            assert paths[b, r, :len(s)].tolist() == f.paths[r]


# ---------------- engine integration (windowed tier family) ----------------

def test_engine_windowed_tiers_route_and_match():
    """FusedPallasEngine with explicit 4-tuple tiers dispatches the
    windowed kernel: full-width K2 tier for short blocks, banded-window
    tier for long banded blocks, native fallback otherwise."""
    from smoothxg_tpu.ops.poa_pallas_fused import FusedPallasEngine
    eng = FusedPallasEngine(
        tiers=((2, 512, 256, 256), (1, 1024, 768, 384)),
        max_seqs=16, max_batch=4, interpret=True)
    rng = np.random.default_rng(31)
    p_short = POAParams(1, 4, 6, 2, 26, 1, local=True)
    p_long = POAParams(1, 4, 6, 2, 26, 1, local=False, wb=40, wf_milli=30)
    short = [family(rng, 80, 4), family(rng, 60, 3)]
    longb = [family(rng, 500, 4)]
    blocks = [(sq, [1] * len(sq), p_short) for sq in short] + \
             [(sq, [1] * len(sq), p_long) for sq in longb]
    # routing: short -> tier 0 (full width); long banded -> tier 1
    assert eng._route(short[0], p_short) == 0
    assert eng._route(longb[0], p_long) == 1
    assert eng._route(longb[0], p_short) is None  # unbanded long: no tier
    graphs = eng.poa_block_batch(blocks)
    for (sq, w, p), g in zip(blocks, graphs):
        f = oracle(sq, p)
        assert g.base == f.base
        assert g.seq_paths == f.paths
        assert g._topo == f.topo_order()
    assert eng.tier_blocks.get(0, 0) == 2
    assert eng.tier_blocks.get(1, 0) == 1


def test_long_block_band_policy_converts_params(drb1_path, tmp_path):
    """The pipeline's long-block policy (Config.long_poa_band) converts
    blocks whose longest padded sequence exceeds the threshold to abPOA
    band semantics; the native run still passes the byte-exact lace
    oracle and the -B stats see banded long blocks."""
    import pytest as _pytest
    from smoothxg_tpu.ops import poa_native
    if not poa_native.available():      # pragma: no cover
        _pytest.skip("native engine unavailable")
    from smoothxg_tpu.pipeline.run import Config, run_smoothing
    out = str(tmp_path / "l4000.gfa")
    stats = str(tmp_path / "stats.tsv")
    run_smoothing(Config(
        gfa_in=drb1_path, smoothed_out=out, n_haps=12,
        max_path_jump=5000, max_edge_jump=5000,
        poa_length_targets=[4000], engine="native",
        block_stats=stats, tmp_base=str(tmp_path)))
    # exit implies lace validation passed; all 4 long blocks align banded
    import csv
    with open(stats) as f:
        rows = list(csv.DictReader(f, delimiter="\t"))
    assert len(rows) >= 3
    long_rows = [r for r in rows if int(r["max.seq.len"]) > 4096]
    assert long_rows, "no long blocks in the -l 4000 run?"


@pytest.mark.slow
def test_win_banded_aligned8_seq_roll_path():
    """Production-shaped tier (SL, FW multiples of 8): the seq-plane
    window read goes through the aligned-floor + dynamic-roll path, with
    window offsets at 128-lane (not 1024) quanta."""
    rng = np.random.default_rng(41)
    blocks = [family(rng, 1200, 3)]
    assert_parity(blocks, K=1, VW=2048, LW=2048, W=1024, RW=8,
                  local=False, banded=True, wb=60, wf_milli=30,
                  expect_window_offsets=True)


@pytest.mark.slow
def test_win_banded_negative_realign_delta():
    """Length-heterogeneous long blocks create nodes whose min-rank comes
    via a shallow pred while another pred sits deeper with a HIGHER
    window — the realign delta goes negative (caught on the real -l 4000
    DRB1 blocks: a positive-only realign silently read the deep pred's
    window unshifted).  Also covers the blo-1 window anchor: the match
    move at the band floor reads the pred's value one column below."""
    rng = np.random.default_rng(9)

    def het_family(L, n, dels):
        base = rng.integers(0, 4, L).astype(np.int8)
        out = [base]
        for i in range(n - 1):
            s = base.copy()
            idxs = rng.choice(len(s), 40, replace=False)
            s[idxs] = (s[idxs] + rng.integers(1, 4, 40)) % 4
            if i < len(dels) and dels[i]:
                p = int(rng.integers(200, len(s) - dels[i] - 200))
                s = np.concatenate([s[:p], s[p + dels[i]:]])
            out.append(s.astype(np.int8))
        return out

    from smoothxg_tpu.ops.poa_pallas_fused import FusedPallasEngine
    p = POAParams(1, 4, 6, 2, 26, 1, local=False, wb=311, wf_milli=30)
    blocks = [het_family(4000, 5, (500, 900)),
              het_family(3500, 6, (300, 0, 300))]
    eng = FusedPallasEngine(tiers=((1, 5888, 10240, 3072),), max_seqs=16,
                            max_batch=2, interpret=True, threads=1,
                            steal=False)
    graphs = eng.poa_block_batch([(sq, [1] * len(sq), p) for sq in blocks])
    assert eng.redo == 0 and eng.fallbacks == 0, eng.stats()
    for sq, g in zip(blocks, graphs):
        f = oracle(sq, p)
        assert g.base == f.base
        assert g.seq_paths == f.paths
        assert g._topo == f.topo_order()


def test_engine_stacked_kernel_ab_selectable():
    """kernel="stacked" dispatches the round-3 stacked family through the
    same engine surface (A/B lane), producing identical graphs."""
    from smoothxg_tpu.ops.poa_pallas_fused import FusedPallasEngine
    rng = np.random.default_rng(13)
    p = POAParams(1, 4, 6, 2, 26, 1, local=True)
    blocks = [(family(rng, 70, 4), None, p), (family(rng, 50, 3), None, p)]
    blocks = [(sq, [1] * len(sq), pp) for sq, _, pp in blocks]
    a = FusedPallasEngine(tiers=((2, 512, 256, 256),), max_seqs=16,
                          max_batch=4, interpret=True, kernel="stacked")
    b = FusedPallasEngine(tiers=((2, 512, 256, 256),), max_seqs=16,
                          max_batch=4, interpret=True)
    ga = a.poa_block_batch(blocks)
    gb = b.poa_block_batch(blocks)
    for x, y in zip(ga, gb):
        assert x.base == y.base and x.seq_paths == y.seq_paths
