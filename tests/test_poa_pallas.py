"""Pallas POA kernel (interpret mode) vs the host numpy oracle.

Same contract as the JAX engine tests: alignments may be co-optimal paths,
but scores must match the host DP and the updated graph must preserve every
added sequence."""
import numpy as np
import pytest

from smoothxg_tpu.ops.poa_graph import POAGraph
from smoothxg_tpu.ops.poa_host import align as host_align, POAParams
from smoothxg_tpu.ops.poa_pallas import PallasPOAEngine
from smoothxg_tpu.utils.dna import encode_seq

from test_poa_jax import aln_score, CASES


@pytest.fixture(scope="module")
def engine():
    return PallasPOAEngine(interpret=True)


@pytest.mark.parametrize("local", [True, False])
@pytest.mark.parametrize("seqs", CASES)
def test_pallas_engine_matches_host_scores(seqs, local, engine):
    p = POAParams(local=local)
    gh = POAGraph()
    gj = POAGraph()
    for s in seqs:
        e = encode_seq(s)
        if gh.n_nodes() == 0:
            gh.add_sequence(e, 1)
            gj.add_sequence(e, 1)
            continue
        ah = host_align(gh, e, p)
        [aj] = engine.align_batch([(gj, e, p)])
        assert aln_score(gj, e, aj, p) == aln_score(gh, e, ah, p)
        gh.add_alignment(ah, e, 1)
        gj.add_alignment(aj, e, 1)
    for g in (gh, gj):
        for s, path in zip(seqs, g.seq_paths):
            assert "".join(chr(g.base[v]) for v in path) == s


@pytest.mark.parametrize("local", [True, False])
def test_pallas_random_mutations_optimal(local, engine):
    p = POAParams(local=local)
    rng = np.random.default_rng(7)
    g = POAGraph()
    base = "".join("ACGT"[i] for i in rng.integers(0, 4, 90))
    g.add_sequence(encode_seq(base), 1)
    for trial in range(3):
        s = list(base)
        for _ in range(5):
            pos = int(rng.integers(0, len(s)))
            s[pos] = "ACGT"[int(rng.integers(0, 4))]
        pos = int(rng.integers(10, len(s) - 10))
        s = s[:pos] + list("ACGT"[: int(rng.integers(1, 4))]) + s[pos:]
        seq = encode_seq("".join(s))
        ah = host_align(g, seq, p)
        [aj] = engine.align_batch([(g, seq, p)])
        assert aln_score(g, seq, aj, p) == aln_score(g, seq, ah, p), trial
        g.add_alignment(aj, seq, 1)
    assert "".join(chr(g.base[v]) for v in g.seq_paths[0]) == base


def test_pallas_batch_multiple_blocks(engine):
    p = POAParams(local=True)
    rng = np.random.default_rng(3)
    tasks = []
    for b in range(5):
        base = "".join("ACGT"[i] for i in rng.integers(0, 4, 40 + 9 * b))
        g = POAGraph()
        g.add_sequence(encode_seq(base), 1)
        s = list(base)
        s[5] = "A"
        s[11] = "T"
        tasks.append((g, encode_seq("".join(s)), p))
    alns = engine.align_batch(tasks)
    for (g, s, _), a in zip(tasks, alns):
        ref = host_align(g, s, p)
        assert aln_score(g, s, a, p) == aln_score(g, s, ref, p)


def test_shape_selection_and_fallback_reasons():
    """Pinned-shape selection: wide first, tall-thin for high-V, None when
    nothing fits (engine falls back to the host oracle)."""
    eng = PallasPOAEngine.__new__(PallasPOAEngine)
    eng.interpret = False
    eng.uniform_shapes = PallasPOAEngine.SHAPES
    wide, tall = PallasPOAEngine.SHAPES
    assert eng._dims(1000, 1500) == wide
    assert eng._dims(wide[0], wide[1] - 1) == wide
    assert eng._dims(wide[0] + 1, tall[1] - 1) == tall
    assert eng._dims(tall[0], tall[1] - 1) == tall
    assert eng._dims(tall[0] + 1, 1000) is None
    assert eng._dims(wide[0] + 1, tall[1]) is None


def test_wave_pipelined_smooth_blocks():
    """smooth_blocks' two-wave async pipeline with the Pallas engine must
    produce sequence-preserving block graphs (validated through lace by
    reconstructing each path range's sequence)."""
    engine = PallasPOAEngine(interpret=True, max_batch=2)  # force wave path
    from smoothxg_tpu.graph.index import FlatIndex
    from smoothxg_tpu.graph.mutable import MutableGraph
    from smoothxg_tpu.pipeline.blocks import smoothable_blocks
    from smoothxg_tpu.pipeline.smooth import smooth_blocks

    rng = np.random.default_rng(11)
    g = MutableGraph()
    prev = None
    # chain graph with 2 paths sharing all nodes
    handles = []
    for i in range(24):
        h = g.create_handle("".join("ACGT"[j] for j in rng.integers(0, 4, 5)))
        handles.append(h)
        if prev is not None:
            g.create_edge(prev, h)
        prev = h
    for name in ("p1", "p2"):
        pid = g.create_path(name)
        g.path_steps[pid] = list(handles)
    g = g.compact()
    idx = FlatIndex(g)
    bs = smoothable_blocks(idx, 40, 20, 100, 0)   # many small blocks
    assert len(bs) > 3
    results = smooth_blocks(idx, bs, params=POAParams(local=True),
                            engine=engine)
    for res in results:
        assert res.graph is not None
        for pid in range(res.graph.path_count() - 0):
            assert res.graph.path_seq(pid)
