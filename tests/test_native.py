"""Native graphcore (C++ unchop/toposort) vs the pure-Python implementation."""
import pytest

from smoothxg_tpu.graph.mutable import MutableGraph, flip
from smoothxg_tpu.io.gfa import read_gfa
from smoothxg_tpu.native_bindings import load


requires_native = pytest.mark.skipif(load() is None,
                                     reason="native graphcore not built")


@requires_native
def test_native_unchop_matches_python_drb1(drb1_path):
    g = read_gfa(drb1_path)
    orig = {g.path_names[i]: g.path_seq(i) for i in range(g.path_count())}
    g2 = g.chop(13).compact()
    upy = g2.unchop(native=False)
    unat = g2.unchop(native=True)
    assert upy.node_count() == unat.node_count()
    assert sorted(upy.seqs.values()) == sorted(unat.seqs.values())
    for gg in (upy, unat):
        for i in range(gg.path_count()):
            assert gg.path_seq(i) == orig[gg.path_names[i]]


@requires_native
def test_native_unchop_reverse_traversal():
    g = MutableGraph()
    a = g.create_handle("AC")
    b = g.create_handle("GT")
    g.create_edge(a, b)
    p = g.create_path("p")
    g.append_step(p, a)
    g.append_step(p, b)
    q = g.create_path("q")
    g.append_step(q, flip(b))
    g.append_step(q, flip(a))
    u = g.unchop(native=True)
    assert u.node_count() == 1
    assert u.path_seq(0) == "ACGT"
    assert u.path_seq(1) == "ACGT"[::-1].translate(str.maketrans("ACGT", "TGCA"))


@requires_native
def test_native_respects_path_boundaries():
    g = MutableGraph()
    hs = [g.create_handle(s) for s in ("AC", "GT")]
    g.create_edge(hs[0], hs[1])
    p = g.create_path("p")
    g.append_step(p, hs[0])
    g.append_step(p, hs[1])
    q = g.create_path("q")
    g.append_step(q, hs[1])
    u = g.unchop(native=True)
    assert u.node_count() == 2
