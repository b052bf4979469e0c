"""Host-stage process-pool parallelism (-t/-T): results must be
byte/structure-identical to the serial path (reference parallelizes with
OMP + ordered writers, src/smooth.cpp:1904, src/breaks.cpp:198)."""
import pytest

from smoothxg_tpu.graph.index import FlatIndex
from smoothxg_tpu.io.gfa import read_gfa
from smoothxg_tpu.ops.poa_host import POAParams
from smoothxg_tpu.pipeline.blocks import smoothable_blocks
from smoothxg_tpu.pipeline.breaks import break_blocks
from smoothxg_tpu.pipeline.prep import prep
from smoothxg_tpu.pipeline.smooth import smooth_blocks


@pytest.fixture(scope="module")
def drb1_idx(drb1_path):
    g = read_gfa(drb1_path)
    g = prep(g, 100, use_sgd=False)
    return FlatIndex(g)


def _blockset(idx, split=False):
    bs = smoothable_blocks(idx, 700 * 12, 700, 5000, 5000)
    kw = {}
    if split:
        kw = dict(block_group_identity=0.95, block_group_est_identity=0.95,
                  min_dedup_depth_for_block_splitting=2)
    return bs, kw


def _sig(results):
    out = []
    for r in results:
        g = r.get_graph()
        out.append((r.block_id,
                    g.node_count() if g else 0,
                    g.edge_count() if g else 0,
                    tuple(r.path_mappings),
                    sorted((k, [(row.src, row.start, row.text)
                                for row in v])
                           for k, v in (r.maf or {}).items())))
    return out


@pytest.mark.slow
def test_parallel_breaks_match_serial(drb1_idx):
    bs, kw = _blockset(drb1_idx, split=True)
    # WFA clustering is expensive: 8 blocks is plenty to exercise the pool
    from smoothxg_tpu.pipeline.blocks import Blockset
    small = Blockset()
    for b in list(bs)[:8]:
        small.add_block(b)
    serial = break_blocks(drb1_idx, small, max_poa_length=1400, **kw)
    par = break_blocks(drb1_idx, small, max_poa_length=1400, threads=4, **kw)
    assert [b.path_ranges for b in serial] == [b.path_ranges for b in par]


@pytest.mark.slow
def test_parallel_finalize_matches_serial(drb1_idx):
    bs, _ = _blockset(drb1_idx)
    bs = break_blocks(drb1_idx, bs, max_poa_length=1400)
    from smoothxg_tpu.ops import poa_native
    engine = (poa_native.NativePOAEngine() if poa_native.available()
              else None)
    kw = dict(params=POAParams(local=True), consensus_base_name="c",
              produce_maf=True, engine=engine)
    serial = smooth_blocks(drb1_idx, bs, threads=1, **kw)
    par = smooth_blocks(drb1_idx, bs, threads=4, **kw)
    assert _sig(serial) == _sig(par)


@pytest.mark.slow
def test_pipelined_fused_matches_serial(drb1_idx):
    """The fused engine's pipelined chunk-iterator path (threads>1) must
    produce block results identical to its serial poa_block_batch path."""
    from smoothxg_tpu.ops.poa_pallas_fused import FusedPallasEngine
    bs, _ = _blockset(drb1_idx)
    bs = break_blocks(drb1_idx, bs, max_poa_length=1400)
    kw = dict(params=POAParams(local=True), consensus_base_name="c",
              produce_maf=True)
    serial = smooth_blocks(
        drb1_idx, bs, threads=1,
        engine=FusedPallasEngine(interpret=True, max_batch=4), **kw)
    par = smooth_blocks(
        drb1_idx, bs, threads=2,
        engine=FusedPallasEngine(interpret=True, max_batch=4, threads=2),
        **kw)
    assert _sig(serial) == _sig(par)
