"""Profile the host-side per-block finalize path (rehydrate + _finalize_block).

This is the stage that runs on the process pool in the pipelined fused
path (smooth.py:_finalize_chunk_raw); if it is slower than the device,
it sets the bench's blocks/s.  CPU-only: uses the native C++ engine to
produce the block POA graphs, then times finalize in isolation.

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python3 tools/profile_finalize.py
"""
import cProfile
import io
import pstats
import time

from smoothxg_tpu.graph.index import FlatIndex
from smoothxg_tpu.io.gfa import read_gfa
from smoothxg_tpu.ops.poa_host import POAParams
from smoothxg_tpu.ops.poa_native import NativePOAEngine
from smoothxg_tpu.pipeline.blocks import smoothable_blocks
from smoothxg_tpu.pipeline.breaks import break_blocks
from smoothxg_tpu.pipeline.prep import prep
from smoothxg_tpu.pipeline import smooth as sm

REF_GFA = ("/root/reference/test/data/DRB1-3123.fa.gz.pggb-s3000-p70-n10-"
           "a70-K16-k8-w10000-j5000-e5000.seqwish.gfa")


def main():
    g = read_gfa(REF_GFA)
    g = prep(g, 100, use_sgd=False)
    idx = FlatIndex(g)
    target = 700
    bs = smoothable_blocks(idx, target * 12, target, 5000, 5000)
    bs = break_blocks(idx, bs, max_poa_length=2 * target)
    params = POAParams(local=True)

    # extract states exactly like smooth_blocks does
    pseqs = [idx.path_seq(p) for p in range(idx.path_count())]
    states = []
    for bid, block in enumerate(bs):
        pad = sm._block_padding(idx, block.path_ranges, 0.001, 1000)
        states.append(sm._extract_block(idx, pseqs, block, bid, pad, params))
    from smoothxg_tpu.utils.dna import encode_seq
    enc = [[encode_seq(s) for s in st.useqs] for st in states]

    # align all blocks on the native engine (fast, threaded)
    eng = NativePOAEngine(threads=4)
    t0 = time.time()
    graphs = eng.poa_block_batch([(es, st.weights, st.params)
                                  for st, es in zip(states, enc)])
    align_s = time.time() - t0
    for st, gg in zip(states, graphs):
        st.graph = gg
    print(f"blocks={len(states)} native align {align_s:.2f}s "
          f"({len(states)/align_s:.1f} blocks/s at 4 threads)")

    # time finalize alone (single thread — pool gives ~4x this rate)
    t0 = time.time()
    for st in states:
        sm._finalize_block(idx, st, False, "", False)
    fin_s = time.time() - t0
    print(f"finalize(1-thread) {fin_s:.2f}s  "
          f"{len(states)/fin_s:.1f} blocks/s  "
          f"{fin_s/len(states)*1e3:.1f} ms/block")

    pr = cProfile.Profile()
    pr.enable()
    for st in states:
        sm._finalize_block(idx, st, False, "", False)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
    print(s.getvalue())


if __name__ == "__main__":
    main()
