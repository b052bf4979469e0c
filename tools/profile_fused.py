"""Profile the fused POA kernel's phase costs on the real TPU.

Compiles three variants (stage 1 = fill only, 2 = +traceback, 0 = full with
threading) and times each on the DRB1 iteration-1 block workload, so kernel
optimization targets the dominant phase.  stage != 0 graphs are invalid by
design — timings only.

Usage: python tools/profile_fused.py [reps] [stages e.g. 0 or 1,2,0]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    stages = ([int(x) for x in sys.argv[2].split(",")]
              if len(sys.argv) > 2 else [1, 2, 0])
    from smoothxg_tpu.graph.index import FlatIndex
    from smoothxg_tpu.io.gfa import read_gfa
    from smoothxg_tpu.ops.poa_host import POAParams
    from smoothxg_tpu.pipeline.blocks import smoothable_blocks
    from smoothxg_tpu.pipeline.breaks import break_blocks
    from smoothxg_tpu.pipeline.prep import prep
    from smoothxg_tpu.pipeline.smooth import _extract_block, _block_padding
    from smoothxg_tpu.utils.dna import encode_seq
    from smoothxg_tpu.ops.poa_pallas_fused import _compiled_fused, FusedPallasEngine

    REF_GFA = ("/root/reference/test/data/DRB1-3123.fa.gz.pggb-s3000-p70-"
               "n10-a70-K16-k8-w10000-j5000-e5000.seqwish.gfa")
    g = read_gfa(REF_GFA)
    g = prep(g, 100, use_sgd=False)
    idx = FlatIndex(g)
    target = 700
    bs = smoothable_blocks(idx, target * 12, target, 5000, 5000)
    bs = break_blocks(idx, bs, max_poa_length=2 * target)
    params = POAParams(local=True)
    path_seqs = [idx.path_seq(p) for p in range(idx.path_count())]
    blocks = []
    for bid, block in enumerate(bs):
        pad = _block_padding(idx, block.path_ranges, 0.001, 1000)
        st = _extract_block(idx, path_seqs, block, bid, pad, params)
        blocks.append(([encode_seq(s) for s in st.useqs], st.weights, params))
    print(f"{len(blocks)} blocks; "
          f"alignments={sum(len(b[0]) - 1 for b in blocks)}", flush=True)

    from smoothxg_tpu.ops.poa_pallas_fused import FOLD
    eng = FusedPallasEngine(max_batch=32)
    B, VW, LW, RW = eng.max_batch, eng.VW, eng.LW, eng.RW
    # pack exactly as the engine does
    import jax.numpy as jnp
    nseq = np.zeros((B, 1, 1), np.int32)
    par = np.zeros((B, 1, 8), np.int32)
    slen = np.zeros((B, 1, 128), np.int16)
    seqs = np.full((B, RW, LW), -1, np.int8)
    for b, (sq, w, p) in enumerate(blocks[:B]):
        nseq[b, 0, 0] = len(sq)
        par[b, 0] = [p.m, p.n, p.g, p.e, p.q, p.c, max(p.wb, 0), p.wf_milli]
        alpha = FusedPallasEngine._alphabet(sq)
        for r, s in enumerate(sq):
            slen[b, 0, r] = len(s)
            seqs[b, r, 1:len(s) + 1] = np.searchsorted(
                alpha, np.asarray(s, np.uint8))
    seqs = seqs.reshape(B, RW * FOLD, LW // FOLD)
    args = (jnp.asarray(nseq), jnp.asarray(par), jnp.asarray(slen),
            jnp.asarray(seqs))

    for stage in stages:
        fn = _compiled_fused(VW, LW, RW, True, False, B, stage)
        t0 = time.time()
        meta, exp, paths = fn(*args)
        np.asarray(meta)
        compile_s = time.time() - t0
        times = []
        for _ in range(reps):
            t0 = time.time()
            meta, exp, paths = fn(*args)
            np.asarray(meta)
            times.append(time.time() - t0)
        print(f"stage={stage}: compile+first={compile_s:.1f}s "
              f"warm={min(times)*1e3:.0f}ms", flush=True)


if __name__ == "__main__":
    main()
