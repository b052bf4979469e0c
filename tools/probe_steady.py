"""Trimmed throughput probe: the bench's DRB1x16 steady-state passes only
(no CPU baselines, no ctest extras).  Prints per-pass walls + engine stats."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_GFA = ("/root/reference/test/data/DRB1-3123.fa.gz.pggb-s3000-p70-n10-"
           "a70-K16-k8-w10000-j5000-e5000.seqwish.gfa")


def main():
    from smoothxg_tpu.graph.index import FlatIndex
    from smoothxg_tpu.io.gfa import read_gfa
    from smoothxg_tpu.ops.poa_host import POAParams
    from smoothxg_tpu.ops.poa_pallas_fused import FusedPallasEngine
    from smoothxg_tpu.pipeline.blocks import Blockset, smoothable_blocks
    from smoothxg_tpu.pipeline.breaks import break_blocks
    from smoothxg_tpu.pipeline.prep import prep
    from smoothxg_tpu.pipeline.smooth import smooth_blocks

    g = read_gfa(REF_GFA)
    g = prep(g, 100, use_sgd=True)
    idx = FlatIndex(g)
    target = 700
    bs = smoothable_blocks(idx, target * 12, target, 5000, 5000)
    bs = break_blocks(idx, bs, max_poa_length=2 * target)
    params = POAParams(local=True)
    nthreads = os.cpu_count() or 1
    engine = FusedPallasEngine(threads=nthreads)
    t0 = time.time()
    engine.warmup(locals_=(True,))
    print("warmup", round(time.time() - t0, 1), flush=True)

    big = Blockset()
    for _ in range(16):
        for b in bs:
            big.add_block(b)

    t0 = time.time()
    smooth_blocks(idx, bs, params=params, consensus_base_name="",
                  produce_maf=False, engine=engine, threads=nthreads)
    print("residual-warm", round(time.time() - t0, 2), flush=True)
    walls = []
    for _ in range(3):
        t0 = time.time()
        res = smooth_blocks(idx, big, params=params, consensus_base_name="",
                            produce_maf=False, engine=engine,
                            threads=nthreads)
        walls.append(round(time.time() - t0, 2))
        print("pass", walls[-1], len(res) / walls[-1], "blocks/s",
              json.dumps(engine.stats()), flush=True)
    print(json.dumps({"best_bps": round(len(res) / min(walls), 1),
                      "walls": walls}))


if __name__ == "__main__":
    main()
