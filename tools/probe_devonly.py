"""Steady-state device-only throughput on the ctest workload (x16):
3 passes through smooth_blocks with host-steal off, pooled finalize on.
Decomposes the headline blocks/s into what the chip does alone."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = ("/root/reference/test/data/DRB1-3123.fa.gz.pggb-s3000-p70-n10-a70-"
       "K16-k8-w10000-j5000-e5000.seqwish.gfa")


def main():
    from smoothxg_tpu.graph.index import FlatIndex
    from smoothxg_tpu.io.gfa import read_gfa
    from smoothxg_tpu.ops.poa_host import POAParams
    from smoothxg_tpu.ops.poa_pallas_fused import FusedPallasEngine
    from smoothxg_tpu.pipeline.blocks import Blockset, smoothable_blocks
    from smoothxg_tpu.pipeline.breaks import break_blocks
    from smoothxg_tpu.pipeline.prep import prep
    from smoothxg_tpu.pipeline.smooth import smooth_blocks

    nthreads = os.cpu_count() or 1
    g = read_gfa(REF)
    g = prep(g, 100, use_sgd=True)
    idx = FlatIndex(g)
    bs = smoothable_blocks(idx, 700 * 12, 700, 5000, 5000)
    bs = break_blocks(idx, bs, max_poa_length=1400)
    big = Blockset()
    for _ in range(16):
        for b in bs:
            big.add_block(b)
    eng = FusedPallasEngine(threads=nthreads, steal=False)
    params = POAParams(local=True)
    t0 = time.time()
    eng.warmup(locals_=(True,))
    print("warmup", round(time.time() - t0, 1))
    for r in range(3):
        t0 = time.time()
        res = smooth_blocks(idx, big, params=params, consensus_base_name="",
                            produce_maf=False, engine=eng, threads=nthreads)
        w = time.time() - t0
        print(f"pass{r}: {len(res)/w:.1f} blocks/s wall {w:.2f}s")
    s = eng.stats()
    print("tiers", s["tier_blocks"], "dev_rows", s["dev_rows_per_s"],
          "brows", s["dev_block_rows_per_s"], "lost", s["device_lost"])


if __name__ == "__main__":
    main()
