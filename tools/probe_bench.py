"""One instrumented pass of the bench's throughput section: phase timing +
engine stats after warmup and after the big run, to localize regressions."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from smoothxg_tpu.graph.index import FlatIndex
    from smoothxg_tpu.io.gfa import read_gfa
    from smoothxg_tpu.ops.poa_host import POAParams
    from smoothxg_tpu.ops.poa_jax import ensure_backend
    from smoothxg_tpu.ops.poa_pallas_fused import FusedPallasEngine
    from smoothxg_tpu.pipeline.blocks import smoothable_blocks, Blockset
    from smoothxg_tpu.pipeline.breaks import break_blocks
    from smoothxg_tpu.pipeline.prep import prep
    from smoothxg_tpu.pipeline.smooth import smooth_blocks
    from smoothxg_tpu.utils.progress import Log
    Log.enabled = True
    ensure_backend()
    REF_GFA = ("/root/reference/test/data/DRB1-3123.fa.gz.pggb-s3000-p70-"
               "n10-a70-K16-k8-w10000-j5000-e5000.seqwish.gfa")
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
    print(f"[probe] warmup {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    smooth_blocks(idx, bs, params=params, consensus_base_name="",
                  produce_maf=False, engine=engine, threads=nthreads)
    print(f"[probe] warm-run bs ({len(bs.blocks)} blocks) "
          f"{time.time()-t0:.2f}s stats={engine.stats()}", flush=True)

    big = Blockset()
    for _ in range(16):
        for b in bs:
            big.add_block(b)
    for rep in range(2):
        s0 = engine.stats()
        t0 = time.time()
        smooth_blocks(idx, big, params=params, consensus_base_name="",
                      produce_maf=False, engine=engine, threads=nthreads)
        dt = time.time() - t0
        s1 = engine.stats()
        d = {k: s1[k] - s0[k] for k in s1}
        print(f"[probe] big run#{rep} {dt:.2f}s = "
              f"{len(big.blocks)/dt:.1f} blocks/s delta-stats={d}",
              flush=True)


if __name__ == "__main__":
    main()
