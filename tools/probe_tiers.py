"""Real-device probe: per-tier compile cost + device throughput of the
stacked kernel family on the DRB1 iteration-1 workload, vs the legacy
unstacked kernel.  Run on the axon v5e (single process, single client)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

REF = ("/root/reference/test/data/DRB1-3123.fa.gz.pggb-s3000-p70-n10-a70-"
       "K16-k8-w10000-j5000-e5000.seqwish.gfa")


def build_tasks():
    from smoothxg_tpu.graph.index import FlatIndex
    from smoothxg_tpu.io.gfa import read_gfa
    from smoothxg_tpu.ops.poa_host import POAParams
    from smoothxg_tpu.pipeline.blocks import smoothable_blocks
    from smoothxg_tpu.pipeline.breaks import break_blocks
    from smoothxg_tpu.pipeline.prep import prep
    from smoothxg_tpu.pipeline import smooth as SM
    from smoothxg_tpu.utils.dna import encode_seq

    g = read_gfa(REF)
    g = prep(g, 100, use_sgd=True)
    idx = FlatIndex(g)
    bs = smoothable_blocks(idx, 700 * 12, 700, 5000, 5000)
    bs = break_blocks(idx, bs, max_poa_length=1400)
    pseqs = [idx.path_seq(pid) for pid in range(idx.path_count())]
    params = POAParams(local=True)
    tasks = []
    for bid, block in enumerate(bs):
        pad = SM._block_padding(idx, block.path_ranges, 0.001, 1000)
        st = SM._extract_block(idx, pseqs, block, bid, pad, params)
        es = [encode_seq(s) for s in st.useqs]
        if es:
            tasks.append((es, list(st.weights), st.params))
    return tasks


def run_engine(eng, tasks, reps, label):
    big = tasks * reps
    t0 = time.perf_counter()
    eng.warmup(locals_=(True,))
    warm = time.perf_counter() - t0
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        n = 0
        for i, kind, payload in eng.poa_block_batch_iter(big):
            n += 1
        walls.append(time.perf_counter() - t0)
    w = min(walls)
    print(f"{label}: warm {warm:.1f}s walls {[round(x,2) for x in walls]} "
          f"-> {len(big)/w:.1f} blocks/s  stats {eng.stats()}")
    return len(big) / w


def main():
    from smoothxg_tpu.ops.poa_jax import ensure_backend, _enable_compile_cache
    _enable_compile_cache()
    ensure_backend()
    from smoothxg_tpu.ops.poa_pallas_fused import FusedPallasEngine

    tasks = build_tasks()
    print(f"{len(tasks)} unique blocks")
    reps = int(os.environ.get("REPS", "16"))

    which = os.environ.get("WHICH", "stacked")
    threads = int(os.environ.get("THREADS", "1"))
    if which in ("legacy", "both"):
        eng = FusedPallasEngine(threads=threads, steal=False,
                                tiers=((1, 4096, 2048),))
        eng.legacy = True
        run_engine(eng, tasks, reps, "legacy(1x4096)")
    if which in ("stacked", "both"):
        mb = int(os.environ.get("MB", "32"))
        eng = FusedPallasEngine(threads=threads, steal=False, max_batch=mb)
        run_engine(eng, tasks, reps, f"stacked t{threads} mb{mb} nosteal")
    if which in ("steal",):
        mb = int(os.environ.get("MB", "64"))
        eng = FusedPallasEngine(threads=threads, max_batch=mb)
        run_engine(eng, tasks, reps, f"stacked t{threads} mb{mb} steal")


if __name__ == "__main__":
    main()
