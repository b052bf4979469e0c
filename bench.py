"""Benchmark: POA blocks/s per chip on the DRB1-3123 workload.

The north-star metric (BASELINE.json): POA blocks/s per chip for batched,
size-bucketed block smoothing, compared against a single-thread CPU engine.
The CPU baseline is this repo's own numpy DP engine measured in-process (the
reference's abPOA is not buildable in this image; the numpy engine computes
the identical DP, so the ratio understates nothing structural).

Prints ONE JSON line:
  {"metric": "poa_blocks_per_s", "value": N, "unit": "blocks/s",
   "vs_baseline": N / cpu_blocks_per_s, ...extras}

Notes:
  * One process end to end: axon remote compiles cost minutes and are not
    reusable across processes, so the engine pins a single uniform shape
    and the warmup cost is reported separately as "compile_s".
  * extras include the warm single-chip 1-iteration end-to-end wall time
    for the DRB1 pipeline (reference binary: 25.45 s for 3 iterations on a
    Ryzen 3700X, test/performance/check.md:5-16).
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REF_GFA = ("/root/reference/test/data/DRB1-3123.fa.gz.pggb-s3000-p70-n10-"
           "a70-K16-k8-w10000-j5000-e5000.seqwish.gfa")


def main() -> int:
    from smoothxg_tpu.graph.index import FlatIndex
    from smoothxg_tpu.io.gfa import read_gfa
    from smoothxg_tpu.ops.poa_host import POAParams
    from smoothxg_tpu.ops.poa_jax import ensure_backend
    from smoothxg_tpu.ops.poa_pallas import PallasPOAEngine
    from smoothxg_tpu.pipeline.blocks import smoothable_blocks
    from smoothxg_tpu.pipeline.breaks import break_blocks
    from smoothxg_tpu.pipeline.prep import prep
    from smoothxg_tpu.pipeline.smooth import HostPOAEngine, smooth_blocks
    from smoothxg_tpu.pipeline.run import Config, run_smoothing
    from smoothxg_tpu.utils.progress import Log

    Log.enabled = os.environ.get("BENCH_VERBOSE", "") != ""
    ensure_backend()

    # ---- build the iteration-1 workload (target 700, the ctest config) ----
    g = read_gfa(REF_GFA)
    g = prep(g, 100, use_sgd=True)
    idx = FlatIndex(g)
    target = 700
    bs = smoothable_blocks(idx, target * 12, target, 5000, 5000)
    bs = break_blocks(idx, bs, max_poa_length=2 * target)
    params = POAParams(local=True)

    # Pallas kernel: ONE pinned shape, V/L are dynamic loop bounds inside
    # the kernel; large batch amortizes the per-dispatch tunnel latency
    engine = PallasPOAEngine(max_batch=128)
    t0 = time.time()
    engine.warmup(locals_=(True,), preds=(4, 8))
    prewarm_s = time.time() - t0

    # throughput workload: the DRB1 blockset replicated 16x (384 blocks) —
    # per-chip blocks/s for batched independent block POA, the unit that
    # data-parallel scale-out multiplies
    from smoothxg_tpu.pipeline.blocks import Blockset
    big = Blockset()
    REP = 16
    for _ in range(REP):
        for b in bs:
            big.add_block(b)

    def run_once(eng, blockset):
        return smooth_blocks(idx, blockset, params=params,
                             consensus_base_name="", produce_maf=False,
                             engine=eng)

    t0 = time.time()
    run_once(engine, bs)          # warmup: any residual variant compiles
    warmup_s = time.time() - t0 + prewarm_s

    t0 = time.time()
    results = run_once(engine, big)
    tpu_s = time.time() - t0
    n_blocks = len(results)
    tpu_bps = n_blocks / tpu_s

    t0 = time.time()
    run_once(HostPOAEngine(), bs)
    cpu_s = time.time() - t0
    cpu_bps = len(bs.blocks) / cpu_s

    # warm 1-iteration end-to-end (engine shapes already compiled)
    tmp = tempfile.mkdtemp(prefix="smoothxg_bench_")
    cfg = Config(
        gfa_in=REF_GFA, smoothed_out=os.path.join(tmp, "drb1.gfa"),
        n_haps=12, max_path_jump=5000, max_edge_jump=5000,
        poa_length_targets=[700], use_sgd=True, add_consensus=True,
        engine=engine, tmp_base=tmp,
    )
    t0 = time.time()
    run_smoothing(cfg)
    e2e_1iter_s = time.time() - t0

    print(json.dumps({
        "metric": "poa_blocks_per_s",
        "value": round(tpu_bps, 3),
        "unit": "blocks/s",
        "vs_baseline": round(tpu_bps / cpu_bps, 2),
        "blocks": n_blocks,
        "tpu_smooth_s": round(tpu_s, 2),
        "cpu_singlethread_blocks_per_s": round(cpu_bps, 3),
        "warmup_compile_s": round(warmup_s, 1),
        "e2e_1iter_warm_s": round(e2e_1iter_s, 2),
        "device_tasks": engine.device_tasks,
        "host_fallbacks": engine.fallbacks,
        "engine_calls": engine.calls,
        "device_wait_s": round(engine.device_s, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
