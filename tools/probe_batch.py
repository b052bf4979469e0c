"""A/B max_batch on the ctest x16 workload: per-dispatch tunnel overhead
(~0.4 s RTT) dominates at DRB1 scale, so fewer+larger dispatches should
win; DP planes are per-grid-step so VMEM does not grow with batch."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from probe_tiers import build_tasks
    from smoothxg_tpu.ops.poa_pallas_fused import FusedPallasEngine

    tasks = build_tasks()
    big = tasks * 16
    engs = {}
    for mb in (32, 64, 128):
        e = FusedPallasEngine(threads=1, steal=False, max_batch=mb)
        t0 = time.time()
        e.warmup(locals_=(True,), tiers=range(4))
        print(f"mb{mb} warmup {time.time()-t0:.1f}s", flush=True)
        engs[mb] = e
    walls = {mb: [] for mb in engs}
    for r in range(4):
        for mb, e in engs.items():
            t0 = time.time()
            n = 0
            for i, kind, payload in e.poa_block_batch_iter(big):
                n += 1
            w = time.time() - t0
            walls[mb].append(w)
            print(f"r{r} mb{mb}: {n/w:.1f} blocks/s ({w:.2f}s)", flush=True)
    for mb, e in engs.items():
        print(mb, "best", round(len(big) / min(walls[mb]), 1), "blocks/s",
              "calls", e.stats()["calls"])


if __name__ == "__main__":
    main()
