"""Decompose the headline steal-on run: device wall vs host-steal wall
per pass, the steal split, and each lane's blocks/s. If the two lanes
finish far apart, the balancer's cost model is off."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from probe_tiers import build_tasks
    from smoothxg_tpu.ops.poa_pallas_fused import FusedPallasEngine

    tasks = build_tasks()
    big = tasks * 16
    nthreads = os.cpu_count() or 1
    eng = FusedPallasEngine(threads=nthreads, steal=True)
    eng.warmup(locals_=(True,), tiers=range(4))
    for r in range(4):
        d0, s0 = eng.device_blocks, eng.stolen
        t0 = time.time()
        n = 0
        for i, kind, payload in eng.poa_block_batch_iter(big):
            n += 1
        w = time.time() - t0
        s = eng.stats()
        print(f"r{r}: {n/w:.1f} blocks/s ({w:.2f}s) dev+{eng.device_blocks-d0}"
              f" stolen+{eng.stolen-s0} dev_rows/s {s['dev_rows_per_s']}"
              f" host_cells/s {s['host_cells_per_s']}", flush=True)
    print("tiers", eng.stats()["tier_blocks"])
    print("device_lost:", eng.device_lost)


if __name__ == "__main__":
    main()
