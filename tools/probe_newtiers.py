"""Real-device A/B: candidate round-5 tier families vs the round-4 family
on the l700 bench workload (device-only, steal off, min-of-3).

Usage: python tools/probe_newtiers.py [fam ...]
  fam in {r4, r5, r5b} (default: r4 r5)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAMS = {
    # round-4 production family
    "r4": ((4, 2176, 2048, 2048), (3, 2944, 2048, 2048),
           (2, 4352, 2048, 2048),
           (1, 8704, 2048, 2048), (1, 4352, 4096, 4096),
           (1, 5888, 10240, 3072)),
    # round-5 candidate: K6/K4 short-window tiers for the l700/l900 bulk
    # (probe_blockstats: 20/24 l700 blocks have maxL <= 1345, est <= 2944)
    # + a (1, 6144, 2944) full-width tier for mid-length high-V blocks
    # (l4000[2], l1100[8]).  FW/SL not multiples of 8 exercise the
    # kernel's unaligned dynamic-slab path on a real device.
    "r5": ((6, 2176, 1408, 1408), (4, 2944, 1536, 1536),
           (3, 2944, 2048, 2048), (2, 4352, 2048, 2048),
           (1, 8704, 2048, 2048), (1, 6144, 2944, 2944),
           (1, 4352, 4096, 4096), (1, 5888, 10240, 3072)),
    # aligned-only fallback: K4 with a bigger node budget at LW 2048
    "r5b": ((4, 2304, 2048, 2048), (3, 2944, 2048, 2048),
            (2, 4352, 2048, 2048),
            (1, 8704, 2048, 2048), (1, 4352, 4096, 4096),
            (1, 5888, 10240, 3072)),
}


def main():
    from probe_tiers import build_tasks
    from smoothxg_tpu.ops.poa_pallas_fused import FusedPallasEngine

    fams = sys.argv[1:] or ["r4", "r5"]
    tasks = build_tasks()
    big = tasks * 16
    for fam in fams:
        eng = FusedPallasEngine(threads=1, steal=False, tiers=FAMS[fam])
        t0 = time.time()
        # warm every tier the routing will use
        used = sorted({eng._route(s, p) for s, _, p in tasks} - {None})
        eng.warmup(locals_=(True,), tiers=used)
        eng.poa_block_batch(tasks)       # absorb D2H slicer compiles
        warm = time.time() - t0
        walls = []
        for _ in range(3):
            t0 = time.time()
            res = eng.poa_block_batch(big)
            walls.append(time.time() - t0)
        st = eng.stats()
        print(f"[{fam}] warm={warm:.1f}s walls={[round(w,2) for w in walls]}"
              f" best={len(big)/min(walls):.1f} blocks/s"
              f" tiers={st['tier_blocks']} redo={st['redo']}"
              f" vcap={st['vcap_redo']} fb={st['fallbacks']}"
              f" rows/s={st['dev_rows_per_s']}"
              f" brows/s={st['dev_block_rows_per_s']}", flush=True)
        assert all(g is not None for g in res)


if __name__ == "__main__":
    main()
