"""A/B the K3xV2944 tier against the round-3 tier table, interleaved in
one process so tunnel drift hits both lanes equally."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from probe_tiers import build_tasks
    from smoothxg_tpu.ops.poa_pallas_fused import FusedPallasEngine

    tasks = build_tasks()
    big = tasks * 16
    OLD = ((4, 2176, 2048, 2048), (2, 4352, 2048, 2048),
           (1, 8704, 2048, 2048), (1, 4352, 4096, 4096),
           (1, 5888, 10240, 3072))
    NEW = FusedPallasEngine.TIERS
    engs = {}
    for name, tiers in (("old", OLD), ("new", NEW)):
        e = FusedPallasEngine(threads=1, steal=False, tiers=tiers)
        e.legacy = False
        t0 = time.time()
        e.warmup(locals_=(True,), tiers=range(4 if name == "old" else 5))
        print(name, "warmup", round(time.time() - t0, 1))
        engs[name] = e
    walls = {"old": [], "new": []}
    for r in range(4):
        for name, e in engs.items():
            t0 = time.time()
            n = 0
            for i, kind, payload in e.poa_block_batch_iter(big):
                n += 1
            w = time.time() - t0
            walls[name].append(w)
            print(f"r{r} {name}: {n/w:.1f} blocks/s ({w:.2f}s)")
    for name, e in engs.items():
        s = e.stats()
        print(name, "best", round(len(big) / min(walls[name]), 1),
              "blocks/s; tiers", s["tier_blocks"])


if __name__ == "__main__":
    main()
