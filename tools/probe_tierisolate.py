"""Isolate one candidate tier on the real device: route ONLY blocks that
fit it, run them, report wall + stats.  Fresh process per tier so a
backend crash identifies the culprit.

Usage: python tools/probe_tierisolate.py K VW LW W [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from probe_tiers import build_tasks
    from smoothxg_tpu.ops.poa_pallas_fused import FusedPallasEngine

    K, VW, LW, W = (int(x) for x in sys.argv[1:5])
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 16
    tasks = build_tasks()
    eng = FusedPallasEngine(threads=1, steal=False,
                            tiers=((K, VW, LW, W),))
    fit = [t for t in tasks if eng._route(t[0], t[2]) == 0]
    print(f"tier K{K}xV{VW}xL{LW}xW{W}: {len(fit)}/{len(tasks)} blocks fit",
          flush=True)
    if not fit:
        return
    t0 = time.time()
    eng.warmup(locals_=(True,), tiers=(0,))
    print(f"warm={time.time() - t0:.1f}s", flush=True)
    res = eng.poa_block_batch(fit)
    print("first batch ok:", all(g is not None for g in res),
          "lost:", eng.device_lost, flush=True)
    big = fit * reps
    walls = []
    for _ in range(3):
        t0 = time.time()
        eng.poa_block_batch(big)
        walls.append(time.time() - t0)
    st = eng.stats()
    print(f"walls={[round(w, 2) for w in walls]} "
          f"best={len(big) / min(walls):.1f} blocks/s "
          f"tiers={st['tier_blocks']} redo={st['redo']} "
          f"vcap={st['vcap_redo']} fb={st['fallbacks']} "
          f"rows/s={st['dev_rows_per_s']} lost={st['device_lost']}",
          flush=True)


if __name__ == "__main__":
    main()
