"""Do axon remote compiles parallelize across threads?  Warm the four
LW2048 tiers sequentially vs with one thread per tier, fresh process
each (run twice: sequential, then parallel — pass seq|par)."""
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "seq"
    from smoothxg_tpu.ops.poa_pallas_fused import FusedPallasEngine
    eng = FusedPallasEngine(threads=1, steal=False)
    tiers = [ti for ti, t in enumerate(eng.tiers)
             if t[2] <= 2048 and t[3] >= t[2]]
    t0 = time.time()
    if mode == "seq":
        eng.warmup(locals_=(True,), tiers=tuple(reversed(tiers)))
    else:
        ths = [threading.Thread(target=eng.warmup,
                                args=((True,), (False,), (ti,)))
               for ti in tiers]
        for t in ths:
            t.start()
        for t in ths:
            t.join()
    print(f"[{mode}] warm {len(tiers)} tiers: {time.time() - t0:.1f}s "
          f"lost={eng.device_lost}", flush=True)


if __name__ == "__main__":
    main()
