"""Pure kernel wall per dispatch: dispatch each tier's real chunks and
block_until_ready on meta only (no paths D2H, no decode). Separates DP
fill time from transfer/decode overhead in the engine wall."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    from probe_tiers import build_tasks
    from smoothxg_tpu.ops.poa_pallas_fused import FusedPallasEngine

    tasks = build_tasks()
    eng = FusedPallasEngine(threads=1, steal=False)
    eng.warmup(locals_=(True,), tiers=range(4))
    # route and chunk exactly as the engine does
    dev = {}
    for i, (seqs, w, p) in enumerate(tasks):
        ti = eng._route(seqs, p)
        if ti is not None:
            dev.setdefault(ti, []).append(i)
    blocks = tasks
    for ti, idxs in sorted(dev.items()):
        idxs = idxs * 16
        idxs.sort(key=lambda i: (len(blocks[i][0]), len(blocks[i][0][0])),
                  reverse=True)
        capt = eng._tier_batch(ti)
        chunks = [idxs[s:s + capt] for s in range(0, len(idxs), capt)]
        # warm pass
        h = eng._launch(blocks, chunks[0], ti)
        np.asarray(h[2])
        walls = []
        rows = 0
        for rep in range(2):
            t0 = time.time()
            hs = [eng._launch(blocks, c, ti) for c in chunks]
            for h in hs:
                np.asarray(h[2])          # meta only
            walls.append(time.time() - t0)
        K = eng.tiers[ti][0]
        nb = len(idxs)
        print(f"tier{ti} K{K}xV{eng.tiers[ti][1]}: {len(chunks)} chunks, "
              f"{nb} blocks, walls {[round(w,2) for w in walls]} -> "
              f"{nb/min(walls):.1f} blocks/s kernel-only", flush=True)


if __name__ == "__main__":
    main()
