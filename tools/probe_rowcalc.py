"""Host-only: compute per-tier grid-row counts for the ctest x16 workload
so measured kernel walls translate to grid-rows/s (no TPU needed)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    from probe_tiers import build_tasks
    from smoothxg_tpu.ops.poa_pallas_fused import FusedPallasEngine

    tasks = build_tasks()
    eng = FusedPallasEngine(threads=1, steal=False)
    dev = {}
    for i, (seqs, w, p) in enumerate(tasks):
        ti = eng._route(seqs, p)
        if ti is not None:
            dev.setdefault(ti, []).append(i)
    for ti, idxs in sorted(dev.items()):
        idxs = idxs * 16
        K, VW, LW, W = eng.tiers[ti]
        rows = sum(eng._steal_costs(tasks[i][0], ti)[1] for i in idxs)
        brows = sum(eng._steal_costs(tasks[i][0])[1] for i in idxs)
        capt = eng._tier_batch(ti)
        nchunks = (len(idxs) + capt - 1) // capt
        # grid steps per chunk = mb // K; padded rows: pad blocks are 1x1
        print(f"tier{ti} K{K}xV{VW}: blocks={len(idxs)} chunks={nchunks} "
              f"grid_rows={rows:.0f} block_rows={brows:.0f} "
              f"rows/chunk={rows/nchunks:.0f}")


if __name__ == "__main__":
    main()
