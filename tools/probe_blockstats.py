"""Host-only: per-block shape stats for the bench workloads, to design
device tier shapes from data (round-5: K>=4 dominance + long-tier
population).  For every unique block of the -l 700/900/1100 headline
worksets and the -l 4000 long-block workset, prints: n unique seqs
(rounds+1), maxlen, minlen, sumlen, raw mash V estimate, calibrated
estimate, TRUE final V (native engine), routed tier, and for banded
blocks the required window = 2*band + DAG rank spread (min/max depth
spread measured from the final graph, the quantity the kernel's window
must cover)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

REF = ("/root/reference/test/data/DRB1-3123.fa.gz.pggb-s3000-p70-n10-a70-"
       "K16-k8-w10000-j5000-e5000.seqwish.gfa")


def build(idx, target, jump, edge_jump):
    from smoothxg_tpu.ops.poa_host import POAParams
    from smoothxg_tpu.pipeline.blocks import smoothable_blocks
    from smoothxg_tpu.pipeline.breaks import break_blocks
    from smoothxg_tpu.pipeline import smooth as SM
    from smoothxg_tpu.utils.dna import encode_seq

    bs = smoothable_blocks(idx, target * 12, target, jump, edge_jump)
    bs = break_blocks(idx, bs, max_poa_length=2 * target)
    pseqs = [idx.path_seq(pid) for pid in range(idx.path_count())]
    params = POAParams(local=True)
    tasks = []
    for bid, block in enumerate(bs):
        pad = SM._block_padding(idx, block.path_ranges, 0.001, 1000)
        p = params
        # the long-block policy exactly as smooth_blocks applies it
        if p.wb < 0 and block.path_ranges and \
                max(pr.length for pr in block.path_ranges) + 2 * pad > 4096:
            p = POAParams(p.m, p.n, p.g, p.e, p.q, p.c, local=False,
                          wb=311, wf_milli=30)
        st = SM._extract_block(idx, pseqs, block, bid, pad, p)
        es = [encode_seq(s) for s in st.useqs]
        if es:
            tasks.append((es, list(st.weights), st.params))
    return tasks


def true_v_and_spread(seqs, weights, params):
    from smoothxg_tpu.ops.poa_native import NativePOAEngine
    eng = NativePOAEngine(threads=1)
    g = eng.poa_block_batch([(seqs, weights, params)])[0]
    V = len(g.base)
    # DAG min/max depth per node over the FINAL graph — the rank pair the
    # banded kernel tracks (mrA/MrA); window must hold Mr-mr + 2*band
    order = g.topo_order()
    mn = np.zeros(V, np.int64)
    mx = np.zeros(V, np.int64)
    for v in order:
        ps = g.preds[v]
        if ps:
            mn[v] = min(mn[p] for p in ps) + 1
            mx[v] = max(mx[p] for p in ps) + 1
    spread = int((mx - mn).max()) if V else 0
    return V, spread


def main():
    from smoothxg_tpu.graph.index import FlatIndex
    from smoothxg_tpu.io.gfa import read_gfa
    from smoothxg_tpu.ops.poa_pallas_fused import FusedPallasEngine
    from smoothxg_tpu.pipeline.prep import prep

    g = read_gfa(REF)
    g = prep(g, 100, use_sgd=True)
    idx = FlatIndex(g)
    eng = FusedPallasEngine(threads=1, steal=False)

    for label, target, jump, ej in (
            ("l700", 700, 5000, 5000),
            ("l900", 900, 5000, 5000),
            ("l1100", 1100, 5000, 5000),
            ("l4000", 4000, 100, 0)):
        tasks = build(idx, target, jump, ej)
        print(f"== {label}: {len(tasks)} blocks")
        for i, (seqs, w, p) in enumerate(tasks):
            lens = [len(s) for s in seqs]
            raw = eng._estimate_final_v(seqs)
            est = lens[0] + (raw - lens[0]) * eng.GROWTH_CAL
            V, spread = true_v_and_spread(seqs, w, p)
            ti = eng._route(seqs, p)
            row = (f"{label}[{i:3d}] n={len(seqs):3d} maxL={max(lens):5d} "
                   f"minL={min(lens):5d} sumL={sum(lens):6d} raw={raw:7.0f} "
                   f"est={est:7.0f} trueV={V:5d} tier={ti}")
            if p.wb >= 0:
                bw = p.wb + (p.wf_milli * max(lens)) // 1000
                row += (f" bw={bw} need_w={2 * bw + spread} "
                        f"spread={spread} lenspread={max(lens) - min(lens)}")
            print(row, flush=True)


if __name__ == "__main__":
    main()
