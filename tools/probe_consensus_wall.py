"""Per-spec consensus-graph wall on the 8x-tiled DRB1 fixture
(VERDICT r3 #6: parallelize within a spec if this stage dominates)."""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

DRB1 = ("/root/reference/test/data/DRB1-3123.fa.gz.pggb-s3000-p70-n10-a70-"
        "K16-k8-w10000-j5000-e5000.seqwish.gfa")


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from test_scale import _tile_gfa

    from smoothxg_tpu.pipeline.consensus_graph import (ConsensusSpec,
                                                       build_consensus_specs)
    from smoothxg_tpu.pipeline.run import Config, run_smoothing

    tmp = tempfile.mkdtemp()
    tiled = os.path.join(tmp, "x8.gfa")
    _tile_gfa(DRB1, tiled, 8)
    out = os.path.join(tmp, "out.gfa")
    t0 = time.time()
    outp, cons = run_smoothing(Config(
        gfa_in=tiled, smoothed_out=out, n_haps=96,
        max_path_jump=5000, max_edge_jump=5000, poa_length_targets=[700],
        use_sgd=True, add_consensus=True, engine="native", threads=8,
        tmp_base=tmp))
    print("smooth+lace wall", round(time.time() - t0, 1), flush=True)
    t0 = time.time()
    build_consensus_specs(outp, [ConsensusSpec(basename="consensus", min_allele_len=10, max_allele_len=10000)],
                          list(cons), threads=1)
    print("one-spec consensus wall (1 thread)", round(time.time() - t0, 1))


if __name__ == "__main__":
    main()
