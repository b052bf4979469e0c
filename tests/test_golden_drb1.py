"""Golden structural metrics for the full 3-iteration DRB1 pipeline.

The reference repo ships no golden outputs and its deps/ submodules are
empty (binary unbuildable in this image), so reference-exact comparison is
impossible; instead this records the structural metrics of this repo's own
canonical run (reference command: test/performance/check.md:5-16,
`-l 700,900,1100 -C consensus,10,100:... -r 12`) and pins them within
tight bounds, plus hard invariants the reference also guarantees:

  * every input path reconstructs byte-identically (src/main.cpp:762-800),
  * consensus paths exist for every spec entry,
  * MAF a-block count == final-iteration block count,
  * the output GFA and MAF are BYTE-IDENTICAL to the recorded snapshot
    (sha256) — the pipeline is fully deterministic (deterministic ids,
    ordered merge, sequential native SGD), verified across separate
    processes, so any drift at all is a real behavior change,
  * node/edge/step counts are also recorded individually so a snapshot
    break localizes to a stage instead of just "hash changed".

Engine: native C++ (bit-for-bit fused-oracle parity is covered by
tests/test_poa_native.py; the TPU kernel's parity by
tests/test_poa_pallas_fused.py) — so a drift here isolates to the
host pipeline stages.
"""
import pytest

from smoothxg_tpu.io.gfa import read_gfa
from smoothxg_tpu.pipeline.run import Config, run_smoothing

# recorded 2026-08-18 from the canonical run (engine=native, use_sgd=True;
# re-recorded after SGD moved to the native sequential backend — a benign
# reordering with measurably better 1D linearity (mean step rank-jump 3.2
# vs 6.0 for the batched JAX formulation): block count 18 -> 19, all hard
# invariants unchanged)
GOLDEN = {
    "nodes": 4933,
    "edges": 6736,
    "paths": 31,          # 12 input + 19 consensus
    "steps": 37264,
    "cons": 19,
    "maf_blocks": 19,
    "total_bp": 191572,   # input 163,416 + consensus paths
}
# byte-exact snapshot of the same canonical run (recorded 2026-08-19 from
# two independent processes producing identical bytes)
GOLDEN_SHA256 = {
    "gfa": "aa1067cf77c3697ebb2a35d7aeafc9ced4b253b34b1fbeef0db3e78054175f9a",
    "maf": "8038b621ea2e6887a4c5c4057f15e0fe1e72d5ba1c8979ffd8377bffc1f991ed",
}


@pytest.mark.slow
def test_golden_drb1_three_iterations(drb1_path, tmp_path):
    from smoothxg_tpu.ops import poa_native
    if not poa_native.available():      # pragma: no cover
        pytest.skip("native engine unavailable")
    out = str(tmp_path / "out.gfa")
    maf = str(tmp_path / "out.maf")
    cfg = Config(
        gfa_in=drb1_path, smoothed_out=out,
        n_haps=12, max_path_jump=5000, max_edge_jump=5000,
        poa_length_targets=[700, 900, 1100],
        use_sgd=True, add_consensus=True,
        write_msa_in_maf_format=maf,
        engine="native", tmp_base=str(tmp_path),
    )
    outp, cons = run_smoothing(cfg)
    g = read_gfa(outp)
    orig = read_gfa(drb1_path)

    # hard invariant: byte-identical path reconstruction
    for i in range(orig.path_count()):
        name = orig.path_names[i]
        assert g.path_seq(g.get_path(name)) == orig.path_seq(i)

    got = {
        "nodes": g.node_count(),
        "edges": g.edge_count(),
        "paths": g.path_count(),
        "steps": sum(len(g.path_steps[i]) for i in range(g.path_count())),
        "cons": len(cons),
        "maf_blocks": open(maf).read().count("\na "),
        "total_bp": sum(len(g.path_seq(i)) for i in range(g.path_count())),
    }
    # structural metrics are exact (they localize a snapshot break)
    assert got == GOLDEN, got

    # content-level MAF oracle: every s-row reconstructs its source
    # (input paths and embedded consensus paths) — see test_maf_oracle
    from tests.test_maf_oracle import check_maf_semantics
    n_rows, _, n_cons, _ = check_maf_semantics(maf, drb1_path, outp)
    assert n_rows > 100 and n_cons == GOLDEN["cons"]

    # byte-exact snapshot: the whole pipeline is deterministic
    import hashlib
    got_sha = {
        "gfa": hashlib.sha256(open(outp, "rb").read()).hexdigest(),
        "maf": hashlib.sha256(open(maf, "rb").read()).hexdigest(),
    }
    assert got_sha == GOLDEN_SHA256, (
        "byte-level drift in the canonical DRB1 run — if the structural "
        "metrics above still match, diff the GFA/MAF against a previous "
        "build and re-record deliberately", got_sha)
