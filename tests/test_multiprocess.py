"""Multi-process data parallelism (SURVEY §5.8 / BASELINE config 4):
two real jax.distributed processes shard the blockset, all-gather the
compact per-block results, and each replicates lace — the final GFA and
MAF from the 2-process run must be BYTE-IDENTICAL to the single-process
run."""
import os
import subprocess
import sys

import pytest

from tests.conftest import DRB1


def _run_cli(extra, out, maf, tmp, env_extra=None):
    os.makedirs(tmp, exist_ok=True)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    if env_extra:
        env.update(env_extra)
    cmd = [sys.executable, "-m", "smoothxg_tpu.cli",
           "-g", DRB1, "-o", out, "-r", "12",
           "-j", "5k", "-e", "5k", "-l", "700,900",
           "-m", maf, "--engine", "native", "-b", tmp] + extra
    return subprocess.Popen(cmd, env=env, stdout=subprocess.DEVNULL,
                            stderr=subprocess.PIPE)


@pytest.mark.slow
def test_two_process_run_matches_single(tmp_path):
    coord = "localhost:29753"
    # single-process reference
    s_out = str(tmp_path / "single.gfa")
    s_maf = str(tmp_path / "single.maf")
    p = _run_cli([], s_out, s_maf, str(tmp_path / "ts"))
    _, err = p.communicate(timeout=300)
    assert p.returncode == 0, err.decode()[-2000:]

    # two cooperating ranks, each with -t 4: prep must be forced onto the
    # deterministic sequential SGD (threads>1 is racy Hogwild by design and
    # would give each rank a different node order -> desynced blocksets),
    # so the threaded distributed run still matches the -t 1 single run
    # byte for byte
    d_out = str(tmp_path / "dist.gfa")
    d_maf = str(tmp_path / "dist.maf")
    procs = []
    for rank in range(2):
        procs.append(_run_cli(
            ["--dist-rank", str(rank), "--dist-size", "2",
             "--dist-coordinator", coord, "-t", "4"],
            d_out, d_maf, str(tmp_path / f"tr{rank}")))
    errs = [p.communicate(timeout=300)[1] for p in procs]
    for p, err in zip(procs, errs):
        assert p.returncode == 0, err.decode()[-2000:]

    with open(s_out, "rb") as f:
        single_gfa = f.read()
    with open(d_out, "rb") as f:
        dist_gfa = f.read()
    assert dist_gfa == single_gfa

    with open(s_maf, "rb") as f:
        single_maf = f.read()
    with open(d_maf, "rb") as f:
        dist_maf = f.read()
    assert dist_maf == single_maf


def test_shard_bounds_cover_exactly():
    from smoothxg_tpu.parallel.multiproc import shard_bounds
    for n in (0, 1, 5, 24, 97):
        for size in (1, 2, 3, 8):
            spans = [shard_bounds(n, r, size) for r in range(size)]
            assert spans[0][0] == 0 and spans[-1][1] == n
            for (a, b), (c, d) in zip(spans, spans[1:]):
                assert b == c and a <= b and c <= d
