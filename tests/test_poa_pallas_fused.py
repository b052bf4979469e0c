"""Fused Pallas kernel (interpret mode) vs the numpy fused oracle:
bit-for-bit parity on bases, rings, topo order and per-sequence paths."""
import numpy as np
import pytest

from smoothxg_tpu.ops.poa_fused import FusedPOA
from smoothxg_tpu.ops.poa_host import POAParams
from smoothxg_tpu.ops.poa_pallas_fused import FusedPallasEngine
from smoothxg_tpu.utils.dna import encode_seq

from test_poa_jax import CASES


@pytest.fixture(scope="module")
def engine():
    return FusedPallasEngine(shape=(512, 256), max_seqs=16, max_batch=4,
                             interpret=True)


def oracle(seqs, p):
    f = FusedPOA()
    for s in seqs:
        f.add_sequence(encode_seq(s), p)
    return f


def run_engine(engine, seqs, p):
    return engine.poa_block_batch(
        [([encode_seq(s) for s in seqs], [1] * len(seqs), p)])[0]


def assert_block_parity(engine, seqs, p):
    f = oracle(seqs, p)
    g = run_engine(engine, seqs, p)
    assert g.base == f.base
    assert g.seq_paths == f.paths
    assert g._topo == f.topo_order()
    assert g.group == f.to_poa_graph([1] * len(seqs)).group
    # the spoa-divergence counter (meta lane 3) matches the oracle
    assert g.guard_splits == f.guard_splits


@pytest.mark.parametrize("local", [True, False])
@pytest.mark.parametrize("seqs", CASES)
def test_fused_kernel_matches_oracle(seqs, local, engine):
    assert_block_parity(engine, seqs, POAParams(local=local))


@pytest.mark.parametrize("local", [True, False])
def test_fused_kernel_random(local, engine):
    p = POAParams(local=local)
    rng = np.random.default_rng(17)
    base = "".join("ACGT"[i] for i in rng.integers(0, 4, 70))
    seqs = [base]
    for _ in range(5):
        s = list(base)
        for _ in range(6):
            pos = int(rng.integers(0, len(s)))
            s[pos] = "ACGT"[int(rng.integers(0, 4))]
        if rng.random() < 0.6:
            pos = int(rng.integers(5, len(s) - 5))
            s = s[:pos] + list("ACGT"[: int(rng.integers(1, 4))]) + s[pos:]
        if rng.random() < 0.4:
            pos = int(rng.integers(5, len(s) - 8))
            del s[pos:pos + int(rng.integers(1, 4))]
        seqs.append("".join(s))
    assert_block_parity(engine, seqs, p)


def test_fused_kernel_batch_and_fallback(engine):
    """Batched blocks decode independently; oversize blocks take the native
    fallback; results all carry valid consensus."""
    p = POAParams(local=True)
    rng = np.random.default_rng(23)
    blocks = []
    for b in range(5):
        base = "".join("ACGT"[i] for i in rng.integers(0, 4, 30 + 7 * b))
        mut = list(base)
        mut[4] = "T" if mut[4] != "T" else "G"
        blocks.append(([encode_seq(base), encode_seq("".join(mut))],
                       [1, 2], p))
    # one oversize block (seq longer than LW-1) -> fallback path
    long = "".join("ACGT"[i] for i in rng.integers(0, 4, 300))
    blocks.append(([encode_seq(long)], [1], p))
    graphs = engine.poa_block_batch(blocks)
    assert engine.fallbacks >= 1
    for (seqs, weights, _), g in zip(blocks, graphs):
        for s, path in zip(seqs, g.seq_paths):
            assert np.array_equal(
                np.array([g.base[v] for v in path], dtype=np.int32),
                np.asarray(s, dtype=np.int32))
        assert g.consensus_path()


@pytest.mark.parametrize("wb", [311, 7])
@pytest.mark.parametrize("local", [True, False])
@pytest.mark.parametrize("seqs", CASES[:2])
def test_fused_kernel_banded_matches_oracle(seqs, local, wb, engine):
    """Banded kernel variant (rank prepass + band mask) stays bit-for-bit
    with the banded numpy oracle."""
    assert_block_parity(engine, seqs, POAParams(local=local, wb=wb))


def test_fused_kernel_banded_random(engine):
    p = POAParams(local=True, wb=311)
    rng = np.random.default_rng(41)
    base = "".join("ACGT"[i] for i in rng.integers(0, 4, 80))
    seqs = [base]
    for _ in range(4):
        s = list(base)
        for _ in range(6):
            pos = int(rng.integers(0, len(s)))
            s[pos] = "ACGT"[int(rng.integers(0, 4))]
        pos = int(rng.integers(5, len(s) - 6))
        s = s[:pos] + list("ACG")[: int(rng.integers(1, 3))] + s[pos:]
        seqs.append("".join(s))
    assert_block_parity(engine, seqs, p)


def test_host_steal_routes_blocks_and_matches_oracle():
    """steal=True: a cost-balanced tail of device-eligible blocks runs on
    the native pool; results must be identical to the all-device path."""
    p = POAParams(local=True)
    rng = np.random.default_rng(3)
    blocks = []
    for _ in range(10):
        base = "".join("ACGT"[i] for i in rng.integers(0, 4, 40))
        seqs = [base]
        for _ in range(2):
            s = list(base)
            pos = int(rng.integers(0, len(s)))
            s[pos] = "ACGT"[int(rng.integers(0, 4))]
            seqs.append("".join(s))
        blocks.append(([encode_seq(s) for s in seqs],
                       [1] * len(seqs), p))
    eng = FusedPallasEngine(shape=(512, 256), max_seqs=16, max_batch=4,
                            interpret=True, threads=2, steal=True,
                            devices=1)
    got = eng.poa_block_batch(blocks)
    assert eng.stolen > 0
    assert eng.stolen + eng.device_blocks == len(blocks)
    for (seqs, w, pp), g in zip(blocks, got):
        f = FusedPOA()
        for s in seqs:
            f.add_sequence(s, pp)
        assert g.base == f.base
        assert g.seq_paths == f.paths
