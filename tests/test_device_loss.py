"""Backend-loss failover: a TPU tunnel abort mid-run must reroute the
failed + remaining blocks to the native pool and mark the device dead for
the rest of the process — output complete and byte-identical, never an
exception (the axon terminal sporadically ABORTs long sessions; reference
analogue: the OMP host path has no device to lose, src/smooth.cpp:1904)."""
import numpy as np
import pytest

from smoothxg_tpu.ops.poa_host import POAParams
from smoothxg_tpu.ops.poa_pallas_fused import FusedPallasEngine


class FakeAbort(RuntimeError):
    pass


# mimic jax.errors.JaxRuntimeError's name so _is_backend_loss matches the
# class-name gate without importing jax here
FakeAbort.__name__ = "JaxRuntimeError"


def family(rng, L, n):
    base = rng.integers(0, 4, size=L, dtype=np.int8)
    out = [base]
    for _ in range(n - 1):
        s = base.copy()
        pos = int(rng.integers(1, L - 1))
        s[pos] = (s[pos] + 1) % 4
        out.append(s)
    return [np.asarray(s, np.int8) for s in out]


def _blocks(n=9, seed=3):
    rng = np.random.default_rng(seed)
    p = POAParams(1, 4, 6, 2, 26, 1, local=True)
    return [(family(rng, 60 + 8 * i, 3), [1, 1, 1], p) for i in range(n)]


def _expected(blocks):
    from smoothxg_tpu.ops.poa_fused import FusedHostEngine
    return FusedHostEngine().poa_block_batch(blocks)


@pytest.mark.parametrize("fail_at", [0, 1])
def test_dispatch_loss_fails_over_to_native(fail_at):
    eng = FusedPallasEngine(tiers=((2, 512, 256, 256),), max_seqs=16,
                            max_batch=4, interpret=True, devices=1)
    blocks = _blocks()
    calls = {"n": 0}
    real = eng._launch

    def flaky(blks, chunk, ti=0, vcap=None):
        if calls["n"] == fail_at:
            calls["n"] += 1
            raise FakeAbort("ABORTED: TPU backend error (Aborted).")
        calls["n"] += 1
        return real(blks, chunk, ti, vcap)

    eng._launch = flaky
    graphs = eng.poa_block_batch(blocks)
    assert all(g is not None for g in graphs)
    assert eng.device_lost and "ABORTED" in eng.device_lost
    for g, f in zip(graphs, _expected(blocks)):
        assert g.base == f.base
        assert g.seq_paths == f.seq_paths
    # the engine stays alive and routes everything native afterwards
    d0 = eng.device_blocks
    graphs2 = eng.poa_block_batch(_blocks(seed=5))
    assert all(g is not None for g in graphs2)
    assert eng.device_blocks == d0, "device used after loss?"


def test_programming_errors_still_propagate():
    eng = FusedPallasEngine(tiers=((2, 512, 256, 256),), max_seqs=16,
                            max_batch=4, interpret=True, devices=1)

    def boom(blks, chunk, ti=0, vcap=None):
        raise ValueError("a real bug, not a backend loss")

    eng._launch = boom
    with pytest.raises(ValueError):
        eng.poa_block_batch(_blocks())


def test_is_backend_loss_classifier():
    is_loss = FusedPallasEngine._is_backend_loss
    assert is_loss(FakeAbort("ABORTED: TPU backend error (Aborted)."))
    assert is_loss(RuntimeError("UNAVAILABLE: Socket closed"))
    assert not is_loss(ValueError("ABORTED"))      # wrong class
    assert not is_loss(RuntimeError("shape mismatch"))
