"""Multi-process (multi-host) data parallelism over blocks.

The TPU-native mapping of the reference's single-node OMP-over-blocks
loop (src/smooth.cpp:1904) at pod scale (SURVEY §5.8, DESIGN.md
"Scale-out design"): every process replicates the cheap deterministic
host stages (graph load, prep, indexing, block finding, breaking, and —
after the gather — merge/lace/validation), and only the expensive POA
smoothing shards.  Each rank smooths a CONTIGUOUS slice of the blockset
with GLOBAL block ids, serializes its compact per-block results, and one
`process_allgather` (DCN on real pods, gloo on the CPU test mesh) gives
every rank the full result list.  Because block ids are global and every
later stage is deterministic, each rank reconstructs the identical laced
graph with no broadcast and no ordered-writer machinery; rank 0 alone
writes output files.

jax.distributed.initialize() is the one-time process-group setup; the
collective itself is jax's multihost allgather over a uint8 payload
(variable length handled by a preliminary length gather).
"""
from __future__ import annotations

import pickle

import numpy as np

_INITIALIZED = False


def init_process_group(coordinator: str, num_processes: int,
                       process_id: int) -> None:
    """Idempotent jax.distributed bootstrap."""
    global _INITIALIZED
    if _INITIALIZED or num_processes <= 1:
        _INITIALIZED = True
        return
    import jax
    jax.distributed.initialize(coordinator, num_processes=num_processes,
                               process_id=process_id)
    _INITIALIZED = True


def allgather_bytes(payload: bytes) -> list[bytes]:
    """All-gather one variable-length byte string per process.

    Two collectives: int64 lengths first, then the max-padded uint8
    payloads — the standard ragged-gather construction."""
    from jax.experimental import multihost_utils as mhu
    lens = mhu.process_allgather(
        np.array([len(payload)], np.int64)).ravel()
    m = max(int(lens.max()), 1)
    buf = np.zeros(m, np.uint8)
    if payload:
        buf[:len(payload)] = np.frombuffer(payload, np.uint8)
    gathered = np.asarray(mhu.process_allgather(buf))
    gathered = gathered.reshape(len(lens), m)
    return [bytes(gathered[i, :int(lens[i])]) for i in range(len(lens))]


def shard_bounds(n_blocks: int, rank: int, size: int) -> tuple[int, int]:
    """Contiguous [lo, hi) slice for this rank (remainder spread over the
    leading ranks)."""
    base, rem = divmod(n_blocks, size)
    lo = rank * base + min(rank, rem)
    hi = lo + base + (1 if rank < rem else 0)
    return lo, hi


def distributed_smooth_blocks(idx, blockset, *, rank: int, size: int,
                              **smooth_kwargs):
    """Shard the blockset, smooth locally, all-gather BlockResults.

    Returns the FULL result list in global block-id order on every rank
    (so lace/merge replicate instead of broadcasting a graph)."""
    from ..pipeline.blocks import Blockset
    from ..pipeline.smooth import smooth_blocks

    blocks = list(blockset)
    lo, hi = shard_bounds(len(blocks), rank, size)
    shard = Blockset()
    for b in blocks[lo:hi]:
        shard.add_block(b)
    local = smooth_blocks(idx, shard, block_id_offset=lo, **smooth_kwargs)
    # compact per-block payloads: block graph (nodes/edges), per-path step
    # runs, consensus + MAF rows — everything lace/merge consume
    for r in local:
        if getattr(r, "cache", None) is not None:   # pragma: no cover
            r.graph = r.get_graph()
            r.cache = None
    parts = allgather_bytes(pickle.dumps(local, protocol=4))
    results: list = []
    for part in parts:
        results.extend(pickle.loads(part))
    results.sort(key=lambda r: r.block_id)
    assert len(results) == len(blocks), (len(results), len(blocks))
    return results
