"""Host-stage process parallelism.

The reference parallelizes its host stages with OpenMP (block smoothing
src/smooth.cpp:1904, WFA clustering src/breaks.cpp:198, lace walks
src/main.cpp:622-772); the equivalents here are pure-Python/numpy loops, so
`-t/-T` map to a process pool.  Spawn context (never fork): the main
process holds live JAX / TPU-tunnel / grpc threads, and forking a threaded
process can deadlock.  Workers pin JAX_PLATFORMS=cpu so they can never
touch the single-client axon tunnel.
"""
from __future__ import annotations

import atexit
import os
from concurrent.futures import ProcessPoolExecutor

_POOL: ProcessPoolExecutor | None = None
_POOL_SIZE = 0


def _init_worker() -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"


def get_pool(n_workers: int) -> ProcessPoolExecutor:
    """Lazily created, process-wide pool; resized when n changes."""
    global _POOL, _POOL_SIZE
    if _POOL is not None and _POOL_SIZE != n_workers:
        _POOL.shutdown(wait=True)
        _POOL = None
    if _POOL is None:
        import multiprocessing as mp
        _POOL = ProcessPoolExecutor(
            max_workers=n_workers,
            mp_context=mp.get_context("spawn"),
            initializer=_init_worker)
        _POOL_SIZE = n_workers
        atexit.register(_POOL.shutdown, wait=False)
    return _POOL


def shutdown() -> None:
    """Terminate pool workers NOW.  For callers that hard-exit via
    os._exit (smoothxg_tpu.cli) and therefore skip atexit: orphaned
    spawn workers would otherwise outlive the CLI holding its inherited
    stdio pipes open (a parent reading those pipes then blocks forever).
    """
    global _POOL, _POOL_SIZE
    if _POOL is not None:
        try:
            _POOL.shutdown(wait=False, cancel_futures=True)
            for p in getattr(_POOL, "_processes", {}).values():
                try:
                    p.terminate()
                except Exception:
                    pass
        except Exception:
            pass
        _POOL = None
        _POOL_SIZE = 0


def _warm_task() -> None:
    # front-load the imports a real task would pay at unpickle time
    from ..pipeline import breaks, smooth  # noqa: F401


def warm(n_workers: int) -> None:
    """Fire-and-forget worker boot.  Spawned workers cost ~0.5 s of
    interpreter + import startup; kicking them off at pipeline start
    overlaps that with graph load/prep instead of landing it on the first
    parallel stage's critical path."""
    if n_workers and n_workers > 1:
        pool = get_pool(n_workers)
        for _ in range(n_workers):
            pool.submit(_warm_task)


def chunked(items: list, n_chunks: int) -> list[list]:
    """Split into at most n_chunks contiguous, near-equal chunks."""
    n_chunks = max(1, min(n_chunks, len(items)))
    q, r = divmod(len(items), n_chunks)
    out, pos = [], 0
    for i in range(n_chunks):
        size = q + (1 if i < r else 0)
        out.append(items[pos:pos + size])
        pos += size
    return out
