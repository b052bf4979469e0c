"""Shared worker-side FlatIndex cache for the -t process pool.

The index pickle is tens of MB at scale; shipping it as a task argument
costs (chunks x size) of pipe traffic per stage, every iteration.  Instead
it is spilled ONCE per index version to a registered temp file and chunk
tasks carry only (version, path); each worker maps the file a single time
per version (page-cache shared across workers).  Path sequences are
derived in-worker from the same index and cached alongside — they never
cross the pipe either.

(The reference sidesteps this class of cost with shared-memory OMP
threads, src/breaks.cpp:198; spawn-based process workers need the
explicit spill.)
"""
from __future__ import annotations

_SEQ = 0
_W_VER: int | None = None
_W_IDX = None
_W_PSEQS = None


def payload(idx) -> tuple[int, str]:
    """(version, temp-file path) of the pickled index, cached on the
    index object so every stage shares one spill."""
    global _SEQ
    p = getattr(idx, "_pool_payload", None)
    if p is None:
        import pickle

        from ..utils import tempfiles
        _SEQ += 1
        path = tempfiles.create("poolidx")
        with open(path, "wb") as f:
            pickle.dump(idx, f, protocol=pickle.HIGHEST_PROTOCOL)
        p = (_SEQ, path)
        idx._pool_payload = p
    return p


def worker_idx(ver: int, path: str):
    """Worker-side: the FlatIndex for this version (loaded once)."""
    global _W_VER, _W_IDX, _W_PSEQS
    if _W_VER != ver:
        import pickle
        with open(path, "rb") as f:
            _W_IDX = pickle.load(f)
        _W_VER = ver
        _W_PSEQS = None
    return _W_IDX


def worker_pseqs(ver: int, path: str, seqindex=None):
    """Worker-side path sequences: mmap views when a SeqIndex travels
    with the task (cheap), else derived from the cached index."""
    global _W_PSEQS
    if seqindex is not None and hasattr(seqindex, "views"):
        return seqindex.views()
    idx = worker_idx(ver, path)
    if _W_PSEQS is None:
        _W_PSEQS = [idx.path_seq(p) for p in range(idx.path_count())]
    return _W_PSEQS
