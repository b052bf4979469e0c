"""mmap-backed path sequence index.

The reference serializes every path's sequence into an on-disk store with
an offset table and mmaps it for O(1) subsequence extraction without
holding the genome in RAM (reference: src/seqindex.cpp:18-102, built once
per run in src/main.cpp:387-389).  The equivalent here is a single flat
file — magic, offset table, JSON name table, concatenated sequence bytes —
served through np.memmap so worker processes share pages instead of
duplicating path strings.
"""
from __future__ import annotations

import json
import os

import numpy as np

MAGIC = b"SXTSEQ1\n"


class _SeqView:
    """String-like lazy view of one path's sequence: slicing decodes only
    the requested window from the mapped store."""

    __slots__ = ("_mm", "_off", "_len")

    def __init__(self, mm, off: int, ln: int):
        self._mm = mm
        self._off = off
        self._len = ln

    def __len__(self) -> int:
        return self._len

    def __getitem__(self, key) -> str:
        if isinstance(key, slice):
            start, stop, step = key.indices(self._len)
            if step != 1:
                return bytes(
                    self._mm[self._off + start:self._off + stop:step]
                ).decode()
            return bytes(
                self._mm[self._off + start:self._off + stop]).decode()
        if key < 0:
            key += self._len
        return chr(self._mm[self._off + key])

    def __str__(self) -> str:
        return self[0:self._len]


class SeqIndex:
    """On-disk path sequence store with O(1) mmap subsequence reads."""

    def __init__(self, mm: np.memmap, offsets: np.ndarray,
                 names: list[str], path: str):
        self._mm = mm
        self.offsets = offsets          # int64[n_paths + 1], store-relative
        self.names = names
        self.path = path

    # ---- build / load ----
    @classmethod
    def build(cls, idx, path: str) -> "SeqIndex":
        """Serialize every path sequence of a FlatIndex and map it back."""
        n = idx.path_count()
        offsets = np.zeros(n + 1, dtype=np.int64)
        names = [idx.get_path_name(p) for p in range(n)]
        nb = json.dumps(names).encode()
        with open(path, "wb") as f:
            f.write(MAGIC)
            f.write(np.int64(n).tobytes())
            f.write(np.int64(len(nb)).tobytes())
            off_pos = f.tell()
            f.write(offsets.tobytes())      # placeholder, rewritten below
            f.write(nb)
            for p in range(n):
                s = idx.path_seq(p).encode()
                offsets[p + 1] = offsets[p] + len(s)
                f.write(s)
            f.seek(off_pos)
            f.write(offsets.tobytes())
        return cls.load(path)

    @classmethod
    def load(cls, path: str) -> "SeqIndex":
        with open(path, "rb") as f:
            if f.read(len(MAGIC)) != MAGIC:
                raise ValueError(f"not a SeqIndex file: {path}")
            n = int(np.frombuffer(f.read(8), dtype=np.int64)[0])
            nlen = int(np.frombuffer(f.read(8), dtype=np.int64)[0])
            offsets = np.frombuffer(f.read(8 * (n + 1)), dtype=np.int64)
            names = json.loads(f.read(nlen).decode())
            data_start = f.tell()
        mm = np.memmap(path, dtype=np.uint8, mode="r", offset=data_start)
        return cls(mm, offsets, names, path)

    # ---- queries ----
    def path_count(self) -> int:
        return len(self.names)

    def path_len(self, pid: int) -> int:
        return int(self.offsets[pid + 1] - self.offsets[pid])

    def subseq(self, pid: int, start: int, end: int) -> str:
        """Sequence of path positions [start, end), clamped like a python
        slice (reference: seqindex at_position/subseq)."""
        ln = self.path_len(pid)
        start = min(max(start, 0), ln)
        end = min(max(end, start), ln)
        o = int(self.offsets[pid])
        return bytes(self._mm[o + start:o + end]).decode()

    def view(self, pid: int) -> _SeqView:
        return _SeqView(self._mm, int(self.offsets[pid]),
                        self.path_len(pid))

    def views(self) -> list[_SeqView]:
        return [self.view(p) for p in range(self.path_count())]

    def remove(self) -> None:
        """Drop the mapping and delete the backing file (tempfile
        discipline, reference: src/main.cpp:611)."""
        self._mm = None
        try:
            os.remove(self.path)
        except OSError:
            pass

    # views hold raw (mm, off, len) and pickle by re-mapping in workers
    def __reduce__(self):
        return (SeqIndex.load, (self.path,))
