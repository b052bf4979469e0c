"""FlatIndex: immutable flat-array index of a sequence graph.

This is the framework's xg equivalent (reference: src/xg.cpp / src/xg.hpp,
the vendored succinct index).  Instead of SDSL succinct vectors we use plain
numpy arrays — replicated per host and directly exportable as device buffers.
Provides exactly the query surface the pipeline uses:

  * node length / sequence / pangenome vector offset
    (reference: xg node_vector_offset, src/xg.hpp:640-641)
  * per-path step vectors + step positions (reference: XGPath, src/xg.hpp:536-580)
  * node -> (path, step rank) membership CSR
    (reference: index_node_to_path, src/xg.cpp:1408-1521)
  * edge adjacency per node side (reference: g_iv edge records, src/xg.cpp:948-1019)

Node ids are dense 1..N in rank (sort) order; handles are (id << 1 | rev).
A step is identified as (path_id, rank); path ranges are (path_id, begin_rank,
end_rank) with end exclusive.
"""
from __future__ import annotations

import numpy as np

from .mutable import MutableGraph, hid, hrev, handle
from ..utils.dna import revcomp_bytes


class FlatIndex:
    def __init__(self, g: MutableGraph):
        ids = list(g.node_ids())
        n = len(ids)
        # require dense 1..N ids in storage order (call compact() first)
        if ids != list(range(1, n + 1)):
            g = g.compact()
            ids = list(range(1, n + 1))
        self.n_nodes = n
        self.node_len = np.array([len(g.seqs[i]) for i in ids], dtype=np.int64)
        self.node_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(self.node_len, out=self.node_off[1:])
        seq_cat = "".join(g.seqs[i] for i in ids)
        self.seq = np.frombuffer(seq_cat.encode(), dtype=np.uint8)

        # adjacency: per handle side, lists of neighbor handles
        right: list[list[int]] = [[] for _ in range(2 * (n + 1))]
        left: list[list[int]] = [[] for _ in range(2 * (n + 1))]
        self._edge_list: list[tuple[int, int]] = []
        for a, b in g.edges():
            self._edge_list.append((a, b))
            right[a].append(b)
            left[b].append(a)
            # mirrored traversal
            fa, fb = b ^ 1, a ^ 1
            if (fa, fb) != (a, b):
                right[fa].append(fb)
                left[fb].append(fa)
        self._right = right
        self._left = left

        # paths
        self.path_names = list(g.path_names)
        self._name2path = {nm: i for i, nm in enumerate(self.path_names)}
        self.path_steps: list[np.ndarray] = []
        self.path_pos: list[np.ndarray] = []   # pos[rank] = start offset of step
        for steps in g.path_steps:
            arr = np.array(steps, dtype=np.int64)
            lens = self.node_len[(arr >> 1) - 1] if len(arr) else np.zeros(0, np.int64)
            pos = np.zeros(len(arr) + 1, dtype=np.int64)
            np.cumsum(lens, out=pos[1:])
            self.path_steps.append(arr)
            self.path_pos.append(pos)
        self.path_len = np.array([int(p[-1]) if len(p) else 0 for p in self.path_pos],
                                 dtype=np.int64)

        # node -> steps CSR (reference: np_iv/nr_iv/nx_iv, src/xg.cpp:1408-1521)
        counts = np.zeros(n + 1, dtype=np.int64)
        for arr in self.path_steps:
            if len(arr):
                np.add.at(counts, (arr >> 1) - 1, 1)
        self.node_steps_start = np.zeros(n + 2, dtype=np.int64)
        np.cumsum(counts, out=self.node_steps_start[1:])
        total = int(self.node_steps_start[n])
        # Flatten all steps path-major, then stable-sort by node: within a
        # node, entries stay in (path, rank) order — identical to the
        # sequential cursor fill this replaces.
        if total:
            nodes_cat = np.concatenate(
                [(arr >> 1) - 1 for arr in self.path_steps if len(arr)])
            pid_cat = np.concatenate(
                [np.full(len(arr), pid, dtype=np.int32)
                 for pid, arr in enumerate(self.path_steps) if len(arr)])
            rank_cat = np.concatenate(
                [np.arange(len(arr), dtype=np.int64)
                 for arr in self.path_steps if len(arr)])
            order = np.argsort(nodes_cat, kind="stable")
            self.step_path = pid_cat[order]
            self.step_rank = rank_cat[order]
        else:
            self.step_path = np.zeros(0, dtype=np.int32)
            self.step_rank = np.zeros(0, dtype=np.int64)

    # ---- node queries ----
    def get_length(self, h: int) -> int:
        return int(self.node_len[(h >> 1) - 1])

    def node_length(self, node_id: int) -> int:
        return int(self.node_len[node_id - 1])

    def get_sequence(self, h: int) -> str:
        i = (h >> 1) - 1
        s = self.seq[self.node_off[i]:self.node_off[i + 1]]
        if h & 1:
            s = revcomp_bytes(s)
        return s.tobytes().decode()

    def get_sequence_bytes(self, h: int) -> np.ndarray:
        i = (h >> 1) - 1
        s = self.seq[self.node_off[i]:self.node_off[i + 1]]
        return revcomp_bytes(s) if h & 1 else s

    def node_vector_offset(self, node_id: int) -> int:
        return int(self.node_off[node_id - 1])

    # ---- edges ----
    def follow_right(self, h: int) -> list[int]:
        return self._right[h] if h < len(self._right) else []

    def follow_left(self, h: int) -> list[int]:
        return self._left[h] if h < len(self._left) else []

    def edges(self):
        return iter(self._edge_list)

    # ---- paths ----
    def path_count(self) -> int:
        return len(self.path_names)

    def get_path_name(self, pid: int) -> str:
        return self.path_names[pid]

    def has_path(self, name: str) -> bool:
        return name in self._name2path

    def get_path(self, name: str) -> int:
        return self._name2path[name]

    def get_path_length(self, pid: int) -> int:
        return int(self.path_len[pid])

    def step_count(self, pid: int) -> int:
        return len(self.path_steps[pid])

    def step_handle(self, pid: int, rank: int) -> int:
        return int(self.path_steps[pid][rank])

    def step_position(self, pid: int, rank: int) -> int:
        return int(self.path_pos[pid][rank])

    def steps_on_node(self, node_id: int) -> list[tuple[int, int]]:
        a = self.node_steps_start[node_id - 1]
        b = self.node_steps_start[node_id]
        return [(int(self.step_path[i]), int(self.step_rank[i])) for i in range(a, b)]

    def node_depth(self, node_id: int) -> int:
        return int(self.node_steps_start[node_id] - self.node_steps_start[node_id - 1])

    # ---- serialization (reference: xg serialize/deserialize + -i flag,
    # src/main.cpp:418-420, src/xg.hpp:225) ----
    def save(self, path: str) -> None:
        import io as _io
        import json as _json
        parts = {
            "node_len": self.node_len,
            "seq": self.seq,
            "path_len": self.path_len,
        }
        for i, (st, po) in enumerate(zip(self.path_steps, self.path_pos)):
            parts[f"steps_{i}"] = st
            parts[f"pos_{i}"] = po
        edges = np.array(self._edge_list, dtype=np.int64).reshape(-1, 2) \
            if self._edge_list else np.zeros((0, 2), dtype=np.int64)
        parts["edges"] = edges
        parts["names"] = np.frombuffer(
            _json.dumps(self.path_names).encode(), dtype=np.uint8)
        np.savez_compressed(path, **parts)

    @classmethod
    def load(cls, path: str) -> "FlatIndex":
        import json as _json
        from .mutable import MutableGraph
        z = np.load(path)
        names = _json.loads(bytes(z["names"]).decode())
        g = MutableGraph()
        node_len = z["node_len"]
        seq = bytes(z["seq"])
        off = 0
        for ln in node_len:
            g.create_handle(seq[off:off + int(ln)].decode())
            off += int(ln)
        for a, b in z["edges"]:
            g.create_edge(int(a), int(b))
        for i, nm in enumerate(names):
            pid = g.create_path(nm)
            g.path_steps[pid] = [int(h) for h in z[f"steps_{i}"]]
        return cls(g)

    # ---- strand accounting ----
    def rev_bp_in_window(self, pid: int, a: int, b: int) -> tuple[int, int]:
        """(fwd_bp, rev_bp) of path positions [a, b) by step orientation
        (used for block strand normalization, reference: src/smooth.cpp:70-128
        fwd_bp/rev_bp accounting).  O(log steps): interior steps come from
        a lazily-built prefix sum of reverse bp; only the two boundary
        steps are handled individually."""
        a = max(a, 0)
        b = min(b, int(self.path_len[pid]))
        if b <= a:
            return 0, 0
        pos = self.path_pos[pid]
        steps = self.path_steps[pid]
        if not hasattr(self, "_revcum") or self._revcum is None:
            self._revcum = [None] * self.path_count()
        rc = self._revcum[pid]
        if rc is None:
            lens = np.diff(np.asarray(pos, dtype=np.int64))
            rev_steps = (np.asarray(steps, dtype=np.int64) & 1) == 1
            rc = np.zeros(len(lens) + 1, dtype=np.int64)
            np.cumsum(np.where(rev_steps, lens, 0), out=rc[1:])
            self._revcum[pid] = rc
        lo = int(np.searchsorted(pos, a, side="right")) - 1
        hi = int(np.searchsorted(pos, b, side="left"))

        def partial(r):
            ov = min(b, int(pos[r + 1])) - max(a, int(pos[r]))
            return ov if (ov > 0 and int(steps[r]) & 1) else 0

        if hi - lo <= 2:
            rev = sum(partial(r) for r in range(lo, hi))
        else:
            rev = int(rc[hi - 1] - rc[lo + 1]) + partial(lo) + partial(hi - 1)
        return (b - a) - rev, rev

    # ---- range helpers ----
    def range_seq(self, pid: int, begin: int, end: int) -> str:
        """Concatenated sequence of steps [begin, end) of path pid."""
        parts = [self.get_sequence(int(h)) for h in self.path_steps[pid][begin:end]]
        return "".join(parts)

    def range_len(self, pid: int, begin: int, end: int) -> int:
        return int(self.path_pos[pid][end] - self.path_pos[pid][begin])

    def path_seq(self, pid: int) -> str:
        return self.range_seq(pid, 0, len(self.path_steps[pid]))
