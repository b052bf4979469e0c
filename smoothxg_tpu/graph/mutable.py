"""MutableGraph: a compact host-side bidirected sequence graph with paths.

This is the framework's replacement for the reference's odgi::graph_t
dynamic graph (reference: deps/odgi, used from src/prep.cpp:102-144,
src/smooth.cpp:538-550, src/main.cpp:1011).  It supports exactly the surface
the smoothing pipeline needs:

  * create_handle / create_edge / destroy_handle / destroy_edge
  * path creation and step appends
  * chop (split nodes longer than k; reference: odgi chop via src/prep.cpp:144)
  * unchop (merge unary non-branching runs; reference: odgi unchop via
    src/main.cpp:1011, src/smooth.cpp:538)
  * topological_order + groom + apply_ordering (reference: src/prep.cpp:132-140)

Representation: handles are ints (node_id << 1 | is_reverse); node ids are
dense 1-based ints; edges connect node *sides* (node_id << 1 | end) where
end==1 is the right/forward-out side.  All transforms that renumber return a
new graph so that downstream flat indexing is deterministic.
"""
from __future__ import annotations

from typing import Iterable

import numpy as np

from ..utils.dna import revcomp


# ---- handle helpers -------------------------------------------------------

def handle_fwd(node_id: int) -> int:
    return node_id << 1


def handle(node_id: int, is_rev: bool) -> int:
    return (node_id << 1) | int(is_rev)


def flip(h: int) -> int:
    return h ^ 1


def hid(h: int) -> int:
    return h >> 1


def hrev(h: int) -> bool:
    return bool(h & 1)


# A side is (node_id << 1 | end); end 1 = right side (forward exit),
# end 0 = left side (forward entry).

def out_side(h: int) -> int:
    # side you exit from when traversing h
    return (h >> 1 << 1) | (0 if h & 1 else 1)


def in_side(h: int) -> int:
    # side you enter through when traversing h
    return (h >> 1 << 1) | (1 if h & 1 else 0)


def side_to_handle_entering(side: int) -> int:
    """Handle that *enters* through `side` (used when following right)."""
    # entering through left side (end=0) -> forward; through right -> reverse
    return (side >> 1 << 1) | (1 if side & 1 else 0)


def side_to_handle_exiting(side: int) -> int:
    """Handle that *exits* through `side` (used when following left)."""
    return (side >> 1 << 1) | (0 if side & 1 else 1)


def _bulk_add_side_edges(adj: dict, sa_list, sb_list,
                         preseed: bool = False) -> None:
    """Append side adjacency for (out_side, in_side) pairs, preserving
    input order and skipping duplicates of the same undirected edge in
    EITHER direction — exactly create_edge's semantics, fully vectorized
    (canonical-key first-seen dedup, then a stable group-by over the
    interleaved directed entries so each side's slot order matches the
    per-edge append).  With preseed=True the current adjacency counts as
    already-seen (merge mode, as create_edges_from_paths needs)."""
    sa = np.asarray(sa_list, dtype=np.int64)
    sb = np.asarray(sb_list, dtype=np.int64)
    if not len(sa):
        return
    key = np.where(sa <= sb, (sa << 32) | sb, (sb << 32) | sa)
    _, first = np.unique(key, return_index=True)
    if preseed and adj:
        from itertools import chain, repeat
        items = [(x, lst) for x, lst in adj.items() if lst]
        if items:
            total = sum(len(lst) for _, lst in items)
            ex = np.fromiter(chain.from_iterable(
                repeat(x, len(lst)) for x, lst in items),
                np.int64, count=total)
            en = np.fromiter(chain.from_iterable(
                lst for _, lst in items), np.int64, count=total)
            ek = np.unique(np.where(ex <= en, (ex << 32) | en,
                                    (en << 32) | ex))
            keep = ~np.isin(key[first], ek)
            first = first[keep]
    sel = np.sort(first)
    sa, sb = sa[sel], sb[sel]
    m = len(sa)
    if not m:
        return
    # directed entries in per-edge order: (sa,sb) then (sb,sa), dropping
    # the mirror of self side loops (create_edge records those once)
    ds = np.empty(2 * m, dtype=np.int64)
    dn = np.empty(2 * m, dtype=np.int64)
    ds[0::2], dn[0::2] = sa, sb
    ds[1::2], dn[1::2] = sb, sa
    valid = np.ones(2 * m, dtype=bool)
    valid[1::2] = sa != sb
    ds, dn = ds[valid], dn[valid]
    order = np.argsort(ds, kind="stable")
    dss, dns = ds[order], dn[order]
    cut = np.nonzero(np.diff(dss))[0] + 1
    starts = np.concatenate([[0], cut])
    ends = np.concatenate([cut, [len(dss)]])
    dl = dns.tolist()
    for s, e, side in zip(starts.tolist(), ends.tolist(),
                          dss[starts].tolist()):
        lst = adj.get(side)
        if lst is None:
            adj[side] = dl[s:e]
        else:
            lst.extend(dl[s:e])


class MutableGraph:
    def __init__(self) -> None:
        self.seqs: dict[int, str] = {}          # node_id -> forward sequence
        self.adj: dict[int, list[int]] = {}     # side -> [sides]
        self.path_names: list[str] = []
        self.path_steps: list[list[int]] = []   # path_id -> [handles]
        self._name2path: dict[str, int] = {}
        self._next_id = 1
        self._order: list[int] = []             # node ids in storage order

    # ---- nodes ----
    def create_handle(self, seq: str, node_id: int | None = None) -> int:
        if node_id is None:
            node_id = self._next_id
        if node_id in self.seqs:
            raise ValueError(f"node {node_id} already exists")
        self.seqs[node_id] = seq
        self._order.append(node_id)
        if node_id >= self._next_id:
            self._next_id = node_id + 1
        return handle_fwd(node_id)

    def bulk_create_handles(self, seq_list) -> int:
        """Append len(seq_list) fresh nodes with consecutive ids; returns
        the first id (same ids create_handle would have assigned)."""
        first = self._next_id
        ids = range(first, first + len(seq_list))
        self.seqs.update(zip(ids, seq_list))
        self._order.extend(ids)
        self._next_id = first + len(seq_list)
        return first

    def has_node(self, node_id: int) -> bool:
        return node_id in self.seqs

    def get_handle(self, node_id: int, is_rev: bool = False) -> int:
        return handle(node_id, is_rev)

    def get_sequence(self, h: int) -> str:
        s = self.seqs[hid(h)]
        return revcomp(s) if hrev(h) else s

    def get_length(self, h: int) -> int:
        return len(self.seqs[hid(h)])

    def node_count(self) -> int:
        return len(self.seqs)

    def node_ids(self) -> Iterable[int]:
        """Node ids in storage order (skipping destroyed)."""
        return (n for n in self._order if n in self.seqs)

    def destroy_handle(self, h: int) -> None:
        n = hid(h)
        for side in (n << 1, (n << 1) | 1):
            for other in self.adj.get(side, []):
                if other != side:
                    lst = self.adj.get(other)
                    if lst is not None:
                        self.adj[other] = [s for s in lst if s != side]
            self.adj.pop(side, None)
        del self.seqs[n]

    # ---- edges ----
    def create_edge(self, a: int, b: int) -> None:
        sa, sb = out_side(a), in_side(b)
        lst = self.adj.setdefault(sa, [])
        if sb in lst:
            return
        lst.append(sb)
        if sa != sb:
            self.adj.setdefault(sb, []).append(sa)
        else:
            pass  # self side loop recorded once

    def has_edge(self, a: int, b: int) -> bool:
        return in_side(b) in self.adj.get(out_side(a), ())

    def destroy_edge(self, a: int, b: int) -> None:
        sa, sb = out_side(a), in_side(b)
        if sa in self.adj:
            self.adj[sa] = [s for s in self.adj[sa] if s != sb]
        if sb in self.adj and sa != sb:
            self.adj[sb] = [s for s in self.adj[sb] if s != sa]

    def edges_array(self) -> np.ndarray:
        """All canonical edges as an (m, 2) int64 handle-pair array, in the
        same first-seen order as edges() — the per-yield generator cost
        dominates to_arrays/compact on big graphs."""
        items = [(sa, lst) for sa, lst in self.adj.items() if lst]
        if not items:
            return np.zeros((0, 2), dtype=np.int64)
        from itertools import chain, repeat
        total = sum(len(lst) for _, lst in items)
        sa = np.fromiter(chain.from_iterable(
            repeat(s, len(lst)) for s, lst in items), np.int64, count=total)
        sb = np.fromiter(chain.from_iterable(
            lst for _, lst in items), np.int64, count=total)
        lo = np.minimum(sa, sb)
        hi = np.maximum(sa, sb)
        _, first = np.unique((lo << 32) | hi, return_index=True)
        sel = np.sort(first)                   # first-seen canonical order
        ka, kb = lo[sel], hi[sel]
        a = (ka >> 1 << 1) | (1 - (ka & 1))    # side_to_handle_exiting
        b = (kb >> 1 << 1) | (kb & 1)          # side_to_handle_entering
        return np.stack([a, b], axis=1)

    def edges(self) -> Iterable[tuple[int, int]]:
        """Yield canonical edges as (handle_from, handle_to)."""
        seen = set()
        for sa, lst in self.adj.items():
            for sb in lst:
                key = (sa, sb) if sa <= sb else (sb, sa)
                if key in seen:
                    continue
                seen.add(key)
                a = side_to_handle_exiting(key[0])
                b = side_to_handle_entering(key[1])
                yield (a, b)

    def edge_count(self) -> int:
        n = 0
        for _ in self.edges():
            n += 1
        return n

    def follow_right(self, h: int) -> list[int]:
        return [side_to_handle_entering(s) for s in self.adj.get(out_side(h), ())]

    def follow_left(self, h: int) -> list[int]:
        return [side_to_handle_exiting(s) for s in self.adj.get(in_side(h), ())]

    def degree_right(self, h: int) -> int:
        return len(self.adj.get(out_side(h), ()))

    def degree_left(self, h: int) -> int:
        return len(self.adj.get(in_side(h), ()))

    # ---- paths ----
    def create_path(self, name: str) -> int:
        if name in self._name2path:
            raise ValueError(f"path {name} already exists")
        pid = len(self.path_names)
        self.path_names.append(name)
        self.path_steps.append([])
        self._name2path[name] = pid
        return pid

    def has_path(self, name: str) -> bool:
        return name in self._name2path

    def get_path(self, name: str) -> int:
        return self._name2path[name]

    def append_step(self, pid: int, h: int) -> None:
        self.path_steps[pid].append(h)

    def prepend_step(self, pid: int, h: int) -> None:
        self.path_steps[pid].insert(0, h)

    def path_count(self) -> int:
        return len(self.path_names)

    def path_seq(self, pid: int) -> str:
        # inlined get_sequence: one dict hit per step, no call overhead
        # (path validation joins millions of steps at scale)
        seqs = self.seqs
        return "".join([revcomp(seqs[h >> 1]) if h & 1 else seqs[h >> 1]
                        for h in self.path_steps[pid]])

    def path_len(self, pid: int) -> int:
        seqs = self.seqs
        return sum(len(seqs[h >> 1]) for h in self.path_steps[pid])

    # ---- derived ----
    def total_seq_len(self) -> int:
        return sum(len(s) for s in self.seqs.values())

    def create_edges_from_paths(self) -> None:
        """Ensure every path adjacency exists as an edge
        (reference: src/main.cpp:986-1008). Vectorized: step pairs are
        side-encoded and deduplicated in numpy before touching adj."""
        chunks = []
        for steps in self.path_steps:
            if len(steps) > 1:
                s = np.asarray(steps, dtype=np.int64)
                a, b = s[:-1], s[1:]
                sa = (a >> 1 << 1) | (1 - (a & 1))   # out_side
                sb = (b >> 1 << 1) | (b & 1)         # in_side
                chunks.append((sa << 32) | sb)
        if not chunks:
            return
        packed = np.unique(np.concatenate(chunks))
        _bulk_add_side_edges(self.adj, (packed >> 32).tolist(),
                             (packed & 0xFFFFFFFF).tolist(), preseed=True)

    def steps_index(self) -> dict[int, list[tuple[int, int]]]:
        """node_id -> [(path_id, step_rank)] over all paths."""
        idx: dict[int, list[tuple[int, int]]] = {}
        for pid, steps in enumerate(self.path_steps):
            for rank, h in enumerate(steps):
                idx.setdefault(hid(h), []).append((pid, rank))
        return idx

    # ---- transforms (return new graphs, ids renumbered 1..N) ----

    def compact(self, order: list[int] | None = None,
                flips: set[int] | None = None) -> "MutableGraph":
        """Rebuild with nodes renumbered 1..N following `order` (node ids),
        flipping the orientation of nodes in `flips`.
        Equivalent to odgi apply_ordering (reference: src/prep.cpp:128-139)."""
        if order is None:
            order = [n for n in self._order if n in self.seqs]
        flips = flips or set()
        g = MutableGraph()
        n = len(order)
        seqs: dict[int, str] = {}
        for new_id, old_id in enumerate(order, start=1):
            s = self.seqs[old_id]
            seqs[new_id] = revcomp(s) if old_id in flips else s
        g.seqs = seqs
        g._order = list(range(1, n + 1))
        g._next_id = n + 1

        # vectorized handle remap: new = (lut[id] << 1) | (rev ^ flip[id])
        maxid = max(order) if order else 0
        lut = np.zeros(maxid + 1, dtype=np.int64)
        lut[np.asarray(order, dtype=np.int64)] = np.arange(
            1, n + 1, dtype=np.int64)
        fl = np.zeros(maxid + 1, dtype=np.int64)
        if flips:
            fl[np.fromiter(flips, dtype=np.int64, count=len(flips))] = 1

        def remap_vec(h: np.ndarray) -> np.ndarray:
            nid = h >> 1
            return (lut[nid] << 1) | ((h & 1) ^ fl[nid])

        # adjacency: direct per-side remap — same dedup state, same
        # first-seen edge order (every side list is keyed by the canonical
        # edge scan the previous rebuild produced), no dict->array->dict
        # round-trip.  Fall back to the rebuild when ids are sparse.
        lut_l = lut.tolist()
        fl_l = fl.tolist()
        alive_all = len(self.seqs) == n
        if alive_all:
            bound = len(lut_l)
            adj = {}
            for side, lst in self.adj.items():
                if not lst or side >> 1 >= bound:
                    continue
                nid = lut_l[side >> 1]
                if not nid:
                    continue
                ns = (nid << 1) | ((side & 1) ^ fl_l[side >> 1])
                vals = [(lut_l[v >> 1] << 1) | ((v & 1) ^ fl_l[v >> 1])
                        for v in lst if v >> 1 < bound and lut_l[v >> 1]]
                if vals:
                    adj[ns] = vals
            g.adj = adj
        else:
            epairs = self.edges_array()
            if len(epairs):
                ea = remap_vec(epairs)
                a, b = ea[:, 0], ea[:, 1]
                _bulk_add_side_edges(g.adj,
                                     ((a >> 1 << 1) | (1 - (a & 1))).tolist(),
                                     ((b >> 1 << 1) | (b & 1)).tolist())
        for name, steps in zip(self.path_names, self.path_steps):
            pid = g.create_path(name)
            g.path_steps[pid] = remap_vec(
                np.asarray(steps, dtype=np.int64)).tolist()
        return g

    def chop(self, max_len: int) -> "MutableGraph":
        """Split nodes longer than max_len into consecutive <=max_len pieces,
        preserving node order (reference: odgi chop, src/prep.cpp:142-144)."""
        g = MutableGraph()
        # node_id -> list of piece handles (forward orientation)
        pieces: dict[int, list[int]] = {}
        for n in self.node_ids():
            seq = self.seqs[n]
            ph = []
            for i in range(0, max(len(seq), 1), max_len):
                ph.append(g.create_handle(seq[i:i + max_len]))
            pieces[n] = ph
            for a, b in zip(ph, ph[1:]):
                g.create_edge(a, b)

        def map_handle(h: int) -> list[int]:
            ph = pieces[hid(h)]
            if hrev(h):
                return [flip(x) for x in reversed(ph)]
            return list(ph)

        for a, b in self.edges():
            g.create_edge(map_handle(a)[-1], map_handle(b)[0])
        for name, steps in zip(self.path_names, self.path_steps):
            pid = g.create_path(name)
            out = g.path_steps[pid]
            for h in steps:
                out.extend(map_handle(h))
        return g

    # ---- flat-array interop (native graphcore + device export) ----

    def to_arrays(self):
        """Export as flat arrays (requires dense 1..N ids; compact() first
        otherwise): (seq_buf u8, node_off i64[n+1], edges i64[2m] handle
        pairs, path_off i64[p+1], steps i64)."""
        ids = [n for n in self._order if n in self.seqs]
        n = len(ids)
        assert ids == list(range(1, n + 1)), "to_arrays needs compact ids"
        seq_cat = "".join(self.seqs[i] for i in ids)
        seq_buf = np.frombuffer(seq_cat.encode(), dtype=np.uint8).copy()
        node_off = np.zeros(n + 1, dtype=np.int64)
        node_off[1:] = np.cumsum([len(self.seqs[i]) for i in ids])
        edges = self.edges_array().ravel()
        path_off = np.zeros(len(self.path_steps) + 1, dtype=np.int64)
        path_off[1:] = np.cumsum([len(s) for s in self.path_steps])
        steps = np.array([h for s in self.path_steps for h in s], dtype=np.int64)
        return seq_buf, node_off, edges, path_off, steps

    @classmethod
    def from_arrays(cls, seq_buf, node_off, edges, path_off, steps,
                    path_names) -> "MutableGraph":
        g = cls()
        n = len(node_off) - 1
        # bulk node load (ids dense 1..n by construction)
        s = bytes(seq_buf).decode()
        off = np.asarray(node_off, dtype=np.int64).tolist()
        g.seqs = {i + 1: s[off[i]:off[i + 1]] for i in range(n)}
        g._order = list(range(1, n + 1))
        g._next_id = n + 1
        # bulk edges: same insertion order as create_edge, with an O(1)
        # seen-set replacing the per-edge adjacency list scan
        ea = np.asarray(edges, dtype=np.int64)
        if len(ea):
            a, b = ea[0::2], ea[1::2]
            _bulk_add_side_edges(g.adj,
                                 ((a >> 1 << 1) | (1 - (a & 1))).tolist(),
                                 ((b >> 1 << 1) | (b & 1)).tolist())
        sarr = np.asarray(steps, dtype=np.int64)
        offp = np.asarray(path_off, dtype=np.int64).tolist()
        for p, name in enumerate(path_names):
            pid = g.create_path(name)
            g.path_steps[pid] = sarr[offp[p]:offp[p + 1]].tolist()
        return g

    def _native_unchop(self) -> "MutableGraph | None":
        """unchop + toposort + renumber in one native call
        (native/graphcore.cpp). None if unavailable or ids not dense."""
        from ..native_bindings import unchop_arrays
        ids = [n for n in self._order if n in self.seqs]
        if ids != list(range(1, len(ids) + 1)):
            return None
        out = unchop_arrays(*self.to_arrays(), do_unchop=True,
                            do_toposort=False)
        if out is None:
            return None
        return MutableGraph.from_arrays(*out, self.path_names)

    def unchop_toposort(self) -> "MutableGraph":
        """unchop + topological renumber in ONE native call — equivalent to
        `g.unchop().compact(g.unchop().topological_order())` (graphcore.cpp
        implements the same Kahn/min-storage-rank order) without the python
        compact's per-node/per-step rebuild."""
        from ..native_bindings import unchop_arrays
        ids = [n for n in self._order if n in self.seqs]
        src = self
        if ids != list(range(1, len(ids) + 1)):
            # non-dense ids (e.g. after destroy_handle): a storage-order
            # renumber changes nothing the native pass depends on — unchop
            # merges are structural and the final numbering comes from the
            # toposort, whose storage-rank tie-break this preserves
            src = self.compact()
        out = unchop_arrays(*src.to_arrays(), do_unchop=True,
                            do_toposort=True)
        if out is not None:
            return MutableGraph.from_arrays(*out, src.path_names)
        g = src.unchop()
        return g.compact(g.topological_order())

    def unchop(self, native: bool = True) -> "MutableGraph":
        """Merge maximal non-branching runs of nodes into single nodes,
        preserving all path sequences exactly
        (reference: odgi unchop via src/main.cpp:1011, src/smooth.cpp:538).

        Two oriented nodes a -> b are merged iff the right side of a has
        exactly one edge, to the left side of b, the left side of b has
        exactly one edge, a != b (as nodes), and every path traversal of a
        continues into b (and every traversal of b comes from a) — i.e. no
        path begins or ends between them and no other traversals exist."""
        if native:
            g = self._native_unchop()
            if g is not None:
                return g
        steps_at: dict[int, list[tuple[int, int]]] = self.steps_index()

        def linkable(a: int, b: int) -> bool:
            # a, b oriented handles; structural degree conditions hold already
            if hid(a) == hid(b):
                return False
            # path condition
            for pid, rank in steps_at.get(hid(a), ()):  # traversals of node(a)
                h = self.path_steps[pid][rank]
                if h == a:
                    nxt = self.path_steps[pid][rank + 1] if rank + 1 < len(self.path_steps[pid]) else None
                    if nxt != b:
                        return False
                elif h == flip(a):
                    prv = self.path_steps[pid][rank - 1] if rank > 0 else None
                    if prv != flip(b):
                        return False
            for pid, rank in steps_at.get(hid(b), ()):
                h = self.path_steps[pid][rank]
                if h == b:
                    prv = self.path_steps[pid][rank - 1] if rank > 0 else None
                    if prv != a:
                        return False
                elif h == flip(b):
                    nxt = self.path_steps[pid][rank + 1] if rank + 1 < len(self.path_steps[pid]) else None
                    if nxt != flip(a):
                        return False
            return True

        # find successor for each oriented node where merge is allowed
        succ: dict[int, int] = {}   # handle -> handle
        pred: dict[int, int] = {}
        for n in self.node_ids():
            for h in (handle_fwd(n), handle_fwd(n) | 1):
                nbrs = self.follow_right(h)
                if len(nbrs) != 1:
                    continue
                b = nbrs[0]
                if len(self.follow_left(b)) != 1:
                    continue
                if not linkable(h, b):
                    continue
                succ[h] = b
                pred[b] = h
        # drop conflicting reverse-orientation duplicates: a chain a->b is the
        # same as flip(b)->flip(a); keep both maps consistent (they are, by
        # symmetry of the conditions).

        # build chains over forward representative orientation
        visited_nodes: set[int] = set()
        chains: list[list[int]] = []
        for n in self._order:
            if n not in self.seqs or n in visited_nodes:
                continue
            h = handle_fwd(n)
            # walk left to chain start
            start = h
            seen_guard = {hid(start)}
            while start in pred:
                p = pred[start]
                if hid(p) in seen_guard:  # cycle
                    break
                start = p
                seen_guard.add(hid(start))
            chain = [start]
            visited_nodes.add(hid(start))
            cur = start
            while cur in succ:
                nxt = succ[cur]
                if hid(nxt) in visited_nodes:
                    break
                chain.append(nxt)
                visited_nodes.add(hid(nxt))
                cur = nxt
            chains.append(chain)

        # merged node per chain; map node -> (chain_idx, pos, oriented_as)
        g = MutableGraph()
        chain_of: dict[int, tuple[int, int, int]] = {}
        new_handle_of_chain: list[int] = []
        for ci, chain in enumerate(chains):
            seq = "".join(self.get_sequence(h) for h in chain)
            nh = g.create_handle(seq)
            new_handle_of_chain.append(nh)
            for pos, h in enumerate(chain):
                chain_of[hid(h)] = (ci, pos, h)

        def map_handle(h: int) -> int:
            ci, pos, rep = chain_of[hid(h)]
            nh = new_handle_of_chain[ci]
            # h equals rep -> same orientation as chain; else flipped
            return nh if h == rep else flip(nh)

        for a, b in self.edges():
            ca, pa, ra = chain_of[hid(a)]
            cb, pb, rb = chain_of[hid(b)]
            if ca == cb:
                # internal chain edge (a->b consecutive) vanish
                if a == ra and b == rb and pb == pa + 1:
                    continue
                if flip(a) == ra and flip(b) == rb and pa == pb + 1:
                    continue
            # boundary edges only valid if a exits its chain end and b enters
            # its chain start (in mapped orientation); other edges mid-chain
            # cannot exist by construction (degree conditions)
            g.create_edge(map_handle(a), map_handle(b))

        for name, steps in zip(self.path_names, self.path_steps):
            pid = g.create_path(name)
            out = g.path_steps[pid]
            i = 0
            while i < len(steps):
                h = steps[i]
                ci, pos, rep = chain_of[hid(h)]
                clen = len(chains[ci])
                out.append(map_handle(h))
                if clen > 1:
                    # consume the whole chain traversal
                    i += clen
                else:
                    i += 1
            g.path_steps[pid] = out
        return g

    # ---- orderings ----

    def topological_order(self) -> list[int]:
        """Kahn-style ordering of node ids over the bidirected graph treated
        as directed by current node orientation; cycles broken by taking the
        lowest-storage-rank remaining node
        (reference capability: odgi topological_order, src/prep.cpp:136-140)."""
        indeg: dict[int, int] = {}
        alive = [n for n in self._order if n in self.seqs]
        rank = {n: i for i, n in enumerate(alive)}
        for n in alive:
            indeg[n] = len(self.follow_left(handle_fwd(n)))
        from heapq import heappush, heappop
        ready: list[int] = []
        for n in alive:
            if indeg[n] == 0:
                heappush(ready, rank[n])
        order: list[int] = []
        emitted: set[int] = set()
        remaining = set(alive)
        cursor = 0   # lowest-rank candidate: emitted only grows, so a
        # monotone scan over `alive` (already rank-ordered) replaces an
        # O(V) min() per cycle break — amortized O(V) over the whole sort
        while remaining:
            if not ready:
                while alive[cursor] in emitted:
                    cursor += 1
                n = alive[cursor]
                heappush(ready, rank[n])
                indeg[n] = 0
            r = heappop(ready)
            n = alive[r]
            if n in emitted:
                continue
            emitted.add(n)
            remaining.discard(n)
            order.append(n)
            for nb in self.follow_right(handle_fwd(n)):
                m = hid(nb)
                if m in emitted or m not in remaining:
                    continue
                indeg[m] -= 1
                if indeg[m] <= 0:
                    heappush(ready, rank[m])
        return order

    def groom(self) -> tuple[list[int], set[int]]:
        """BFS from the first node flipping nodes so that most edges are
        traversed forward (reference capability: odgi groom,
        src/prep.cpp:131-133). Returns (order, flip_set)."""
        alive = [n for n in self._order if n in self.seqs]
        aliveset = set(alive)
        visited: set[int] = set()
        flips: set[int] = set()
        order: list[int] = []
        from collections import deque
        for seed in alive:
            if seed in visited:
                continue
            dq = deque([handle_fwd(seed)])
            visited.add(seed)
            while dq:
                h = dq.popleft()
                n = hid(h)
                order.append(n)
                if hrev(h):
                    flips.add(n)
                for nb in self.follow_right(h) + [flip(x) for x in self.follow_left(h)]:
                    m = hid(nb)
                    if m in aliveset and m not in visited:
                        visited.add(m)
                        dq.append(nb)
        return order, flips
