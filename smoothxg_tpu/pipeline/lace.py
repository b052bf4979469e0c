"""Lacing: assemble per-block smoothed graphs into one output graph by
walking every original path across its block fragments, validate that every
path's sequence is byte-identical to the input, embed consensus paths, add
path-implied edges, and unchop.

Reimplements the reference driver's lacing section
(reference: src/main.cpp:614-1011):
  * sequential node/edge copy with per-block id translation (:643-665),
  * path handles created in sorted (path, start) fragment order (:667-687),
  * per-path fragment walk with stitch edges (:696-754),
  * byte-exact validation against the original sequences (:762-800),
  * consensus path embedding (:802-866),
  * path-implied edge walk (:986-1008) and unchop (:1011).
"""
from __future__ import annotations

import numpy as np

from ..graph.index import FlatIndex
from ..graph.mutable import MutableGraph
from ..utils.progress import Log
from .smooth import BlockResult


class PathValidationError(RuntimeError):
    pass


def lace(idx: FlatIndex, results: list[BlockResult],
         path_seqs: list[str], merge_outcome=None,
         preserve_unmerged_consensus: bool = False,
         consensus_base_name: str = "") -> tuple[MutableGraph, list[str]]:
    """Returns (smoothed graph, consensus path names)."""
    smoothed = MutableGraph()

    # 1) nodes + edges from every block, with id translation — bulk
    # appends (per-node create_handle / per-edge create_edge dominated
    # lace at scale); block graphs have dense 1..n ids in storage order,
    # the same assumption the per-node loop made
    from ..graph.mutable import _bulk_add_side_edges
    id_trans: list[int] = []
    edge_chunks: list[np.ndarray] = []
    for res in results:
        id_trans.append(smoothed.node_count())
        bg = res.get_graph()
        if bg is None or bg.node_count() == 0:
            continue
        smoothed.bulk_create_handles([bg.seqs[n] for n in bg.node_ids()])
        ea = bg.edges_array()
        if len(ea):
            edge_chunks.append((((ea >> 1) + id_trans[-1]) << 1) | (ea & 1))
    if edge_chunks:
        eh = np.concatenate(edge_chunks)
        a, b = eh[:, 0], eh[:, 1]
        _bulk_add_side_edges(smoothed.adj,
                             (a & ~np.int64(1)) | (1 - (a & 1)),   # out_side
                             (b & ~np.int64(1)) | (b & 1))         # in_side

    # 2) sorted path fragments (reference: path_mapping mmmulti::set ordering)
    entries: list[tuple[int, int, int, int, int]] = []
    for res in results:
        for (pid, p0, p1, target_rank) in res.path_mappings:
            entries.append((pid, p0, p1, target_rank, res.block_id))
    entries.sort()

    # 3) walk each path's fragments in order
    cur_pid = None
    out_pid = None
    last_handle = None
    last_end = 0
    for (pid, p0, p1, target_rank, block_id) in entries:
        if pid != cur_pid:
            if cur_pid is not None and last_end != len(path_seqs[cur_pid]):
                raise PathValidationError(
                    f"path {idx.get_path_name(cur_pid)} not fully covered "
                    f"({last_end}/{len(path_seqs[cur_pid])})")
            cur_pid = pid
            out_pid = smoothed.create_path(idx.get_path_name(pid))
            last_handle = None
            last_end = 0
        if p0 != last_end:
            raise PathValidationError(
                f"gap in path {idx.get_path_name(pid)} at {last_end}..{p0}")
        bg = results[block_id].get_graph()
        off = id_trans[block_id]
        steps = bg.path_steps[target_rank - 1]
        out_steps = smoothed.path_steps[out_pid]
        if steps:
            # vectorized handle translation (reference OMPs this walk,
            # src/main.cpp:696; one numpy pass per fragment here)
            sa = np.asarray(steps, dtype=np.int64)
            ts = (((sa >> 1) + off) << 1) | (sa & 1)
            if last_handle is not None:
                smoothed.create_edge(last_handle, int(ts[0]))
            out_steps.extend(ts.tolist())
            last_handle = out_steps[-1]
        last_end = p1
    if cur_pid is not None and last_end != len(path_seqs[cur_pid]):
        raise PathValidationError(
            f"path {idx.get_path_name(cur_pid)} not fully covered")

    # 4) validation (the primary oracle; reference: src/main.cpp:762-800)
    for pid in range(smoothed.path_count()):
        name = smoothed.path_names[pid]
        orig = str(path_seqs[idx.get_path(name)])
        got = smoothed.path_seq(pid)
        if got != orig:
            raise PathValidationError(
                f"path {name} corrupted in the smoothed graph "
                f"(len {len(got)} vs {len(orig)})")
    if smoothed.path_count() != idx.path_count():
        raise PathValidationError(
            f"path count mismatch: {smoothed.path_count()} vs {idx.path_count()}")
    Log.info("lace", f"validated {smoothed.path_count()} paths")

    # 5) consensus embedding (reference: src/main.cpp:802-976)
    consensus_names: list[str] = []
    in_merged = merge_outcome.in_merged_group if merge_outcome else set()
    exclude_unmerged = in_merged if (merge_outcome
                                     and not preserve_unmerged_consensus) else set()

    def _embed_consensus_steps(out_pid: int, block_id: int) -> None:
        bg = results[block_id].get_graph()
        if bg is None:
            return
        cname = results[block_id].consensus_name
        if cname is None or not bg.has_path(cname):
            return
        off = id_trans[block_id]
        smoothed.path_steps[out_pid].extend(
            ((h >> 1) + off) << 1 | (h & 1)
            for h in bg.path_steps[bg.get_path(cname)])

    for res in results:
        if res.consensus_name is None:
            continue
        rg = res.get_graph()
        if rg is None or not rg.has_path(res.consensus_name):
            continue
        if res.block_id in exclude_unmerged:
            continue
        out_pid = smoothed.create_path(res.consensus_name)
        _embed_consensus_steps(out_pid, res.block_id)
        if res.block_id not in in_merged:
            consensus_names.append(res.consensus_name)

    # merged consensus paths (reference: src/main.cpp:869-946)
    if merge_outcome:
        for mc in merge_outcome.merged:
            name = consensus_base_name + mc.block_id_ranges
            out_pid = smoothed.create_path(name)
            runs = mc.runs
            for (lo, hi) in runs:
                ids = range(hi, lo - 1, -1) if mc.inverted else range(lo, hi + 1)
                for bid in ids:
                    _embed_consensus_steps(out_pid, bid)
            consensus_names.append(name)

    # 6) path-implied edges + unchop
    smoothed.create_edges_from_paths()
    smoothed = smoothed.unchop()
    Log.info("lace", f"smoothed graph: {smoothed.node_count()} nodes, "
                     f"{smoothed.total_seq_len()} bp")
    return smoothed, consensus_names
