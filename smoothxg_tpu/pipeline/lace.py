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

from ..graph.index import FlatIndex
from ..graph.mutable import MutableGraph
from ..utils.progress import Log
from .smooth import BlockResult


class PathValidationError(RuntimeError):
    pass


def lace(idx: FlatIndex, results: list[BlockResult],
         path_seqs: list[str]) -> tuple[MutableGraph, list[str]]:
    """Returns (smoothed graph, consensus path names)."""
    smoothed = MutableGraph()

    # 1) nodes + edges from every block, with id translation
    id_trans: list[int] = []
    for res in results:
        id_trans.append(smoothed.node_count())
        bg = res.graph
        if bg is None or bg.node_count() == 0:
            continue
        for n in bg.node_ids():
            smoothed.create_handle(bg.seqs[n])
        off = id_trans[-1]
        for a, b in bg.edges():
            smoothed.create_edge(((a >> 1) + off) << 1 | (a & 1),
                                 ((b >> 1) + off) << 1 | (b & 1))

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
        bg = results[block_id].graph
        off = id_trans[block_id]
        steps = bg.path_steps[target_rank - 1]
        out_steps = smoothed.path_steps[out_pid]
        first = True
        for h in steps:
            t = ((h >> 1) + off) << 1 | (h & 1)
            out_steps.append(t)
            if first:
                if last_handle is not None:
                    smoothed.create_edge(last_handle, t)
                first = False
        if out_steps:
            last_handle = out_steps[-1]
        last_end = p1
    if cur_pid is not None and last_end != len(path_seqs[cur_pid]):
        raise PathValidationError(
            f"path {idx.get_path_name(cur_pid)} not fully covered")

    # 4) validation (the primary oracle; reference: src/main.cpp:762-800)
    for pid in range(smoothed.path_count()):
        name = smoothed.path_names[pid]
        orig = path_seqs[idx.get_path(name)]
        got = smoothed.path_seq(pid)
        if got != orig:
            raise PathValidationError(
                f"path {name} corrupted in the smoothed graph "
                f"(len {len(got)} vs {len(orig)})")
    if smoothed.path_count() != idx.path_count():
        raise PathValidationError(
            f"path count mismatch: {smoothed.path_count()} vs {idx.path_count()}")
    Log.info("lace", f"validated {smoothed.path_count()} paths")

    # 5) consensus embedding (unmerged; reference: src/main.cpp:832-866)
    consensus_names: list[str] = []
    for res in results:
        if res.consensus_name is None or res.graph is None:
            continue
        bg = res.graph
        if not bg.has_path(res.consensus_name):
            continue
        off = id_trans[res.block_id]
        out_pid = smoothed.create_path(res.consensus_name)
        smoothed.path_steps[out_pid] = [
            ((h >> 1) + off) << 1 | (h & 1)
            for h in bg.path_steps[bg.get_path(res.consensus_name)]]
        consensus_names.append(res.consensus_name)

    # 6) path-implied edges + unchop
    smoothed.create_edges_from_paths()
    smoothed = smoothed.unchop()
    Log.info("lace", f"smoothed graph: {smoothed.node_count()} nodes, "
                     f"{smoothed.total_seq_len()} bp")
    return smoothed, consensus_names
