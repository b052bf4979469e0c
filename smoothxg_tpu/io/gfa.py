"""GFA v1 reader/writer for MutableGraph.

Replaces the reference's gfakluge streaming parse (reference:
src/xg.cpp:695-730) and odgi's to_gfa.  Handles S/L/P records; sequences are
embedded as paths (reference: README.md:27-31).
"""
from __future__ import annotations

from ..graph.mutable import MutableGraph, flip, handle


def read_gfa(path: str) -> MutableGraph:
    g = MutableGraph()
    name2id: dict[str, int] = {}
    deferred_links: list[tuple[str, str, str, str]] = []
    deferred_paths: list[tuple[str, str]] = []
    with open(path) as f:
        for line in f:
            if not line:
                continue
            t = line[0]
            if t == "S":
                parts = line.rstrip("\n").split("\t")
                name, seq = parts[1], parts[2]
                h = g.create_handle(seq)
                name2id[name] = h >> 1
            elif t == "L":
                parts = line.rstrip("\n").split("\t")
                deferred_links.append((parts[1], parts[2], parts[3], parts[4]))
            elif t == "P":
                parts = line.rstrip("\n").split("\t")
                deferred_paths.append((parts[1], parts[2]))
    for a, ao, b, bo in deferred_links:
        ha = handle(name2id[a], ao == "-")
        hb = handle(name2id[b], bo == "-")
        g.create_edge(ha, hb)
    for name, stepstr in deferred_paths:
        pid = g.create_path(name)
        steps = g.path_steps[pid]
        if stepstr and stepstr != "*":
            for tok in stepstr.split(","):
                rev = tok[-1] == "-"
                steps.append(handle(name2id[tok[:-1]], rev))
    return g


def write_gfa(g: MutableGraph, path: str) -> None:
    with open(path, "w") as f:
        f.write("H\tVN:Z:1.0\n")
        for n in g.node_ids():
            f.write(f"S\t{n}\t{g.seqs[n]}\n")
        # edges in deterministic order
        es = sorted(
            ((a >> 1, a & 1, b >> 1, b & 1) for a, b in g.edges()))
        for aid, arev, bid, brev in es:
            f.write(f"L\t{aid}\t{'-' if arev else '+'}\t{bid}\t{'-' if brev else '+'}\t0M\n")
        for name, steps in zip(g.path_names, g.path_steps):
            s = ",".join(f"{h >> 1}{'-' if h & 1 else '+'}" for h in steps)
            f.write(f"P\t{name}\t{s}\t*\n")
