"""MAF block merging and block-graph flipping.

Reimplements the reference's MAF/merge consumer thread as a deterministic
bulk pass over blocks in id order (reference: write_maf_lambda +
_put_block_in_group + _write_merged_maf_blocks, src/smooth.cpp:1075-1893).
The reference preserved block order with an atomic bitvector and a spinning
thread; here results already arrive in order, so the pass is pure.

Semantics:
  * a deque of up to `max_groups` open merge groups; a block joins a group
    iff for every shared path row there is a coordinate-contiguous group row
    (forward or flipped), and the fraction of contiguous rows (jaccard) is
    >= `contiguous_path_jaccard` (src/smooth.cpp:1617-1755),
  * merging concatenates aligned rows and gap-pads non-shared rows
    (src/smooth.cpp:1075-1294); consensus rows accumulate per group,
  * a block that starts a new group is groom-flipped when its lowest path
    begins reverse (src/smooth.cpp:1800-1829); joining flipped reverses its
    rows and marks the block graph for the flip pass
    (src/smooth.cpp:2324-2408),
  * flushed groups emit one MAF 'a' record with blocks=/loops=/merged=
    annotations and (for multi-block groups) a merged consensus row; the
    block-id interval runs are recorded for merged-consensus path embedding
    (src/smooth.cpp:1296-1528, src/main.cpp:869-946).
"""
from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from ..utils.dna import revcomp
from .smooth import BlockResult, MafRow, _flip_block_graph


@dataclass
class MergedGroup:
    block_ids: list[int] = field(default_factory=list)
    rows: dict[str, list[MafRow]] = field(default_factory=dict)
    consensus_rows: deque = field(default_factory=deque)  # (name, MafRow)


@dataclass
class MergedConsensus:
    """One merged group's consensus-embedding recipe."""
    block_id_ranges: str            # "min-max" path-name suffix
    runs: list[tuple[int, int]]     # contiguous [lo, hi] inclusive runs
    inverted: bool


@dataclass
class MergeOutcome:
    flipped_blocks: set[int] = field(default_factory=set)
    merged: list[MergedConsensus] = field(default_factory=list)
    in_merged_group: set[int] = field(default_factory=set)
    maf_records: list[tuple[str, list[MafRow]]] = field(default_factory=list)


def _alignment_width(group: MergedGroup) -> int:
    for rows in group.rows.values():
        for r in rows:
            return len(r.text)
    return 0


def _row_start(r: MafRow, flip: bool) -> int:
    return r.src_len - (r.start + r.size) if flip else r.start


def merge_blocks_pass(
    results: list[BlockResult],
    *,
    merge_blocks: bool,
    consensus_base_name: str,
    add_consensus: bool,
    contiguous_path_jaccard: float = 1.0,
    preserve_unmerged_consensus: bool = False,
    max_groups: int = 50,
) -> MergeOutcome:
    out = MergeOutcome()
    queue: deque[MergedGroup] = deque()

    def flush(group: MergedGroup, below_thresh: bool) -> None:
        _flush_group(group, out, add_consensus, consensus_base_name,
                     preserve_unmerged_consensus, below_thresh)

    for res in results:
        if res.maf is None:
            continue
        bid = res.block_id
        consensus_name = res.consensus_name or ""
        maf = res.maf

        merged = False
        flip_sel = False
        group_sel = -1
        side_left = False
        below_thresh = False

        if merge_blocks and queue:
            best_j = -1.0
            for gi, group in enumerate(queue):
                gdir = 0
                if len(group.block_ids) > 1:
                    gdir = 1 if group.block_ids[0] > group.block_ids[-1] else -1
                for flip in (False, True):
                    ok = True
                    ncontig = 0
                    side = gdir   # 1 = new block goes left, -1 = right, 0 = undecided
                    for pname, rows in maf.items():
                        if pname == consensus_name:
                            continue
                        if pname not in group.rows:
                            continue
                        found_any = False
                        for r in rows:
                            for gr in group.rows[pname]:
                                d = _contiguous_g(gr, r, flip)
                                if d is None:
                                    continue
                                want_left = (d == -1)
                                sd = 1 if want_left else -1
                                if side == 0 or side == sd:
                                    side = sd
                                    found_any = True
                                    ncontig += 1
                                    break
                            # reference checks all rows; a row may fail
                        if not found_any:
                            ok = False
                            break
                    if ok:
                        n_in_group = sum(len(v) for v in group.rows.values())
                        n_in_block = sum(len(v) for k, v in maf.items())
                        denom = (n_in_block - (1 if add_consensus else 0)
                                 + n_in_group - ncontig)
                        j = ncontig / denom if denom else 0.0
                        if j >= contiguous_path_jaccard and j > best_j:
                            best_j = j
                            group_sel = gi
                            flip_sel = flip
                            side_left = (side == 1)
            below_thresh = (best_j > -1) and (best_j < contiguous_path_jaccard)
            merged = group_sel > -1
        elif merge_blocks:
            # the very first block starts a group too and is groom-flipped
            # like any other group-starting block
            # (reference: src/smooth.cpp:1800-1829)
            queue.append(MergedGroup())
            group_sel = len(queue) - 1
            merged = True
            flip_sel = res.groom_flip
            side_left = False

        if merged:
            _put_block_in_group(queue[group_sel], bid, consensus_name, maf,
                                side_left, flip_sel)
            if flip_sel:
                out.flipped_blocks.add(bid)
        else:
            if len(queue) >= max_groups:
                flush(queue.popleft(), below_thresh)
            flip = res.groom_flip
            group = MergedGroup()
            queue.append(group)
            _put_block_in_group(group, bid, consensus_name, maf, False, flip)
            if flip:
                out.flipped_blocks.add(bid)

    while queue:
        flush(queue.popleft(), False)

    # apply the flip pass to the block graphs
    for bid in out.flipped_blocks:
        res = results[bid]
        g = res.get_graph()
        if g is not None:
            res.set_graph(_flip_block_graph(g, res.consensus_name))
    return out


def _put_block_in_group(group: MergedGroup, bid: int, consensus_name: str,
                        maf: dict[str, list[MafRow]], on_left: bool,
                        flip: bool) -> None:
    width = _alignment_width(group)
    for pname in maf:
        if pname == consensus_name:
            continue
        rows = maf[pname]
        if pname not in group.rows:
            group.rows[pname] = []
            for r in rows:
                text = revcomp(r.text) if flip else r.text
                group.rows[pname].append(MafRow(
                    pname, _row_start(r, flip), r.size,
                    flip ^ r.is_rev, r.src_len,
                    (text + "-" * width) if on_left else ("-" * width + text)))
        else:
            for r in rows:
                rs = _row_start(r, flip)
                merged_row = False
                for gr in group.rows[pname]:
                    if len(gr.text) != width:
                        continue   # avoid merging more rows from this block
                    d = _contiguous_g(gr, r, flip)
                    if d is None:
                        continue
                    text = revcomp(r.text) if flip else r.text
                    if d == -1:
                        gr.start -= r.size
                        gr.text = text + gr.text
                    else:
                        gr.text = gr.text + text
                    gr.size += r.size
                    merged_row = True
                    break
                if not merged_row:
                    text = revcomp(r.text) if flip else r.text
                    group.rows[pname].append(MafRow(
                        pname, rs, r.size, flip ^ r.is_rev, r.src_len,
                        (text + "-" * width) if on_left else ("-" * width + text)))
    # consensus row
    if consensus_name and consensus_name in maf:
        r = maf[consensus_name][0]
        text = revcomp(r.text) if flip else r.text
        row = MafRow(consensus_name, r.start, r.size, r.is_rev, r.src_len, text)
        if on_left:
            group.consensus_rows.appendleft((consensus_name, row))
        else:
            group.consensus_rows.append((consensus_name, row))
    # pad rows not present in this block
    block_width = next((len(r.text) for k, rows in maf.items()
                        if k != consensus_name for r in rows), 0)
    new_width = width + block_width
    gaps = "-" * block_width
    for rows in group.rows.values():
        for gr in rows:
            if len(gr.text) < new_width:
                gr.text = (gaps + gr.text) if on_left else (gr.text + gaps)
    if on_left:
        group.block_ids.insert(0, bid)
    else:
        group.block_ids.append(bid)


def _contiguous_g(gr: MafRow, r: MafRow, flip: bool) -> int | None:
    rs = _row_start(r, flip)
    rrev = flip ^ r.is_rev
    if rrev != gr.is_rev:
        return None
    if gr.is_rev:
        if (gr.src_len - gr.start) == (r.src_len - (rs + r.size)):
            return -1
        if (r.src_len - rs) == (gr.src_len - (gr.start + gr.size)):
            return +1
    else:
        if (gr.start + gr.size) == rs:
            return +1
        if (rs + r.size) == gr.start:
            return -1
    return None


def _flush_group(group: MergedGroup, out: MergeOutcome, add_consensus: bool,
                 consensus_base_name: str, preserve_unmerged: bool,
                 below_thresh: bool) -> None:
    if not group.block_ids:
        return
    n = len(group.block_ids)
    first, last_ = group.block_ids[0], group.block_ids[-1]
    lo, hi = min(first, last_), max(first, last_)
    block_id_ranges = f"{lo}" if n == 1 else f"{lo}-{hi}"
    inverted = n > 1 and first > last_

    full_ranges_parts = []
    if n > 1:
        runs: list[tuple[int, int]] = []
        start = 0
        for i in range(1, n):
            contig = (group.block_ids[i - 1] - group.block_ids[i] == 1
                      if inverted else
                      group.block_ids[i] - group.block_ids[i - 1] == 1)
            if not contig:
                a, b = group.block_ids[start], group.block_ids[i - 1]
                runs.append((min(a, b), max(a, b)))
                full_ranges_parts.append(f"{a}" if a == b else f"{a}-{b}")
                start = i
        a, b = group.block_ids[start], group.block_ids[n - 1]
        runs.append((min(a, b), max(a, b)))
        full_ranges_parts.append(f"{a}" if a == b else f"{a}-{b}")
        out.merged.append(MergedConsensus(block_id_ranges, runs, inverted))
        if add_consensus:
            out.in_merged_group.update(group.block_ids)
    else:
        full_ranges_parts.append(str(first))
    full_ranges = "_".join(full_ranges_parts)

    # assemble the MAF record
    rows: list[MafRow] = []
    loops = False
    for pname in group.rows:
        if len(group.rows[pname]) > 1:
            loops = True
        rows.extend(group.rows[pname])
    width = _alignment_width(group)
    if add_consensus:
        pos = 0
        merged_size = 0
        merged_len = 0
        merged_text = []
        for (cname, crow) in group.consensus_rows:
            if n == 1 or preserve_unmerged:
                rows.append(MafRow(cname, crow.start, crow.size, crow.is_rev,
                                   crow.src_len,
                                   "-" * pos + crow.text
                                   + "-" * (width - pos - len(crow.text))))
            pos += len(crow.text)
            if n > 1:
                merged_size += crow.size
                merged_len += crow.src_len
                merged_text.append(crow.text)
        if n > 1 and group.consensus_rows:
            first_c = group.consensus_rows[0][1]
            rows.append(MafRow(consensus_base_name + block_id_ranges,
                               first_c.start, merged_size, first_c.is_rev,
                               merged_len, "".join(merged_text)))

    hdr = f"a blocks={full_ranges} loops={'true' if loops else 'false'}"
    if n > 1:
        hdr += " merged=true"
        if below_thresh:
            hdr += " below_thresh=true"
    out.maf_records.append((hdr, rows))
