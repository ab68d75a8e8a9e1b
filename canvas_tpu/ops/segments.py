"""Segment derivation and post-processing (CanvasPartition back half).

Covers:
  * DeriveSegments — breakpoint indices -> genomic (start, end) spans
    (Segmentation.cs:83-125, including its peculiar end-1 convention);
  * SplitOverlappingSegments — multi-sample union split
    (GenomeSegmentationResults.cs:32-55);
  * OverlapCommonRegions — force common-CNV bed boundaries
    (Segmentation.cs:185-218);
  * PostProcessSegments — group bins into numbered segments honoring
    forbidden-interval midpoints, max inter-bin gap, and reference-ploidy
    changes (SegmentationResultsProcessor.cs:17-129);
  * partitioned-file text output (chr start end coverage segmentID).
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass
from pathlib import Path

import numpy as np


@dataclass(frozen=True)
class Span:
    """Genomic segment span: start 0-based inclusive, end exclusive."""
    start: int
    end: int


def derive_segments(
    breakpoints: list[int], n_bins: int,
    starts: np.ndarray, ends: np.ndarray) -> list[Span]:
    """Map breakpoint bin-indices to genomic spans (Segmentation.cs:83-125).

    Note the reference quirk: every segment's end bin is breakpoints[i+1]-1
    (the bin before the next breakpoint) and the last segment runs to the
    final bin; with <2 breakpoints or <=10 bins the whole chromosome is one
    segment.
    """
    bps = list(breakpoints)
    out: list[Span] = []
    if len(bps) >= 2 and n_bins > 10:
        if bps[0] != 0:
            bps.insert(0, 0)
        idx_pairs = []
        idx_pairs.append((bps[0], bps[1] - 1))
        for i in range(1, len(bps) - 1):
            idx_pairs.append((bps[i], bps[i + 1] - 1))
        idx_pairs.append((bps[-1], n_bins - 1))
        for s, e in idx_pairs:
            out.append(Span(int(starts[s]), int(ends[e])))
    else:
        out.append(Span(int(starts[0]), int(ends[n_bins - 1])))
    return out


def split_overlapping_segments(per_sample: list[list[Span]]) -> list[Span]:
    """Union-split of per-sample segmentations
    (GenomeSegmentationResults.cs:32-55): sweep all starts/ends; emit a
    segment between consecutive positions whenever >=1 sample segment is
    open.  Starts sort before ends at equal positions."""
    if len(per_sample) == 1:
        return per_sample[0]
    events: list[tuple[int, int]] = []  # (position, +1/-1); starts first on tie
    for segs in per_sample:
        for s in segs:
            events.append((s.start, 0))
            events.append((s.end, 1))
    # sort by position; at equal position starts (flag 0) come first, which
    # mirrors the reference's merge of the starts stream before ends
    events.sort(key=lambda e: (e[0], e[1]))
    out: list[Span] = []
    n_open = 0
    cur = 0
    for pos, kind in events:
        if n_open > 0 and cur != pos:
            out.append(Span(cur, pos))
        cur = pos
        n_open += 1 if kind == 0 else -1
    return out


def overlap_common_regions(
    breakpoints: list[int], common_intervals: list[tuple[int, int]]) -> list[int]:
    """Insert common-CNV interval boundaries into a breakpoint list
    (Segmentation.cs:185-218).  Both in bin-index space."""
    new_bps: list[int] = []
    index = 0
    length = len(common_intervals)
    for bp in breakpoints:
        while index < length:
            start, end = common_intervals[index]
            if bp <= start:
                new_bps.append(bp)
                break
            if start < bp < end:
                new_bps.append(start)
                new_bps.append(end)
                index += 1
                break
            if bp >= end:
                new_bps.append(start)
                new_bps.append(end)
                index += 1
        if index > length:
            new_bps.append(bp)
    return new_bps


@dataclass
class BinnedSegment:
    """A numbered segment with its member bin indices (SegmentWithBins)."""
    identifier: int
    bin_indices: list[int]


def post_process_segments(
    span_starts_by_contig: dict[str, set[int]],
    span_ends_by_contig: dict[str, set[int]],
    bin_start: dict[str, np.ndarray],
    bin_end: dict[str, np.ndarray],
    excluded_by_contig: dict[str, list[tuple[int, int]]] | None = None,
    max_inter_bin_dist: int = 1_000_000,
    ploidy_breaks_by_contig: dict[str, np.ndarray] | None = None,
) -> dict[str, list[BinnedSegment]]:
    """Group bins into numbered segments (SegmentationResultsProcessor.cs).

    A new segment starts at bin b when any of:
      * a segmentation span starts at bin_start[b];
      * the midpoint of the next forbidden interval lies in
        (previousBinEnd, binEnd];
      * previousBinEnd + max_inter_bin_dist < binStart (and prev end > 0);
      * reference ploidy is non-uniform over (previousBinEnd, binEnd]
        (1-based inclusive interval).
    Segment numbering is global across contigs, starting at 0 via the first
    new-segment trigger (the counter starts at -1).
    """
    excluded_by_contig = excluded_by_contig or {}
    ploidy_breaks_by_contig = ploidy_breaks_by_contig or {}
    seg_num = -1
    out: dict[str, list[BinnedSegment]] = {}
    for contig in bin_start:
        starts = span_starts_by_contig.get(contig, set())
        excl = excluded_by_contig.get(contig, [])
        pl_breaks = np.asarray(sorted(ploidy_breaks_by_contig.get(contig, [])),
                               dtype=np.int64)
        s_arr = np.asarray(bin_start[contig], dtype=np.int64)
        e_arr = np.asarray(bin_end[contig], dtype=np.int64)
        n = len(s_arr)
        if n == 0:
            out[contig] = []
            continue
        prev_end = np.concatenate([[0], e_arr[:-1]])

        # span starts
        starts_sorted = np.fromiter(sorted(starts), dtype=np.int64,
                                    count=len(starts))
        new_seg = np.isin(s_arr, starts_sorted) if len(starts_sorted) \
            else np.zeros(n, dtype=bool)
        # forbidden-interval midpoints: the sequential pointer rests on the
        # first interval with end >= prev_end (prev_end is monotone), which
        # equals a searchsorted when interval ends are non-decreasing
        if excl:
            ends_excl = np.asarray([iv[1] for iv in excl], dtype=np.int64)
            mids = np.asarray([(iv[0] + iv[1]) // 2 for iv in excl],
                              dtype=np.int64)
            if np.all(np.diff(ends_excl) >= 0):
                act = np.searchsorted(ends_excl, prev_end, side="left")
            else:   # nested/odd bed: walk the pointer like the reference
                act = np.empty(n, dtype=np.int64)
                p = 0
                for b in range(n):
                    while p < len(excl) and ends_excl[p] < prev_end[b]:
                        p += 1
                    act[b] = p
            valid = act < len(excl)
            mid = mids[np.minimum(act, len(excl) - 1)]
            new_seg |= valid & (prev_end < mid) & (mid <= e_arr)
        # inter-bin gap
        if max_inter_bin_dist >= 0:
            new_seg |= (prev_end > 0) & (prev_end + max_inter_bin_dist
                                         < s_arr)
        # reference-ploidy change over (prev_end or 1, binEnd]
        if pl_breaks.size:
            lo = np.where(prev_end > 0, prev_end, 1)
            cnt = (np.searchsorted(pl_breaks, e_arr, side="right")
                   - np.searchsorted(pl_breaks, lo, side="right"))
            new_seg |= cnt > 0

        bound = new_seg.copy()
        bound[0] = True
        gs = np.flatnonzero(bound)
        ge = np.concatenate([gs[1:], [n]])
        # a group takes a fresh number iff its first bin triggered
        # new_seg; an untriggered first-of-contig group keeps the current
        # counter (the scalar code's `elif current is None` branch)
        ids = seg_num + np.cumsum(new_seg[gs])
        segs = [BinnedSegment(int(i), list(range(a, b)))
                for i, a, b in zip(ids, gs, ge)]
        seg_num = int(ids[-1]) if len(ids) else seg_num
        out[contig] = segs
    return out


def write_partitioned(
    path: str | Path,
    segments_by_contig: dict[str, list[BinnedSegment]],
    bin_start: dict[str, np.ndarray],
    bin_end: dict[str, np.ndarray],
    coverage: dict[str, np.ndarray],
) -> None:
    """Write 'chr start end coverage segID' rows (Segmentation.cs:235-252)."""
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(str(path), "wt") as f:
        for contig, segs in segments_by_contig.items():
            for seg in segs:
                for b in seg.bin_indices:
                    f.write(f"{contig}\t{bin_start[contig][b]}\t{bin_end[contig][b]}"
                            f"\t{coverage[contig][b]}\t{seg.identifier}\n")


def read_partitioned(path: str | Path):
    """Read the partitioned file back: contig -> (start, end, cov, seg_id)."""
    opener = gzip.open if str(path).endswith(".gz") else open
    data: dict[str, list[tuple[int, int, float, int]]] = {}
    with opener(str(path), "rt") as f:
        for line in f:
            c, s, e, cov, sid = line.rstrip("\n").split("\t")
            data.setdefault(c, []).append((int(s), int(e), float(cov), int(sid)))
    out = {}
    for c, rows in data.items():
        arr = np.array(rows, dtype=np.float64)
        out[c] = (arr[:, 0].astype(np.int64), arr[:, 1].astype(np.int64),
                  arr[:, 2].astype(np.float32), arr[:, 3].astype(np.int64))
    return out
