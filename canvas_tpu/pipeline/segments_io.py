"""Partitioned-file -> caller Segment objects (CanvasCommon/Segments.cs).

Builds Segment records from the partitioned bin rows, with start/end
confidence intervals from flanking-bin half-lengths (Segments.cs:82-105:
adjacent touching bins give (-halfLen(prev), +halfLen(this)) around the
boundary; otherwise +/- halfLen of the edge bin), and attaches b-allele
counts per segment interval (AddAlleles :146-158)."""

from __future__ import annotations

import numpy as np

from canvas_tpu.models.segment_model import Segment
from canvas_tpu.ops.segments import read_partitioned


def _half_length(start: int, end: int) -> int:
    # C# Math.Round(x, MidpointRounding.AwayFromZero)
    return int(np.floor((end - start) / 2.0 + 0.5))


def segments_from_rows(chrom, start, end, cov, seg_id) -> list[Segment]:
    """Group bin rows by adjacent segment id into Segment objects."""
    start = np.asarray(start)
    end = np.asarray(end)
    seg_id = np.asarray(seg_id)
    boundaries = np.flatnonzero(np.diff(seg_id)) + 1
    lows = np.concatenate([[0], boundaries])
    highs = np.concatenate([boundaries, [len(seg_id)]])
    segs: list[Segment] = []
    for gi, (lo, hi) in enumerate(zip(lows, highs)):
        first_s, first_e = int(start[lo]), int(end[lo])
        last_s, last_e = int(start[hi - 1]), int(end[hi - 1])
        if gi > 0:
            phi = int(highs[gi - 1])
            prev_s, prev_e = int(start[phi - 1]), int(end[phi - 1])
            if prev_e == first_s:
                start_ci = (-_half_length(prev_s, prev_e),
                            _half_length(first_s, first_e))
            else:
                h = _half_length(first_s, first_e)
                start_ci = (-h, h)
        else:
            h = _half_length(first_s, first_e)
            start_ci = (-h, h)
        if gi < len(lows) - 1:
            nlo = int(lows[gi + 1])
            next_s, next_e = int(start[nlo]), int(end[nlo])
            if last_e == next_s:
                end_ci = (-_half_length(last_s, last_e),
                          _half_length(next_s, next_e))
            else:
                h = _half_length(last_s, last_e)
                end_ci = (-h, h)
        else:
            h = _half_length(last_s, last_e)
            end_ci = (-h, h)
        segs.append(Segment(chrom, int(start[lo]), int(end[hi - 1]),
                            np.asarray(cov[lo:hi], np.float32),
                            bin_starts=start[lo:hi].copy(),
                            bin_ends=end[lo:hi].copy(),
                            start_ci=start_ci, end_ci=end_ci))
    return segs


def segments_from_partitioned(path) -> dict[str, list[Segment]]:
    """Read a 'chr start end coverage segID' file into per-contig Segment
    lists with confidence intervals (Segments.ReadSegments)."""
    data = read_partitioned(path)
    return {chrom: segments_from_rows(chrom, s, e, c, i)
            for chrom, (s, e, c, i) in data.items()}


def add_alleles(
    segments_by_chrom: dict[str, list[Segment]],
    frequencies_by_chrom: dict[str, list[list[tuple[int, int, int]]]],
) -> None:
    """Attach (pos, countRef, countAlt) lists to segments (AddAlleles).

    Frequency = countAlt / total; CountsA/B = max/min (the Ballele
    convention)."""
    for chrom, segs in segments_by_chrom.items():
        if chrom not in frequencies_by_chrom:
            continue
        for seg, alleles in zip(segs, frequencies_by_chrom[chrom]):
            if not alleles:
                continue
            arr = np.asarray(alleles, dtype=np.int64)
            ref, alt = arr[:, 1], arr[:, 2]
            total = ref + alt
            seg.baf_positions = arr[:, 0].copy()
            seg.baf_frequencies = (alt / np.maximum(total, 1)).astype(np.float32)
            seg.baf_total_coverage = total.astype(np.int32)
            seg.baf_count_a = np.maximum(ref, alt).astype(np.int32)
            seg.baf_count_b = np.minimum(ref, alt).astype(np.int32)


def segment_intervals(segments_by_chrom: dict[str, list[Segment]]
                      ) -> dict[str, list[tuple[int, int]]]:
    """Segments.IntervalsByChromosome — for the VF-file interval mapping."""
    return {chrom: [(s.begin, s.end) for s in segs]
            for chrom, segs in segments_by_chrom.items()}
