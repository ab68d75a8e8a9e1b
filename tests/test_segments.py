"""Segment derivation / splitting / post-processing semantics."""

import numpy as np

from canvas_tpu.ops import segments as seg


def test_derive_segments_end_convention():
    starts = np.arange(0, 2000, 100)
    ends = starts + 100
    spans = seg.derive_segments([0, 5, 12], 20, starts, ends)
    # seg0: bins 0..4 -> but reference end bin = breakpoints[1]-1 = 4
    assert spans[0] == seg.Span(0, 500)
    assert spans[1] == seg.Span(500, 1200)
    assert spans[2] == seg.Span(1200, 2000)


def test_derive_segments_small_chromosome():
    starts = np.arange(0, 500, 100)
    ends = starts + 100
    spans = seg.derive_segments([0, 2], 5, starts, ends)  # n_bins <= 10
    assert spans == [seg.Span(0, 500)]


def test_split_overlapping_segments():
    a = [seg.Span(0, 100), seg.Span(100, 200)]
    b = [seg.Span(0, 150), seg.Span(150, 200)]
    out = seg.split_overlapping_segments([a, b])
    assert out == [seg.Span(0, 100), seg.Span(100, 150), seg.Span(150, 200)]


def test_split_single_sample_passthrough():
    a = [seg.Span(0, 10)]
    assert seg.split_overlapping_segments([a]) is a


def test_overlap_common_regions():
    bps = [0, 10, 50]
    common = [(20, 30)]
    out = seg.overlap_common_regions(bps, common)
    # reference quirk (Segmentation.cs:207-216): a breakpoint past the last
    # common interval is dropped because `index > length` never holds
    assert out == [0, 10, 20, 30]
    # breakpoint inside a common interval snaps to its boundaries
    assert seg.overlap_common_regions([0, 25], [(20, 30)]) == [0, 20, 30]


def test_post_process_new_segment_on_span_start():
    bin_start = {"chr1": np.array([0, 100, 200, 300])}
    bin_end = {"chr1": np.array([100, 200, 300, 400])}
    got = seg.post_process_segments(
        {"chr1": {0, 200}}, {}, bin_start, bin_end)
    segs = got["chr1"]
    assert [s.bin_indices for s in segs] == [[0, 1], [2, 3]]
    assert [s.identifier for s in segs] == [0, 1]


def test_post_process_forbidden_midpoint_break():
    bin_start = {"chr1": np.array([0, 100, 5000, 5100])}
    bin_end = {"chr1": np.array([100, 200, 5100, 5200])}
    got = seg.post_process_segments(
        {"chr1": {0}}, {}, bin_start, bin_end,
        excluded_by_contig={"chr1": [(200, 5000)]},
        max_inter_bin_dist=1_000_000)
    segs = got["chr1"]
    # midpoint 2600 falls in (200, 5100] -> new segment at bin 2
    assert [s.bin_indices for s in segs] == [[0, 1], [2, 3]]


def test_post_process_max_gap_break():
    bin_start = {"chr1": np.array([0, 100, 2_000_000])}
    bin_end = {"chr1": np.array([100, 200, 2_000_100])}
    got = seg.post_process_segments(
        {"chr1": {0}}, {}, bin_start, bin_end, max_inter_bin_dist=1000)
    assert [s.bin_indices for s in got["chr1"]] == [[0, 1], [2]]


def test_segment_numbering_across_contigs():
    bin_start = {"chr1": np.array([0]), "chr2": np.array([0])}
    bin_end = {"chr1": np.array([100]), "chr2": np.array([100])}
    got = seg.post_process_segments(
        {"chr1": {0}, "chr2": {0}}, {}, bin_start, bin_end)
    assert got["chr1"][0].identifier == 0
    assert got["chr2"][0].identifier == 1


def test_partitioned_roundtrip(tmp_path):
    bin_start = {"chr1": np.array([0, 100])}
    bin_end = {"chr1": np.array([100, 200])}
    cov = {"chr1": np.array([5.0, 7.0], dtype=np.float32)}
    segs = seg.post_process_segments({"chr1": {0}}, {}, bin_start, bin_end)
    p = tmp_path / "part.tsv.gz"
    seg.write_partitioned(p, segs, bin_start, bin_end, cov)
    back = seg.read_partitioned(p)
    np.testing.assert_array_equal(back["chr1"][0], [0, 100])
    np.testing.assert_array_equal(back["chr1"][3], [0, 0])


def test_merge_excluded_intervals_blocks_bridging():
    from canvas_tpu.models.segment_model import (
        Segment, merge_segments_using_excluded_intervals)

    def seg(begin, end, cn, q):
        s = Segment("chr1", begin, end,
                    np.full(max(1, (end - begin) // 1000), 10.0, np.float32))
        s.copy_number = cn
        s.qscore = q
        return s

    # same-CN neighbors merge freely without exclusions...
    a = [seg(0, 50_000, 2, 30), seg(50_000, 100_000, 2, 30)]
    out = merge_segments_using_excluded_intervals(a, 10, None)
    assert len(out) == 1 and out[0].end == 100_000

    # ...but an excluded interval between them blocks the merge; note the
    # reference tests interval ENDPOINTS against [end, begin]
    # (CanvasSegment.cs:759-760), so an endpoint must fall in the junction
    b = [seg(0, 50_000, 2, 30), seg(50_000, 100_000, 2, 30)]
    excl = {"chr1": [(50_000, 51_000)]}
    out = merge_segments_using_excluded_intervals(b, 10, excl)
    assert len(out) == 2

    # short segment assimilates into the higher-q neighbor; the look-back
    # never reaches index 0 (the reference's `checkIndex > 0` quirk,
    # CanvasSegment.cs:882), so the left neighbor here is index 1
    c = [seg(0, 30_000, 5, 40), seg(30_000, 50_000, 2, 40),
         seg(50_000, 50_005, 4, 1), seg(50_005, 100_000, 3, 10)]
    out = merge_segments_using_excluded_intervals(c, 10_000, None)
    assert [s.copy_number for s in out] == [5, 2, 3]
    assert out[1].end == 50_005  # swallowed by the left (q 40 >= 10)

    # ...unless the excluded interval sits between it and the left neighbor
    d = [seg(0, 30_000, 5, 40), seg(30_000, 50_000, 2, 40),
         seg(50_000, 50_005, 4, 1), seg(50_005, 100_000, 3, 10)]
    out = merge_segments_using_excluded_intervals(d, 10_000, excl)
    assert [s.copy_number for s in out] == [5, 2, 3]
    assert out[2].begin == 50_000  # swallowed by the right instead

    # index-0 quirk itself: a short segment at index 1 can only merge right
    e = [seg(0, 50_000, 2, 40), seg(50_000, 50_005, 4, 1),
         seg(50_005, 100_000, 3, 10)]
    out = merge_segments_using_excluded_intervals(e, 10_000, None)
    assert [s.copy_number for s in out] == [2, 3]
    assert out[1].begin == 50_000


def test_filter_bed_masks_possible(tmp_path):
    from canvas_tpu.io.bed import load_bed_intervals, is_forbidden_interval

    bed = tmp_path / "f.bed"
    bed.write_text("chr1\t100\t200\nchr1\t500\t600\nchr2\t0\t50\n")
    ivals = load_bed_intervals(bed)
    assert ivals == {"chr1": [(100, 200), (500, 600)], "chr2": [(0, 50)]}
    assert is_forbidden_interval("chr1", 150, 300, ivals)      # start inside
    assert is_forbidden_interval("chr1", 0, 100, ivals)        # endpoint touch
    assert not is_forbidden_interval("chr1", 201, 499, ivals)
    assert not is_forbidden_interval("chr3", 0, 1000, ivals)


def test_merge_segments_multisample_alignment():
    from canvas_tpu.models.segment_model import (
        Segment, merge_segments_multisample)

    def seg(begin, end, cn, q):
        s = Segment("chr1", begin, end,
                    np.full(max(1, (end - begin) // 1000), 5.0, np.float32))
        s.copy_number = cn
        s.qscore = q
        return s

    # 4 aligned segments; samples agree on CN for the first two only
    a = [seg(0, 30_000, 2, 40), seg(30_000, 60_000, 2, 35),
         seg(60_000, 90_000, 3, 30), seg(90_000, 120_000, 2, 30)]
    b = [seg(0, 30_000, 2, 40), seg(30_000, 60_000, 2, 35),
         seg(60_000, 90_000, 2, 30), seg(90_000, 120_000, 2, 30)]
    out = merge_segments_multisample({"s1": a, "s2": b}, 2000, 10)
    # segments 0+1 merge (same CN vector [2,2]); 2 ([3,2]) and 3 ([2,2])
    # stay apart because adjacent vectors differ at each junction
    assert [(s.begin, s.end) for s in out["s1"]] == \
        [(0, 60_000), (60_000, 90_000), (90_000, 120_000)]
    assert [(s.begin, s.end) for s in out["s1"]] == \
        [(s.begin, s.end) for s in out["s2"]]
    # short segment (below min call size) assimilates into a neighbor in
    # every sample identically
    c = [seg(0, 30_000, 2, 40), seg(30_000, 30_500, 4, 1),
         seg(30_500, 60_000, 3, 10)]
    d = [seg(0, 30_000, 2, 40), seg(30_000, 30_500, 4, 1),
         seg(30_500, 60_000, 3, 10)]
    out = merge_segments_multisample({"s1": c, "s2": d}, 2000, 10)
    assert [(s.begin, s.end) for s in out["s1"]] == \
        [(0, 30_500), (30_500, 60_000)]
    assert [(s.begin, s.end) for s in out["s2"]] == \
        [(0, 30_500), (30_500, 60_000)]


def _post_process_oracle(span_starts, span_ends, bin_start, bin_end,
                         excluded=None, max_dist=1_000_000, pl=None):
    """The sequential per-bin grouping (SegmentationResultsProcessor.cs)."""
    excluded = excluded or {}
    pl = pl or {}
    seg_num = -1
    out = {}
    for contig in bin_start:
        starts = span_starts.get(contig, set())
        excl = excluded.get(contig, [])
        pl_breaks = np.asarray(pl.get(contig, []), dtype=np.int64)
        segs, current, excl_idx, prev_end = [], None, 0, 0
        for b in range(len(bin_start[contig])):
            s, e = int(bin_start[contig][b]), int(bin_end[contig][b])
            new_seg = s in starts
            while excl_idx < len(excl) and excl[excl_idx][1] < prev_end:
                excl_idx += 1
            if excl_idx < len(excl):
                mid = (excl[excl_idx][0] + excl[excl_idx][1]) // 2
                if prev_end < mid <= e:
                    new_seg = True
            if prev_end > 0 and max_dist >= 0 and prev_end + max_dist < s \
                    and not new_seg:
                new_seg = True
            if not new_seg and pl_breaks.size:
                lo = prev_end if prev_end > 0 else 1
                if np.any((pl_breaks > lo) & (pl_breaks <= e)):
                    new_seg = True
            if new_seg:
                seg_num += 1
                current = seg.BinnedSegment(seg_num, [b])
                segs.append(current)
            elif current is None:
                current = seg.BinnedSegment(seg_num, [b])
                segs.append(current)
            else:
                current.bin_indices.append(b)
            prev_end = e
        out[contig] = segs
    return out


def test_post_process_matches_sequential_oracle():
    rng = np.random.default_rng(3)
    for trial in range(5):
        bin_start, bin_end, spans, excl, pl = {}, {}, {}, {}, {}
        for contig in ("chr1", "chr2"):
            n = int(rng.integers(50, 300))
            widths = rng.integers(50, 400, n)
            gaps = rng.choice([0, 0, 0, 2_000_000], n)
            starts = np.cumsum(widths + gaps) - widths
            bin_start[contig] = starts
            bin_end[contig] = starts + widths
            spans[contig] = set(
                int(starts[i]) for i in rng.choice(n, 5, replace=False))
            mid = int(starts[n // 2])
            excl[contig] = [(mid, mid + 100), (mid + 5_000, mid + 6_000)]
            pl[contig] = [int(starts[n // 3]) + 1]
        got = seg.post_process_segments(
            spans, {}, bin_start, bin_end, excluded_by_contig=excl,
            max_inter_bin_dist=1_000_000, ploidy_breaks_by_contig=pl)
        want = _post_process_oracle(spans, {}, bin_start, bin_end,
                                    excluded=excl, pl=pl)
        for contig in bin_start:
            assert [(s.identifier, s.bin_indices) for s in got[contig]] == \
                [(s.identifier, s.bin_indices) for s in want[contig]], \
                (trial, contig)
