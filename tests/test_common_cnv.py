"""Common-CNV SetA/SetB segmentation tests."""

import numpy as np
import pytest

from canvas_tpu.models import common_cnv as cc
from canvas_tpu.models.pedigree import CopyNumberModel, SampleStats
from canvas_tpu.models.segment_model import Segment


def make_seg(chrom, begin, end, mean=100.0, bin_size=1000):
    starts = np.arange(begin, end, bin_size)
    ends = np.minimum(starts + bin_size, end)
    rng = np.random.default_rng(begin)
    return Segment(chrom, begin, end,
                   rng.poisson(mean, len(starts)).astype(np.float32),
                   bin_starts=starts, bin_ends=ends)


def test_common_within_canvas():
    canvas = [make_seg("chr1", 0, 100_000)]
    common = [make_seg("chr1", 30_000, 60_000)]
    common[0].is_common_cnv = True
    regions = cc.merge_common_cnv_segments(canvas, common)
    assert len(regions) == 1
    r = regions[0]
    assert [s.begin for s in r.set_a] == [0]
    # set B: left flank, common, right flank
    assert [(s.begin, s.end) for s in r.set_b] == [
        (0, 30_000), (30_000, 60_000), (60_000, 100_000)]


def test_no_overlap_passthrough():
    canvas = [make_seg("chr1", 0, 10_000), make_seg("chr1", 50_000, 60_000)]
    common = [make_seg("chr1", 20_000, 30_000)]
    regions = cc.merge_common_cnv_segments(canvas, common)
    kinds = [("A" if r.set_b is None else "B") for r in regions]
    assert kinds == ["A", "B", "A"]


def test_identical_coordinates_prefers_common():
    canvas = [make_seg("chr1", 10_000, 20_000)]
    common = [make_seg("chr1", 10_000, 20_000)]
    regions = cc.merge_common_cnv_segments(canvas, common)
    assert len(regions) == 1
    assert regions[0].set_a is None
    assert regions[0].set_b[0].begin == 10_000


def test_small_common_skipped():
    canvas = [make_seg("chr1", 0, 100_000)]
    common = [make_seg("chr1", 30_000, 30_500)]  # < 2*window threshold
    regions = cc.merge_common_cnv_segments(canvas, common)
    assert all(r.set_b is None for r in regions)


def test_choose_best_sets_semantics(rng):
    """The reference's set criterion sums per-segment max log likelihoods,
    which favors the coarser SetA unless SetB is forced (no SetA) — a
    matched-boundary common CNV goes through the forced-B path instead."""
    begin, end = 0, 90_000
    starts = np.arange(begin, end, 1000)
    ends = starts + 1000
    counts = rng.poisson(100, len(starts)).astype(np.float32)
    cnv = (starts >= 22_000) & (starts < 67_000)
    counts[cnv] = rng.poisson(50, cnv.sum())
    canvas_seg = Segment("chr1", begin, end, counts,
                         bin_starts=starts, bin_ends=ends)
    common = cc.common_segments_from_bed(
        [(22_000, 67_000)], "chr1", starts, ends, counts)
    regions = {"s1": cc.merge_common_cnv_segments([canvas_seg], common)}
    r = regions["s1"][0]
    assert [(s.begin, s.end) for s in r.set_b] == [
        (0, 22_000), (22_000, 67_000), (67_000, 90_000)]
    seg_for_stats = [make_seg("chr1", 0, 200_000, 100.0)]
    stats = {"s1": SampleStats.from_segments(seg_for_stats)}
    models = {"s1": CopyNumberModel(5, stats["s1"].max_coverage,
                                    stats["s1"].mean_coverage, 60.0)}
    cc.choose_best_sets(regions, stats, models, 5)
    # fewer segments sum fewer negative log terms -> SetA (reference math)
    assert regions["s1"][0].selected == "A"

    # forced SetB: a region with no SetA (e.g. boundary-matched common CNV)
    forced = {"s1": [cc.OverlappingRegion(None, [common[0]])]}
    cc.choose_best_sets(forced, stats, models, 5)
    assert forced["s1"][0].selected == "B"
    final = cc.resolve_regions(forced["s1"])
    assert final[0].is_common_cnv


def test_choose_best_sets_rejects_unsupported_split(rng):
    """Uniform coverage should keep the partitioner's SetA."""
    begin, end = 0, 90_000
    starts = np.arange(begin, end, 1000)
    ends = starts + 1000
    counts = rng.poisson(100, len(starts)).astype(np.float32)
    canvas_seg = Segment("chr1", begin, end, counts,
                         bin_starts=starts, bin_ends=ends)
    common = cc.common_segments_from_bed(
        [(30_000, 60_000)], "chr1", starts, ends, counts)
    regions = {"s1": cc.merge_common_cnv_segments([canvas_seg], common)}
    seg_for_stats = [make_seg("chr1", 0, 200_000, 100.0)]
    stats = {"s1": SampleStats.from_segments(seg_for_stats)}
    models = {"s1": CopyNumberModel(5, stats["s1"].max_coverage,
                                    stats["s1"].mean_coverage, 60.0)}
    cc.choose_best_sets(regions, stats, models, 5)
    final = cc.resolve_regions(regions["s1"])
    # either SetA (1 segment) or the likelihoods tie; SetA expected
    assert regions["s1"][0].selected == "A"
    assert len(final) == 1
