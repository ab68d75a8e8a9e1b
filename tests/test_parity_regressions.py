"""Regression tests pinning the four round-1 parity bugs against
reference semantics (VERDICT.md round 1, 'weak' items 1-3 + 'missing' 4).

Each test asserts the *reference's* behavior, with the controlling
reference file cited, so a future refactor cannot silently revert."""

import numpy as np

from canvas_tpu.io.bins import BinSet
from canvas_tpu.genome.contigs import ContigTable
from canvas_tpu.models import somatic, pedigree, diploid
from canvas_tpu.ops import normalize, segments as segops


def test_somatic_minimum_call_size_is_shipped_json_value():
    """SomaticCallerParameters.json 'MinimumCallSize': '50000' is
    deserialized over the code default of 10
    (CanvasSomaticCaller/Program.cs:157-163)."""
    assert somatic.MINIMUM_CALL_SIZE == 50000


def test_pedigree_minimum_call_size_matches_json():
    """PedigreeCallerParameters.json 'MinimumCallSize': 2000."""
    assert pedigree.MINIMUM_CALL_SIZE == 2000


def _binset(counts, gcs, contig_ids=None, bin_size=100):
    n = len(counts)
    contigs = ContigTable(["chr1", "chr2"], [10 ** 9, 10 ** 9])
    cid = np.asarray(contig_ids if contig_ids is not None
                     else np.zeros(n, np.int32), dtype=np.int32)
    # per-contig running starts
    start = np.zeros(n, np.int64)
    for c in np.unique(cid):
        idx = np.where(cid == c)[0]
        start[idx] = np.arange(len(idx)) * bin_size
    return BinSet(
        contigs=contigs,
        contig_id=cid,
        start=start,
        end=start + bin_size,
        count=np.asarray(counts, np.float32),
        gc=np.asarray(gcs, np.int32),
    )


def test_ffpe_strip_applies_after_extreme_gc_removal():
    """CanvasClean stores CountDeviation on each bin object
    (CanvasClean.cs:289-292) so RemoveBinsWithExtremeLocalSD (:308-322)
    still strips high-deviation bins after RemoveBinsWithExtremeGC dropped
    others.  Round 1 silently no-opped when lengths diverged."""
    rng = np.random.default_rng(7)
    n = 60_000
    # plenty of bins at GC 40..60; a rare GC value (5) that extreme-GC strips
    gcs = rng.integers(40, 61, size=n).astype(np.int32)
    rare = rng.choice(n, size=10, replace=False)
    gcs[rare] = 5
    # smoothly varying dispersion: window SD = sqrt(2*lam) stays below the
    # 2*20 strip cutoff but varies enough that the MAD of window SDs
    # (the localSd average) clears the >5.0 strip gate
    lam = 360 + 340 * np.sin(np.arange(n) * 2 * np.pi / 4000)
    counts = rng.poisson(lam).astype(np.float32)
    # make one 20-bin window wildly noisy so its local SD >> 40
    noisy = slice(1000, 1020)
    counts[noisy] = rng.choice([0, 40000], size=20).astype(np.float32)
    bins = _binset(counts, gcs)

    cleaned, local_sd = normalize.clean(
        bins, do_size_filter=False, do_outlier_removal=False,
        do_gc_norm=True, mode="MedianByGC", compute_local_sd=True)
    assert local_sd is not None and local_sd > 5.0
    # the rare-GC bins must be gone (extreme GC strip)...
    assert not np.any(cleaned.gc == 5)
    # ...and the noisy FFPE window must ALSO be gone (the round-1 bug kept it)
    survived_noisy = np.sum(
        (cleaned.contig_id == 0)
        & (cleaned.start >= 1000 * 100) & (cleaned.start < 1020 * 100))
    assert survived_noisy == 0
    # sanity: most normal bins survive
    assert len(cleaned) > 0.85 * n


def test_diploid_mean_allele_coverage_shifts_balanced_maf():
    """MeanCoverage comes from the VF file's per-site total depth
    (CanvasDiploidCaller.cs:298), not a constant 30; the balanced-CN MAF
    model must move with it (Utilities.cs:948-955)."""
    m30 = diploid.initialize_ploidies(30.0)
    m80 = diploid.initialize_ploidies(80.0)
    balanced30 = [m for m in m30 if m.copy_number == 2 and m.major_count == 1]
    balanced80 = [m for m in m80 if m.copy_number == 2 and m.major_count == 1]
    assert balanced30[0].maf != balanced80[0].maf
    # EstimateDiploidMAF(2, 80) = 0.5 - 1/(3.352 * 80^0.4747)
    expect = 0.5 - 1.0 / (3.352 * 80.0 ** 0.4747)
    assert abs(balanced80[0].maf - expect) < 1e-12


def test_forbidden_interval_midpoint_forces_segment_break():
    """SegmentationResultsProcessor.cs:95-110: a forbidden interval whose
    midpoint falls between previousBinEnd and binEnd starts a new segment
    even when the segmentation spans are continuous."""
    bin_start = {"chr1": np.array([0, 100, 5000, 5100], np.int64)}
    bin_end = {"chr1": np.array([100, 200, 5100, 5200], np.int64)}
    span_starts = {"chr1": {0}}  # one continuous span: no segmentation break
    excluded = {"chr1": [(200, 5000)]}  # centromere-like gap, midpoint 2600
    with_excl = segops.post_process_segments(
        span_starts, {}, bin_start, bin_end, excluded_by_contig=excluded,
        max_inter_bin_dist=10 ** 9)
    without = segops.post_process_segments(
        span_starts, {}, bin_start, bin_end, excluded_by_contig=None,
        max_inter_bin_dist=10 ** 9)
    assert len(without["chr1"]) == 1
    assert len(with_excl["chr1"]) == 2
    assert list(with_excl["chr1"][0].bin_indices) == [0, 1]
    assert list(with_excl["chr1"][1].bin_indices) == [2, 3]


def test_intersect_bins_uses_full_keys():
    """Utilities.cs:834 intersects on (chrom, start, end); under mixed bin
    sizes a shared start with different ends must NOT survive."""
    from canvas_tpu.pipeline.runner import intersect_bins

    contigs = ContigTable(["chr1"], [10 ** 6])
    def mk(starts, ends):
        n = len(starts)
        return BinSet(contigs, np.zeros(n, np.int32),
                      np.asarray(starts, np.int64), np.asarray(ends, np.int64),
                      np.full(n, 50, np.int32), np.ones(n, np.float32))
    a = mk([0, 100, 200], [100, 200, 300])
    b = mk([0, 100, 200], [100, 150, 300])   # bin 1 differs in end only
    out = intersect_bins({"a": a, "b": b})
    assert list(out["a"].start) == [0, 200]
    assert list(out["b"].start) == [0, 200]
