"""CanvasSegment equivalent: the caller-facing segment record.

Host-side bookkeeping over the (few thousand) segments; bulk per-segment
statistics are computed on device by the callers.  Semantics mirror
CanvasCommon/CanvasSegment.cs and CanvasFilter.cs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from canvas_tpu.ops import stats

SEGMENT_SIZE_CUTOFF = 10000  # CanvasFilter.cs:10
PASS = "PASS"


# CnvType enum (CnvType.cs)
GAIN = "Gain"
LOSS = "Loss"
LOH = "LossOfHeterozygosity"
REF = "Reference"
COMPLEX = "ComplexCnv"

_VCF_ID = {GAIN: "GAIN", LOSS: "LOSS", REF: "REF", LOH: "LOH",
           COMPLEX: "COMPLEXCNV"}
_SV_TYPE = {GAIN: "CNV", LOSS: "CNV", COMPLEX: "CNV", LOH: "LOH"}

INT_MAX = 2147483647  # <DUP> sentinel allele copy number


def cnv_size_filter(minimum_size: int) -> str:
    """L10kb-style size filter name (CanvasFilter.cs:46-65)."""
    if minimum_size % 1_000_000 == 0:
        return f"L{minimum_size // 1_000_000}Mb"
    if minimum_size % 1000 == 0:
        return f"L{minimum_size // 1000}kb"
    return f"L{minimum_size}bp"


def cnv_size_filter_threshold(minimum_size: int) -> tuple[int, str]:
    if minimum_size % 1_000_000 == 0:
        return minimum_size // 1_000_000, "Mb"
    if minimum_size % 1000 == 0:
        return minimum_size // 1000, "kb"
    return minimum_size, "bp"


@dataclass
class Segment:
    """One called segment for one sample."""

    chrom: str
    begin: int           # 0-based inclusive
    end: int             # 0-based exclusive
    bin_counts: np.ndarray       # float32 coverage of member bins
    bin_starts: np.ndarray | None = None
    bin_ends: np.ndarray | None = None
    baf_frequencies: np.ndarray = field(
        default_factory=lambda: np.zeros(0, np.float32))
    baf_positions: np.ndarray = field(
        default_factory=lambda: np.zeros(0, np.int64))
    baf_total_coverage: np.ndarray = field(
        default_factory=lambda: np.zeros(0, np.int32))
    baf_count_a: np.ndarray = field(
        default_factory=lambda: np.zeros(0, np.int32))
    baf_count_b: np.ndarray = field(
        default_factory=lambda: np.zeros(0, np.int32))
    copy_number: int = -1
    second_best_copy_number: int = -1
    major_chromosome_count: int | None = None
    mcc_score: float | None = None
    qscore: float = 0.0
    dq_score: float | None = None
    model_distance: float = 0.0
    runner_up_model_distance: float = 0.0
    is_heterogeneous: bool = False
    is_common_cnv: bool = False
    filter_tags: list[str] = field(default_factory=list)
    start_ci: tuple[int, int] | None = None
    end_ci: tuple[int, int] | None = None

    # -- basic properties --------------------------------------------------

    @property
    def length(self) -> int:
        return self.end - self.begin

    @property
    def bin_count(self) -> int:
        return len(self.bin_counts)

    @property
    def mean_count(self) -> float:
        return float(np.sum(self.bin_counts, dtype=np.float64) / self.bin_count)

    @property
    def median_count(self) -> float:
        return stats.median(self.bin_counts)

    def truncated_median_count(self, bins_to_remove: int) -> float:
        """Median excluding flanking bins when >5 remain
        (CanvasSegment.cs:269-278)."""
        start, end = bins_to_remove, self.bin_count - bins_to_remove
        if end - start > 5:
            return stats.median(self.bin_counts[start:end])
        return stats.median(self.bin_counts)

    @property
    def filter_string(self) -> str:
        tags = [t for t in self.filter_tags if t != PASS]
        return PASS if not tags else ";".join(tags)

    @property
    def is_pass(self) -> bool:
        return self.filter_string == PASS

    # -- CNV typing (CanvasSegment.cs:280-312) -----------------------------

    def cnv_type_and_allele_copy_numbers(self, reference_cn: int = 2):
        if reference_cn > 2:
            raise ValueError("Reference copy number > 2 is not supported")
        cn, mcc = self.copy_number, self.major_chromosome_count
        if cn == reference_cn:
            if reference_cn == 1:
                return REF, [1]
            if reference_cn == 2 and mcc is not None:
                if mcc == 2:
                    return LOH, [0, reference_cn]
                return REF, [1, 1]
            return REF, [-1] * max(1, reference_cn)
        if cn > reference_cn:
            if reference_cn == 1:
                return GAIN, [cn]
            if reference_cn == 2:
                if mcc is not None:
                    return GAIN, [cn - mcc, mcc]
                return GAIN, [-1, INT_MAX]
            return GAIN, [-1] * max(1, reference_cn)
        if cn == 0:
            return LOSS, [0] * reference_cn
        return LOSS, [0, 1]

    # -- merging (CanvasSegment.MergeIn, :318-334) -------------------------

    def merge_in(self, other: "Segment") -> None:
        if other.begin < self.begin:
            self.start_ci = other.start_ci
            self.begin = other.begin
            self.bin_counts = np.concatenate([other.bin_counts, self.bin_counts])
            if self.bin_starts is not None and other.bin_starts is not None:
                self.bin_starts = np.concatenate(
                    [other.bin_starts, self.bin_starts])
                self.bin_ends = np.concatenate([other.bin_ends, self.bin_ends])
            self.baf_positions = np.concatenate(
                [other.baf_positions, self.baf_positions])
            self.baf_frequencies = np.concatenate(
                [other.baf_frequencies, self.baf_frequencies])
            self.baf_total_coverage = np.concatenate(
                [other.baf_total_coverage, self.baf_total_coverage])
            self.baf_count_a = np.concatenate([other.baf_count_a, self.baf_count_a])
            self.baf_count_b = np.concatenate([other.baf_count_b, self.baf_count_b])
        if other.end > self.end:
            self.end_ci = other.end_ci
            self.end = other.end
            self.bin_counts = np.concatenate([self.bin_counts, other.bin_counts])
            if self.bin_starts is not None and other.bin_starts is not None:
                self.bin_starts = np.concatenate(
                    [self.bin_starts, other.bin_starts])
                self.bin_ends = np.concatenate([self.bin_ends, other.bin_ends])
            self.baf_positions = np.concatenate(
                [self.baf_positions, other.baf_positions])
            self.baf_frequencies = np.concatenate(
                [self.baf_frequencies, other.baf_frequencies])
            self.baf_total_coverage = np.concatenate(
                [self.baf_total_coverage, other.baf_total_coverage])
            self.baf_count_a = np.concatenate([self.baf_count_a, other.baf_count_a])
            self.baf_count_b = np.concatenate([self.baf_count_b, other.baf_count_b])


def merge_segments(
    segments: list[Segment],
    minimum_call_size: int = 0,
    maximum_merge_span: int = 10000,
) -> list[Segment]:
    """CanvasSegment.MergeSegments (CanvasSegment.cs:961-1075), single-sample
    path: assimilate short segments into the better-scoring neighbor, then
    merge adjacent same-CN same-heterogeneity segments."""
    if not segments:
        return []
    merged: list[Segment] = []
    i = 0
    while i < len(segments):
        if segments[i].length >= minimum_call_size:
            merged.append(segments[i])
            i += 1
            continue
        prev_idx, prev_q = -1, -1.0
        for check in range(i - 1, -1, -1):
            if segments[check].chrom != segments[i].chrom:
                break
            if segments[check].length < minimum_call_size:
                continue
            if segments[i].begin - segments[check].end > maximum_merge_span:
                break
            prev_idx, prev_q = check, segments[check].qscore
            break
        next_idx, next_q = -1, -1.0
        for check in range(i + 1, len(segments)):
            if segments[check].chrom != segments[i].chrom:
                break
            if segments[check].length < minimum_call_size:
                continue
            if segments[check].begin - segments[i].end > maximum_merge_span:
                break
            next_idx, next_q = check, segments[check].qscore
            break
        if prev_q >= 0 and prev_q >= next_q:
            segments[prev_idx].merge_in(segments[i])
            i += 1
            continue
        if next_q >= 0:
            for t in range(next_idx - 1, i - 1, -1):
                segments[next_idx].merge_in(segments[t])
            i = next_idx
            continue
        merged.append(segments[i])
        i += 1

    segments = merged
    out: list[Segment] = [segments[0]]
    last = segments[0]
    for s in segments[1:]:
        if (last.copy_number == s.copy_number and last.chrom == s.chrom
                and s.begin - last.end < maximum_merge_span
                and last.is_heterogeneous == s.is_heterogeneous):
            last.merge_in(s)
        else:
            out.append(s)
            last = s
    return out


def merge_segments_using_excluded_intervals(
    segments: list[Segment],
    minimum_call_size: int,
    excluded: dict[str, list[tuple[int, int]]] | None,
) -> list[Segment]:
    """CanvasSegment.MergeSegmentsUsingExcludedIntervals (:863-952), the
    somatic-WGS merge: neighbor search breaks at chromosome changes and at
    excluded (filter-bed) intervals instead of a bp span; assimilation
    requires a strictly positive neighbor q-score.  Reference quirks kept:
    the look-back loop never considers index 0, and same-CN merging also
    refuses to cross an excluded interval."""
    from canvas_tpu.io.bed import is_forbidden_interval

    if not segments:
        return []
    merged: list[Segment] = []
    i = 0
    while i < len(segments):
        if segments[i].length >= minimum_call_size:
            merged.append(segments[i])
            i += 1
            continue
        prev_idx, prev_q = -1, 0.0
        for check in range(i - 1, 0, -1):
            if segments[check].chrom != segments[i].chrom:
                break
            if segments[check].length < minimum_call_size:
                continue
            if is_forbidden_interval(segments[check].chrom,
                                     segments[check].end,
                                     segments[i].begin, excluded):
                break
            prev_idx, prev_q = check, segments[check].qscore
            break
        next_idx, next_q = -1, 0.0
        for check in range(i + 1, len(segments)):
            if segments[check].chrom != segments[i].chrom:
                break
            if segments[check].length < minimum_call_size:
                continue
            if is_forbidden_interval(segments[check].chrom, segments[i].end,
                                     segments[check].begin, excluded):
                break
            next_idx, next_q = check, segments[check].qscore
            break
        if prev_q > 0 and prev_q >= next_q:
            segments[prev_idx].merge_in(segments[i])
            i += 1
            continue
        if next_q > 0:
            for t in range(i, next_idx):
                segments[next_idx].merge_in(segments[t])
            i = next_idx
            continue
        merged.append(segments[i])
        i += 1

    segments = merged
    out = [segments[0]]
    last = segments[0]
    for s in segments[1:]:
        if (last.copy_number == s.copy_number and last.chrom == s.chrom
                and not is_forbidden_interval(last.chrom, last.end, s.begin,
                                              excluded)
                and last.is_heterogeneous == s.is_heterogeneous):
            last.merge_in(s)
        else:
            out.append(s)
            last = s
    return out


def set_filters(
    segments: list[Segment], quality_threshold: int,
    size_cutoff: int = SEGMENT_SIZE_CUTOFF) -> None:
    """SetFilterForSegments (CanvasSegment.cs:1080-1091)."""
    for s in segments:
        tags = []
        if s.qscore < quality_threshold:
            tags.append(f"q{quality_threshold}")
        if s.length < size_cutoff:
            tags.append(cnv_size_filter(size_cutoff))
        s.filter_tags = tags


def merge_segments_multisample(
    segments_by_sample: dict[str, list[Segment]],
    minimum_call_size: int,
    q_score_threshold: int,
    maximum_merge_span: int = 10000,
) -> dict[str, list[Segment]]:
    """CanvasPedigreeCaller.MergeSegments (:179-205) + the copyNumbers/
    qscores variant of CanvasSegment.MergeSegments (:961-1075): segments are
    position-aligned across samples; merge decisions use the cross-sample
    CN vectors (all samples must agree) and the across-sample mean q-score
    (adjacent same-CN-vector segments merge only when both mean q-scores
    clear the threshold, so merging never flips a PASS filter).  Unlike the
    somatic variant, the look-back reaches index 0 and accepts q >= 0."""
    names = list(segments_by_sample)
    n = len(segments_by_sample[names[0]])
    copy_numbers = [[segments_by_sample[s][i].copy_number for s in names]
                    for i in range(n)]
    qscores = [float(np.mean([segments_by_sample[s][i].qscore
                              for s in names])) for i in range(n)]

    out: dict[str, list[Segment]] = {}
    for sample in names:
        segments = list(segments_by_sample[sample])
        merged: list[Segment] = []
        new_cns: list[list[int]] = []
        new_qs: list[float] = []
        i = 0
        while i < len(segments):
            if segments[i].length >= minimum_call_size:
                merged.append(segments[i])
                new_cns.append(copy_numbers[i])
                new_qs.append(qscores[i])
                i += 1
                continue
            prev_idx, prev_q = -1, -1.0
            for check in range(i - 1, -1, -1):
                if segments[check].chrom != segments[i].chrom:
                    break
                if segments[check].length < minimum_call_size:
                    continue
                if segments[i].begin - segments[check].end \
                        > maximum_merge_span:
                    break
                prev_idx, prev_q = check, qscores[check]
                break
            next_idx, next_q = -1, -1.0
            for check in range(i + 1, len(segments)):
                if segments[check].chrom != segments[i].chrom:
                    break
                if segments[check].length < minimum_call_size:
                    continue
                if segments[check].begin - segments[i].end \
                        > maximum_merge_span:
                    break
                next_idx, next_q = check, qscores[check]
                break
            if prev_q >= 0 and prev_q >= next_q:
                segments[prev_idx].merge_in(segments[i])
                i += 1
                continue
            if next_q >= 0:
                for t in range(next_idx - 1, i - 1, -1):
                    segments[next_idx].merge_in(segments[t])
                i = next_idx
                continue
            merged.append(segments[i])
            new_cns.append(copy_numbers[i])
            new_qs.append(qscores[i])
            i += 1

        final = [merged[0]]
        last = 0
        for j in range(1, len(merged)):
            if (new_cns[last] == new_cns[j]
                    and final[-1].chrom == merged[j].chrom
                    and merged[j].begin - final[-1].end < maximum_merge_span
                    and new_qs[j] > q_score_threshold
                    and new_qs[last] > q_score_threshold):
                final[-1].merge_in(merged[j])
            else:
                final.append(merged[j])
                last = j
        out[sample] = final
    return out
