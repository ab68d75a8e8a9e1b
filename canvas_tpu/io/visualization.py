"""Visualization outputs: coverage/VF plot data + bedgraphs.

The reference writes CNV.CoverageAndVariantFrequency.txt (100kb plot
points with CN, normalized coverage, MAF and a variant-frequency histogram;
CanvasSegment.WriteCoveragePlotData :575+), plus coverage / copy-number /
b-allele bedgraph tracks (CanvasPedigreeCaller/Visualization,
BAlleleBedGraphWriter).  Bigwig is a binary wrapper over the same values;
bedgraph text is emitted here (convertible with external tooling).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from canvas_tpu.genome.contigs import ContigTable
from canvas_tpu.models.segment_model import Segment
from canvas_tpu.ops import stats

POINT_LENGTH = 100_000
N_VF_BINS = 100  # CanvasSegment.NumberVariantFrequencyBins


def write_coverage_plot_data(
    path: str | Path,
    segments: list[Segment],
    contigs: ContigTable,
    normal_diploid_coverage: float | None,
    ploidy=None,
) -> None:
    """CNV.CoverageAndVariantFrequency.txt: per-100kb plot points."""
    by_chrom: dict[str, list[Segment]] = {}
    for seg in segments:
        by_chrom.setdefault(seg.chrom, []).append(seg)
    with open(path, "w", newline="\n") as f:
        f.write("#Chromosome\tStart\tEnd\tCopyNumber\tMajorChromosomeCount"
                "\tMedianHits\tNormalizedCoverage\tMedianMinorAlleleFrequency"
                "\tReferencePloidy\t")
        f.write("\t".join(f"VariantFrequencyBin{i}" for i in range(N_VF_BINS)))
        f.write("\n")
        for chrom, length in zip(contigs.names, contigs.lengths):
            if chrom not in by_chrom:
                continue
            chr_segments = by_chrom[chrom]
            start = 0
            while start < length:
                end = min(length, start + POINT_LENGTH)
                counts, mafs, vfs = [], [], []
                bases_by_cn: dict[tuple[int, int | None], int] = {}
                for seg in chr_segments:
                    if seg.begin > end or seg.end < start:
                        continue
                    o = min(seg.end, end) - max(seg.begin, start)
                    key = (seg.copy_number, seg.major_chromosome_count)
                    bases_by_cn[key] = bases_by_cn.get(key, 0) + o
                    if seg.bin_starts is not None:
                        m = (seg.bin_starts < end) & (seg.bin_ends > start)
                        counts.extend(seg.bin_counts[m].tolist())
                    else:
                        counts.extend(seg.bin_counts.tolist())
                    vfs.extend(seg.baf_frequencies.tolist())
                    mafs.extend(np.minimum(seg.baf_frequencies,
                                           1 - seg.baf_frequencies).tolist())
                if bases_by_cn:
                    (cn, mcc) = max(bases_by_cn, key=bases_by_cn.get)
                    median_hits = stats.median(counts) if counts else 0.0
                    norm_cov = (2 * median_hits / normal_diploid_coverage
                                if normal_diploid_coverage else 0.0)
                    med_maf = stats.median(mafs) if len(mafs) >= 10 else -1.0
                    ref_ploidy = (ploidy.reference_copy_number(chrom, start, end)
                                  if ploidy else 2)
                    hist = np.histogram(
                        np.clip(vfs, 0, 0.9999), bins=N_VF_BINS,
                        range=(0, 1))[0] if vfs else np.zeros(N_VF_BINS, int)
                    f.write(f"{chrom}\t{start}\t{end}\t{cn}"
                            f"\t{mcc if mcc is not None else ''}"
                            f"\t{median_hits:.2f}\t{norm_cov:.2f}"
                            f"\t{med_maf:.4f}\t{ref_ploidy}\t")
                    f.write("\t".join(str(int(h)) for h in hist))
                    f.write("\n")
                start = end


def _weighted_median_half(values, weights) -> float:
    """Illumina.Common MathUtilities.WeightedMedian.Median: sort by value,
    cut at half the total weight; a cut landing exactly on an item boundary
    averages the straddling pair (so equal-weight {3/4, 2/8} -> 0.5, the
    behavior NormalizedCoverageWriterTests.cs:120-150 pins).  Distinct from
    ops.stats.weighted_median, which ports Utilities.WeightedQuantiles."""
    v = np.asarray(values, dtype=np.float64)
    w = np.asarray(weights, dtype=np.float64)
    if len(v) == 0:
        raise ValueError("weighted median of empty sequence")
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cum = np.cumsum(w)
    half = cum[-1] / 2.0
    k = int(np.searchsorted(cum, half))
    if cum[k] == half and k + 1 < len(v):
        return float((v[k] + v[k + 1]) / 2.0)
    return float(v[k])


def is_pass_variant(segment: Segment, ploidy=None) -> bool:
    """CopyNumberBedGraphCalculator.IsPassVariant: PASS filter, and either
    CN != reference ploidy or an LOH call (CN2 with MCC2)."""
    if segment.filter_string != "PASS":
        return False
    ref_cn = (ploidy.reference_copy_number(segment.chrom, segment.begin,
                                           segment.end)
              if ploidy is not None else 2)
    if segment.copy_number != ref_cn:
        return True
    return segment.copy_number == 2 and segment.major_chromosome_count == 2


def copy_number_bedgraph_entries(segments: list[Segment], ploidy=None
                                 ) -> list[tuple[str, int, int, int]]:
    """CopyNumberBedGraphCalculator.Calculate: one entry per PASS variant
    segment (reference-CN segments excluded, LOH included)."""
    return [(s.chrom, s.begin, s.end, s.copy_number)
            for s in segments if is_pass_variant(s, ploidy)]


def compute_normalization_factor(segments: list[Segment]) -> float:
    """NormalizationCalculator.ComputeNormalizationFactor: weighted median
    (by bin count) of per-segment CN / median(bin counts) over PASS
    segments (all segments when none pass), excluding CN=0; 0 when only
    CN=0 segments remain.

    Deliberate deviation from the reference: CN!=0 segments with EMPTY
    bin-count lists are dropped from the estimation set here, while the
    reference NormalizationCalculator keeps them and its WeightedMedian
    then throws on the empty Counts list.  A mixed callset (some binless
    segments alongside normal ones) therefore yields a usable factor here
    where the reference would crash its visualization step — leniency
    chosen on purpose; these are debug outputs.  The all-candidates-binless
    case still raises, matching the reference's hard failure."""
    passing = [s for s in segments if s.filter_string == "PASS"]
    est = [s for s in (passing or segments)
           if s.copy_number != 0 and len(s.bin_counts)]
    if not est:
        if any(s.copy_number != 0 for s in (passing or segments)):
            raise ValueError(
                "cannot estimate a normalization factor: no candidate "
                "segment carries bins")    # reference throws here too
        return 0.0
    factors = [s.copy_number
               / _weighted_median_half(s.bin_counts,
                                       np.ones(len(s.bin_counts)))
               for s in est]
    weights = [len(s.bin_counts) for s in est]
    return _weighted_median_half(factors, weights)


def normalized_bins_entries(segments: list[Segment],
                            normalization_factor: float | None = None
                            ) -> list[tuple[str, int, int, float]]:
    """NormalizedBinsCoverageCalculator.Calculate: per-bin entries scaled
    by the (possibly precomputed) normalization factor, so a CN0 genome
    draws at 0 and a diploid genome draws at ~2."""
    if not segments:
        return []
    if normalization_factor is None:
        normalization_factor = compute_normalization_factor(segments)
    out = []
    for seg in segments:
        if seg.bin_starts is None:
            continue
        for s, e, c in zip(seg.bin_starts, seg.bin_ends, seg.bin_counts):
            out.append((seg.chrom, int(s), int(e),
                        float(c) * normalization_factor))
    return out


def normalized_segments_entries(segments: list[Segment],
                                normalization_factor: float | None = None
                                ) -> list[tuple[str, int, int, float]]:
    """NormalizedSegmentsCoverageCalculator.Calculate: one entry per
    segment spanning [min bin start, max bin end] at
    median(bin counts) * factor (plain middle-averaging median, matching
    the reference's MathNet Median on its golden vectors)."""
    if not segments:
        return []
    if normalization_factor is None:
        normalization_factor = compute_normalization_factor(segments)
    out = []
    for seg in segments:
        med = float(np.median(np.asarray(seg.bin_counts, np.float64)))
        start = int(seg.bin_starts.min()) if seg.bin_starts is not None \
            else seg.begin
        end = int(seg.bin_ends.max()) if seg.bin_ends is not None \
            else seg.end
        out.append((seg.chrom, start, end, med * normalization_factor))
    return out


def write_copy_number_bedgraph(path: str | Path, segments: list[Segment],
                               ploidy=None) -> None:
    """CN track (CopyNumberBedGraphWriter): PASS variant segments only."""
    with open(path, "w", newline="\n") as f:
        for chrom, s, e, cn in copy_number_bedgraph_entries(segments, ploidy):
            f.write(f"{chrom}\t{s}\t{e}\t{cn}\n")


def write_coverage_bedgraph(path: str | Path, segments: list[Segment],
                            normalization_factor: float | None = None
                            ) -> None:
    """Per-bin normalized coverage track (CoverageBedGraphWriter over
    NormalizedBinsCoverageCalculator)."""
    with open(path, "w", newline="\n") as f:
        for chrom, s, e, v in normalized_bins_entries(segments,
                                                      normalization_factor):
            f.write(f"{chrom}\t{s}\t{e}\t{v:.2f}\n")


def write_ballele_bedgraph(path: str | Path, segments: list[Segment]) -> None:
    """Per-segment median b-allele frequency track (BAlleleBedGraphWriter)."""
    with open(path, "w", newline="\n") as f:
        for seg in segments:
            if len(seg.baf_frequencies) == 0:
                continue
            med = stats.median(seg.baf_frequencies)
            f.write(f"{seg.chrom}\t{seg.begin}\t{seg.end}\t{med:.4f}\n")


# Header literal the reference writes above the partition track
# (CanvasPedigreeCaller.cs:153)
PARTITION_BEDGRAPH_HEADER = ("track type=bedGraph visibility=full "
                             "autoScale=on graphType=points")


def _round_away_from_zero(v: float, digits: int) -> str:
    """Math.Round(v, digits, MidpointRounding.AwayFromZero) followed by
    C# double.ToString() shortest formatting (RoundingBedGraphWriter)."""
    import math

    scale = 10.0 ** digits
    r = math.copysign(math.floor(abs(v) * scale + 0.5) / scale, v)
    s = format(r, f".{digits}f").rstrip("0").rstrip(".")
    return s if s not in ("", "-0") else "0"


def write_partition_bedgraph(path: str | Path, segments: list[Segment],
                             normalization_factor: float,
                             header: str | None = PARTITION_BEDGRAPH_HEADER
                             ) -> None:
    """Pre-caller segmentation coverage track: one entry per partition
    segment at median(bin counts) * factor, rounded to 4 digits
    away-from-zero (CanvasPedigreeCaller.cs:153-155 wires a
    CoverageBedGraphWriter over NormalizedSegmentsCoverageCalculator
    through RoundingBedGraphWriter(4), Program.cs:180-182).  Binless
    segments are skipped (no median exists).  The factor comes from the
    CALLED segments, the entries from the original partition segments."""
    entries = normalized_segments_entries(
        [s for s in segments if len(s.bin_counts)], normalization_factor)
    with open(path, "w", newline="\n") as f:
        if header:
            f.write(header + "\n")
        for chrom, s, e, v in entries:
            f.write(f"{chrom}\t{s}\t{e}\t{_round_away_from_zero(v, 4)}\n")


def bedgraph_to_bigwig(bedgraph_path: str | Path, contigs,
                       bigwig_path: str | Path) -> bool:
    """Convert a bedgraph track to bigwig via the external bedGraphToBigWig
    tool when present (CoverageBigWigWriter delegates to an
    IBedGraphToBigWigConverter; without the binary the reference uses
    NullBedGraphToBigWigConverter and skips the conversion).  Returns True
    when the bigwig was produced."""
    import shutil
    import subprocess
    import tempfile

    tool = shutil.which("bedGraphToBigWig")
    if tool is None:
        return False
    with tempfile.NamedTemporaryFile("w", suffix=".chrom.sizes",
                                     delete=False) as f:
        for name, length in zip(contigs.names, contigs.lengths_array):
            f.write(f"{name}\t{int(length)}\n")
        sizes = f.name
    try:
        subprocess.run([tool, str(bedgraph_path), sizes, str(bigwig_path)],
                       check=True, capture_output=True)
        return True
    except subprocess.CalledProcessError:
        return False
    finally:
        Path(sizes).unlink(missing_ok=True)
