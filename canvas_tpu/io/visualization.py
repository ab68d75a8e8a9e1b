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


def write_copy_number_bedgraph(path: str | Path,
                               segments: list[Segment]) -> None:
    """CN track (CanvasPedigreeCaller CopyNumberBedGraph)."""
    with open(path, "w", newline="\n") as f:
        for seg in segments:
            f.write(f"{seg.chrom}\t{seg.begin}\t{seg.end}\t{seg.copy_number}\n")


def write_coverage_bedgraph(path: str | Path, segments: list[Segment]) -> None:
    """Per-bin normalized coverage track."""
    with open(path, "w", newline="\n") as f:
        for seg in segments:
            if seg.bin_starts is None:
                continue
            for s, e, c in zip(seg.bin_starts, seg.bin_ends, seg.bin_counts):
                f.write(f"{seg.chrom}\t{s}\t{e}\t{c:.2f}\n")


def write_ballele_bedgraph(path: str | Path, segments: list[Segment]) -> None:
    """Per-segment median b-allele frequency track (BAlleleBedGraphWriter)."""
    with open(path, "w", newline="\n") as f:
        for seg in segments:
            if len(seg.baf_frequencies) == 0:
                continue
            med = stats.median(seg.baf_frequencies)
            f.write(f"{seg.chrom}\t{seg.begin}\t{seg.end}\t{med:.4f}\n")


def write_partition_bedgraph(path: str | Path, segments: list[Segment]) -> None:
    """Segment-boundary track (partition bedgraph)."""
    with open(path, "w", newline="\n") as f:
        for i, seg in enumerate(segments):
            f.write(f"{seg.chrom}\t{seg.begin}\t{seg.end}\t{i % 2}\n")


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
