"""Canvas-format CNV VCF writer (CanvasCommon/CanvasSegmentWriter.cs).

Reproduces the reference's header layout, record IDs
(Canvas:GAIN|LOSS|REF|LOH|COMPLEXCNV:chr:start-end), symbolic <CN*> ALT
alleles, genotype assembly, and the GT:RC:BC:CN:MCC:MCCQ:QS:FT[:DQ] FORMAT
block byte-for-byte (modulo the ##source version string).
"""

from __future__ import annotations

import gzip
from pathlib import Path

from canvas_tpu.genome.contigs import ContigTable
from canvas_tpu.models.segment_model import (
    COMPLEX, INT_MAX, LOH, REF, Segment, _SV_TYPE, _VCF_ID,
    cnv_size_filter_threshold)

SOURCE = "canvas_tpu 0.1.0"


def _overall_ploidy_headers(segments: list[Segment], diploid_coverage):
    total_w = total_p = 0.0
    for s in segments:
        if s.is_pass:
            total_w += s.length
            total_p += s.copy_number * s.length
    lines = []
    if total_w > 0:
        lines.append(f"##OverallPloidy={total_p / total_w:.2f}")
        if diploid_coverage is not None:
            lines.append(f"##DiploidCoverage={diploid_coverage:.2f}")
    return lines


def _header_lines(
    segments: list[Segment],
    contigs: ContigTable,
    sample_names: list[str],
    diploid_coverage: float | None,
    extra_headers: list[str],
    reference_path: str,
    quality_threshold: int,
    denovo_quality_threshold: int | None,
    size_threshold: int | None,
    max_copy_num: int = 5,
) -> list[str]:
    """WriteVcfHeader (CanvasSegmentWriter.cs:50-116)."""
    lines = [
        "##fileformat=VCFv4.1",
        f"##source={SOURCE}",
        f"##reference={reference_path}",
    ]
    if len(sample_names) == 1:
        lines += _overall_ploidy_headers(segments, diploid_coverage)
    lines += extra_headers or []
    for name, length in zip(contigs.names, contigs.lengths):
        lines.append(f"##contig=<ID={name},length={length}>")
    qfilter = f"q{quality_threshold}"
    lines.append('##ALT=<ID=DUP,Description="Region of elevated copy number '
                 'relative to the reference">')
    lines += alt_cn_header_lines(max_copy_num)
    lines.append(f'##FILTER=<ID={qfilter},Description="Quality below '
                 f'{quality_threshold}">')
    if size_threshold is not None:
        num, units = cnv_size_filter_threshold(size_threshold)
        lines.append(f'##FILTER=<ID=L{num}{units},Description="Length shorter '
                     f'than {num} {units}">')
    lines.append('##FILTER=<ID=FailedFT,Description="Sample-level filter '
                 'failed in all the samples">')
    lines += [
        '##INFO=<ID=CIEND,Number=2,Type=Integer,Description="Confidence interval around END for imprecise variants">',
        '##INFO=<ID=CIPOS,Number=2,Type=Integer,Description="Confidence interval around POS for imprecise variants">',
        '##INFO=<ID=CNVLEN,Number=1,Type=Integer,Description="Number of reference positions spanned by this CNV">',
        '##INFO=<ID=END,Number=1,Type=Integer,Description="End position of the variant described in this record">',
        '##INFO=<ID=SVTYPE,Number=1,Type=String,Description="Type of structural variant">',
        '##INFO=<ID=SUBCLONAL,Number=0,Type=Flag,Description="Subclonal variant">',
        '##INFO=<ID=COMMONCNV,Number=0,Type=Flag,Description="Common CNV variant identified from pre-specified bed intervals">',
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
        '##FORMAT=<ID=RC,Number=1,Type=Float,Description="Mean counts per bin in the region">',
        '##FORMAT=<ID=BC,Number=1,Type=Float,Description="Number of bins in the region">',
        '##FORMAT=<ID=CN,Number=1,Type=Integer,Description="Copy number genotype for imprecise events">',
        '##FORMAT=<ID=MCC,Number=1,Type=Integer,Description="Major chromosome count (equal to copy number for LOH regions)">',
        '##FORMAT=<ID=MCCQ,Number=1,Type=Float,Description="Major chromosome count quality score">',
        '##FORMAT=<ID=QS,Number=1,Type=Float,Description="Phred-scaled quality score. If CN is reference then this is -10log10(prob(variant)) otherwise this is -10log10(prob(no variant).">',
    ]
    if denovo_quality_threshold is not None:
        lines.append(f'##FORMAT=<ID=DQ,Number=1,Type=Float,Description="De novo '
                     f'quality. Threshold for passing de novo call: '
                     f'{denovo_quality_threshold}">')
    lines.append('##FORMAT=<ID=FT,Number=1,Type=String,Description="Sample '
                 "filter, 'PASS' indicates that all filters have passed for "
                 'this sample">')
    lines.append("\t".join(
        ["#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO",
         "FORMAT"] + sample_names))
    return lines


def alt_cn_header_lines(max_copy_num: int) -> list[str]:
    """WriteHeaderAllAltCnTags (CanvasSegmentWriter.cs:98-107): one ALT line
    per copy-number allele 0..max, skipping CN1."""
    return [
        f'##ALT=<ID=CN{cn},Description="Copy number allele: {cn} copies">'
        for cn in range(max_copy_num + 1) if cn != 1
    ]


def _assign_record_cnv_type(types: list[str]) -> str:
    """AssignCnvType (CanvasSegmentWriter.cs:159-165)."""
    non_ref = sorted(set(t for t in types if t != REF),
                     key=lambda t: types.index(t))
    if not non_ref:
        return REF
    if len(non_ref) > 1:
        return COMPLEX
    return non_ref[0]


def _alt_and_genotypes(allele_cns: list[list[int]]) -> tuple[str, list[str]]:
    """GetAltAllelesAndGenotypes (CanvasSegmentWriter.cs:167-201)."""
    uniq = sorted({a for cns in allele_cns for a in cns if a not in (1, -1)})
    alt_strings = [f"<CN{a}>" for a in uniq]
    if alt_strings and uniq[-1] == INT_MAX:
        alt_strings[-1] = "<DUP>"
    alt = ",".join(alt_strings) if alt_strings else "."
    genotypes = []
    for cns in allele_cns:
        parts = []
        for a in cns:
            if a == 1:
                parts.append("0")
            elif a == -1:
                parts.append(".")
            else:
                parts.append(str(uniq.index(a) + 1))
        parts.sort(key=lambda g: -1 if g == "." else int(g))
        genotypes.append("/".join(parts))
    return alt, genotypes


def _record_filter(sample_filters: list[str]) -> str:
    """Record-level filter from sample filters (CanvasFilter.cs:35-40)."""
    if any(f == "PASS" for f in sample_filters):
        return "PASS"
    return "FailedFT"


def format_record(
    per_sample: list[Segment],
    reference_cns: list[int],
    denovo: bool,
    multisample: bool,
) -> str:
    """One VCF data line for the same genomic span across samples
    (WriteVariants + WriteColumnsUntilInfoField + WriteFormatAndSampleFields,
    CanvasSegmentWriter.cs:121-270)."""
    first = per_sample[0]
    types, allele_cns = [], []
    for seg, ref_cn in zip(per_sample, reference_cns):
        t, cns = seg.cnv_type_and_allele_copy_numbers(ref_cn)
        types.append(t)
        allele_cns.append(cns)
    record_type = _assign_record_cnv_type(types)
    alt, genotypes = _alt_and_genotypes(allele_cns)
    record_filter = _record_filter([s.filter_string for s in per_sample])

    symbolic = alt.startswith("<") and alt.endswith(">")
    pos = first.begin if symbolic else first.begin + 1
    vid = f"Canvas:{_VCF_ID[record_type]}:{first.chrom}:{first.begin + 1}-{first.end}"
    qual = "." if multisample else f"{first.qscore:.2f}"
    parts = [first.chrom, str(pos), vid, "N", alt, qual, record_filter]

    info = ""
    if record_type != REF:
        info += f"SVTYPE={_SV_TYPE[record_type]};"
    if first.is_heterogeneous:
        info += "SUBCLONAL;"
    if first.is_common_cnv:
        info += "COMMONCNV;"
    info += f"END={first.end}"
    if record_type != REF:
        info += f";CNVLEN={first.length}"
    if first.start_ci is not None:
        info += f";CIPOS={first.start_ci[0]},{first.start_ci[1]}"
    if first.end_ci is not None:
        info += f";CIEND={first.end_ci[0]},{first.end_ci[1]}"
    parts.append(info)

    fmt = "GT:RC:BC:CN:MCC:MCCQ:QS:FT" + (":DQ" if denovo else "")
    fields = [fmt]
    for seg, gt in zip(per_sample, genotypes):
        mcc = str(seg.major_chromosome_count) \
            if seg.major_chromosome_count is not None else "."
        mccq = f"{seg.mcc_score:.2f}" if seg.mcc_score is not None else "."
        col = (f"{gt}:{seg.median_count:.2f}:{seg.bin_count}:{seg.copy_number}"
               f":{mcc}:{mccq}:{seg.qscore:.2f}:{seg.filter_string}")
        if denovo:
            dq = f"{seg.dq_score:.2f}" if seg.dq_score is not None else "."
            col += f":{dq}"
        fields.append(col)
    return "\t".join(parts) + "\t" + "\t".join(fields)


def write_segments(
    path: str | Path,
    segments_per_sample: list[list[Segment]],
    sample_names: list[str],
    contigs: ContigTable,
    diploid_coverage: float | None = None,
    extra_headers: list[str] | None = None,
    reference_cn_fn=None,
    quality_threshold: int = 10,
    denovo_quality_threshold: int | None = None,
    size_threshold: int | None = None,
    reference_path: str = "genome.fa",
) -> None:
    """Write a single- or multi-sample Canvas CNV VCF.

    segments_per_sample: outer list over samples; inner lists must be
    position-aligned across samples (same spans).  reference_cn_fn(sample_idx,
    segment) -> reference copy number (default 2).
    """
    multisample = len(sample_names) > 1
    denovo = denovo_quality_threshold is not None
    opener = gzip.open if str(path).endswith(".gz") else open
    first_sample = segments_per_sample[0]
    with opener(str(path), "wt") as f:
        for line in _header_lines(
                first_sample, contigs, sample_names, diploid_coverage,
                extra_headers or [], reference_path, quality_threshold,
                denovo_quality_threshold, size_threshold):
            f.write(line + "\n")
        n = len(first_sample)
        # records ordered by contig-table order (reference iterates contigs)
        order = sorted(range(n), key=lambda i: (
            contigs.index(first_sample[i].chrom), first_sample[i].begin))
        for i in order:
            per_sample = [segs[i] for segs in segments_per_sample]
            ref_cns = [
                reference_cn_fn(j, per_sample[j]) if reference_cn_fn else 2
                for j in range(len(per_sample))]
            f.write(format_record(per_sample, ref_cns, denovo, multisample)
                    + "\n")
