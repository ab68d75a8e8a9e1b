"""EvaluateCNV — the accuracy acceptance harness (Tools/EvaluateCNV).

Compares a CNV VCF against a truth set at base resolution:
  * 3D base-count array [truthCN, callCN, refPloidy] plus a no-call array
    (CNVEvaluator.cs:13-35);
  * excluded-region subtraction with the reference's majority-exclusion
    quirk (overlapBases/excludedOverlap < 0.1 kills the overlap,
    CNVEvaluator.cs:237-257);
  * Recall/Precision/F1/Accuracy and direction variants from the count
    array (MetricsCalculator.cs);
  * per-event accuracy mean/median (CalculateMedianAndMeanAccuracies);
  * PASS-only and all-variant passes; optional DQ threshold for de novo
    evaluation; size-stratified splits.
"""

from __future__ import annotations

import gzip
import re
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

MAX_CN = 5


@dataclass
class TruthInterval:
    chromosome: str
    start: int          # 0-based inclusive
    end: int            # exclusive
    cn: int
    reference_cn: int | None = None
    bases_covered: int = 0
    bases_called_correctly: int = 0
    bases_called_incorrectly: int = 0
    bases_excluded: int = 0

    @property
    def length(self) -> int:
        return self.end - self.start


@dataclass
class CnvCall:
    chrom: str
    start: int          # 0-based inclusive
    end: int            # exclusive
    cn: int
    ref_ploidy: int
    alt_allele: str
    pass_filter: bool
    qscore: float = 0.0
    dq: float | None = None

    @property
    def length(self) -> int:
        return self.end - self.start

    @property
    def is_alt_variant(self) -> bool:
        return self.alt_allele not in (".",) and self.cn != self.ref_ploidy


def load_truth_bed(path: str | Path) -> dict[str, list[TruthInterval]]:
    """Truth set: chr<TAB>start<TAB>end<TAB>cn (bed-style, 0-based)."""
    out: dict[str, list[TruthInterval]] = {}
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(str(path), "rt") as f:
        for line in f:
            if not line.strip() or line.startswith(("#", "track")):
                continue
            fields = line.rstrip("\n").split("\t")
            iv = TruthInterval(fields[0], int(fields[1]), int(fields[2]),
                               int(fields[3]))
            out.setdefault(iv.chromosome, []).append(iv)
    return out


def load_exclude_bed(path: str | Path) -> dict[str, list[tuple[int, int]]]:
    out: dict[str, list[tuple[int, int]]] = {}
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(str(path), "rt") as f:
        for line in f:
            if not line.strip() or line.startswith(("#", "track")):
                continue
            fields = line.rstrip("\n").split("\t")
            out.setdefault(fields[0], []).append(
                (int(fields[1]), int(fields[2])))
    return out


_END_RE = re.compile(r"END=(\d+)")


def load_cnv_calls(
    vcf_path: str | Path,
    sample_index: int = 0,
    ploidy_fn=None,
    dq_threshold: float | None = None,
) -> dict[str, list[CnvCall]]:
    """Parse a Canvas CNV VCF into calls.

    ploidy_fn(chrom, start, end) -> reference ploidy (default 2).
    With dq_threshold set, only calls with DQ >= threshold are kept
    (de novo evaluation mode)."""
    out: dict[str, list[CnvCall]] = {}
    opener = gzip.open if str(vcf_path).endswith(".gz") else open
    with opener(str(vcf_path), "rt") as f:
        for line in f:
            if line.startswith("#"):
                continue
            fields = line.rstrip("\n").split("\t")
            chrom, pos, _, _, alt, _, filt, info = fields[:8]
            fmt = fields[8].split(":")
            sample = fields[9 + sample_index].split(":")
            col = dict(zip(fmt, sample))
            m = _END_RE.search(info)
            end = int(m.group(1)) if m else int(pos)
            symbolic = alt.startswith("<")
            start = int(pos) if symbolic else int(pos) - 1
            cn = int(col["CN"]) if col.get("CN", ".") != "." else 2
            ploidy = int(ploidy_fn(chrom, start, end)) if ploidy_fn else 2
            record_pass = filt == "PASS" and col.get("FT", "PASS") == "PASS"
            dq = None
            if "DQ" in col and col["DQ"] != ".":
                dq = float(col["DQ"])
            if dq_threshold is not None:
                if dq is None or dq < dq_threshold:
                    continue
            out.setdefault(chrom, []).append(CnvCall(
                chrom, start, end, cn, ploidy, alt, record_pass,
                float(col.get("QS", 0) or 0), dq))
    return out


@dataclass
class BaseCounter:
    min_size: int = 0
    max_size: int = 2 ** 31 - 1
    base_count: np.ndarray = field(
        default_factory=lambda: np.zeros((MAX_CN + 1, MAX_CN + 1, 3), np.int64))
    no_calls: np.ndarray = field(
        default_factory=lambda: np.zeros((MAX_CN + 1, 3), np.int64))
    total_variants: int = 0
    total_variant_bases: int = 0
    mean_accuracy: float = 0.0
    median_accuracy: float = float("nan")


@dataclass
class Metrics:
    """MetricsCalculator output (percentages)."""
    accuracy: float
    direction_accuracy: float
    f1: float
    recall: float
    direction_recall: float
    precision: float
    direction_precision: float
    gain_recall: float
    gain_precision: float
    loss_recall: float
    loss_precision: float
    total_bases: int


def count_bases(
    truth: dict[str, list[TruthInterval]],
    calls: dict[str, list[CnvCall]],
    counter: BaseCounter,
    exclude: dict[str, list[tuple[int, int]]] | None = None,
    passing_only: bool = True,
    skip_diploid: bool = False,
) -> None:
    """CalculateMetrics base-count core (CNVEvaluator.cs:115-334)."""
    exclude = exclude or {}
    for calls_chrom in calls.values():
        for call in calls_chrom:
            if not (call.is_alt_variant
                    and counter.min_size <= call.length <= counter.max_size):
                continue
            if passing_only and not call.pass_filter:
                continue
            counter.total_variant_bases += call.length
            counter.total_variants += 1

    for intervals in truth.values():
        for interval in intervals:
            if not (counter.min_size <= interval.length <= counter.max_size):
                continue
            chromosome = interval.chromosome
            if chromosome not in calls:
                chromosome = chromosome.replace("chr", "")
            if chromosome not in calls:
                chromosome = "chr" + interval.chromosome.replace("chr", "")
            chrom_calls = calls.get(chromosome, [])
            known_cn = min(interval.cn, MAX_CN)
            total_overlap = 0
            exclude_bases = 0
            ploidy_weights: list[tuple[int, int]] = []
            for call in chrom_calls:
                ref_ploidy = (interval.reference_cn
                              if interval.reference_cn is not None
                              else call.ref_ploidy)
                cn = min(call.cn, MAX_CN)
                if call.alt_allele == "." and skip_diploid:
                    continue
                o_start = max(call.start, interval.start)
                o_end = min(call.end, interval.end)
                if o_start >= o_end:
                    continue
                overlap = o_end - o_start
                call_excluded = 0
                for ex_start, ex_end in exclude.get(call.chrom, []):
                    e_start = max(ex_start, o_start)
                    e_end = min(ex_end, o_end)
                    if e_start >= e_end:
                        continue
                    ex_bases = e_end - e_start
                    exclude_bases += ex_bases
                    call_excluded += ex_bases
                    overlap -= ex_bases
                    # reference's majority-exclusion quirk
                    if overlap / max(ex_bases, 1) < 0.1:
                        call_excluded += overlap
                        exclude_bases += overlap
                        overlap = 0
                        break
                ploidy_weights.append((ref_ploidy, overlap))
                if call.pass_filter or not passing_only:
                    total_overlap += overlap
                    counter.base_count[known_cn, cn, ref_ploidy] += overlap
                interval.bases_covered += overlap
                if known_cn == cn:
                    interval.bases_called_correctly += overlap
                else:
                    interval.bases_called_incorrectly += overlap
                interval.bases_excluded += call_excluded

            non_overlap = interval.length - total_overlap - exclude_bases
            if interval.reference_cn is None:
                if not ploidy_weights:
                    raise ValueError(
                        f"truth interval {interval.chromosome}:"
                        f"{interval.start}-{interval.end} has no overlapping "
                        f"calls; provide reference ploidy")
                w = np.array([max(x[1], 1) for x in ploidy_weights], float)
                p = np.array([x[0] for x in ploidy_weights], float)
                interval.reference_cn = int(np.round(np.sum(p * w) / np.sum(w)))
            if non_overlap < 0:
                raise ValueError("negative non-overlap bases")
            counter.no_calls[known_cn, interval.reference_cn] += non_overlap

    # event-level accuracies
    accs = []
    for intervals in truth.values():
        for interval in intervals:
            if interval.cn == interval.reference_cn:
                continue
            basecount = interval.length - interval.bases_excluded
            if basecount <= 0:
                continue
            accs.append(interval.bases_called_correctly / basecount)
    counter.mean_accuracy = float(np.sum(accs) / max(1, len(accs)))
    accs.sort()
    counter.median_accuracy = accs[len(accs) // 2] if accs else float("nan")


def calculate_metrics(counter: BaseCounter, max_ploidy: int = 2) -> Metrics:
    """MetricsCalculator.CalculateMetrics."""
    bc, nc = counter.base_count, counter.no_calls
    total = total_right = total_right_dir = 0
    is_gain = call_gain = gain_ok = gain_dir = 0
    is_loss = call_loss = loss_ok = loss_dir = 0
    for ploidy in range(max_ploidy + 1):
        for t in range(MAX_CN + 1):
            ncb = int(nc[t, ploidy])
            if t < ploidy:
                is_loss += ncb
            if t > ploidy:
                is_gain += ncb
            total += ncb
            for c in range(MAX_CN + 1):
                b = int(bc[t, c, ploidy])
                total += b
                if t == c:
                    total_right += b
                if (t < ploidy and c < ploidy) or (t == ploidy and c == ploidy) \
                        or (t > ploidy and c > ploidy):
                    total_right_dir += b
                if t < ploidy:
                    is_loss += b
                if t > ploidy:
                    is_gain += b
                if c < ploidy:
                    call_loss += b
                if c > ploidy:
                    call_gain += b
                if t == c and t < ploidy:
                    loss_ok += b
                if t == c and t > ploidy:
                    gain_ok += b
                if t > ploidy and c > ploidy:
                    gain_dir += b
                if t < ploidy and c < ploidy:
                    loss_dir += b

    def pct(a, b):
        return 100.0 * a / b if b else float("nan")

    frac_prec = (gain_ok + loss_ok) / (call_gain + call_loss) \
        if (call_gain + call_loss) else float("nan")
    frac_rec = (gain_ok + loss_ok) / (is_gain + is_loss) \
        if (is_gain + is_loss) else float("nan")
    f1 = (2 * frac_prec * frac_rec / (frac_prec + frac_rec)
          if (frac_prec + frac_rec) else float("nan"))
    return Metrics(
        accuracy=pct(total_right, total),
        direction_accuracy=pct(total_right_dir, total),
        f1=f1,
        recall=frac_rec * 100,
        direction_recall=pct(gain_dir + loss_dir, is_gain + is_loss),
        precision=frac_prec * 100,
        direction_precision=pct(gain_dir + loss_dir, call_gain + call_loss),
        gain_recall=pct(gain_ok, is_gain),
        gain_precision=pct(gain_ok, call_gain),
        loss_recall=pct(loss_ok, is_loss),
        loss_precision=pct(loss_ok, call_loss),
        total_bases=total,
    )


def evaluate(
    truth_path: str | Path,
    vcf_path: str | Path,
    exclude_path: str | Path | None = None,
    passing_only: bool = True,
    dq_threshold: float | None = None,
    ploidy_fn=None,
    sample_index: int = 0,
) -> Metrics:
    """End-to-end evaluation (CNVChecker.Evaluate equivalent).

    ploidy_fn(chrom, start, end) -> reference ploidy; when given it also
    pre-sets truth-interval reference CNs (the reference's --ploidy-x/-y
    options), which is required when the DQ filter leaves truth intervals
    without any overlapping call."""
    truth = load_truth_bed(truth_path)
    calls = load_cnv_calls(vcf_path, sample_index=sample_index,
                           ploidy_fn=ploidy_fn, dq_threshold=dq_threshold)
    if ploidy_fn is not None:
        for intervals in truth.values():
            for iv in intervals:
                if iv.reference_cn is None:
                    iv.reference_cn = int(
                        ploidy_fn(iv.chromosome, iv.start, iv.end))
    exclude = load_exclude_bed(exclude_path) if exclude_path else None
    counter = BaseCounter()
    count_bases(truth, calls, counter, exclude, passing_only)
    return calculate_metrics(counter)


def format_report(metrics: Metrics, counter: BaseCounter | None = None,
                  passing_only: bool = True) -> str:
    lines = [
        "Results for PASSing variants" if passing_only
        else "Results for all variants",
        f"Accuracy\t{metrics.accuracy:.4f}",
        f"DirectionAccuracy\t{metrics.direction_accuracy:.4f}",
        f"F-score\t{metrics.f1:.4f}",
        f"Recall\t{metrics.recall:.4f}",
        f"DirectionRecall\t{metrics.direction_recall:.4f}",
        f"Precision\t{metrics.precision:.4f}",
        f"DirectionPrecision\t{metrics.direction_precision:.4f}",
        f"GainRecall\t{metrics.gain_recall:.4f}",
        f"GainPrecision\t{metrics.gain_precision:.4f}",
        f"LossRecall\t{metrics.loss_recall:.4f}",
        f"LossPrecision\t{metrics.loss_precision:.4f}",
    ]
    return "\n".join(lines)


def main(argv=None) -> int:
    """CLI: EvaluateCNV truth.bed CNV.vcf[.gz] [excluded.bed] output_dir
    (Tools/EvaluateCNV/Program.cs:59)."""
    import argparse
    import sys
    from pathlib import Path as _Path

    p = argparse.ArgumentParser(prog="evaluate_cnv")
    p.add_argument("truth")
    p.add_argument("cnv_vcf")
    p.add_argument("excluded", nargs="?", default=None)
    p.add_argument("output_dir", nargs="?", default=None)
    p.add_argument("-q", "--dq-threshold", type=float, default=None,
                   help="only evaluate calls with DQ >= threshold (de novo)")
    p.add_argument("--sample-index", type=int, default=0)
    p.add_argument("--ploidy", type=int, default=None,
                   help="uniform reference ploidy override")
    args = p.parse_args(argv)
    ploidy_fn = (lambda c, s, e: args.ploidy) if args.ploidy else None
    report_parts = []
    for passing in (True, False):
        m = evaluate(args.truth, args.cnv_vcf, args.excluded,
                     passing_only=passing, dq_threshold=args.dq_threshold,
                     ploidy_fn=ploidy_fn, sample_index=args.sample_index)
        report_parts.append(format_report(m, passing_only=passing))
    report = "\n".join(report_parts) + "\n"
    if args.output_dir:
        out = _Path(args.output_dir)
        out.mkdir(parents=True, exist_ok=True)
        name = "EvaluateCNVResults"
        if args.dq_threshold is not None:
            name += "_denovo"
        (out / f"{name}.txt").write_text(report)
    sys.stdout.write(report)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
