"""Somatic WGS e2e benchmark: purity/ploidy recovery + EvaluateCNV accuracy.

Drives the full tumor workflow — BAM + het-site VCF -> CanvasBin ->
CanvasClean -> CanvasSNV pileup -> wavelet partition -> somatic
purity/ploidy grid -> VCF — on a synthetic tumor with a planted purity and
allele-specific copy-number events, then scores:
  1. |estimated - planted| purity (##EstimatedTumorPurity header);
  2. EvaluateCNV accuracy/recall/precision vs the planted truth, compared
     to the reference's published HCC2218 enrichment numbers (BASELINE.md:
     Accuracy 92.03, Recall 88.09, Precision 81.30 — real data, so a
     calibration target rather than a like-for-like dataset).

Tumor synthesis: with purity p, a region of tumor total CN n and B-allele
count b has effective depth multiplier (2(1-p) + n*p)/2 and het-site VAF
((1-p) + b*p) / (2(1-p) + n*p); reads covering a het site carry the ALT
base with that probability (all-'C' read sequences, see _synth).

Usage:
    python benchmarks/e2e_somatic.py [--mbp 120] [--purity 0.7]
                                     [--rate 0.25] [--cache ...]
"""

from __future__ import annotations

import argparse
import gzip
import json
import shutil
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from _synth import (READ_LEN, make_reference, make_het_vcf,  # noqa: E402
                    assign_alt_reads, synth_positions, write_bam_vectorized)

BASELINE = {"accuracy": 92.0255, "recall": 88.0894, "precision": 81.3032}

# somatic event kinds cycled along each contig: (total CN, B-allele count)
EVENT_KINDS = [
    (1, 0),   # hemizygous deletion (LOH)
    (3, 1),   # one-copy gain
    (0, 0),   # homozygous deletion
    (4, 1),   # two-copy gain
    (2, 0),   # copy-neutral LOH (CNV-invisible in coverage, BAF-visible)
    (3, 2),   # gain of the B allele
]
MARGIN_BP = 1_000_000
GAP_BP = 1_500_000
# With ModelDistance ~ 0 (clean synthetic segments) the reference's
# Logistic q-score reduces to f(binCount) and PASS (q>=10) needs ~1430
# bins (~650 kb at 454 bp bins); keep events clear of that line so the
# benchmark measures the caller, not the q-score's bin-count prior.
SIZE_RANGE = (700_000, 1_500_000)


def plan_events(contigs: dict[str, int], seed: int = 23):
    rng = np.random.default_rng(seed)
    plan = {}
    kind_i = 0
    for name, length in contigs.items():
        plan[name] = []
        pos = MARGIN_BP
        while pos + SIZE_RANGE[1] + MARGIN_BP < length:
            size = int(rng.integers(*SIZE_RANGE))
            cn, b = EVENT_KINDS[kind_i % len(EVENT_KINDS)]
            kind_i += 1
            plan[name].append((pos, pos + size, cn, b))
            pos += size + GAP_BP + int(rng.integers(0, GAP_BP))
    return plan


def build_inputs(cache: Path, mbp: int, rate: float, purity: float):
    key = cache / f"som{mbp}_r{rate}_p{purity}"
    ref_dir, bam = key / "ref", key / "tumor.bam"
    het_vcf = key / "normal_het.vcf"
    meta = key / "meta.json"
    if meta.exists() and (ref_dir / "kmer.fa").exists():
        return ref_dir, bam, het_vcf, json.loads(meta.read_text())
    shutil.rmtree(key, ignore_errors=True)
    ref_dir.mkdir(parents=True)

    n_contigs = max(2, mbp // 30)
    clen = mbp * 1_000_000 // n_contigs
    contigs = {f"chr{i + 1}": clen for i in range(n_contigs)}
    t0 = time.time()
    make_reference(ref_dir, contigs)
    print(f"[gen] reference {mbp}Mbp: {time.time() - t0:.1f}s",
          file=sys.stderr)

    sites = make_het_vcf(het_vcf, contigs)
    plan = plan_events(contigs)
    rng = np.random.default_rng(3)
    per_pos, per_alt = [], []
    t0 = time.time()
    for name, length in contigs.items():
        # depth plan: effective CN = 2(1-p) + n*p
        eff = [(s, e, 2 * (1 - purity) + cn * purity)
               for s, e, cn, _ in plan[name]]
        starts = synth_positions(rng, length, rate, eff)
        # per-site VAF from the covering event (default diploid het 0.5)
        pos = sites[name]
        vaf = np.full(len(pos), 0.5)
        for s, e, cn, b in plan[name]:
            inside = (pos >= s) & (pos < e)
            denom = 2 * (1 - purity) + cn * purity
            vaf[inside] = ((1 - purity) + b * purity) / max(denom, 1e-9)
        per_pos.append(starts)
        per_alt.append(assign_alt_reads(rng, starts, pos, vaf))
    total = write_bam_vectorized(bam, list(contigs.items()), per_pos,
                                 per_alt)
    print(f"[gen] tumor BAM {total / 1e6:.1f}M reads: "
          f"{time.time() - t0:.1f}s", file=sys.stderr)
    meta_obj = {"contigs": contigs,
                "plan": {n: [list(ev) for ev in evs]
                         for n, evs in plan.items()}}
    meta.write_text(json.dumps(meta_obj))
    return ref_dir, bam, het_vcf, meta_obj


def write_truth_bed(out_dir: Path, contigs: dict[str, int], plan) -> Path:
    """Full-coverage truth: events at their total CN, CN2 in the gaps."""
    bed = out_dir / "somatic_truth.bed"
    with open(bed, "w") as f:
        for name, length in contigs.items():
            pos = 0
            for s, e, cn, _b in sorted(plan[name]):
                if s > pos:
                    f.write(f"{name}\t{pos}\t{s}\t2\n")
                f.write(f"{name}\t{s}\t{e}\t{cn}\n")
                pos = e
            if pos < length:
                f.write(f"{name}\t{pos}\t{length}\t2\n")
    return bed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbp", type=int, default=120)
    ap.add_argument("--rate", type=float, default=0.25)
    ap.add_argument("--purity", type=float, default=0.7)
    ap.add_argument("--cache", default="/tmp/canvas_tpu_bench")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    cache = Path(args.cache)
    ref_dir, bam, het_vcf, meta = build_inputs(
        cache, args.mbp, args.rate, args.purity)
    contigs = meta["contigs"]

    from canvas_tpu.pipeline import runner
    from canvas_tpu.tools import evaluate_cnv

    out_dir = Path(args.out or (cache / f"som_out_{args.mbp}_p{args.purity}"))
    shutil.rmtree(out_dir, ignore_errors=True)
    ctx = runner.WorkflowContext(reference_folder=str(ref_dir),
                                 output_dir=str(out_dir))
    tumor = runner.Sample("tumor", str(bam), normal_vcf=str(het_vcf))
    t0 = time.time()
    vcf = runner.somatic_wgs(ctx, tumor)
    wall = time.time() - t0

    est_purity = est_ploidy = None
    with gzip.open(vcf, "rt") as f:
        for line in f:
            if line.startswith("##EstimatedTumorPurity="):
                est_purity = float(line.strip().split("=")[1])
            elif line.startswith("##OverallPloidy="):
                est_ploidy = float(line.strip().split("=")[1])
            elif not line.startswith("#"):
                break

    truth_bed = write_truth_bed(out_dir, contigs, meta["plan"])
    m = evaluate_cnv.evaluate(truth_bed, vcf, min_entry_size=10_000)

    print(json.dumps({
        "metric": "somatic WGS purity+accuracy",
        "mbp": args.mbp, "wall_s": round(wall, 2),
        "planted_purity": args.purity,
        "estimated_purity": est_purity,
        "purity_error": (round(abs(est_purity - args.purity), 3)
                         if est_purity is not None else None),
        "overall_ploidy": est_ploidy,
        "accuracy": round(m.accuracy, 2),
        "recall": round(m.recall, 2),
        "precision": round(m.precision, 2),
        "vs_baseline": {
            "accuracy": round(m.accuracy / BASELINE["accuracy"], 4),
            "recall": round(m.recall / BASELINE["recall"], 4),
            "precision": round(m.precision / BASELINE["precision"], 4),
        },
    }))


if __name__ == "__main__":
    main()
