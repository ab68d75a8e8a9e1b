"""Tumor-normal enrichment e2e benchmark (manifest targets + CBS).

Drives the Tumor-normal-enrichment workflow — predefined target bins ->
repeated-median smoothing -> T/N LSNorm ratio -> CanvasClean -> CBS ->
somatic caller with 1 bp merge span — on a synthetic panel: a target BED
of short probes tiling the genome, a diploid normal, and a tumor with
planted CN events each spanning many targets.

Scored with EvaluateCNV against the planted truth and compared to the
reference's published HCC2218 T/N enrichment numbers (BASELINE.md:
Accuracy 92.03 / Recall 88.09 / Precision 81.30 — real exome data, so a
calibration target rather than a like-for-like dataset).

Usage:
    python benchmarks/e2e_enrichment.py [--mbp 30] [--rate 0.3]
                                        [--cache /tmp/canvas_tpu_bench]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from _synth import (make_reference, make_het_vcf,  # noqa: E402
                    assign_alt_reads, synth_positions,
                    write_bam_vectorized)

BASELINE = {"accuracy": 92.0255, "recall": 88.0894, "precision": 81.3032}

TARGET_LEN = 400
# Dense probe grid: the Logistic q-score is ~f(binCount) on clean data and
# PASS needs ~1430 bins, so events (0.8-1.6 Mb) must span >1430 targets.
TARGET_SPACING = 500
# (total CN, B-allele count) cycled along the genome; the tumor is a
# pure line (purity 1.0, like a cell line panel sample)
EVENT_KINDS = [(1, 0), (3, 1), (0, 0), (4, 1)]
MARGIN_BP = 500_000
GAP_BP = 1_200_000
SIZE_RANGE = (800_000, 1_600_000)


def plan_events(contigs: dict[str, int], seed: int = 31):
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


def write_target_bed(path: Path, contigs: dict[str, int]) -> None:
    with open(path, "w") as f:
        for name, length in contigs.items():
            for s in range(1_000, length - TARGET_LEN - 1_000,
                           TARGET_SPACING):
                f.write(f"{name}\t{s}\t{s + TARGET_LEN}\ttarget\n")


def build_inputs(cache: Path, mbp: int, rate: float):
    key = cache / f"enr{mbp}_r{rate}"
    ref_dir = key / "ref"
    tumor_bam, normal_bam = key / "tumor.bam", key / "normal.bam"
    bed = key / "targets.bed"
    het_vcf = key / "normal_het.vcf"
    meta = key / "meta.json"
    if meta.exists() and (ref_dir / "kmer.fa").exists():
        return ref_dir, tumor_bam, normal_bam, bed, het_vcf, json.loads(
            meta.read_text())
    shutil.rmtree(key, ignore_errors=True)
    ref_dir.mkdir(parents=True)

    n_contigs = max(2, mbp // 15)
    clen = mbp * 1_000_000 // n_contigs
    contigs = {f"chr{i + 1}": clen for i in range(n_contigs)}
    t0 = time.time()
    make_reference(ref_dir, contigs)
    print(f"[gen] reference {mbp}Mbp: {time.time() - t0:.1f}s",
          file=sys.stderr)
    write_target_bed(bed, contigs)
    sites = make_het_vcf(het_vcf, contigs)

    plan = plan_events(contigs)
    rng = np.random.default_rng(9)
    t0 = time.time()
    # normal: diploid, VAF 0.5 everywhere
    per_pos = [synth_positions(rng, length, rate, [])
               for name, length in contigs.items()]
    per_alt = [assign_alt_reads(rng, p, sites[name],
                                np.full(len(sites[name]), 0.5))
               for p, name in zip(per_pos, contigs)]
    total = write_bam_vectorized(normal_bam, list(contigs.items()),
                                 per_pos, per_alt)
    print(f"[gen] normal.bam {total / 1e6:.1f}M reads", file=sys.stderr)
    # tumor: planted events; pure tumor so VAF = b / cn at het sites
    per_pos, per_alt = [], []
    for name, length in contigs.items():
        evs = plan[name]
        starts = synth_positions(
            rng, length, rate, [(s, e, float(cn)) for s, e, cn, _ in evs])
        pos = sites[name]
        vaf = np.full(len(pos), 0.5)
        for s, e, cn, b in evs:
            inside = (pos >= s) & (pos < e)
            vaf[inside] = b / cn if cn else 0.0
        per_pos.append(starts)
        per_alt.append(assign_alt_reads(rng, starts, pos, vaf))
    total = write_bam_vectorized(tumor_bam, list(contigs.items()),
                                 per_pos, per_alt)
    print(f"[gen] tumor.bam {total / 1e6:.1f}M reads", file=sys.stderr)
    print(f"[gen] BAMs: {time.time() - t0:.1f}s", file=sys.stderr)
    meta_obj = {"contigs": contigs,
                "plan": {n: [list(e) for e in evs]
                         for n, evs in plan.items()}}
    meta.write_text(json.dumps(meta_obj))
    return ref_dir, tumor_bam, normal_bam, bed, het_vcf, meta_obj


def write_truth_bed(out_dir: Path, contigs: dict[str, int], plan) -> Path:
    bed = out_dir / "enrichment_truth.bed"
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
    ap.add_argument("--mbp", type=int, default=30)
    ap.add_argument("--rate", type=float, default=0.3)
    ap.add_argument("--cache", default="/tmp/canvas_tpu_bench")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    cache = Path(args.cache)
    ref_dir, tumor_bam, normal_bam, bed, het_vcf, meta = build_inputs(
        cache, args.mbp, args.rate)
    contigs = meta["contigs"]

    from canvas_tpu.pipeline import runner
    from canvas_tpu.tools import evaluate_cnv

    out_dir = Path(args.out or (cache / f"enr_out_{args.mbp}"))
    shutil.rmtree(out_dir, ignore_errors=True)
    ctx = runner.WorkflowContext(reference_folder=str(ref_dir),
                                 output_dir=str(out_dir))
    tumor = runner.Sample("tumor", str(tumor_bam),
                          normal_vcf=str(het_vcf))
    normal = runner.Sample("normal", str(normal_bam))
    t0 = time.time()
    vcf = runner.somatic_wgs(ctx, tumor, normal=normal,
                             manifest_path=str(bed))
    wall = time.time() - t0

    truth_bed = write_truth_bed(out_dir, contigs, meta["plan"])
    m = evaluate_cnv.evaluate(truth_bed, vcf, min_entry_size=10_000)

    print(json.dumps({
        "metric": "T/N enrichment accuracy",
        "mbp": args.mbp, "wall_s": round(wall, 2),
        "accuracy": round(m.accuracy, 2),
        "recall": round(m.recall, 2),
        "precision": round(m.precision, 2),
        "direction_accuracy": round(m.direction_accuracy, 2),
        "vs_baseline": {
            "accuracy": round(m.accuracy / BASELINE["accuracy"], 4),
            "recall": round(m.recall / BASELINE["recall"], 4),
            "precision": round(m.precision / BASELINE["precision"], 4),
        },
    }))


if __name__ == "__main__":
    main()
