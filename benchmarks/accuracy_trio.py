"""Trio accuracy benchmark: SmallPedigree-WGS vs EvaluateCNV headline numbers.

Mirrors the reference's demo evaluation (README.md "Running EvaluateCNV"):
a trio (father/mother/proband) with inherited + de novo CNVs is called by
`runner.small_pedigree_wgs`, and the proband's calls are scored twice with
the EvaluateCNV reimplementation —
  1. inherited/overall: full-coverage truth bed, PASS calls
     (baseline: recall 97.46%, precision 93.85%);
  2. de novo: de-novo-only truth bed, DQ >= 20 filter
     (baseline: recall 97.98%, precision 96.51%).

Inputs are synthetic (cached by scale): a random flagged reference and three
Poisson-coverage BAMs whose copy-number plans encode event inheritance —
parent-only events (proband CN2), inherited events (parent + proband share
the CN), and de novo events (proband only).

Usage:
    python benchmarks/accuracy_trio.py [--mbp 60] [--rate 0.25]
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

from _synth import (make_reference, synth_positions,  # noqa: E402
                    write_bam_vectorized)

BASELINE = {  # README.md "Running EvaluateCNV" demo, PASS-only
    "inherited_recall": 97.46, "inherited_precision": 93.85,
    "denovo_recall": 97.98, "denovo_precision": 96.51,
}
MARGIN_BP = 1_000_000     # keep events away from contig ends
GAP_BP = 1_000_000        # min separation between events
SIZE_RANGE = (100_000, 600_000)

# event kinds cycled along each contig: (carrier, proband_cn, parent_cn)
EVENT_KINDS = [
    ("father", 1, 1),     # inherited deletion
    ("mother", 3, 3),     # inherited duplication
    ("father", 2, 3),     # father-only duplication (not transmitted)
    ("denovo", 0, None),  # de novo homozygous loss
    ("mother", 1, 1),     # inherited deletion (maternal)
    ("denovo", 3, None),  # de novo gain
    ("mother", 2, 1),     # mother-only deletion (not transmitted)
    ("denovo", 4, None),  # de novo amplification
    ("father", 3, 3),     # inherited duplication (paternal)
    ("denovo", 1, None),  # de novo heterozygous loss
]


def plan_events(contigs: dict[str, int], seed: int = 11):
    """Place non-overlapping events along each contig; returns per-sample
    CN plans plus the proband/de-novo truth interval lists."""
    rng = np.random.default_rng(seed)
    plans = {"father": {}, "mother": {}, "proband": {}}
    truth, denovo_truth = {}, {}
    kind_i = 0
    for name, length in contigs.items():
        for s in plans.values():
            s[name] = []
        truth[name], denovo_truth[name] = [], []
        pos = MARGIN_BP
        while pos + SIZE_RANGE[1] + MARGIN_BP < length:
            size = int(rng.integers(*SIZE_RANGE))
            start, end = pos, pos + size
            carrier, child_cn, parent_cn = EVENT_KINDS[kind_i %
                                                       len(EVENT_KINDS)]
            kind_i += 1
            if carrier == "denovo":
                plans["proband"][name].append((start, end, float(child_cn)))
                denovo_truth[name].append((start, end, child_cn))
            else:
                plans[carrier][name].append((start, end, float(parent_cn)))
                if child_cn != 2:
                    plans["proband"][name].append(
                        (start, end, float(child_cn)))
            if child_cn != 2:
                truth[name].append((start, end, child_cn))
            pos = end + GAP_BP + int(rng.integers(0, GAP_BP))
    return plans, truth, denovo_truth


def write_truth_beds(out_dir: Path, contigs: dict[str, int], truth,
                     denovo_truth):
    """Full-coverage proband truth (CN2 gaps) + de-novo-only truth."""
    full = out_dir / "proband_truth.bed"
    with open(full, "w") as f:
        for name, length in contigs.items():
            pos = 0
            for start, end, cn in sorted(truth[name]):
                if start > pos:
                    f.write(f"{name}\t{pos}\t{start}\t2\n")
                f.write(f"{name}\t{start}\t{end}\t{cn}\n")
                pos = end
            if pos < length:
                f.write(f"{name}\t{pos}\t{length}\t2\n")
    dn = out_dir / "denovo_truth.bed"
    with open(dn, "w") as f:
        for name in contigs:
            for start, end, cn in sorted(denovo_truth[name]):
                f.write(f"{name}\t{start}\t{end}\t{cn}\n")
    return full, dn


def build_inputs(cache: Path, mbp: int, rate: float):
    key = cache / f"trio{mbp}_r{rate}"
    ref_dir = key / "ref"
    bams = {n: key / f"{n}.bam" for n in ("father", "mother", "proband")}
    meta = key / "meta.json"
    if meta.exists() and (ref_dir / "kmer.fa").exists():
        return ref_dir, bams, json.loads(meta.read_text())
    shutil.rmtree(key, ignore_errors=True)
    ref_dir.mkdir(parents=True)

    n_contigs = max(2, mbp // 20)
    clen = mbp * 1_000_000 // n_contigs
    contigs = {f"chr{i + 1}": clen for i in range(n_contigs)}
    t0 = time.time()
    make_reference(ref_dir, contigs)
    print(f"[gen] reference {mbp}Mbp x {n_contigs} contigs: "
          f"{time.time() - t0:.1f}s", file=sys.stderr)

    plans, truth, denovo_truth = plan_events(contigs)
    rng = np.random.default_rng(5)
    for sample, bam in bams.items():
        t0 = time.time()
        per_contig = [synth_positions(rng, length, rate, plans[sample][name])
                      for name, length in contigs.items()]
        total = write_bam_vectorized(bam, list(contigs.items()), per_contig)
        print(f"[gen] {sample} BAM {total / 1e6:.1f}M reads: "
              f"{time.time() - t0:.1f}s", file=sys.stderr)
    meta_obj = {"contigs": contigs, "truth": truth,
                "denovo_truth": denovo_truth}
    meta.write_text(json.dumps(meta_obj))
    return ref_dir, bams, meta_obj


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbp", type=int, default=60)
    ap.add_argument("--rate", type=float, default=0.25)
    ap.add_argument("--cache", default="/tmp/canvas_tpu_bench")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    cache = Path(args.cache)
    ref_dir, bams, meta = build_inputs(cache, args.mbp, args.rate)
    contigs = meta["contigs"]

    from canvas_tpu.pipeline import runner
    from canvas_tpu.tools import evaluate_cnv

    out_dir = Path(args.out or (cache / f"trio_out_{args.mbp}"))
    shutil.rmtree(out_dir, ignore_errors=True)
    ctx = runner.WorkflowContext(reference_folder=str(ref_dir),
                                 output_dir=str(out_dir))
    samples = [
        runner.Sample("father", str(bams["father"]), sample_type="Father"),
        runner.Sample("mother", str(bams["mother"]), sample_type="Mother"),
        runner.Sample("proband", str(bams["proband"]),
                      sample_type="Proband"),
    ]
    t0 = time.time()
    vcf = runner.small_pedigree_wgs(ctx, samples)
    wall = time.time() - t0

    truth_bed, denovo_bed = write_truth_beds(
        out_dir, contigs, meta["truth"], meta["denovo_truth"])

    # 1. inherited/overall: PASS calls vs full-coverage truth
    overall = evaluate_cnv.evaluate(
        truth_bed, vcf, sample_index=2, min_entry_size=10_000)
    # 2. de novo: DQ>=20 calls vs de-novo-only truth
    denovo = evaluate_cnv.evaluate(
        denovo_bed, vcf, sample_index=2, dq_threshold=20,
        ploidy_fn=lambda c, s, e: 2, min_entry_size=10_000)

    result = {
        "metric": "trio EvaluateCNV accuracy",
        "mbp": args.mbp,
        "wall_s": round(wall, 2),
        "recall": round(overall.recall, 2),
        "precision": round(overall.precision, 2),
        "f1": round(overall.f1, 2),
        "denovo_recall": round(denovo.recall, 2),
        "denovo_precision": round(denovo.precision, 2),
        "vs_baseline": {
            "recall": round(overall.recall / BASELINE["inherited_recall"], 4),
            "precision": round(
                overall.precision / BASELINE["inherited_precision"], 4),
            "denovo_recall": round(
                denovo.recall / BASELINE["denovo_recall"], 4),
            "denovo_precision": round(
                denovo.precision / BASELINE["denovo_precision"], 4),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
