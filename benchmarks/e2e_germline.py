"""End-to-end germline WGS wall-clock benchmark on a synthetic genome.

Generates (and caches) a synthetic reference + BAM at a chosen scale, then
times `runner.germline_wgs` and prints the per-stage profile.  The reference
point is Canvas's SmallPedigree demo: 3x60x WGS -> VCF in 3h34m on a 16-vCPU
host (BASELINE.md), i.e. roughly 1 sample-hour per 60x genome.

Usage:
    python benchmarks/e2e_germline.py [--mbp 120] [--rate 0.25]
                                      [--cache /tmp/canvas_tpu_bench]

The synthetic BAM is written with a vectorized fixed-record builder (all
reads 50M, proper-paired) so generation doesn't dominate; generation
artifacts are cached by (mbp, rate) and reused across runs.
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

from _synth import (READ_LEN, FLAG, make_reference,  # noqa: E402
                    synth_positions, write_bam_vectorized)


# hg19 canonical contig lengths in Mbp — used by --hg to reproduce the real
# genome's contig-size distribution (chr1 at 249Mbp spans 8 device buckets)
HG19_MBP = [249, 243, 198, 191, 181, 171, 159, 146, 141, 136, 135, 134,
            115, 107, 103, 90, 81, 78, 59, 63, 48, 51, 155, 59]


def build_inputs(cache: Path, mbp: int, rate: float, hg: bool = False,
                 read_len: int = READ_LEN):
    import _synth
    _synth.set_read_len(read_len)
    suffix = "" if read_len == 50 else f"_l{read_len}"
    key = cache / ((f"hg{mbp}_r{rate}" if hg else f"g{mbp}_r{rate}")
                   + suffix)
    ref_dir, bam = key / "ref", key / "sample.bam"
    plan_file = key / "plan.json"
    done = key / "done"
    if done.exists() and bam.exists() and (ref_dir / "kmer.fa").exists():
        return ref_dir, bam, json.loads(plan_file.read_text())
    shutil.rmtree(key, ignore_errors=True)
    (key / "ref").mkdir(parents=True)

    if hg:
        scale = mbp / sum(HG19_MBP)
        names = [f"chr{i + 1}" for i in range(22)] + ["chrX", "chrY"]
        contigs = {n: int(L * scale * 1_000_000)
                   for n, L in zip(names, HG19_MBP)}
        n_contigs = len(contigs)
    else:
        n_contigs = max(2, mbp // 30)
        clen = mbp * 1_000_000 // n_contigs
        contigs = {f"chr{i + 1}": clen for i in range(n_contigs)}
    t0 = time.time()
    make_reference(ref_dir, contigs)
    print(f"[gen] reference {mbp}Mbp x {n_contigs} contigs: "
          f"{time.time() - t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(7)
    plan = {}
    per_contig = []
    t0 = time.time()
    for i, (name, length) in enumerate(contigs.items()):
        p = []
        if i % 3 == 0:
            p = [(length // 4, length // 4 + length // 10, 1.0),
                 (length // 2, length // 2 + length // 10, 3.0)]
        elif i % 3 == 1:
            p = [(length // 3, length // 3 + length // 12, 0.0)]
        plan[name] = [(int(s), int(e), float(c)) for s, e, c in p]
        per_contig.append(synth_positions(rng, length, rate, p))
    total = write_bam_vectorized(bam, list(contigs.items()), per_contig)
    print(f"[gen] BAM {total / 1e6:.1f}M reads: {time.time() - t0:.1f}s",
          file=sys.stderr)
    plan_file.write_text(json.dumps(plan))
    done.write_text("ok\n")   # marks the cache complete (a killed run
                               # must not leave a truncated BAM behind)
    return ref_dir, bam, plan


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbp", type=int, default=120)
    ap.add_argument("--rate", type=float, default=0.25)
    ap.add_argument("--cache", default="/tmp/canvas_tpu_bench")
    ap.add_argument("--out", default=None)
    ap.add_argument("--hg", action="store_true",
                    help="use hg19-like contig length distribution "
                         "(24 contigs; chr1 spans 8 device buckets)")
    ap.add_argument("--read-len", type=int, default=50,
                    help="synthetic read length; depth = rate * read_len "
                         "(use --rate 0.4 --read-len 150 for a 60x run)")
    ap.add_argument("--gen-only", action="store_true",
                    help="build/cache the inputs and exit (lets multi-hour "
                         "generation run detached from the timed pipeline)")
    args = ap.parse_args()

    cache = Path(args.cache)
    ref_dir, bam, plan = build_inputs(cache, args.mbp, args.rate,
                                      hg=args.hg, read_len=args.read_len)
    if args.gen_only:
        print(json.dumps({"generated": str(bam), "mbp": args.mbp,
                          "depth": round(args.rate * args.read_len, 1)}))
        return

    from canvas_tpu.pipeline import runner

    out_dir = Path(args.out or (cache / f"out_{args.mbp}"))
    shutil.rmtree(out_dir, ignore_errors=True)
    ctx = runner.WorkflowContext(reference_folder=str(ref_dir),
                                 output_dir=str(out_dir))
    sample = runner.Sample("s1", str(bam))
    t0 = time.time()
    vcf = runner.germline_wgs(ctx, sample)
    wall = time.time() - t0

    profile = json.loads((out_dir / "s1_profile.json").read_text())
    for st in profile.get("stages", []):
        print(f"  {st['name']:<28s} {st['seconds']:8.2f}s", file=sys.stderr)

    # score the calls against the planted plan with EvaluateCNV
    from canvas_tpu.tools import evaluate_cnv
    truth = out_dir / "truth.bed"
    with open(truth, "w") as f:
        for name, events in plan.items():
            for s, e, cn_mult in events:
                f.write(f"{name}\t{s}\t{e}\t{int(round(cn_mult))}\n")
    m = evaluate_cnv.evaluate(truth, vcf, passing_only=False)

    print(json.dumps({
        "metric": "germline WGS e2e wall-clock",
        "mbp": args.mbp, "value": round(wall, 2), "unit": "s",
        "depth": round(args.rate * args.read_len, 1),
        "read_len": args.read_len,
        "vcf": str(vcf),
        "mbp_per_s": round(args.mbp / wall, 2),
        "recall": round(m.recall, 2), "precision": round(m.precision, 2),
    }))


if __name__ == "__main__":
    main()
