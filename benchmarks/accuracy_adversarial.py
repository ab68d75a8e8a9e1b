"""Adversarial accuracy + calibration suite: non-saturated numbers.

The planted-truth smoke benchmarks saturate near 100% because their noise
is clean Poisson at comfortable depth.  Real Canvas accuracy lives or dies
under GC bias, overdispersion, FFPE noise, mappability dropouts, and
subclonality — the regimes the reference's heuristics were tuned for
(SomaticCaller.cs:1619-2094, CanvasClean.cs GC/LOESS chain,
SegmentScoringModel.cs:12-171).  This harness stresses those regimes at
the BIN level (the components under test — normalization, segmentation,
calling, q-scores — all run post-binning), so a full sweep takes ~2-4 min
on CPU instead of hours of BAM synthesis.

Sections:
  * germline grid: NB overdispersion curve (r = 200 -> 8), sinusoidal
    GC-bias waves the MedianByGC normalization must undo, FFPE-style
    local noise bursts, mappability dropouts — each scored base-level
    against the planted truth (recall / precision / CN accuracy);
  * q-score calibration: PASS germline calls pooled across the noisy
    scenarios, observed precision per q-score bin + expected calibration
    error (ECE vs the q = -10 log10(1-p) reading);
  * somatic purity sweep (0.10 -> 0.75) with allele-specific events
    including copy-neutral LOH: purity recovery error and event CN/MCC
    accuracy through the full clustering + (coverage x purity) grid;
  * chrX/Y reference-ploidy scenario: a male-like sample must report CN 1
    on the allosomes WITHOUT emitting LOSS records (PloidyInfo semantics,
    CanvasSegmentWriter + PloidyInfo.cs:8-260).

Prints a JSON report; `--json out.json` writes it for CI diffing.

Usage:
    python benchmarks/accuracy_adversarial.py [--bins 6000] [--json PATH]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from canvas_tpu.genome.contigs import ContigTable          # noqa: E402
from canvas_tpu.io.bins import BinSet                      # noqa: E402
from canvas_tpu.models import diploid as diploid_caller    # noqa: E402
from canvas_tpu.models import somatic as som               # noqa: E402
from canvas_tpu.models.segment_model import Segment        # noqa: E402
from canvas_tpu.ops import hmm, normalize                  # noqa: E402
from canvas_tpu.ops import segments as segops              # noqa: E402
from canvas_tpu.pipeline import segments_io                # noqa: E402

BIN_BP = 500           # uniform synthetic bin width
BASE_COV = 100.0       # diploid mean count per bin

# planted germline events cycled along each contig: (cn, n_bins)
GERMLINE_EVENTS = [(1, 120), (3, 150), (0, 80), (4, 100), (1, 60),
                   (3, 200)]


# ---------------------------------------------------------------------------
# Synthetic germline BinSet
# ---------------------------------------------------------------------------

def gc_bias(gc: np.ndarray, strength: float) -> np.ndarray:
    """Unimodal coverage bias peaking at GC 45% (classic WGS shape)."""
    return np.maximum(1.0 - strength * ((gc - 45.0) / 45.0) ** 2, 0.05)


def make_binset(
    rng: np.random.Generator,
    n_contigs: int = 4,
    bins_per_contig: int = 6000,
    nb_r: float = 200.0,
    gc_waves: float = 0.0,
    gc_strength: float = 0.0,
    ffpe_sigma: float = 0.0,
    dropout_frac: float = 0.0,
) -> tuple[BinSet, np.ndarray]:
    """Returns (bins, truth CN per bin).  Knobs:
      nb_r        — negative-binomial dispersion (smaller = noisier);
      gc_waves    — amplitude (GC points) of a sinusoidal GC profile;
      gc_strength — coverage bias strength applied through gc_bias();
      ffpe_sigma  — extra lognormal noise inside random local bursts;
      dropout_frac — fraction of bins inside zero-coverage runs."""
    names = [f"chr{i + 1}" for i in range(n_contigs)]
    contigs = ContigTable(names, [bins_per_contig * BIN_BP] * n_contigs)
    cid, start, end, gc_all, count, truth = [], [], [], [], [], []
    margin = 300
    for ci in range(n_contigs):
        n = bins_per_contig
        cn = np.full(n, 2, np.int16)
        pos, k = margin, ci  # stagger event kinds across contigs
        while True:
            ev_cn, ev_len = GERMLINE_EVENTS[k % len(GERMLINE_EVENTS)]
            k += 1
            if pos + ev_len + margin >= n:
                break
            cn[pos: pos + ev_len] = ev_cn
            pos += ev_len + margin
        pos_frac = np.arange(n) / n
        if gc_waves > 0:
            gc = 45.0 + gc_waves * np.sin(2 * np.pi * pos_frac * 9.0) \
                + rng.normal(0, 2.0, n)
        else:
            gc = rng.normal(45.0, 8.0, n)
        gc = np.clip(np.rint(gc), 10, 80).astype(np.int16)
        mean = BASE_COV * cn / 2.0 * gc_bias(gc.astype(np.float64),
                                             gc_strength)
        lam = rng.gamma(nb_r, np.maximum(mean, 1e-3) / nb_r)
        c = rng.poisson(lam).astype(np.float32)
        if ffpe_sigma > 0:
            # bursts of locally correlated multiplicative noise (~FFPE)
            burst = np.zeros(n, bool)
            for s in rng.integers(0, n - 50, size=max(1, n // 400)):
                burst[s: s + int(rng.integers(20, 60))] = True
            c = np.where(burst,
                         c * rng.lognormal(0.0, ffpe_sigma, n), c)
        if dropout_frac > 0:
            drop = np.zeros(n, bool)
            run = max(3, int(dropout_frac * n / max(1, n // 200)))
            for s in rng.integers(0, n - run, size=max(1, n // 200)):
                drop[s: s + run] = True
            c = np.where(drop, 0.0, c)
        cid.append(np.full(n, ci, np.int32))
        start.append(np.arange(n, dtype=np.int64) * BIN_BP)
        end.append((np.arange(n, dtype=np.int64) + 1) * BIN_BP)
        gc_all.append(gc)
        count.append(c)
        truth.append(cn)
    bins = BinSet(contigs, np.concatenate(cid), np.concatenate(start),
                  np.concatenate(end), np.concatenate(gc_all),
                  np.concatenate(count))
    return bins, np.concatenate(truth)


# ---------------------------------------------------------------------------
# Germline pipeline (clean -> HMM -> diploid) + truth scoring
# ---------------------------------------------------------------------------

def run_germline(bins: BinSet) -> list[Segment]:
    cleaned, _ = normalize.clean(bins)
    slices = cleaned.contig_slices()
    cov = {c: cleaned.count[sl].astype(np.float64)
           for c, sl in slices.items()}
    bps = hmm.segment_coverage_batched(cov)
    segs: list[Segment] = []
    for c, sl in slices.items():
        starts, ends = cleaned.start[sl], cleaned.end[sl]
        spans = segops.derive_segments(bps.get(c, [0]) or [0], len(starts),
                                       starts, ends)
        ids = np.zeros(len(starts), np.int64)
        for i, sp in enumerate(spans):
            sel = (starts >= sp.start) & (ends <= sp.end)
            ids[sel] = i
        segs.extend(segments_io.segments_from_rows(
            c, starts, ends, cleaned.count[sl], ids))
    called, _ = diploid_caller.call_variants(segs)
    return called


def score_germline(bins: BinSet, truth_cn: np.ndarray,
                   called: list[Segment]) -> dict:
    """Base-level confusion vs planted truth + per-call q-score records."""
    slices = bins.contig_slices()
    tp = fp = fn = correct_cn = var_bases = called_bases = 0
    qrec: list[tuple[float, bool]] = []
    for seg in called:
        sl = slices[seg.chrom]
        starts, ends = bins.start[sl], bins.end[sl]
        tcn = truth_cn[sl]
        sel = (starts >= seg.begin) & (ends <= seg.end)
        bp = (ends[sel] - starts[sel]).sum()
        t = tcn[sel]
        t_var_bp = ((ends[sel] - starts[sel]) * (t != 2)).sum()
        is_pass = not seg.filter_tags
        call_var = seg.copy_number != 2
        if call_var and is_pass:
            called_bases += bp
            maj = np.bincount(t, minlength=10).argmax()
            hit = t_var_bp > 0 and (
                (seg.copy_number < 2) == (maj < 2))
            tp += int(t_var_bp) if hit else 0
            fp += int(bp - t_var_bp)
            qrec.append((seg.qscore, bool(hit)))
            mt = int(np.round(np.mean(t)))
            correct_cn += int(bp) if seg.copy_number == mt else 0
        else:
            fn += int(t_var_bp)
        var_bases += int(t_var_bp)
    recall = tp / var_bases if var_bases else 1.0
    precision = tp / (tp + fp) if (tp + fp) else 1.0
    return {"recall": round(100 * recall, 2),
            "precision": round(100 * precision, 2),
            "cn_accuracy": round(100 * correct_cn / max(called_bases, 1),
                                 2),
            "qrec": qrec}


def calibration_table(qrec: list[tuple[float, bool]]) -> dict:
    """Observed precision per q-score bin + ECE vs q's own probability
    reading (q = -10 log10(1 - p)  =>  p = 1 - 10^(-q/10))."""
    if not qrec:
        return {"bins": [], "ece": None}
    qs = np.array([q for q, _ in qrec])
    ok = np.array([c for _, c in qrec])
    edges = [0, 10, 20, 30, 40, 60, 1000]
    rows, ece, n_tot = [], 0.0, len(qrec)
    for lo, hi in zip(edges[:-1], edges[1:]):
        sel = (qs >= lo) & (qs < hi)
        if not sel.any():
            continue
        obs = float(ok[sel].mean())
        conf = float(np.mean(1.0 - 10 ** (-qs[sel] / 10.0)))
        rows.append({"q": f"[{lo},{hi})", "n": int(sel.sum()),
                     "observed_precision": round(obs, 3),
                     "implied": round(conf, 3)})
        ece += sel.sum() / n_tot * abs(obs - conf)
    return {"bins": rows, "ece": round(float(ece), 4)}


# ---------------------------------------------------------------------------
# Somatic purity sweep (subclonality + LOH)
# ---------------------------------------------------------------------------

SOMATIC_EVENTS = [  # (total CN, B-allele count) incl. copy-neutral LOH
    (1, 0), (3, 1), (0, 0), (4, 1), (2, 0), (3, 2),
]


def make_somatic_segments(rng, purity: float, n_ref: int = 40,
                          n_event_each: int = 4,
                          cov: float = 100.0) -> tuple[list[Segment], list]:
    """Synthetic usable segments at the given purity; returns (segments,
    truth list of (segment index, cn, mcc))."""
    segs, truth = [], []
    pos = 0

    def add(cn, bcnt):
        nonlocal pos
        mult = (2 * (1 - purity) + cn * purity) / 2.0
        vaf = ((1 - purity) + bcnt * purity) / max(
            2 * (1 - purity) + cn * purity, 1e-9)
        n_bins = int(rng.integers(80, 160))
        counts = rng.normal(cov * mult, 6.0, n_bins).astype(np.float32)
        length = n_bins * BIN_BP
        n_vf = 60
        raw = np.clip(rng.normal(vaf, 0.04, n_vf), 0.02, 0.98)
        freqs = np.maximum(raw, 1 - raw).astype(np.float32)  # B-allele freq
        seg = Segment("chr1", pos, pos + length, counts,
                      baf_frequencies=freqs,
                      baf_positions=np.arange(n_vf, dtype=np.int64) * 50
                      + pos,
                      baf_total_coverage=np.full(n_vf, 60, np.int32),
                      baf_count_a=np.rint(60 * (1 - raw)).astype(np.int32),
                      baf_count_b=np.rint(60 * raw).astype(np.int32))
        truth.append((len(segs), cn, max(cn - bcnt, bcnt)))
        segs.append(seg)
        pos += length + 10 * BIN_BP

    for _ in range(n_ref):
        add(2, 1)
    truth_ref_len = len(truth)
    del truth[:truth_ref_len]   # only events are scored below
    offset = len(segs)
    for cn, b in SOMATIC_EVENTS:
        for _ in range(n_event_each):
            add(cn, b)
    truth = [(i, cn, mcc) for (i, cn, mcc) in truth if i >= offset]
    return segs, truth


def somatic_sweep(rng) -> list[dict]:
    rows = []
    for purity in (0.10, 0.20, 0.30, 0.40, 0.75):
        segs, truth = make_somatic_segments(rng, purity)
        genome_len = max(s.end for s in segs)
        try:
            model, _headers = som.call_somatic(
                segs, genome_len, clustering_mode="Density")
            cn_ok = sum(1 for i, cn, _ in truth
                        if segs[i].copy_number == cn)
            mcc_ok = sum(1 for i, cn, mcc in truth
                         if segs[i].copy_number == cn
                         and (segs[i].major_chromosome_count in (mcc, -1)
                              or cn == 0))
            loh = [(i, cn, mcc) for i, cn, mcc in truth
                   if (cn, mcc) == (2, 2)]
            loh_ok = sum(1 for i, cn, mcc in loh
                         if segs[i].copy_number == 2
                         and segs[i].major_chromosome_count == 2)
            rows.append({
                "purity": purity,
                "purity_est": round(model.purity, 3),
                "purity_abs_err": round(abs(model.purity - purity), 3),
                "event_cn_acc": round(100 * cn_ok / len(truth), 1),
                "event_mcc_acc": round(100 * mcc_ok / len(truth), 1),
                "loh_detected": f"{loh_ok}/{len(loh)}",
            })
        except Exception as e:   # failure taxonomy is part of the result
            rows.append({"purity": purity, "error": type(e).__name__})
    return rows


# ---------------------------------------------------------------------------
# chrX/Y reference-ploidy scenario
# ---------------------------------------------------------------------------

def allosome_scenario(rng) -> dict:
    """Male-like sample: chrX/chrY at CN 1.  With a reference ploidy of 1
    the VCF must carry CN 1 as REF (no LOSS records); a planted CN 0 on
    chrX must still call as LOSS."""
    from canvas_tpu.io.ploidy import PloidyInfo, PloidyInterval
    from canvas_tpu.io import vcf_write
    import gzip
    import tempfile

    sizes = {"chr1": 10000, "chrX": 1400, "chrY": 400}  # realistic share
    names = list(sizes)
    contigs = ContigTable(names, [sizes[c] * BIN_BP for c in names])
    cid, start, end, gc_all, count = [], [], [], [], []
    for ci, name in enumerate(names):
        n = sizes[name]
        cn = np.full(n, 2.0 if name == "chr1" else 1.0)
        if name == "chrX":
            cn[600:800] = 0.0       # planted homozygous loss on X
        gc = np.clip(np.rint(rng.normal(45, 8, n)), 10, 80).astype(np.int16)
        lam = BASE_COV * cn / 2.0
        cid.append(np.full(n, ci, np.int32))
        start.append(np.arange(n, dtype=np.int64) * BIN_BP)
        end.append((np.arange(n, dtype=np.int64) + 1) * BIN_BP)
        gc_all.append(gc)
        count.append(rng.poisson(np.maximum(lam, 1e-3)).astype(np.float32))
    bins = BinSet(contigs, np.concatenate(cid), np.concatenate(start),
                  np.concatenate(end), np.concatenate(gc_all),
                  np.concatenate(count))
    called = run_germline(bins)
    ploidy = PloidyInfo({
        "chrX": [PloidyInterval("chrX", 1, sizes["chrX"] * BIN_BP, 1)],
        "chrY": [PloidyInterval("chrY", 1, sizes["chrY"] * BIN_BP, 1)]})
    with tempfile.TemporaryDirectory() as td:
        out = Path(td) / "CNV.vcf.gz"
        vcf_write.write_segments(
            out, [called], ["sample"], contigs, diploid_coverage=BASE_COV,
            reference_cn_fn=lambda i, s: ploidy.reference_copy_number(
                s.chrom, s.begin, s.end))
        records = [line.split("\t") for line in gzip.open(out, "rt")
                   if not line.startswith("#")]
    x_loss = [r for r in records
              if r[0] == "chrX" and ":LOSS:" in r[2]
              and abs(int(r[1]) - 600 * BIN_BP) < 20 * BIN_BP]
    spurious = [r for r in records
                if r[0] in ("chrX", "chrY") and ":LOSS:" in r[2]
                and r not in x_loss]
    cn1_as_ref = all(":REF:" in r[2] for r in records if r[0] == "chrY")
    return {"chrY_cn1_reported_as_REF": bool(cn1_as_ref),
            "planted_chrX_cn0_called_LOSS": bool(x_loss),
            "spurious_allosome_losses": len(spurious)}


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bins", type=int, default=6000,
                    help="bins per contig for germline scenarios")
    ap.add_argument("--json", type=Path, default=None)
    args = ap.parse_args()

    report: dict = {"germline": {}, "somatic_purity_sweep": None,
                    "calibration": None, "allosome_ploidy": None}
    qrec_all: list[tuple[float, bool]] = []

    scenarios = [
        ("baseline_r200", dict(nb_r=200.0)),
        ("overdispersion_r50", dict(nb_r=50.0)),
        ("overdispersion_r20", dict(nb_r=20.0)),
        ("overdispersion_r8", dict(nb_r=8.0)),
        ("gc_waves_mild", dict(nb_r=100.0, gc_waves=12.0,
                               gc_strength=0.5)),
        ("gc_waves_severe", dict(nb_r=100.0, gc_waves=18.0,
                                 gc_strength=1.0)),
        ("ffpe_noise", dict(nb_r=100.0, ffpe_sigma=0.5)),
        ("mappability_dropouts", dict(nb_r=100.0, dropout_frac=0.05)),
    ]
    for name, kw in scenarios:
        rng = np.random.default_rng(7)   # same plants for every scenario
        bins, truth = make_binset(rng, bins_per_contig=args.bins, **kw)
        called = run_germline(bins)
        sc = score_germline(bins, truth, called)
        qrec_all.extend(sc.pop("qrec"))
        report["germline"][name] = sc
        print(f"[germline] {name}: {sc}", file=sys.stderr)

    report["calibration"] = calibration_table(qrec_all)
    rng = np.random.default_rng(23)
    report["somatic_purity_sweep"] = somatic_sweep(rng)
    for row in report["somatic_purity_sweep"]:
        print(f"[somatic] {row}", file=sys.stderr)
    report["allosome_ploidy"] = allosome_scenario(
        np.random.default_rng(5))
    print(f"[allosome] {report['allosome_ploidy']}", file=sys.stderr)

    out = json.dumps(report, indent=2)
    print(out)
    if args.json:
        args.json.write_text(out)


if __name__ == "__main__":
    main()
