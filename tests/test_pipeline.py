"""End-to-end pipeline tests: synthetic genome + BAM -> CLI -> VCF."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from canvas_tpu.genome.reference import write_fasta
from canvas_tpu.io import bam as bamio
from canvas_tpu.pipeline import runner
from canvas_tpu.tools import evaluate_cnv as ec
from canvas_tpu.tools.flag_unique_kmers import flag_unique_kmers


L = 300_000
CNV_PLAN = {  # contig -> list of (start, end, cn)
    "chr1": [(80_000, 140_000, 1), (200_000, 260_000, 3)],
    "chr2": [(50_000, 110_000, 0)],
}


def simulate_reads(rng, seq_len, cn_track, rate=0.25, read_len=50):
    """Poisson read starts proportional to copy number."""
    lam = rate * cn_track / 2.0
    n_reads = rng.poisson(lam)
    records = []
    k = 0
    for pos in np.flatnonzero(n_reads):
        for _ in range(int(n_reads[pos])):
            records.append(bamio.BamRecord(
                0, int(pos), 50, 0x1 | 0x2, f"r{k}", [(read_len, "M")],
                "A" * read_len, np.full(read_len, 30, np.uint8)))
            k += 1
    return records


@pytest.fixture(scope="module")
def reference_dir(tmp_path_factory):
    rng = np.random.default_rng(42)
    ref = tmp_path_factory.mktemp("ref")
    seqs = {c: "".join(rng.choice(list("ACGT"), size=L))
            for c in ("chr1", "chr2")}
    write_fasta(ref / "genome.fa", seqs)
    flag_unique_kmers(ref / "genome.fa", ref / "kmer.fa")
    return ref


def make_bam(path, rng, plan):
    for ci, contig in enumerate(("chr1", "chr2")):
        pass
    all_records = []
    refs = [("chr1", L), ("chr2", L)]
    for ci, contig in enumerate(("chr1", "chr2")):
        cn = np.full(L, 2, dtype=np.float64)
        for s, e, c in plan.get(contig, []):
            cn[s:e] = c
        recs = simulate_reads(np.random.default_rng(1000 + ci), L, cn)
        for r in recs:
            r.ref_id = ci
        all_records.extend(recs)
    bamio.write_bam(path, refs, all_records)


def test_germline_wgs_end_to_end(reference_dir, tmp_path):
    rng = np.random.default_rng(7)
    bam_path = tmp_path / "sample.bam"
    make_bam(bam_path, rng, CNV_PLAN)

    ctx = runner.WorkflowContext(
        reference_folder=str(reference_dir), output_dir=str(tmp_path / "out"))
    sample = runner.Sample("s1", str(bam_path))
    out_vcf = runner.germline_wgs(ctx, sample)
    assert out_vcf.exists()

    # score against the planted truth
    truth = tmp_path / "truth.bed"
    with open(truth, "w") as f:
        for contig, plan in CNV_PLAN.items():
            for s, e, c in plan:
                f.write(f"{contig}\t{s}\t{e}\t{c}\n")
    m = ec.evaluate(truth, out_vcf, passing_only=False)
    assert m.recall > 80.0
    assert m.precision > 80.0

    # resume from checkpoints: re-running must produce the same VCF
    # (compare decompressed content; the gzip header embeds a timestamp)
    import gzip
    first = gzip.open(out_vcf).read()
    ctx2 = runner.WorkflowContext(
        reference_folder=str(reference_dir), output_dir=str(tmp_path / "out"))
    out2 = runner.germline_wgs(ctx2, runner.Sample("s1", str(bam_path)))
    assert gzip.open(out2).read() == first


def test_cli_germline(reference_dir, tmp_path):
    bam_path = tmp_path / "s.bam"
    make_bam(bam_path, np.random.default_rng(3), CNV_PLAN)
    from canvas_tpu.pipeline.cli import main
    rc = main(["Germline-WGS", "-b", str(bam_path), "-n", "cli_sample",
               "-r", str(reference_dir), "-o", str(tmp_path / "cliout")])
    assert rc == 0
    assert (tmp_path / "cliout" / "cli_sample_CNV.vcf.gz").exists()


def test_small_pedigree_end_to_end(reference_dir, tmp_path):
    """Trio: father+proband share a gain; proband has a de novo loss."""
    plans = {
        "father": {"chr1": [(80_000, 140_000, 3)]},
        "mother": {},
        "proband": {"chr1": [(80_000, 140_000, 3)],
                    "chr2": [(50_000, 110_000, 1)]},
    }
    samples = []
    for name, plan in plans.items():
        bam = tmp_path / f"{name}.bam"
        make_bam(bam, np.random.default_rng(11), plan)
        stype = {"father": "Father", "mother": "Mother",
                 "proband": "Proband"}[name]
        samples.append(runner.Sample(name, str(bam), sample_type=stype))
    ctx = runner.WorkflowContext(
        reference_folder=str(reference_dir), output_dir=str(tmp_path / "out"))
    out_vcf = runner.small_pedigree_wgs(ctx, samples)
    assert out_vcf.exists()

    # proband column: both events present
    truth = tmp_path / "truth.bed"
    truth.write_text("chr1\t80000\t140000\t3\nchr2\t50000\t110000\t1\n")
    m = ec.evaluate(truth, out_vcf, sample_index=2, passing_only=False)
    assert m.recall > 75.0
    # mother column: no events -> precision of "no calls" = accuracy high
    m_mother = ec.evaluate(truth, out_vcf, sample_index=1, passing_only=False)
    assert m_mother.recall < 25.0  # mother truly lacks the variants

    # de novo: proband's chr2 loss should carry DQ; shared chr1 gain not
    import gzip
    dn_calls = ec.load_cnv_calls(out_vcf, sample_index=2, dq_threshold=1.0)
    dn_spans = [(c.chrom, c.start, c.end) for calls in dn_calls.values()
                for c in calls]
    assert any(ch == "chr2" and s < 110_000 and e > 50_000
               for ch, s, e in dn_spans)
    assert not any(ch == "chr1" for ch, s, e in dn_spans)

    # per-sample output surface (CanvasPedigreeCaller.cs:137-156): one
    # single-sample VCF per pedigree member, consistent with the
    # multi-sample records, plus the partition coverage track
    out_dir = out_vcf.parent
    for idx, name in enumerate(plans):
        sample_vcf = out_dir / f"{name}_CNV.vcf.gz"
        assert sample_vcf.exists(), name
        multi = ec.load_cnv_calls(out_vcf, sample_index=idx)
        single = ec.load_cnv_calls(sample_vcf, sample_index=0)
        multi_spans = {(ch, c.start, c.end, c.cn)
                       for ch, calls in multi.items() for c in calls}
        single_spans = {(ch, c.start, c.end, c.cn)
                        for ch, calls in single.items() for c in calls}
        assert multi_spans == single_spans, name
        # the sample header line names the sample, not the cohort
        with gzip.open(sample_vcf, "rt") as f:
            header = [l for l in f if l.startswith("#CHROM")][0]
        assert header.rstrip("\n").split("\t")[-1] == name
        part = out_dir / f"{name}_CNV.Partition.bedgraph"
        assert part.exists(), name
        lines = part.read_text().splitlines()
        assert lines[0].startswith("track type=bedGraph")
        assert len(lines) > 1 and all(
            len(l.split("\t")) == 4 for l in lines[1:])

    # Score-distribution goldens (round-4 missing #3): QS and de novo DQ
    # of every proband record pinned exactly on this deterministic
    # fixture.  The pedigree joint likelihood (VariantCaller.cs:60-67),
    # the conditional de novo marginal (CanvasPedigreeCaller.cs:467-483),
    # and the x2 Manta scaling all feed these values — calibration drift
    # in any of them moves the numbers.
    with gzip.open(out_vcf, "rt") as f:
        rows = [l.rstrip("\n").split("\t") for l in f
                if not l.startswith("#")]
    got_scores = []
    for r in rows:
        fmt = r[8].split(":")
        pro = dict(zip(fmt, r[11].split(":")))
        got_scores.append((r[0], int(r[1]), pro.get("QS"), pro.get("DQ")))
    assert got_scores == GOLDEN_PROBAND_SCORES, got_scores


def test_small_pedigree_with_common_cnvs(reference_dir, tmp_path):
    """A common-CNV bed matching a shared event forces its boundaries."""
    plan = {"chr1": [(80_000, 140_000, 3)]}
    samples = []
    for name, t in (("father", "Father"), ("mother", "Mother"),
                    ("proband", "Proband")):
        bam = tmp_path / f"{name}.bam"
        make_bam(bam, np.random.default_rng(13),
                 plan if name != "mother" else {})
        samples.append(runner.Sample(name, str(bam), sample_type=t))
    bed = tmp_path / "common.bed"
    bed.write_text("chr1\t80000\t140000\n")
    ctx = runner.WorkflowContext(
        reference_folder=str(reference_dir), output_dir=str(tmp_path / "out"))
    out_vcf = runner.small_pedigree_wgs(ctx, samples,
                                        common_cnvs_bed=str(bed))
    assert out_vcf.exists()
    import gzip
    body = [l for l in gzip.open(out_vcf, "rt") if not l.startswith("#")]
    assert len(body) >= 2


def make_somatic_bam(path, vcf_path, plan, maf_plan):
    """BAM with het-SNP allele flips + matching normal VCF (ref=A, alt=C).

    Sites every 1 kb (offset 500); reads covering a site carry 'C' with the
    region's minor-allele fraction so the somatic caller gets usable MAFs."""
    rng = np.random.default_rng(77)
    site_pos = np.arange(500, L, 1000)
    all_records = []
    refs = [("chr1", L), ("chr2", L)]
    vcf_lines = [
        "##fileformat=VCFv4.1",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ttumor",
    ]
    for ci, contig in enumerate(("chr1", "chr2")):
        cn = np.full(L, 2, dtype=np.float64)
        for s, e, c in plan.get(contig, []):
            cn[s:e] = c
        maf = np.full(L, 0.5)
        for s, e, q in maf_plan.get(contig, []):
            maf[s:e] = q
        recs = simulate_reads(np.random.default_rng(1000 + ci), L, cn)
        for r in recs:
            r.ref_id = ci
            lo = np.searchsorted(site_pos, r.pos)
            hi = np.searchsorted(site_pos, r.pos + 50)
            if hi > lo:
                seq = list(r.seq)
                for p in site_pos[lo:hi]:
                    if rng.random() < maf[p]:
                        seq[p - r.pos] = "C"
                r.seq = "".join(seq)
        all_records.extend(recs)
        for p in site_pos:
            vcf_lines.append(
                f"{contig}\t{p + 1}\t.\tA\tC\t50\tPASS\t.\tGT:GQX\t0/1:99")
    bamio.write_bam(path, refs, all_records)
    Path(vcf_path).write_text("\n".join(vcf_lines) + "\n")


def test_somatic_enrichment_end_to_end(reference_dir, tmp_path):
    """Enrichment mode: manifest bins + CBS + somatic caller."""
    # tumor with a clear gain over a targeted region set; het sites carry
    # MAF 0.25 in the CN4 (3+1) region, 0.5 in diploid territory
    plan = {"chr1": [(80_000, 200_000, 4)]}
    maf_plan = {"chr1": [(80_000, 200_000, 0.25)]}
    bam = tmp_path / "t.bam"
    snv_vcf = tmp_path / "normal.vcf"
    make_somatic_bam(bam, snv_vcf, plan, maf_plan)
    # targets tile both chromosomes every 2kb (1kb targets)
    lines = []
    for chrom in ("chr1", "chr2"):
        for s in range(10_000, 290_000, 2000):
            lines.append(f"{chrom}\t{s}\t{s + 1000}")
    manifest = tmp_path / "targets.bed"
    manifest.write_text("\n".join(lines) + "\n")
    ctx = runner.WorkflowContext(
        reference_folder=str(reference_dir), output_dir=str(tmp_path / "out"))
    tumor = runner.Sample("tumor", str(bam), normal_vcf=str(snv_vcf))
    out_vcf = runner.somatic_wgs(ctx, tumor, manifest_path=str(manifest))
    assert out_vcf.exists()
    calls = ec.load_cnv_calls(out_vcf)
    gains = [c for cl in calls.values() for c in cl if c.cn > 2]
    assert any(c.chrom == "chr1" and c.start < 200_000 and c.end > 80_000
               for c in gains)


def test_somatic_training_mode_empty_vcf_on_failure(
        reference_dir, tmp_path, monkeypatch):
    """SomaticCaller.cs:409-422: in training mode a modeling exception
    terminates normally with an empty VCF; in production it is fatal."""
    from canvas_tpu.models import somatic as somatic_caller

    plan = {"chr1": [(80_000, 200_000, 4)]}
    bam = tmp_path / "t.bam"
    snv_vcf = tmp_path / "normal.vcf"
    make_somatic_bam(bam, snv_vcf, plan, {})

    def boom(*a, **k):
        raise somatic_caller.UncallableDataException("outside testable range")

    monkeypatch.setattr(somatic_caller, "call_somatic", boom)

    ctx = runner.WorkflowContext(
        reference_folder=str(reference_dir), output_dir=str(tmp_path / "p"))
    with pytest.raises(somatic_caller.UncallableDataException):
        runner.somatic_wgs(ctx, runner.Sample("tumor", str(bam)))

    ctx2 = runner.WorkflowContext(
        reference_folder=str(reference_dir), output_dir=str(tmp_path / "t"))
    ctx2.config.somatic_training_mode = True
    out_vcf = runner.somatic_wgs(ctx2, runner.Sample("tumor", str(bam)))
    assert out_vcf.exists()
    calls = ec.load_cnv_calls(out_vcf)
    assert sum(len(v) for v in calls.values()) == 0


def test_gc_weighted_coverage_mode(reference_dir, tmp_path):
    """GCContentWeighted mode end-to-end: weights computed from fragment
    lengths + genome GC, calls still recover the planted CNVs."""
    bam_path = tmp_path / "s.bam"
    # give reads realistic tlen so fragment GC windows are non-degenerate
    all_records = []
    refs = [("chr1", L), ("chr2", L)]
    for ci, contig in enumerate(("chr1", "chr2")):
        cn = np.full(L, 2, dtype=np.float64)
        for s, e, c in CNV_PLAN.get(contig, []):
            cn[s:e] = c
        recs = simulate_reads(np.random.default_rng(2000 + ci), L, cn)
        for r in recs:
            r.ref_id = ci
            r.tlen = 300
        all_records.extend(recs)
    bamio.write_bam(bam_path, refs, all_records)

    ctx = runner.WorkflowContext(
        reference_folder=str(reference_dir), output_dir=str(tmp_path / "out"))
    ctx.config.coverage_mode = "GCContentWeighted"
    out_vcf = runner.germline_wgs(ctx, runner.Sample("gcw", str(bam_path)))
    truth = tmp_path / "truth.bed"
    with open(truth, "w") as f:
        for contig, plan in CNV_PLAN.items():
            for s, e, c in plan:
                f.write(f"{contig}\t{s}\t{e}\t{c}\n")
    m = ec.evaluate(truth, out_vcf, passing_only=False)
    assert m.recall > 80.0
    assert m.precision > 80.0


def test_fragment_coverage_mode_enrichment(reference_dir, tmp_path):
    """Fragment mode: properly-paired fragments counted into manifest bins."""
    plan = {"chr1": [(80_000, 200_000, 4)]}
    bam = tmp_path / "t.bam"
    # paired fragments: two reads per fragment, proper pair flags
    all_records = []
    refs = [("chr1", L), ("chr2", L)]
    k = 0
    for ci, contig in enumerate(("chr1", "chr2")):
        cn = np.full(L, 2, dtype=np.float64)
        for s, e, c in plan.get(contig, []):
            cn[s:e] = c
        lam = 0.12 * cn / 2.0
        n_frag = np.random.default_rng(3000 + ci).poisson(lam)
        for pos in np.flatnonzero(n_frag):
            for _ in range(int(n_frag[pos])):
                mate_pos = min(int(pos) + 250, L - 51)
                name = f"f{ci}_{k}"; k += 1
                all_records.append(bamio.BamRecord(
                    ci, int(pos), 50, 0x1 | 0x2 | 0x20, name, [(50, "M")],
                    "A" * 50, np.full(50, 30, np.uint8), ci, mate_pos, 300))
                all_records.append(bamio.BamRecord(
                    ci, mate_pos, 50, 0x1 | 0x2 | 0x10, name, [(50, "M")],
                    "A" * 50, np.full(50, 30, np.uint8), ci, int(pos), -300))
    bamio.write_bam(bam, refs, all_records)
    lines = []
    for chrom in ("chr1", "chr2"):
        for s in range(10_000, 290_000, 2000):
            lines.append(f"{chrom}\t{s}\t{s + 1000}")
    manifest = tmp_path / "targets.bed"
    manifest.write_text("\n".join(lines) + "\n")
    from canvas_tpu.io.manifest import Manifest
    ctx = runner.WorkflowContext(
        reference_folder=str(reference_dir), output_dir=str(tmp_path / "out"))
    ctx.config.coverage_mode = "Fragment"
    bins = runner.run_bin_predefined(ctx, runner.Sample("frag", str(bam)),
                                     Manifest.read(str(manifest)))
    sl = bins.contig_slices()["chr1"]
    starts, counts = bins.start[sl], bins.count[sl]
    gain = counts[(starts >= 80_000) & (starts < 200_000)]
    normal = counts[(starts < 70_000) | (starts >= 210_000)]
    # CN4 region carries ~2x the fragments of diploid territory
    assert np.median(gain) > 1.6 * np.median(normal)
    assert np.median(normal) > 0


def test_fragment_mode_requires_manifest(reference_dir, tmp_path):
    bam_path = tmp_path / "s.bam"
    make_bam(bam_path, np.random.default_rng(5), CNV_PLAN)
    ctx = runner.WorkflowContext(
        reference_folder=str(reference_dir), output_dir=str(tmp_path / "o"))
    ctx.config.coverage_mode = "Fragment"
    with pytest.raises(ValueError, match="predefined bins"):
        runner.germline_wgs(ctx, runner.Sample("s", str(bam_path)))


def test_tumor_normal_wgs_ratio_path(reference_dir, tmp_path):
    """T/N WGS: normalization on binned counts (ratio pseudo-counts into
    CanvasClean), matched-normal reference track, somatic caller."""
    plan = {"chr1": [(80_000, 200_000, 4)]}
    maf_plan = {"chr1": [(80_000, 200_000, 0.25)]}
    t_bam = tmp_path / "t.bam"
    snv_vcf = tmp_path / "n.vcf"
    make_somatic_bam(t_bam, snv_vcf, plan, maf_plan)
    n_bam = tmp_path / "normal.bam"
    make_bam(n_bam, np.random.default_rng(9), {})   # diploid everywhere

    ctx = runner.WorkflowContext(
        reference_folder=str(reference_dir), output_dir=str(tmp_path / "out"))
    tumor = runner.Sample("tumor", str(t_bam), normal_vcf=str(snv_vcf))
    normal = runner.Sample("tumor_N", str(n_bam))
    out_vcf = runner.somatic_wgs(ctx, tumor, normal)
    assert out_vcf.exists()
    assert (tmp_path / "out" / "tumor.cnd").exists()
    calls = ec.load_cnv_calls(out_vcf)
    gains = [c for cl in calls.values() for c in cl if c.cn > 2]
    assert any(c.chrom == "chr1" and c.start < 200_000 and c.end > 80_000
               for c in gains)


def test_weighted_average_controls_pipeline(reference_dir, tmp_path):
    """Panel-of-normals: two control BAMs merged by 1/median weights."""
    plan = {"chr1": [(80_000, 200_000, 4)]}
    maf_plan = {"chr1": [(80_000, 200_000, 0.25)]}
    t_bam = tmp_path / "t.bam"
    snv_vcf = tmp_path / "n.vcf"
    make_somatic_bam(t_bam, snv_vcf, plan, maf_plan)
    c1 = tmp_path / "c1.bam"
    c2 = tmp_path / "c2.bam"
    make_bam(c1, np.random.default_rng(10), {})
    make_bam(c2, np.random.default_rng(11), {})

    ctx = runner.WorkflowContext(
        reference_folder=str(reference_dir), output_dir=str(tmp_path / "out"))
    tumor = runner.Sample("tumor", str(t_bam), normal_vcf=str(snv_vcf))
    ctrls = [runner.Sample("tumor_C0", str(c1)),
             runner.Sample("tumor_C1", str(c2))]
    out_vcf = runner.somatic_wgs(ctx, tumor, controls=ctrls)
    calls = ec.load_cnv_calls(out_vcf)
    gains = [c for cl in calls.values() for c in cl if c.cn > 2]
    assert any(c.chrom == "chr1" and c.start < 200_000 and c.end > 80_000
               for c in gains)


def test_interop_stage_outputs(reference_dir, tmp_path):
    """Per-chromosome <chr>-<sample>.SNV.txt.gz (CanvasRunner.cs:688-710)
    and <sample>.partitioned (Segmentation.cs:235-252) interop files are
    written alongside the checkpoints."""
    bam_path = tmp_path / "s.bam"
    make_bam(bam_path, np.random.default_rng(5), CNV_PLAN)
    # het SNV sites for a VF file
    vcf = tmp_path / "normal.vcf"
    lines = ["##fileformat=VCFv4.1",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts"]
    rng = np.random.default_rng(2)
    for pos in sorted(rng.integers(1000, L - 1000, size=200).tolist()):
        lines.append(f"chr1\t{pos}\t.\tA\tC\t50\tPASS\t.\tGT:GQX\t0/1:60")
    vcf.write_text("\n".join(lines) + "\n")

    ctx = runner.WorkflowContext(
        reference_folder=str(reference_dir), output_dir=str(tmp_path / "o"))
    sample = runner.Sample("sx", str(bam_path), normal_vcf=str(vcf))
    runner.germline_wgs(ctx, sample)
    ck = ctx.checkpointer
    assert ck.path("chr1-sx.SNV.txt.gz").exists()
    assert ck.path("chr2-sx.SNV.txt.gz").exists()
    assert ck.path("sx.partitioned").exists()
    from canvas_tpu.ops.segments import read_partitioned
    rows = read_partitioned(ck.path("sx.partitioned"))
    assert "chr1" in rows and len(rows["chr1"][0]) > 10


def test_somatic_enrichment_control_binned(reference_dir, tmp_path):
    """--control-binned: a precomputed control .binned file feeds
    normalization instead of control BAMs (SomaticEnrichmentModeParser
    ControlBinned -> CanvasRunner.cs:501-505)."""
    bam_path = tmp_path / "t.bam"
    make_bam(bam_path, np.random.default_rng(21),
             {"chr1": [(80_000, 140_000, 4)]})
    manifest = tmp_path / "targets.txt"
    rows = ["#Nextera manifest", "[Header]", "[Regions]",
            "Name\tChromosome\tStart\tEnd"]
    for c in ("chr1", "chr2"):
        for s in range(10_000, L - 10_000, 3000):
            rows.append(f"r\t{c}\t{s + 1}\t{s + 1500}")
    manifest.write_text("\n".join(rows) + "\n")

    ctx = runner.WorkflowContext(
        reference_folder=str(reference_dir), output_dir=str(tmp_path / "o1"))
    from canvas_tpu.io.manifest import Manifest
    control = runner.Sample("ctrl", str(bam_path))
    # produce a control .binned via a normal control run, then reuse it
    cb = runner.run_bin_predefined(ctx, control, Manifest.read(manifest))
    binned = tmp_path / "control.binned"
    cb.write_text(binned)

    from canvas_tpu.pipeline.cli import main
    rc = main(["Somatic-Enrichment", "-b", str(bam_path), "-n", "tum",
               "-r", str(reference_dir), "-o", str(tmp_path / "o2"),
               "--manifest", str(manifest),
               "--control-binned", str(binned)])
    assert rc == 0
    assert (tmp_path / "o2" / "tum_CNV.vcf.gz").exists()
    # mutual exclusion enforced
    rc = main(["Somatic-Enrichment", "-b", str(bam_path), "-n", "tum2",
               "-r", str(reference_dir), "-o", str(tmp_path / "o3"),
               "--manifest", str(manifest),
               "--control-bams", str(bam_path),
               "--control-binned", str(binned)])
    assert rc == 2


def test_cli_small_pedigree_reference_style(reference_dir, tmp_path):
    """Reference-style CLI: repeated --bam with --mother/--father/--proband
    name selectors and one multisample --sample-b-allele-vcf (README demo
    syntax + SmallPedigreeOptionsParser.cs)."""
    import gzip as _gzip

    names = ["father", "mother", "child1"]
    bams = []
    for name in names:
        bam = tmp_path / f"{name}.bam"
        make_bam(bam, np.random.default_rng(31), {})
        bams.append(bam)
    # multisample b-allele VCF with one genotype column per sample
    vcf = tmp_path / "Pedigree.vcf"
    rng = np.random.default_rng(4)
    lines = ["##fileformat=VCFv4.1",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
             + "\t".join(names)]
    for pos in sorted(rng.integers(1000, L - 1000, size=120).tolist()):
        gts = "\t".join("0/1" for _ in names)
        lines.append(f"chr1\t{pos}\t.\tA\tC\t50\tPASS\t.\tGT\t{gts}")
    vcf.write_text("\n".join(lines) + "\n")

    from canvas_tpu.pipeline.cli import main
    rc = main(["SmallPedigree-WGS",
               "--bam", str(bams[0]), "--bam", str(bams[1]),
               "--bam", str(bams[2]),
               "--mother", "mother", "--father", "father",
               "--proband", "child1",
               "--sample-b-allele-vcf", str(vcf),
               "-r", str(reference_dir), "-o", str(tmp_path / "po")])
    assert rc == 0
    out = tmp_path / "po" / "CNV.vcf.gz"
    assert out.exists()
    header = _gzip.open(out, "rt").read()
    # sample columns named from the BAM-derived names, proband last given
    assert "father\tmother\tchild1" in header


def test_start_stop_checkpoint_flags(reference_dir, tmp_path):
    """-c/-s (CommonOptionsParser.cs:13-14): -s stops the workflow after
    the named stage with exit 0 and no VCF; a later -c run re-executes
    from the named stage (loading earlier stages' artifacts) and finishes."""
    import gzip

    from canvas_tpu.pipeline.cli import main

    bam_path = tmp_path / "s.bam"
    make_bam(bam_path, np.random.default_rng(5), CNV_PLAN)
    out_dir = tmp_path / "ckout"
    base = ["Germline-WGS", "-b", str(bam_path), "-n", "ck",
            "-r", str(reference_dir), "-o", str(out_dir)]

    # stop after CanvasClean: clean exit, bin+clean checkpoints exist,
    # no VCF written
    rc = main(base + ["-s", "CanvasClean"])
    assert rc == 0
    assert (out_dir / "Checkpoints" / "CanvasBin_ck.binned.gz").exists()
    assert not (out_dir / "_CNV.vcf.gz".join(["ck", ""])).exists()
    assert not (out_dir / "ck_CNV.vcf.gz").exists()

    # resume from CanvasClean onward: loads the binned checkpoint, re-runs
    # clean/partition/caller, produces the VCF
    rc = main(base + ["-c", "CanvasClean"])
    assert rc == 0
    vcf = out_dir / "ck_CNV.vcf.gz"
    assert vcf.exists()
    resumed = gzip.open(vcf).read()

    # numbered form: "-s 2" = stop after the 2nd stage (CanvasClean)
    rc = main(["Germline-WGS", "-b", str(bam_path), "-n", "ck2",
               "-r", str(reference_dir), "-o", str(tmp_path / "ckout2"),
               "-s", "2"])
    assert rc == 0
    assert not (tmp_path / "ckout2" / "ck2_CNV.vcf.gz").exists()

    # a full fresh run matches the stop-then-resume VCF byte for byte
    rc = main(["Germline-WGS", "-b", str(bam_path), "-n", "ck",
               "-r", str(reference_dir), "-o", str(tmp_path / "ckout3")])
    assert rc == 0
    full = gzip.open(tmp_path / "ckout3" / "ck_CNV.vcf.gz").read()
    strip = lambda v: b"\n".join(
        ln for ln in v.split(b"\n") if not ln.startswith(b"##fileDate"))
    assert strip(resumed) == strip(full)


def test_reference_style_flags(reference_dir, tmp_path):
    """-r can point at the kmer.fa FILE (the reference's KmerFasta
    FileOption, CommonOptionsParser.cs:8) and -g names the genome folder
    (CommonOptionsParser.cs:10); output matches the folder-style run."""
    import gzip

    from canvas_tpu.pipeline.cli import main

    bam_path = tmp_path / "s.bam"
    make_bam(bam_path, np.random.default_rng(9), CNV_PLAN)
    rc = main(["Germline-WGS", "-b", str(bam_path), "-n", "rs",
               "-r", str(reference_dir / "kmer.fa"),
               "-g", str(reference_dir),
               "-o", str(tmp_path / "out_file_style")])
    assert rc == 0
    rc = main(["Germline-WGS", "-b", str(bam_path), "-n", "rs",
               "-r", str(reference_dir), "-o", str(tmp_path / "out_dir")])
    assert rc == 0
    strip = lambda v: b"\n".join(
        ln for ln in v.split(b"\n") if not ln.startswith(b"##fileDate"))
    a = gzip.open(tmp_path / "out_file_style" / "rs_CNV.vcf.gz").read()
    b = gzip.open(tmp_path / "out_dir" / "rs_CNV.vcf.gz").read()
    assert strip(a) == strip(b)


def test_unknown_checkpoint_spec_errors(reference_dir, tmp_path):
    """A typo'd -c/-s must fail loudly after the run instead of silently
    loading every checkpoint / running to completion."""
    from canvas_tpu.pipeline.cli import main

    bam_path = tmp_path / "s.bam"
    make_bam(bam_path, np.random.default_rng(11), CNV_PLAN)
    rc = main(["Germline-WGS", "-b", str(bam_path), "-n", "ty",
               "-r", str(reference_dir), "-o", str(tmp_path / "o1"),
               "-c", "CanvasParttion"])
    assert rc == 2
    rc = main(["Germline-WGS", "-b", str(bam_path), "-n", "ty",
               "-r", str(reference_dir), "-o", str(tmp_path / "o2"),
               "-s", "99"])
    assert rc == 2


def test_small_pedigree_start_checkpoint_shared_bin_size(
        reference_dir, tmp_path):
    """-c CanvasBin on a completed SmallPedigree run must re-bin with the
    SHARED multi-sample bin size and reproduce the fresh run's VCF (the
    need_ingest decision must happen after the stage gate flips)."""
    import gzip

    plans = {
        "father": {"chr1": [(80_000, 140_000, 3)]},
        "mother": {},
        "proband": {"chr1": [(80_000, 140_000, 3)]},
    }

    def mk_samples():
        out = []
        for name, plan in plans.items():
            bam = tmp_path / f"{name}.bam"
            if not bam.exists():
                make_bam(bam, np.random.default_rng(21), plan)
            stype = {"father": "Father", "mother": "Mother",
                     "proband": "Proband"}[name]
            out.append(runner.Sample(name, str(bam), sample_type=stype))
        return out

    ctx = runner.WorkflowContext(
        reference_folder=str(reference_dir), output_dir=str(tmp_path / "o"))
    first = gzip.open(runner.small_pedigree_wgs(ctx, mk_samples())).read()

    ctx2 = runner.WorkflowContext(
        reference_folder=str(reference_dir), output_dir=str(tmp_path / "o"),
        start_checkpoint="CanvasBin")
    second = gzip.open(runner.small_pedigree_wgs(ctx2, mk_samples())).read()
    ctx2.checkpointer.finish()

    strip = lambda v: b"\n".join(
        ln for ln in v.split(b"\n") if not ln.startswith(b"##fileDate"))
    assert strip(first) == strip(second)


def test_two_process_distributed_run_matches_single(reference_dir, tmp_path):
    """REAL 2-process jax.distributed run of the production CLI
    (--coordinator): each process BAM-scans only its contig shard and
    all-gathers the observed tracks (runner.ingest_observed ->
    distributed.my_contigs/all_gather_host_data); the resulting VCF must
    match a single-process run byte for byte."""
    import gzip
    import os
    import socket

    bam_path = tmp_path / "s.bam"
    make_bam(bam_path, np.random.default_rng(13), CNV_PLAN)

    with socket.socket() as s:      # free port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    def args(outdir, extra):
        return [sys.executable, "-m", "canvas_tpu", "Germline-WGS",
                "-b", str(bam_path), "-n", "dist",
                "-r", str(reference_dir), "-o", str(outdir)] + extra

    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": str(Path(__file__).parent.parent)}
    procs = [
        subprocess.Popen(
            args(tmp_path / f"out_p{i}",
                 ["--coordinator", f"127.0.0.1:{port}",
                  "--num-processes", "2", "--process-id", str(i)]),
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        for i in range(2)]
    for p in procs:
        assert p.wait(timeout=300) == 0

    single = subprocess.run(
        args(tmp_path / "out_single", []), env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, timeout=300)
    assert single.returncode == 0

    strip = lambda v: b"\n".join(
        ln for ln in v.split(b"\n") if not ln.startswith(b"##fileDate"))
    ref = strip(gzip.open(tmp_path / "out_single" / "dist_CNV.vcf.gz").read())
    for i in range(2):
        got = strip(gzip.open(tmp_path / f"out_p{i}" / "dist_CNV.vcf.gz").read())
        assert got == ref, f"process {i} VCF differs from single-process run"


# QS/DQ of each proband record in test_small_pedigree_end_to_end's fixed
# fixture; update only with an explanation of what moved the scores.
GOLDEN_PROBAND_SCORES = [
    ('chr1', 1, '18.07', '.'),
    ('chr1', 80181, '19.81', '.'),       # inherited gain: QS only, no DQ
    ('chr1', 139525, '18.07', '.'),
    ('chr2', 1, '18.07', '.'),
    ('chr2', 49830, '32.58', '26.00'),   # de novo loss: DQ above Manta 20
    ('chr2', 110533, '18.07', '.'),
]
