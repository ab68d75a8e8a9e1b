"""EvaluateCNV and FlagUniqueKmers tests."""

import numpy as np
import pytest

from canvas_tpu.tools import evaluate_cnv as ec
from canvas_tpu.tools import flag_unique_kmers as fk
from canvas_tpu.genome.reference import read_fasta, write_fasta


def test_metrics_perfect_calls(tmp_path):
    truth = tmp_path / "truth.bed"
    truth.write_text("chr1\t1000\t2000\t1\nchr1\t5000\t6000\t3\n")
    vcf = tmp_path / "calls.vcf"
    vcf.write_text("\n".join([
        "##fileformat=VCFv4.1",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS",
        "chr1\t1000\tCanvas:LOSS:chr1:1001-2000\tN\t<CN0>\t30\tPASS\tSVTYPE=CNV;END=2000\tGT:CN:QS:FT\t0/1:1:30:PASS",
        "chr1\t2001\tCanvas:REF:chr1:2001-5000\tN\t.\t30\tPASS\tEND=5000\tGT:CN:QS:FT\t./.:2:30:PASS",
        "chr1\t5000\tCanvas:GAIN:chr1:5001-6000\tN\t<CN3>\t30\tPASS\tSVTYPE=CNV;END=6000\tGT:CN:QS:FT\t./1:3:30:PASS",
    ]) + "\n")
    m = ec.evaluate(truth, vcf)
    assert m.recall == pytest.approx(100.0)
    assert m.precision == pytest.approx(100.0)
    assert m.accuracy == pytest.approx(100.0)
    assert m.f1 == pytest.approx(1.0)


def test_cn_above_max_clamps_to_bucket5(tmp_path):
    """CNVEvaluator.cs:212,229: both truth and call CNs above MaxCn=5 clamp
    to 5 BEFORE bucketing, so a CN=8 truth called CN=10 (or CN=6) lands in
    base_count[5,5] and counts as a true positive, while a CN=4 truth
    called CN=9 lands in [4,5] — a mismatch despite both being gains."""
    truth = tmp_path / "truth.bed"
    truth.write_text("chr1\t1000\t2000\t8\nchr1\t5000\t6000\t4\n")
    vcf = tmp_path / "calls.vcf"
    vcf.write_text("\n".join([
        "##fileformat=VCFv4.1",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS",
        "chr1\t1000\tCanvas:GAIN:chr1:1001-2000\tN\t<CN10>\t30\tPASS\t"
        "SVTYPE=CNV;END=2000\tGT:CN:QS:FT\t./1:10:30:PASS",
        "chr1\t5000\tCanvas:GAIN:chr1:5001-6000\tN\t<CN9>\t30\tPASS\t"
        "SVTYPE=CNV;END=6000\tGT:CN:QS:FT\t./1:9:30:PASS",
    ]) + "\n")
    known = ec.load_known_cn(truth)
    calls = ec.load_cnv_calls(vcf)
    counter = ec.BaseCounter()
    ec.count_bases(known, calls, counter)
    assert counter.base_count[5, 5, :].sum() == 1000   # 8->5 truth, 10->5 call
    assert counter.base_count[4, 5, :].sum() == 1000   # 4 truth, 9->5 call
    m = ec.calculate_metrics(counter)
    # clamped-equal bases are true positives; 4-vs-9 is direction-correct
    assert m.recall == pytest.approx(50.0)
    assert m.direction_recall == pytest.approx(100.0)


def test_cn6_call_on_cn8_truth_counts_correct(tmp_path):
    """The clamp makes ANY call >= 5 'correct' for truth >= 5 — e.g. a
    diploid caller's extrapolated CN=6 on a CN=8 truth region (reference
    callers can emit CN up to 10).  Pin that equivalence class."""
    truth = tmp_path / "truth.bed"
    truth.write_text("chr1\t1000\t2000\t8\n")
    vcf = tmp_path / "calls.vcf"
    vcf.write_text("\n".join([
        "##fileformat=VCFv4.1",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS",
        "chr1\t1000\tCanvas:GAIN:chr1:1001-2000\tN\t<CN6>\t30\tPASS\t"
        "SVTYPE=CNV;END=2000\tGT:CN:QS:FT\t./1:6:30:PASS",
    ]) + "\n")
    m = ec.evaluate(truth, vcf)
    assert m.recall == pytest.approx(100.0)
    assert m.precision == pytest.approx(100.0)


def test_metrics_partial_overlap(tmp_path):
    truth = tmp_path / "truth.bed"
    truth.write_text("chr1\t1000\t2000\t1\n")
    vcf = tmp_path / "calls.vcf"
    # call only covers half the deletion; rest of truth has no call
    vcf.write_text("\n".join([
        "##fileformat=VCFv4.1",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS",
        "chr1\t1000\tCanvas:LOSS:chr1:1001-1500\tN\t<CN0>\t30\tPASS\tSVTYPE=CNV;END=1500\tGT:CN:QS:FT\t0/1:1:30:PASS",
    ]) + "\n")
    m = ec.evaluate(truth, vcf)
    assert m.recall == pytest.approx(50.0)
    assert m.precision == pytest.approx(100.0)


def test_metrics_false_positive(tmp_path):
    truth = tmp_path / "truth.bed"
    truth.write_text("chr1\t1000\t2000\t2\n")  # truth says normal
    vcf = tmp_path / "calls.vcf"
    vcf.write_text("\n".join([
        "##fileformat=VCFv4.1",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS",
        "chr1\t1000\tCanvas:LOSS:chr1:1001-2000\tN\t<CN0>\t30\tPASS\tSVTYPE=CNV;END=2000\tGT:CN:QS:FT\t0/1:1:30:PASS",
    ]) + "\n")
    m = ec.evaluate(truth, vcf)
    assert m.precision == pytest.approx(0.0)
    assert m.accuracy == pytest.approx(0.0)


def test_exclusion_regions(tmp_path):
    truth = tmp_path / "truth.bed"
    truth.write_text("chr1\t1000\t2000\t1\n")
    excl = tmp_path / "excl.bed"
    excl.write_text("chr1\t1000\t1500\n")
    vcf = tmp_path / "calls.vcf"
    vcf.write_text("\n".join([
        "##fileformat=VCFv4.1",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS",
        "chr1\t1000\tCanvas:LOSS:chr1:1001-2000\tN\t<CN0>\t30\tPASS\tSVTYPE=CNV;END=2000\tGT:CN:QS:FT\t0/1:1:30:PASS",
    ]) + "\n")
    truth_d = ec.load_truth_bed(truth)
    calls = ec.load_cnv_calls(vcf)
    counter = ec.BaseCounter()
    ec.count_bases(truth_d, calls, counter, ec.load_exclude_bed(excl))
    # only 500 unexcluded bases counted
    assert counter.base_count[1, 1, 2] == 500


def test_dq_threshold_filter(tmp_path):
    vcf = tmp_path / "calls.vcf"
    vcf.write_text("\n".join([
        "##fileformat=VCFv4.1",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS",
        "chr1\t1000\tx\tN\t<CN0>\t30\tPASS\tEND=2000\tGT:CN:QS:FT:DQ\t0/1:1:30:PASS:25.0",
        "chr1\t3000\tx\tN\t<CN0>\t30\tPASS\tEND=4000\tGT:CN:QS:FT:DQ\t0/1:1:30:PASS:5.0",
        "chr1\t5000\tx\tN\t<CN0>\t30\tPASS\tEND=6000\tGT:CN:QS:FT\t0/1:1:30:PASS",
    ]) + "\n")
    calls = ec.load_cnv_calls(vcf, dq_threshold=20.0)
    assert len(calls["chr1"]) == 1
    assert calls["chr1"][0].start == 1000


def test_flag_unique_kmers(tmp_path, rng):
    # random 200bp sequence: nearly all 35-mers unique; add an exact repeat
    seq = "".join(rng.choice(list("ACGT"), size=200))
    repeat = seq[:40]
    genome = {"chr1": seq + repeat}  # 35-mers inside the repeat occur twice
    fa = tmp_path / "genome.fa"
    write_fasta(fa, genome)
    out_fa = tmp_path / "kmer.fa"
    masks = fk.flag_unique_kmers(fa, out_fa)
    m = masks["chr1"]
    # positions 0..5 are inside the repeated 40bp prefix -> not unique
    assert not m[:6].any()
    # middle positions unique
    assert m[60:100].all()
    # output fasta case encodes the mask
    back = read_fasta(out_fa)["chr1"]
    upp = (back >= 65) & (back <= 90)
    np.testing.assert_array_equal(upp, m)


def test_kmers_with_n(tmp_path, rng):
    seq = "".join(rng.choice(list("ACGT"), size=100))
    seq = seq[:50] + "N" + seq[51:]
    fa = tmp_path / "g.fa"
    write_fasta(fa, {"c": seq})
    masks = fk.flag_unique_kmers(fa, tmp_path / "k.fa")
    # windows covering the N (starts 16..50) are not unique
    assert not masks["c"][16:51].any()
    assert masks["c"][0:10].all()


def test_kmers_multipass_same_result(tmp_path, rng):
    seq = "".join(rng.choice(list("ACGT"), size=300))
    fa = tmp_path / "g.fa"
    write_fasta(fa, {"c": seq})
    m1 = fk.flag_unique_kmers(fa, tmp_path / "k1.fa", n_passes=1)
    m3 = fk.flag_unique_kmers(fa, tmp_path / "k2.fa", n_passes=3)
    np.testing.assert_array_equal(m1["c"], m3["c"])


def test_revcomp_canonicalization(tmp_path):
    # a sequence plus its reverse complement: every kmer has a mirror
    fwd = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTA"  # 37bp
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    rc = "".join(comp[c] for c in reversed(fwd))
    fa = tmp_path / "g.fa"
    write_fasta(fa, {"c": fwd + "CCCCCCCCCC" + rc})
    masks = fk.flag_unique_kmers(fa, tmp_path / "k.fa")
    # kmers fully inside fwd have their RC counterpart -> not unique
    assert not masks["c"][0:3].any()


def _write_calls_vcf(path, records):
    path.write_text("\n".join([
        "##fileformat=VCFv4.1",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS",
    ] + records) + "\n")


def test_evaluate_size_split_and_roi(tmp_path):
    truth = tmp_path / "truth.bed"
    # one small (2kb) and one large (200kb) loss
    truth.write_text("chr1\t1000\t3000\t1\nchr1\t100000\t300000\t1\n")
    vcf = tmp_path / "calls.vcf"
    _write_calls_vcf(vcf, [
        "chr1\t1000\tCanvas:LOSS:chr1:1001-3000\tN\t<CN0>\t30\tPASS\t"
        "SVTYPE=CNV;END=3000\tGT:CN:QS:FT\t0/1:1:30:PASS",
        # the large truth interval is MISSED (called REF)
        "chr1\t3001\tCanvas:REF:chr1:3001-300000\tN\t.\t30\tPASS\t"
        "END=300000\tGT:CN:QS:FT\t./.:2:30:PASS",
    ])
    # small bin: perfect recall
    m_small = ec.evaluate(truth, vcf, min_size=0, max_size=4999)
    assert m_small.recall == pytest.approx(100.0)
    # large bin: zero recall
    m_large = ec.evaluate(truth, vcf, min_size=100_000, max_size=499_999)
    assert m_large.recall == pytest.approx(0.0)

    # ROI covering only the called loss: ROI accuracy 100
    roi = tmp_path / "roi.bed"
    roi.write_text("chr1\t1500\t2500\n")
    m, counter = ec.evaluate(truth, vcf, roi_path=roi, return_counter=True)
    assert m.roi_bases == 1000
    assert m.roi_accuracy == pytest.approx(100.0)
    rep = ec.format_report(m, counter)
    assert "ROIAccuracy\t100.0000" in rep
    assert "MeanEventAccuracy" in rep


def test_evaluate_skips_unmappable_truth(tmp_path):
    truth = tmp_path / "truth.bed"
    truth.write_text("chr1\t100\t300\t3\n")
    vcf = tmp_path / "calls.vcf"
    _write_calls_vcf(vcf, [
        # variant truth is called REF -> recall 0 ... unless skipped
        "chr1\t0\tCanvas:REF:chr1:1-1000\tN\t.\t30\tPASS\t"
        "END=1000\tGT:CN:QS:FT\t./.:2:30:PASS",
    ])
    kmer = tmp_path / "kmer.fa"
    # all-lowercase contig = fully unmappable
    write_fasta(kmer, {"chr1": "acgt" * 250})
    m = ec.evaluate(truth, vcf)
    assert m.recall == pytest.approx(0.0)
    m2 = ec.evaluate(truth, vcf, kmer_fa=kmer)
    assert np.isnan(m2.recall)  # the only variant interval was skipped


def test_evaluate_cnv_cli_split(tmp_path, capsys):
    truth = tmp_path / "truth.bed"
    truth.write_text("chr1\t1000\t3000\t1\n")
    vcf = tmp_path / "calls.vcf"
    _write_calls_vcf(vcf, [
        "chr1\t1000\tCanvas:LOSS:chr1:1001-3000\tN\t<CN0>\t30\tPASS\t"
        "SVTYPE=CNV;END=3000\tGT:CN:QS:FT\t0/1:1:30:PASS",
    ])
    excluded = tmp_path / "empty.bed"
    excluded.write_text("")
    out = tmp_path / "eval"
    assert ec.main([str(truth), str(vcf), str(excluded), str(out),
                    "--split-by-size", "--ploidy", "2",
                    "--min-size", "0"]) == 0
    files = sorted(p.name for p in out.iterdir())
    assert "EvaluateCNVResults.txt" in files
    assert "EvaluateCNVResults_0kb_5kb.txt" in files
    assert "EvaluateCNVResults_500kb+.txt" in files
    body = (out / "EvaluateCNVResults_0kb_5kb.txt").read_text()
    assert "Recall\t100.0000" in body


def test_somatic_parameter_sweep_converges():
    from canvas_tpu.models import somatic as som
    from canvas_tpu.tools import optimize_somatic_model as opt

    # toy objective: score peaks when DeviationFactor == 2.0 and
    # HeterogeneityWeight == 0.3; sweep must find them and restore globals
    before = (som.DEVIATION_FACTOR, som.HETEROGENEITY_WEIGHT)

    def run_fn(sample):
        return (som.DEVIATION_FACTOR, som.HETEROGENEITY_WEIGHT)

    def score_fn(sample, out):
        df, hw = out
        return -((df - 2.0) ** 2 + (hw - 0.3) ** 2)

    grid = {"DeviationFactor": [1.0, 1.75, 2.0, 3.0],
            "HeterogeneityWeight": [0.1, 0.202, 0.3, 0.5]}
    res = opt.sweep(grid, run_fn, score_fn, samples=[1, 2, 3, 4, 5])
    assert res.best_params["DeviationFactor"] == 2.0
    assert res.best_params["HeterogeneityWeight"] == 0.3
    assert (som.DEVIATION_FACTOR, som.HETEROGENEITY_WEIGHT) == before
    assert len(res.history) > 0


def test_sweep_rejects_unknown_parameter():
    from canvas_tpu.tools import optimize_somatic_model as opt

    with pytest.raises(ValueError):
        opt.sweep({"NotAParam": [1]}, lambda s: None, lambda s, o: 0.0, [1])


def test_copy_number_oracle_bed_and_vcf(tmp_path):
    from canvas_tpu.models.segment_model import Segment
    from canvas_tpu.tools.copy_number_oracle import CopyNumberOracle

    bed = tmp_path / "truth.bed"
    bed.write_text("chr1\t1000\t5000\t2\t1\nchr1\t8000\t9000\t1\t0\t0.4\n")
    orc = CopyNumberOracle(bed)

    seg = Segment("chr1", 1500, 4000, np.zeros(3, np.float32))
    assert orc.known_cn_for_segment(seg) == 3
    # naming convention bridged transparently
    seg2 = Segment("1", 8000, 9000, np.zeros(1, np.float32))
    assert orc.known_cn_for_segment(seg2) == 1
    assert orc.known_clonality_for_segment(seg2) == 0.4
    # <half covered -> unknown
    seg3 = Segment("chr1", 4500, 12000, np.zeros(1, np.float32))
    assert orc.known_cn_for_segment(seg3) == -1

    vcf = tmp_path / "truth.vcf"
    vcf.write_text("\n".join([
        "##fileformat=VCFv4.1",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
        "chr2\t100\t.\tN\t<CNV>\t.\tPASS\tCN=2.5;END=900",
        "chr2\t2000\t.\tN\t<CNV>\t.\tPASS\tCN=4;END=3000",
    ]) + "\n")
    orc2 = CopyNumberOracle(vcf)
    # CN=2.5 rounds UP to 3 (the +0.1 quirk)
    assert orc2.known_cn_for_segment(
        Segment("chr2", 100, 900, np.zeros(1, np.float32))) == 3
    seg4 = Segment("chr2", 2000, 3000, np.zeros(1, np.float32))
    seg4.copy_number = 4
    rep = orc2.accuracy_report([seg4])
    assert rep["accuracy"] == 1.0


def test_truth_bed_allele_pair_and_het_filter(tmp_path):
    """CNVChecker.cs:152-161: CN = alleleA + alleleB; --het drops 1/1 rows
    whose het fraction column is below the option."""
    truth = tmp_path / "truth.bed"
    truth.write_text(
        "chr1\t1000\t2000\t0\t1\n"            # CN1 loss
        "chr1\t5000\t6000\t1\t1\t0.2\n"       # het-normal row, frac 0.2
        "chr1\t8000\t9000\t1\t2\t0.9\n")      # CN3 gain, frac 0.9
    full = ec.load_truth_bed(truth)
    assert [iv.cn for iv in full["chr1"]] == [1, 2, 3]
    het = ec.load_truth_bed(truth, heterogeneity_fraction=0.5)
    assert [iv.cn for iv in het["chr1"]] == [1, 3]


def test_sex_ploidy_fn_with_par_bed(tmp_path):
    par = tmp_path / "par.bed"
    par.write_text("chrX\t0\t1000\nchrX\t5000\t6000\n")
    fn = ec.sex_ploidy_fn(1, 1, par)          # XY male
    assert fn("chrX", 100, 900) == 2           # PAR1 stays diploid
    assert fn("chrX", 2000, 4000) == 1         # non-PAR X is haploid
    assert fn("X", 2000, 4000) == 1            # chr-less naming too
    assert fn("chrY", 0, 10_000) == 1
    assert fn("chr7", 0, 10_000) == 2
    # majority rule across a PAR boundary
    assert fn("chrX", 900, 3000) == 1
    fem = ec.sex_ploidy_fn(2, 0, par)          # XX female
    assert fem("chrX", 2000, 4000) == 2
    assert fem("chrY", 0, 10_000) == 0


def test_min_entry_size_drops_small_entries(tmp_path):
    truth = tmp_path / "truth.bed"
    truth.write_text("chr1\t1000\t3000\t1\nchr1\t50000\t90000\t3\n")
    vcf = tmp_path / "calls.vcf"
    vcf.write_text("\n".join([
        "##fileformat=VCFv4.1",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS",
        "chr1\t1000\tCanvas:LOSS:chr1:1001-3000\tN\t<CN1>\t30\tPASS\t"
        "END=3000\tGT:CN:QS:FT\t0/1:1:30:PASS",
        "chr1\t50000\tCanvas:GAIN:chr1:50001-90000\tN\t<CN3>\t30\tPASS\t"
        "END=90000\tGT:CN:QS:FT\t./1:3:30:PASS",
    ]) + "\n")
    m = ec.evaluate(truth, vcf, min_entry_size=10000,
                    ploidy_fn=lambda c, s, e: 2)
    # only the 40kb gain participates
    assert m.recall == pytest.approx(100.0)
    assert m.total_bases == 40000


def test_callability_metric(tmp_path):
    filt = tmp_path / "filter.bed"
    filt.write_text("chr1\t0\t100\nchr1\t900\t1000\n")
    calls = {"chr1": [ec.CnvCall("chr1", 100, 500, 3, 2, "<CN3>", True),
                      ec.CnvCall("chr1", 400, 600, 1, 2, "<CN1>", True),
                      ec.CnvCall("chr1", 700, 800, 0, 2, "<CN0>", False)]}
    called, total = ec.compute_callability(
        calls, filt, {"chr1": 1000, "chrY": 500}, exclude_chr_y=True)
    assert total == 800            # 1000 - 200 filtered, chrY excluded
    assert called == 500           # merged 100-600 inside included span
    txt = ec.format_callability(called, total)
    assert "Percent callability\t62.5000" in txt


def test_truth_vcf_loader(tmp_path):
    vcf = tmp_path / "truth.vcf"
    vcf.write_text("\n".join([
        "##fileformat=VCFv4.1",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
        "chr1\t1000\t.\tN\t<CNV>\t.\tPASS\tCN=3;END=2000",
        "chr1\t5000\t.\tN\t<CNV>\t.\tPASS\tCN=2.5;END=6000",   # rounds UP
        "chr1\t9000\t.\tN\t<CNV>\t.\tPASS\tCN=1.4;END=9500",   # rounds off
    ]) + "\n")
    truth = ec.load_truth_vcf(vcf)
    assert [iv.cn for iv in truth["chr1"]] == [3, 3, 1]
    assert truth["chr1"][0].end == 2000
    # sample CN column wins over INFO
    vcf2 = tmp_path / "t2.vcf"
    vcf2.write_text(
        "chr2\t100\t.\tN\t<CNV>\t.\tPASS\tCN=3;END=900\tGT:CN\t0/1:4\n")
    assert ec.load_truth_vcf(vcf2)["chr2"][0].cn == 4
    # dispatcher: .bed -> bed loader, else VCF
    bed = tmp_path / "truth.bed"
    bed.write_text("chr1\t0\t100\t1\n")
    assert ec.load_known_cn(bed)["chr1"][0].cn == 1
    assert ec.load_known_cn(vcf)["chr1"][0].cn == 3


def test_check_flags_concordance(tmp_path, rng):
    from canvas_tpu.genome.reference import write_fasta
    n = 5000
    seq = "".join(rng.choice(list("ACGT"), size=n))
    fa = tmp_path / "g.fa"
    write_fasta(fa, {"chr1": seq})
    fk.flag_unique_kmers(fa, tmp_path / "k1.fa")
    fk.flag_unique_kmers(fa, tmp_path / "k2.fa", n_passes=2)
    logs = []
    pct = fk.check_flags(tmp_path / "k1.fa", tmp_path / "k2.fa",
                         log=logs.append)
    assert pct == 100.0
    assert any(l.startswith("After chr1:") for l in logs)

    # flip one flag -> agreement drops below 100
    import numpy as np
    from canvas_tpu.genome.reference import read_fasta
    seqs = read_fasta(tmp_path / "k2.fa")
    b = bytearray(bytes(seqs["chr1"]))
    b[100] = ord(chr(b[100]).swapcase())
    write_fasta(tmp_path / "k3.fa", {"chr1": bytes(b)})
    pct2 = fk.check_flags(tmp_path / "k1.fa", tmp_path / "k3.fa",
                          log=lambda *_: None)
    assert pct2 < 100.0


def test_sweep_parameters_cartesian(tmp_path):
    from canvas_tpu.tools import sweep_parameters as sp

    grid = {"CanvasBin,-d": [50, 100], "CanvasPartition,-m": ["HMM", "Wavelets"]}
    combos = sp.combinations(grid)
    assert len(combos) == 4
    # odometer order: last flag varies fastest
    assert [c["CanvasPartition,-m"] for c in combos] == [
        "HMM", "Wavelets", "HMM", "Wavelets"]

    def run_fn(sample, combo):
        if combo["CanvasBin,-d"] == 50 and sample == "s_crash":
            raise RuntimeError("boom")
        return combo

    def score_fn(sample, combo):
        # peak score at (100, HMM)
        return [1.0 - abs(combo["CanvasBin,-d"] - 100) / 100
                - (0.0 if combo["CanvasPartition,-m"] == "HMM" else 0.25)]

    results = sp.run_sweep(grid, run_fn, score_fn,
                           ["s1", "s_crash"], tmp_path / "ParamSweep")
    summary = (tmp_path / "ParamSweep" / "ResultsSummary.txt").read_text()
    lines = summary.strip().splitlines()
    assert lines[0].startswith("#Index")
    assert len(lines) == 5
    # combos with -d 50 hit the crashing sample -> FAIL rows
    assert sum("FAIL" in l for l in lines) == 2
    ok = [r for r in results if not r["failed"]]
    best = max(ok, key=lambda r: r["mean"])
    assert best["combo"] == {"CanvasBin,-d": 100, "CanvasPartition,-m": "HMM"}
    assert (tmp_path / "ParamSweep" / "Results0.txt").exists()
