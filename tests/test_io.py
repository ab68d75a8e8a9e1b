"""BAM/FASTA/SNV I/O tests with synthetic files."""

import numpy as np
import pytest

from canvas_tpu.genome import reference as ref
from canvas_tpu.genome.contigs import ContigTable
from canvas_tpu.io import bam as bamio
from canvas_tpu.io import snv


def make_record(pos, flag=0x2 | 0x1, cigar=((50, "M"),), seq=None, mapq=50,
                quals=None, ref_id=0, name="r"):
    seq = seq or "A" * sum(l for l, op in cigar if op in "MIS=X")
    qual = np.asarray(quals if quals is not None else [30] * len(seq),
                      dtype=np.uint8)
    return bamio.BamRecord(ref_id, pos, mapq, flag, name, list(cigar), seq,
                           qual, -1, -1, 300)


def test_bam_roundtrip(tmp_path):
    refs = [("chr1", 10000), ("chr2", 5000)]
    records = [make_record(100), make_record(200, flag=0x10),
               make_record(300, ref_id=1)]
    path = tmp_path / "t.bam"
    bamio.write_bam(path, refs, records)
    back = bamio.BamFile.read(path)
    assert back.refs == refs
    got = list(back.records())
    assert len(got) == 3
    assert got[0].pos == 100 and got[0].cigar == [(50, "M")]
    assert got[1].flag == 0x10
    assert got[2].ref_id == 1
    assert got[0].seq == "A" * 50


def test_canvas_bin_filter():
    ok = make_record(10)
    assert ok.passes_canvas_bin_filter(paired_end=True)
    assert not make_record(10, flag=0x2 | 0x1 | 0x10).passes_canvas_bin_filter(True)   # reverse
    assert not make_record(10, flag=0x2 | 0x1 | 0x400).passes_canvas_bin_filter(True)  # dup
    assert not make_record(10, flag=0x2 | 0x1 | 0x100).passes_canvas_bin_filter(True)  # secondary
    assert not make_record(10, flag=0x1).passes_canvas_bin_filter(True)   # not proper pair
    # single-end: proper-pair not required
    assert make_record(10, flag=0x1).passes_canvas_bin_filter(False)
    assert make_record(10, flag=0).passes_canvas_bin_filter(False)
    # CIGAR must start with >= 35M
    assert not make_record(10, cigar=((34, "M"), (16, "S"))).passes_canvas_bin_filter(True)
    assert not make_record(10, cigar=((10, "S"), (40, "M"))).passes_canvas_bin_filter(True)


def test_read_start_counts(tmp_path):
    refs = [("chr1", 1000)]
    records = [make_record(100), make_record(100), make_record(100),
               make_record(200), make_record(300, flag=0x10)]
    path = tmp_path / "t.bam"
    bamio.write_bam(path, refs, records)
    bam = bamio.BamFile.read(path)
    observed, frag = bamio.read_start_counts(bam, "chr1")
    assert observed[100] == 3
    assert observed[200] == 1
    assert observed[300] == 0  # reverse strand filtered


def test_fasta_tracks(tmp_path):
    seqs = {"chr1": "nnnACGtacGTn", "chr2": "NNNNAAAA"}
    p = tmp_path / "kmer.fa"
    ref.write_fasta(p, seqs)
    contigs, tracks = ref.load_reference_tracks(p)
    assert contigs.names == ("chr1", "chr2")
    t = tracks["chr1"]
    assert t["offset"] == 3
    # uppercase = possible: A C G at 3..5, G T at 9, 10
    np.testing.assert_array_equal(
        np.flatnonzero(t["possible"]), [3, 4, 5, 9, 10])
    # gc (any of G/g/C/c): C(4), G(5), c(8), G(9)
    np.testing.assert_array_equal(
        np.flatnonzero(t["is_gc"]), [4, 5, 8, 9])
    # chr2: leading 'N' (uppercase) does NOT trigger the lowercase-n skip
    assert tracks["chr2"]["offset"] == 0
    assert not tracks["chr2"]["possible"][:4].any()


def test_snv_pileup(tmp_path):
    refs = [("chr1", 1000)]
    # reads covering position 100 (0-based); site at VCF pos 101
    rec1 = make_record(90, seq="A" * 10 + "C" + "A" * 39)  # C at pos 100
    rec2 = make_record(95, seq="A" * 5 + "T" + "A" * 44)   # T at pos 100
    rec3 = make_record(90, seq="A" * 10 + "C" + "A" * 39,
                       quals=[30] * 10 + [10] + [30] * 39)  # low qual at site
    path = tmp_path / "t.bam"
    bamio.write_bam(path, refs, [rec1, rec2, rec3])
    bam = bamio.BamFile.read(path)
    sites = [snv.SnvSite("chr1", 101, "T", "C")]
    out = snv.pileup_counts(bam, "chr1", sites)
    assert out[0].count_alt == 1   # one good C
    assert out[0].count_ref == 1   # one good T


def test_load_het_snvs(tmp_path):
    vcf = tmp_path / "n.vcf"
    vcf.write_text("\n".join([
        "##fileformat=VCFv4.1",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1",
        "chr1\t100\t.\tA\tC\t50\tPASS\t.\tGT:GQX\t0/1:99",
        "chr1\t200\t.\tA\tC\t50\tLowQ\t.\tGT:GQX\t0/1:99",    # filtered
        "chr1\t300\t.\tA\tCT\t50\tPASS\t.\tGT:GQX\t0/1:99",   # not SNV
        "chr1\t400\t.\tA\tC\t50\tPASS\t.\tGT:GQX\t1/1:99",    # hom alt
        "chr1\t500\t.\tA\tC\t50\tPASS\t.\tGT:GQX\t0/1:10",    # low GQX
        "chr2\t100\t.\tA\tC\t50\tPASS\t.\tGT:GQX\t0/1:99",
    ]) + "\n")
    germline = snv.load_het_snvs(vcf, "chr1", "S1", is_somatic=False)
    assert [s.position for s in germline] == [100, 400, 500]
    somatic = snv.load_het_snvs(vcf, "chr1", "S1", is_somatic=True)
    assert [s.position for s in somatic] == [100]


def test_b_allele_preference():
    # ref T, alt G: preference T(1) < G(2) -> baf = ref fraction
    s = snv.SnvSite("chr1", 1, "T", "G", count_ref=30, count_alt=10)
    assert snv.b_allele_frequency(s) == pytest.approx(0.75)
    # ref C, alt A: A(0) < C(3) -> baf = alt fraction
    s = snv.SnvSite("chr1", 1, "C", "A", count_ref=30, count_alt=10)
    assert snv.b_allele_frequency(s) == pytest.approx(0.25)
    assert snv.b_allele_frequency(snv.SnvSite("chr1", 1, "A", "C")) is None


def test_read_frequencies(tmp_path):
    p = tmp_path / "vf.txt"
    p.write_text(
        "#Chromosome\tPosition\tRef\tAlt\tCountRef\tCountAlt\n"
        "chr1\t150\tA\tC\t20\t22\n"
        "chr1\t250\tA\tC\t3\t2\n"      # below min counts
        "chr1\t350\tA\tC\t15\t18\n")
    intervals = {"chr1": [(100, 200), (300, 400)]}
    out = snv.read_frequencies(p, intervals)
    assert out["chr1"][0] == [(150, 20, 22)]
    assert out["chr1"][1] == [(350, 15, 18)]


def test_frequency_roundtrip(tmp_path):
    sites = [snv.SnvSite("chr1", 100, "A", "C", 10, 12)]
    p = tmp_path / "vf.txt.gz"
    snv.write_frequencies(p, sites)
    out = snv.read_frequencies(p, {"chr1": [(0, 1000)]})
    assert out["chr1"][0] == [(100, 10, 12)]


def test_write_cnd_file(tmp_path):
    from canvas_tpu.ops import ratio as rt
    from canvas_tpu.io.bins import BinSet
    from canvas_tpu.genome.contigs import ContigTable

    ct = ContigTable(["chr1"], [10_000])
    mk = lambda counts: BinSet(
        ct, np.zeros(len(counts), np.int32),
        np.arange(len(counts), dtype=np.int64) * 100,
        (np.arange(len(counts), dtype=np.int64) + 1) * 100,
        np.full(len(counts), 40, np.int16),
        np.asarray(counts, np.float32))
    tumor = mk([10, 20, 30, 40])
    normal = mk([5, 0.5, 15, 20])   # bin 1 dropped by ratio (ref < 1)
    ratios = rt.lsnorm_ratios(tumor, normal)
    out = tmp_path / "s.cnd"
    rt.write_cnd_file(tumor, normal, ratios, out)
    lines = out.read_text().strip().splitlines()
    assert lines[0].startswith("Fragment Count,Reference Count")
    assert len(lines) == 1 + len(ratios)          # dropped bin skipped
    assert lines[1].split(",")[0] == "10"
    assert lines[1].split(",")[2] == "chr1"


def test_load_somatic_snv_vafs(tmp_path):
    from canvas_tpu.io.snv import load_somatic_snv_vafs

    vcf = tmp_path / "somatic.vcf"
    vcf.write_text("\n".join([
        "##fileformat=VCFv4.1",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tNORMAL\tTUMOR",
        # PASS SNV: ref A 80 reads, alt C 20 -> VF 0.2 (from the LAST column)
        "chr1\t100\t.\tA\tC\t.\tPASS\t.\tDP:AU:CU:GU:TU\t"
        "50:50,0:0,0:0,0:0,0\t100:80,0:20,0:0,0:0,0",
        # VF 0.5 -> dropped
        "chr1\t200\t.\tG\tT\t.\tPASS\t.\tDP:AU:CU:GU:TU\t"
        "50:0,0:0,0:50,0:0,0\t100:0,0:0,0:50,0:50,0",
        # non-PASS dropped
        "chr1\t300\t.\tA\tC\t.\tLowQ\t.\tDP:AU:CU:GU:TU\t"
        "50:50,0:0,0:0,0:0,0\t100:80,0:20,0:0,0:0,0",
        # indel dropped
        "chr1\t400\t.\tAT\tC\t.\tPASS\t.\tDP:AU:CU:GU:TU\t"
        "50:50,0:0,0:0,0:0,0\t100:80,0:20,0:0,0:0,0",
        # tier-2 counts summed: 10,10 alt over 60,20 ref -> 20/100
        "chr1\t500\t.\tA\tG\t.\tPASS\t.\tDP:AU:CU:GU:TU\t"
        "50:50,0:0,0:0,0:0,0\t100:60,20:0,0:10,10:0,0",
    ]) + "\n")
    vafs = load_somatic_snv_vafs(vcf)
    np.testing.assert_allclose(vafs, [0.2, 0.2])


def test_load_dbsnp_population_vcf(tmp_path):
    """A dbSNP/population VCF has no genotype columns: every PASS-agnostic
    single-nucleotide site is kept (SNVReviewer.cs:122-126 comment)."""
    vcf = tmp_path / "dbsnp.vcf"
    vcf.write_text("\n".join([
        "##fileformat=VCFv4.1",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
        "chr1\t100\trs1\tA\tC\t.\t.\t.",
        "chr1\t200\trs2\tA\tCT\t.\t.\t.",    # not a SNV
        "chr1\t300\trs3\tAG\tC\t.\t.\t.",    # ref not single base
        "chr1\t400\trs4\tG\tT\t.\t.\t.",
    ]) + "\n")
    sites = snv.load_het_snvs(vcf, "chr1", is_dbsnp=True)
    assert [s.position for s in sites] == [100, 400]


def _mk_bins(counts, ct=None):
    from canvas_tpu.io.bins import BinSet
    from canvas_tpu.genome.contigs import ContigTable

    ct = ct or ContigTable(["chr1"], [1_000_000])
    n = len(counts)
    return BinSet(ct, np.zeros(n, np.int32),
                  np.arange(n, dtype=np.int64) * 100,
                  (np.arange(n, dtype=np.int64) + 1) * 100,
                  np.full(n, 40, np.int16),
                  np.asarray(counts, np.float32))


def test_weighted_average_and_best_lr2_reference():
    from canvas_tpu.ops import ratio as rt

    tumor = _mk_bins([100.0] * 9 + [200.0])
    c1 = _mk_bins([50.0] * 10)        # median 50 -> weight 1/50
    c2 = _mk_bins([100.0] * 10)       # median 100 -> weight 1/100
    wa = rt.weighted_average_reference([c1, c2])
    # weights normalized: (2/3)*50 + (1/3)*100 = 66.67
    np.testing.assert_allclose(wa.count, 100 / 1.5, rtol=1e-6)
    # BestLR2: c2 matches the tumor best
    best = rt.best_lr2_reference(tumor, [c1, c2])
    assert best is c2


def test_pca_reference_matches_reference_semantics():
    from canvas_tpu.ops import ratio as rt

    rng = np.random.default_rng(0)
    n = 256
    mu = np.full(n, 100.0)
    ax1 = np.zeros(n); ax1[: n // 2] = 1.0
    ax2 = np.zeros(n); ax2[n // 2:] = 1.0
    axes = np.stack([ax1 / np.linalg.norm(ax1), ax2 / np.linalg.norm(ax2)])
    x = mu + 20 * ax1 + rng.normal(0, 0.5, n)
    tumor = _mk_bins(x)
    ref = rt.pca_reference(tumor, axes, mu)
    # the systematic +20 on the first half is captured by the model; the
    # ratio x/ref is ~1 everywhere (median-ratio rescaled)
    ratios = tumor.count / ref.count
    np.testing.assert_allclose(np.median(ratios), 1.0, atol=0.02)
    assert np.abs(ratios - 1.0).max() < 0.1


def test_load_pca_model_and_orthogonality(tmp_path):
    from canvas_tpu.ops import ratio as rt

    good = tmp_path / "model.txt"
    good.write_text(
        "chr1\t0\t100\t10.0\t1.0\t0.0\n"
        "chr1\t100\t200\t20.0\t0.0\t2.0\n")
    keys, mu, axes = rt.load_pca_model(good)
    assert keys == [("chr1", 0, 100), ("chr1", 100, 200)]
    np.testing.assert_allclose(mu, [10.0, 20.0])
    np.testing.assert_allclose(axes, [[1.0, 0.0], [0.0, 1.0]])  # 2-norm'd

    bad = tmp_path / "bad.txt"
    bad.write_text(
        "chr1\t0\t100\t10.0\t1.0\t1.0\n"
        "chr1\t100\t200\t20.0\t0.0\t1.0\n")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="orthogonal"):
        rt.load_pca_model(bad)


def test_is_variant_site_and_baf_csv(tmp_path):
    from canvas_tpu.io.snv import (SnvSite, is_variant_site, write_baf_csv)

    zero = SnvSite("chr1", 10, "A", "C", 0, 0)
    refonly = SnvSite("chr1", 20, "A", "C", 8, 0)
    both = SnvSite("chr1", 30, "T", "G", 6, 2)
    assert not is_variant_site(zero)
    assert is_variant_site(refonly)
    assert not is_variant_site(refonly, is_dbsnp=True)   # dbSNP needs alt
    assert is_variant_site(both, is_dbsnp=True)

    out = tmp_path / "s.baf"
    write_baf_csv(out, [zero, both])
    lines = out.read_text().splitlines()
    assert lines[0] == "Chromosome,Position,BAF"
    # zero-depth dropped; T(1) < G(2) -> BAF = ref fraction 0.75
    assert lines[1] == "chr1,30,0.75"
