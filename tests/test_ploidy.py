"""Reference-ploidy VCF tests."""

import numpy as np

from canvas_tpu.io import ploidy as pl


def make_info():
    return pl.PloidyInfo(by_chromosome={
        "chrX": [pl.PloidyInterval("chrX", 1, 2_000_000, 1),
                 pl.PloidyInterval("chrX", 2_000_001, 3_000_000, 2),
                 pl.PloidyInterval("chrX", 3_000_001, 5_000_000, 1)],
        "chrY": [pl.PloidyInterval("chrY", 1, 1_000_000, 0)],
    })


def test_reference_copy_number_majority():
    info = make_info()
    assert info.reference_copy_number("chr1", 0, 100) == 2
    assert info.reference_copy_number("chrX", 0, 1_000_000) == 1
    # spans mostly the CN2 window
    assert info.reference_copy_number("chrX", 2_000_000, 2_900_000) == 2
    assert info.reference_copy_number("chrY", 0, 500_000) == 0


def test_uniformity():
    info = make_info()
    assert info.is_uniform("chr1", 1, 100)
    assert info.is_uniform("chrX", 1, 1_000_000)
    assert not info.is_uniform("chrX", 1_999_000, 2_001_000)


def test_ploidy_vcf_roundtrip(tmp_path):
    info = make_info()
    p = tmp_path / "ploidy.vcf"
    pl.write_ploidy_vcf(p, "S1", info.by_chromosome["chrX"])
    back = pl.load_ploidy_vcf(p, "S1")
    assert [iv.ploidy for iv in back.by_chromosome["chrX"]] == [1, 2, 1]
    assert back.reference_copy_number("chrX", 0, 1_000_000) == 1


def test_breaks_for_contig():
    info = make_info()
    breaks = info.breaks_for_contig("chrX")
    assert 2_000_001 in breaks or 2_000_001 in breaks + 0
    assert len(info.breaks_for_contig("chr1")) == 0


def test_ploidy_vcf_from_karyotype(tmp_path):
    from canvas_tpu.genome.contigs import ContigTable
    from canvas_tpu.io.ploidy import (load_ploidy_vcf,
                                      ploidy_vcf_from_karyotype)

    ct = ContigTable(["chr1", "chrX", "chrY"], [1000, 800, 600])
    p = tmp_path / "ploidy.vcf"
    ploidy_vcf_from_karyotype(p, "s1", ct, "XY")
    info = load_ploidy_vcf(p)
    assert info.reference_copy_number("chrX", 0, 800) == 1
    assert info.reference_copy_number("chrY", 0, 600) == 1
    assert info.reference_copy_number("chr1", 0, 1000) == 2

    ploidy_vcf_from_karyotype(p, "s1", ct, "XX")
    info = load_ploidy_vcf(p)
    assert info.reference_copy_number("chrX", 0, 800) == 2
    assert info.reference_copy_number("chrY", 0, 600) == 0
