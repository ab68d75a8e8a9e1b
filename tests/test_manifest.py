"""Manifest parsing + on-target sweeps."""

import numpy as np

from canvas_tpu.genome.contigs import ContigTable
from canvas_tpu.io.bins import BinSet
from canvas_tpu.io import manifest as mf


def make_bins(rows):
    contigs = ContigTable(("chr1", "chr2"), (1_000_000, 1_000_000))
    cid = np.array([contigs.index(r[0]) for r in rows], np.int32)
    start = np.array([r[1] for r in rows], np.int64)
    end = np.array([r[2] for r in rows], np.int64)
    return BinSet(contigs, cid, start, end,
                  np.full(len(rows), 40, np.int16),
                  np.arange(len(rows), dtype=np.float32))


def test_parse_nextera_layout(tmp_path):
    p = tmp_path / "m.txt"
    p.write_text(
        "[Header]\nManifest Version\t1\n\n"
        "[Regions]\nName\tChromosome\tStart\tEnd\n"
        "r1\tchr1\t1001\t2000\n"
        "r2\tchr1\t5001\t6000\n"
        "r3\tchr2\t100\t400\n")
    m = mf.Manifest.read(p)
    by = m.regions_by_chromosome()
    assert [(r.start, r.end) for r in by["chr1"]] == [(1001, 2000), (5001, 6000)]
    assert len(by["chr2"]) == 1


def test_parse_bed(tmp_path):
    p = tmp_path / "m.bed"
    p.write_text("chr1\t1000\t2000\tt1\nchr2\t99\t400\n")
    m = mf.Manifest.read(p)
    r = m.regions_by_chromosome()["chr1"][0]
    assert (r.start, r.end) == (1001, 2000)


def test_on_target_mask(tmp_path):
    p = tmp_path / "m.bed"
    p.write_text("chr1\t1000\t2000\n")
    m = mf.Manifest.read(p)
    bins = make_bins([("chr1", 0, 500), ("chr1", 900, 1100),
                      ("chr1", 1500, 1600), ("chr1", 3000, 3100),
                      ("chr2", 1000, 1100)])
    mask = mf.on_target_mask(bins, m)
    assert list(mask) == [False, True, True, False, False]


def test_intersect_bins_with_targets(tmp_path):
    p = tmp_path / "m.bed"
    p.write_text("chr1\t1000\t2000\n")
    m = mf.Manifest.read(p)
    bins = make_bins([("chr1", 500, 1200), ("chr1", 1200, 2500),
                      ("chr1", 3000, 3100)])
    out = mf.intersect_bins_with_targets(bins, m)
    # reference quirk (CanvasRunner.cs:598-612): each manifest region is
    # consumed by its FIRST overlapping bin (regions and bins are 1:1 in
    # real enrichment runs), so only the first bin's clip survives
    assert list(out.start) == [1000]
    assert list(out.end) == [1200]
    assert list(out.count) == [0.0]
    # the 1:1 case clips cleanly
    bins2 = make_bins([("chr1", 900, 2500)])
    out2 = mf.intersect_bins_with_targets(bins2, m)
    assert list(out2.start) == [1000] and list(out2.end) == [2000]


def test_predefined_bins(tmp_path):
    p = tmp_path / "m.bed"
    p.write_text("chr1\t100\t200\nchr1\t300\t400\n")
    m = mf.Manifest.read(p)
    pb = mf.predefined_bins(m)
    np.testing.assert_array_equal(pb["chr1"][0], [100, 300])
    np.testing.assert_array_equal(pb["chr1"][1], [200, 400])
