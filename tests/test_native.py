"""Native C++ BAM scanner vs the Python reader."""

import numpy as np
import pytest

from canvas_tpu import native
from canvas_tpu.io import bam as bamio


@pytest.fixture(scope="module")
def bam_fixture(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("native")
    rng = np.random.default_rng(9)
    refs = [("chr1", 100_000), ("chr2", 50_000)]
    records = []
    k = 0
    for ref_id, (name, L) in enumerate(refs):
        for pos in sorted(rng.integers(0, L - 100, size=2000)):
            flag = 0x1 | 0x2
            r = rng.random()
            if r < 0.1:
                flag |= 0x10      # reverse
            elif r < 0.15:
                flag |= 0x400     # duplicate
            records.append(bamio.BamRecord(
                ref_id, int(pos), 50, flag, f"r{k}", [(50, "M")],
                "A" * 50, np.full(50, 30, np.uint8)))
            k += 1
    path = tmp / "t.bam"
    bamio.write_bam(path, refs, records)
    return path, refs


def test_native_available():
    assert native.available(), "g++ build of the BAM scanner failed"


def test_native_header(bam_fixture):
    path, refs = bam_fixture
    got = native.read_bam_refs(str(path))
    assert got == refs


@pytest.mark.parametrize("contig_idx", [0, 1])
def test_native_matches_python(bam_fixture, contig_idx):
    path, refs = bam_fixture
    bam = bamio.BamFile.read(path)
    name, length = refs[contig_idx]
    want, _ = bamio.read_start_counts(bam, name)
    got = native.scan_read_starts(str(path), contig_idx, length)
    assert got is not None
    np.testing.assert_array_equal(got, want)
    assert got.sum() > 0


def test_native_binary_mode(bam_fixture):
    path, refs = bam_fixture
    got = native.scan_read_starts(str(path), 0, refs[0][1], binary_mode=True)
    assert got.max() == 1


def test_native_kmer_flagger_matches_numpy(rng):
    """Native rolling-key flagger == numpy lexsort fallback, single and
    multi-pass, with planted exact/revcomp repeats and N islands."""
    import numpy as np
    from canvas_tpu import native
    from canvas_tpu.tools import flag_unique_kmers as fk

    if not hasattr(native, "flag_unique_kmers") \
            or native.flag_unique_kmers({"c": "A" * 40}) is None:
        import pytest
        pytest.skip("native toolchain unavailable")
    seq = "".join(rng.choice(list("ACGT"), size=4000))
    seq = seq[:1000] + seq[500:560] + seq[1060:]          # exact repeat
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    rc = "".join(comp[c] for c in reversed(seq[2000:2100]))
    seq = seq[:3000] + rc + seq[3100:]                     # revcomp repeat
    seq = seq[:3500] + "N" * 7 + seq[3507:]                # N island
    seqs = {"c1": seq, "c2": seq[1234:2500]}
    as_np = {k: np.frombuffer(v.encode(), np.uint8) for k, v in seqs.items()}
    py = fk._flag_unique_numpy(as_np, 1)
    for passes in (1, 3):
        nat = native.flag_unique_kmers(seqs, n_passes=passes)
        for k in seqs:
            np.testing.assert_array_equal(nat[k], py[k])
    # repeats and N windows flagged non-unique
    assert not py["c1"][1000:1006].any()
    assert not py["c1"][3500 - 34:3507].any()


def test_scan_read_starts_all_matches_per_ref(bam_fixture):
    path, refs = bam_fixture
    got = native.scan_read_starts_all(str(path), [L for _, L in refs])
    assert got is not None
    for i, (name, length) in enumerate(refs):
        want = native.scan_read_starts(str(path), i, length)
        np.testing.assert_array_equal(got[i], want)
    # zero-length slots skip that reference entirely
    got2 = native.scan_read_starts_all(str(path), [refs[0][1], 0])
    np.testing.assert_array_equal(got2[0], got[0])
    assert len(got2[1]) == 0


def _pileup_fixture(tmp_path, rng):
    from canvas_tpu.io import snv as snvio
    refs = [("chr1", 50_000), ("chr2", 30_000)]
    records, sites = [], {}
    k = 0
    for ref_id, (name, L) in enumerate(refs):
        site_pos = np.sort(rng.choice(np.arange(200, L - 200), 120,
                                      replace=False))
        sites[name] = [snvio.SnvSite(name, int(p) + 1, "A", "C")
                       for p in site_pos]
        for pos in sorted(rng.integers(0, L - 120, size=3000)):
            flag = 0x1 | 0x2
            r = rng.random()
            if r < 0.08:
                flag |= 0x400            # duplicate: excluded
            elif r < 0.12:
                flag |= 0x100            # secondary: excluded
            seq = "".join(rng.choice(list("ACGT"), size=100))
            qual = rng.integers(5, 40, size=100).astype(np.uint8)
            cigar = [(100, "M")]
            if r > 0.9:                  # exercise the CIGAR walk
                cigar = [(10, "S"), (40, "M"), (5, "D"), (3, "I"), (47, "M")]
            mapq = int(rng.integers(0, 60))
            records.append(bamio.BamRecord(
                ref_id, int(pos), mapq, flag, f"p{k}", cigar,
                seq, qual))
            k += 1
    return refs, records, sites


def test_native_pileup_matches_python(tmp_path, rng):
    from canvas_tpu.io import snv as snvio
    refs, records, sites = _pileup_fixture(tmp_path, rng)
    path = tmp_path / "p.bam"
    bamio.write_bam(path, refs, records)

    import copy
    py_sites = copy.deepcopy(sites)
    bam = bamio.BamFile.read(path)
    for name, _ in refs:
        snvio.pileup_counts(bam, name, py_sites[name], min_mapq=10)

    nat_sites = copy.deepcopy(sites)
    ok = snvio.pileup_counts_native(path, nat_sites, min_mapq=10)
    assert ok, "native pileup unavailable"
    n_nonzero = 0
    for name, _ in refs:
        for a, b in zip(py_sites[name], nat_sites[name]):
            assert (a.count_ref, a.count_alt) == (b.count_ref, b.count_alt), \
                (name, a.position, a.count_ref, a.count_alt,
                 b.count_ref, b.count_alt)
            n_nonzero += (a.count_ref + a.count_alt) > 0
    assert n_nonzero > 50   # the comparison actually counted bases


def test_scan_with_fragments_matches_python(tmp_path, rng):
    refs = [("chr1", 40_000), ("chr2", 20_000)]
    records = []
    k = 0
    for ref_id, (name, L) in enumerate(refs):
        for pos in sorted(rng.integers(0, L - 100, size=1500)):
            flag = 0x1 | 0x2
            if rng.random() < 0.1:
                flag |= 0x10
            tlen = int(rng.integers(-500, 40000))
            records.append(bamio.BamRecord(
                ref_id, int(pos), 50, flag, f"f{k}", [(50, "M")],
                "A" * 50, np.full(50, 30, np.uint8), tlen=tlen))
            k += 1
    path = tmp_path / "f.bam"
    bamio.write_bam(path, refs, records)
    res = native.scan_with_fragments_all(str(path), [L for _, L in refs])
    assert res is not None
    obs_n, frag_n = res
    bam = bamio.BamFile.read(path)
    for i, (name, L) in enumerate(refs):
        obs_p, frag_p = bamio.read_start_counts(bam, name,
                                                mode="GCContentWeighted")
        np.testing.assert_array_equal(obs_n[i], obs_p)
        np.testing.assert_array_equal(frag_n[i], frag_p)


def test_truncated_bam_is_an_error(tmp_path, rng):
    """A BAM truncated mid-file must scan to an error (-1 -> native returns
    None and the Python fallback takes over), never to silently partial
    counts."""
    from canvas_tpu import native
    from canvas_tpu.io import bam as bamio

    if not native.available():
        import pytest
        pytest.skip("native scanner unavailable")
    p = tmp_path / "t.bam"
    n = 200_000
    recs = [bamio.BamRecord(0, int(pos), 50, 0x1 | 0x2, f"r{i}", [(50, "M")],
                            "A" * 50, np.full(50, 30, np.uint8))
            for i, pos in enumerate(
                np.sort(rng.integers(0, 500_000, size=n)))]
    bamio.write_bam(p, [("chr1", 500_000)], recs)
    refs = native.read_bam_refs(str(p))
    full = native.scan_read_starts_all(str(p), [L for _, L in refs])
    assert full is not None and int(np.sum(full[0].astype(np.int64))) == n

    data = p.read_bytes()
    trunc = tmp_path / "trunc.bam"
    trunc.write_bytes(data[: len(data) // 2])
    out = native.scan_read_starts_all(str(trunc), [L for _, L in refs])
    assert out is None, "truncated BAM must fail, not return partial counts"
