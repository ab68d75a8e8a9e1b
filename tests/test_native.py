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
