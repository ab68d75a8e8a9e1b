"""Shared synthetic-genome + BAM generators for the benchmark scripts.

A synthetic reference is a random ACGT FASTA run through the unique-35-mer
flagger; a synthetic sample is Poisson read starts (lambda = rate * CN/2)
with per-region copy number planted, written as a coordinate-sorted BAM of
fixed-shape 50M proper-paired reads via a vectorized record builder so
generation never dominates the benchmarked pipeline.
"""

from __future__ import annotations

import struct
import sys
import time
import zlib
from pathlib import Path

import numpy as np

READ_LEN = 50      # default; set_read_len() overrides (e.g. 150 for the
                   # honest 60x-depth e2e row — real WGS reads are ~150bp)
FLAG = 0x1 | 0x2 | 0x40  # paired, proper pair, first of pair


def set_read_len(rl: int) -> None:
    """Set the synthetic read length for every generator in this module
    (record layout sizes derive from it)."""
    global READ_LEN
    READ_LEN = int(rl)


def make_reference(ref_dir: Path, contig_lengths: dict[str, int],
                   seed: int = 42) -> None:
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from canvas_tpu.genome.reference import write_fasta
    from canvas_tpu.tools.flag_unique_kmers import flag_unique_kmers

    rng = np.random.default_rng(seed)
    seqs = {}
    for name, length in contig_lengths.items():
        codes = rng.integers(0, 4, size=length, dtype=np.uint8)
        seqs[name] = bytes(np.frombuffer(b"ACGT", np.uint8)[codes])
    write_fasta(ref_dir / "genome.fa", seqs)
    flag_unique_kmers(ref_dir / "genome.fa", ref_dir / "kmer.fa")


def synth_positions(rng, length: int, rate: float,
                    plan: list[tuple[int, int, float]]) -> np.ndarray:
    """Poisson read starts with planted CN regions (cn as multiplier of 2)."""
    cn = np.full(length, 2.0, np.float32)
    for s, e, c in plan:
        cn[s:e] = c
    lam = rate * cn / 2.0
    counts = rng.poisson(lam).astype(np.int32)
    return np.repeat(np.arange(length, dtype=np.int64), counts)


def _bgzf_block(chunk: bytes) -> bytes:
    comp = zlib.compress(chunk, 1)[2:-4]   # strip zlib wrapper
    bsize = len(comp) + 25  # BSIZE = 18B header + data + 8B footer - 1
    return (b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff\x06\x00"
            b"BC\x02\x00" + struct.pack("<H", bsize) + comp
            + struct.pack("<I", zlib.crc32(chunk))
            + struct.pack("<I", len(chunk)))


def _write_bgzf(f, data: bytes) -> None:
    """Append `data` to an open file as BGZF blocks (<=60000B payloads).

    Blocks compress on a thread pool (zlib releases the GIL) — compression
    dominates whole-genome BAM generation otherwise."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    mv = memoryview(data)
    offsets = range(0, len(data), 60000)
    slab = 512  # bound in-flight chunk copies (~30MB), not the whole buffer
    with ThreadPoolExecutor(max_workers=os.cpu_count() or 1) as ex:
        for s0 in range(0, len(offsets), slab):
            chunks = [bytes(mv[off:off + 60000])
                      for off in list(offsets)[s0:s0 + slab]]
            for block in ex.map(_bgzf_block, chunks, chunksize=16):
                f.write(block)


def write_bam_vectorized(path: Path, refs: list[tuple[str, int]],
                         per_contig_pos: list[np.ndarray],
                         per_contig_alt: list[np.ndarray] | None = None,
                         slice_reads: int = 4_000_000,
                         ) -> int:
    """Write a coordinate-sorted BAM of fixed-shape 50M reads, vectorized.

    Record layout (little-endian), constant-size per read:
      block_size(4) + 8 ints(32) + name(10: 'r' + 8 digits + NUL)
      + cigar(4) + seq((READ_LEN+1)//2) + qual(READ_LEN)
      => 125 bytes at the default READ_LEN=50, 275 at 150.

    per_contig_alt (optional): bool per read; alt reads carry all-'C'
    sequences instead of all-'A', so a pileup at a het site declared
    REF=A/ALT=C sees the planted allele fractions.

    Records are built and compressed in `slice_reads`-read slices so memory
    stays bounded at genome scale (a whole-genome 755M-read buffer would be
    ~94GB; a slice is ~500MB).
    """
    header = bytearray(b"BAM\x01")
    text = b"@HD\tVN:1.6\tSO:coordinate\n"
    header += struct.pack("<i", len(text)) + text
    header += struct.pack("<i", len(refs))
    for name, length in refs:
        nb = name.encode() + b"\x00"
        header += struct.pack("<i", len(nb)) + nb + struct.pack("<i", length)

    total = int(sum(len(p) for p in per_contig_pos))
    seq_bytes = (READ_LEN + 1) // 2
    seq_off = 50                      # 4 + 32 + 10 + 4
    qual_off = seq_off + seq_bytes
    rec_size = qual_off + READ_LEN
    payload_len = rec_size - 4

    ref_ids = np.concatenate([
        np.full(len(p), i, np.int32) for i, p in enumerate(per_contig_pos)]) \
        if per_contig_pos else np.zeros(0, np.int32)
    poss = (np.concatenate(per_contig_pos).astype(np.int32)
            if per_contig_pos else np.zeros(0, np.int32))
    alt_all = None
    if per_contig_alt is not None:
        alt_all = np.concatenate([np.asarray(a, bool)
                                  for a in per_contig_alt])

    le32 = lambda v: np.frombuffer(struct.pack("<i", v), np.uint8)  # noqa: E731
    with open(path, "wb") as f:
        _write_bgzf(f, bytes(header))
        for s0 in range(0, total, slice_reads):
            s1 = min(s0 + slice_reads, total)
            n = s1 - s0
            row = np.zeros((n, rec_size), np.uint8)
            # constant fields
            row[:, 0:4] = le32(payload_len)
            # l_read_name=10, mapq=50, bin=0, n_cigar=1, flag
            row[:, 12] = 10
            row[:, 13] = READ_LEN
            row[:, 16:18] = np.frombuffer(struct.pack("<H", 1), np.uint8)
            row[:, 18:20] = np.frombuffer(struct.pack("<H", FLAG), np.uint8)
            row[:, 20:24] = le32(READ_LEN)
            row[:, 24:28] = le32(-1)          # next_ref_id
            row[:, 28:32] = le32(-1)          # next_pos
            row[:, 32:36] = le32(0)           # tlen
            # name 'r' + 8 digits + NUL at [36:46]
            row[:, 36] = ord("r")
            ids = np.arange(s0, s1, dtype=np.int64)
            for d in range(8):
                row[:, 37 + d] = (ids // 10 ** (7 - d)) % 10 + ord("0")
            # cigar 50M at [46:50]
            row[:, 46:50] = np.frombuffer(
                struct.pack("<I", (READ_LEN << 4) | 0), np.uint8)
            # seq: packed 'AA' (code 1 = A); alt reads all-'C' (0x22)
            row[:, seq_off:qual_off] = 0x11
            if alt_all is not None:
                row[alt_all[s0:s1], seq_off:qual_off] = 0x22
            # qual: 30
            row[:, qual_off:rec_size] = 30
            row[:, 4:8] = ref_ids[s0:s1, None].view(np.uint8).reshape(n, 4)
            row[:, 8:12] = poss[s0:s1, None].view(np.uint8).reshape(n, 4)
            _write_bgzf(f, row.tobytes())
        f.write(bytes.fromhex(
            "1f8b08040000000000ff0600424302001b0003000000000000000000"))
    return total


def write_sample_bam(bam: Path, contigs: dict[str, int], rate: float,
                     plan: dict[str, list[tuple[int, int, float]]],
                     seed: int) -> int:
    """Generate one sample's BAM from a per-contig CN plan."""
    rng = np.random.default_rng(seed)
    per_contig = [synth_positions(rng, length, rate, plan.get(name, []))
                  for name, length in contigs.items()]
    t0 = time.time()
    total = write_bam_vectorized(bam, list(contigs.items()), per_contig)
    print(f"[gen] {bam.name}: {total / 1e6:.1f}M reads "
          f"{time.time() - t0:.1f}s", file=sys.stderr)
    return total


def make_het_vcf(path: Path, contig_lengths: dict[str, int],
                 spacing: int = 1500, margin: int = 1000
                 ) -> dict[str, np.ndarray]:
    """Write a single-sample VCF of heterozygous REF=A/ALT=C sites on a
    regular grid (GT 0/1, GQX 60 so both germline and somatic CanvasSNV
    filters keep them).  Returns 0-based site positions per contig."""
    sites = {}
    with open(path, "w") as f:
        f.write("##fileformat=VCFv4.1\n")
        f.write('##FORMAT=<ID=GT,Number=1,Type=String,Description="GT">\n')
        f.write('##FORMAT=<ID=GQX,Number=1,Type=Integer,Description="Q">\n')
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
                "\tNORMAL\n")
        for name, length in contig_lengths.items():
            pos = np.arange(margin, length - margin - READ_LEN, spacing,
                            dtype=np.int64)
            sites[name] = pos
            for p in pos:
                f.write(f"{name}\t{p + 1}\t.\tA\tC\t100\tPASS\t.\t"
                        f"GT:GQX\t0/1:60\n")
    return sites


def assign_alt_reads(rng, read_starts: np.ndarray, site_pos: np.ndarray,
                     site_vaf: np.ndarray) -> np.ndarray:
    """Bool per read: show the ALT allele.  Each read covers at most one
    site (spacing > read length); a read starting at r covers site s when
    r <= s < r + READ_LEN, and is ALT with that site's VAF."""
    if len(site_pos) == 0:
        return np.zeros(len(read_starts), dtype=bool)
    j = np.minimum(np.searchsorted(site_pos, read_starts, side="left"),
                   len(site_pos) - 1)
    covered = (site_pos[j] >= read_starts) & \
        (site_pos[j] < read_starts + READ_LEN)
    u = rng.random(len(read_starts))
    return covered & (u < site_vaf[j])
