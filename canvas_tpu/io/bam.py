"""BAM/BGZF ingest — the CanvasBin/CanvasSNV input layer.

Replaces Isas.SequencingFiles BamReader (the reference's compiled reader).
Pure-Python BGZF block decoding with zlib + struct record parsing; the
per-contig outputs are numpy arrays ready for the device binning kernels.
A C++ scanner can slot in behind the same interface for production
throughput (see canvas_tpu/native).

Read-start filter semantics (CanvasBin.cs:239-267): mapped, pass-filter,
non-duplicate, forward strand, main (non-secondary, non-supplementary)
alignment, CIGAR starting with >=35M, proper pair when paired-end; each
passing read increments observed[pos] (saturating at 255; Binary mode
stores 1).
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

BAM_MAGIC = b"BAM\x01"
FLAG_PAIRED = 0x1
FLAG_PROPER_PAIR = 0x2
FLAG_UNMAPPED = 0x4
FLAG_REVERSE = 0x10
FLAG_SECONDARY = 0x100
FLAG_FAILQC = 0x200
FLAG_DUPLICATE = 0x400
FLAG_SUPPLEMENTARY = 0x800

CIGAR_OPS = "MIDNSHP=X"
SEQ_NT = "=ACMGRSVTWYHKDBN"


# ---------------------------------------------------------------------------
# BGZF
# ---------------------------------------------------------------------------

def _iter_bgzf_blocks(raw: bytes):
    """Yield decompressed BGZF block payloads."""
    pos = 0
    n = len(raw)
    while pos < n:
        if raw[pos:pos + 2] != b"\x1f\x8b":
            raise ValueError(f"bad BGZF magic at offset {pos}")
        xlen = struct.unpack_from("<H", raw, pos + 10)[0]
        extra = raw[pos + 12: pos + 12 + xlen]
        bsize = None
        e = 0
        while e < len(extra):
            si1, si2, slen = extra[e], extra[e + 1], struct.unpack_from("<H", extra, e + 2)[0]
            if si1 == 66 and si2 == 67:
                bsize = struct.unpack_from("<H", extra, e + 4)[0] + 1
            e += 4 + slen
        if bsize is None:
            raise ValueError("BGZF block without BSIZE")
        cdata = raw[pos + 12 + xlen: pos + bsize - 8]
        payload = zlib.decompress(cdata, wbits=-15)
        yield payload
        pos += bsize


def bgzf_decompress(path: str | Path) -> bytes:
    return b"".join(_iter_bgzf_blocks(Path(path).read_bytes()))


def bgzf_compress(data: bytes, block_size: int = 60000) -> bytes:
    """Write BGZF blocks + EOF marker."""
    out = bytearray()
    for off in range(0, max(len(data), 1), block_size):
        chunk = data[off:off + block_size]
        comp = zlib.compress(chunk, 6)[2:-4]  # raw deflate
        crc = zlib.crc32(chunk) & 0xFFFFFFFF
        bsize = len(comp) + 25 + 1
        out += b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff"
        out += struct.pack("<H", 6)                      # XLEN
        out += b"BC" + struct.pack("<H", 2) + struct.pack("<H", bsize - 1)
        out += comp
        out += struct.pack("<II", crc, len(chunk))
    # EOF block
    out += bytes.fromhex(
        "1f8b08040000000000ff0600424302001b0003000000000000000000")
    return bytes(out)


# ---------------------------------------------------------------------------
# BAM records
# ---------------------------------------------------------------------------

@dataclass
class BamRecord:
    ref_id: int
    pos: int
    mapq: int
    flag: int
    read_name: str
    cigar: list[tuple[int, str]]     # (length, op)
    seq: str
    qual: np.ndarray                 # phred int array
    next_ref_id: int = -1
    next_pos: int = -1
    tlen: int = 0

    @property
    def is_mapped(self) -> bool:
        return not (self.flag & FLAG_UNMAPPED)

    @property
    def is_main(self) -> bool:
        return not (self.flag & (FLAG_SECONDARY | FLAG_SUPPLEMENTARY))

    def passes_canvas_bin_filter(self, paired_end: bool) -> bool:
        """CanvasBin.cs:239-249."""
        f = self.flag
        if f & FLAG_UNMAPPED or f & FLAG_FAILQC or f & FLAG_DUPLICATE \
                or f & FLAG_REVERSE or f & (FLAG_SECONDARY | FLAG_SUPPLEMENTARY):
            return False
        if not self.cigar or self.cigar[0][1] != "M" or self.cigar[0][0] < 35:
            return False
        if paired_end and not (f & FLAG_PROPER_PAIR):
            return False
        return True


@dataclass
class BamFile:
    refs: list[tuple[str, int]]
    _data: bytes = b""
    _first_record_offset: int = 0

    @classmethod
    def read(cls, path: str | Path) -> "BamFile":
        data = bgzf_decompress(path)
        if data[:4] != BAM_MAGIC:
            raise ValueError("not a BAM file")
        off = 4
        l_text = struct.unpack_from("<i", data, off)[0]
        off += 4 + l_text
        n_ref = struct.unpack_from("<i", data, off)[0]
        off += 4
        refs = []
        for _ in range(n_ref):
            l_name = struct.unpack_from("<i", data, off)[0]
            name = data[off + 4: off + 4 + l_name - 1].decode()
            l_ref = struct.unpack_from("<i", data, off + 4 + l_name)[0]
            refs.append((name, l_ref))
            off += 8 + l_name
        return cls(refs, data, off)

    @classmethod
    def read_sample_name(cls, path: str | Path) -> str | None:
        """SM tag from the first @RG header line (the reference defaults a
        pedigree sample's name to the RG SM tag,
        SmallPedigreeOptionsParser.cs:31-45)."""
        data = bgzf_decompress(path)
        if data[:4] != BAM_MAGIC:
            raise ValueError("not a BAM file")
        l_text = struct.unpack_from("<i", data, 4)[0]
        text = data[8: 8 + l_text].decode(errors="replace")
        for line in text.splitlines():
            if line.startswith("@RG"):
                for field in line.split("\t"):
                    if field.startswith("SM:"):
                        return field[3:]
        return None

    def ref_index(self, name: str) -> int:
        for i, (n, _) in enumerate(self.refs):
            if n == name:
                return i
        return -1

    def records(self, want_seq: bool = True):
        data = self._data
        off = self._first_record_offset
        n = len(data)
        unpack = struct.unpack_from
        while off < n:
            block_size = unpack("<i", data, off)[0]
            p = off + 4
            (ref_id, pos) = unpack("<ii", data, p)
            l_read_name = data[p + 8]
            mapq = data[p + 9]
            (n_cigar, flag) = unpack("<HH", data, p + 12)
            l_seq = unpack("<i", data, p + 16)[0]
            (next_ref, next_pos, tlen) = unpack("<iii", data, p + 20)
            q = p + 32
            read_name = data[q:q + l_read_name - 1].decode()
            q += l_read_name
            cigar = []
            for k in range(n_cigar):
                v = unpack("<I", data, q + 4 * k)[0]
                cigar.append((v >> 4, CIGAR_OPS[v & 0xF]))
            q += 4 * n_cigar
            if want_seq:
                sq = data[q:q + (l_seq + 1) // 2]
                seq = "".join(
                    SEQ_NT[(sq[i // 2] >> 4) if i % 2 == 0 else (sq[i // 2] & 0xF)]
                    for i in range(l_seq))
                qual = np.frombuffer(
                    data[q + (l_seq + 1) // 2: q + (l_seq + 1) // 2 + l_seq],
                    dtype=np.uint8).copy()
            else:
                seq, qual = "", np.zeros(0, np.uint8)
            yield BamRecord(ref_id, pos, mapq, flag, read_name, cigar, seq,
                            qual, next_ref, next_pos, tlen)
            off += 4 + block_size


def read_start_counts(
    bam: BamFile, contig: str, paired_end: bool = True,
    mode: str = "TruncatedDynamicRange",
) -> tuple[np.ndarray, np.ndarray]:
    """Per-position observed read-start counts for one contig
    (LoadObservedAlignmentsBAM semantics).  Returns (observed uint8[L],
    fragment_lengths int16[L])."""
    idx = bam.ref_index(contig)
    length = bam.refs[idx][1]
    observed = np.zeros(length, dtype=np.uint8)
    frag = np.zeros(length, dtype=np.int16)
    for rec in bam.records(want_seq=False):
        if rec.ref_id != idx:
            continue
        if not rec.passes_canvas_bin_filter(paired_end):
            continue
        p = rec.pos
        if mode == "Binary":
            observed[p] = 1
        else:
            if observed[p] < 255:
                observed[p] += 1
        if mode == "GCContentWeighted":
            frag[p] = max(min(32767, rec.tlen), 0)
    return observed, frag


# ---------------------------------------------------------------------------
# Minimal BAM writer (fixtures + tests)
# ---------------------------------------------------------------------------

def write_bam(path: str | Path, refs: list[tuple[str, int]],
              records: list[BamRecord]) -> None:
    body = bytearray()
    body += BAM_MAGIC
    text = b"@HD\tVN:1.6\tSO:coordinate\n"
    body += struct.pack("<i", len(text)) + text
    body += struct.pack("<i", len(refs))
    for name, length in refs:
        nb = name.encode() + b"\x00"
        body += struct.pack("<i", len(nb)) + nb + struct.pack("<i", length)
    nt_code = {c: i for i, c in enumerate(SEQ_NT)}
    op_code = {c: i for i, c in enumerate(CIGAR_OPS)}
    for rec in records:
        name_b = rec.read_name.encode() + b"\x00"
        cigar_b = b"".join(
            struct.pack("<I", (ln << 4) | op_code[op]) for ln, op in rec.cigar)
        l_seq = len(rec.seq)
        seq_b = bytearray((l_seq + 1) // 2)
        for i, c in enumerate(rec.seq):
            code = nt_code.get(c.upper(), 15)
            if i % 2 == 0:
                seq_b[i // 2] |= code << 4
            else:
                seq_b[i // 2] |= code
        qual_b = bytes(rec.qual) if len(rec.qual) else b"\xff" * l_seq
        payload = struct.pack(
            "<iiBBHHHiiii", rec.ref_id, rec.pos,
            len(name_b), rec.mapq, 0, len(rec.cigar), rec.flag,
            l_seq, rec.next_ref_id, rec.next_pos, rec.tlen)
        payload += name_b + cigar_b + bytes(seq_b) + qual_b
        body += struct.pack("<i", len(payload)) + payload
    Path(path).write_bytes(bgzf_compress(bytes(body)))
