"""Reference-genome track ingest: kmer.fa -> device-ready position tracks.

The reference annotates the genome FASTA so that positions whose 35-mer is
unique are UPPERCASE (kmer.fa produced by FlagUniqueKmers); CanvasBin's
per-contig pass derives (CanvasBin.cs:183-200):
  * possible[i]  = isupper(base[i]) — unique alignment start positions;
  * is_gc[i]     = base in {G, g, C, c};
  * leading-n offset = first index whose base != 'n' (lowercase only,
    CanvasBin.cs:582-583).

numpy byte-level ops make this a single vectorized pass per contig.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from canvas_tpu.genome.contigs import ContigTable


def read_fasta(path: str | Path) -> dict[str, np.ndarray]:
    """FASTA -> dict of contig name -> uint8 byte array of bases."""
    out: dict[str, np.ndarray] = {}
    name = None
    parts: list[bytes] = []
    with open(path, "rb") as f:
        for line in f:
            line = line.rstrip(b"\n\r")
            if line.startswith(b">"):
                if name is not None:
                    out[name] = np.frombuffer(b"".join(parts), dtype=np.uint8)
                name = line[1:].split()[0].decode()
                parts = []
            else:
                parts.append(line)
    if name is not None:
        out[name] = np.frombuffer(b"".join(parts), dtype=np.uint8)
    return out


def write_fasta(path: str | Path, seqs: dict[str, str | bytes],
                width: int = 70) -> None:
    with open(path, "w") as f:
        for name, seq in seqs.items():
            if isinstance(seq, bytes):
                seq = seq.decode()
            f.write(f">{name}\n")
            for i in range(0, len(seq), width):
                f.write(seq[i:i + width] + "\n")


_UPPER_LO, _UPPER_HI = ord("A"), ord("Z")
_GC_BYTES = np.frombuffer(b"GgCc", dtype=np.uint8)
_LOWER_N = ord("n")


def contig_tracks(bases: np.ndarray) -> dict:
    """Derive the binning input tracks from a kmer-flagged contig sequence."""
    possible = (bases >= _UPPER_LO) & (bases <= _UPPER_HI) & (bases != ord("N"))
    is_gc = np.isin(bases, _GC_BYTES)
    non_n = bases != _LOWER_N
    nz = np.flatnonzero(non_n)
    offset = int(nz[0]) if nz.size else len(bases)
    return {"possible": possible, "is_gc": is_gc, "offset": offset,
            "length": len(bases)}


def load_reference_tracks(
    kmer_fasta: str | Path, contigs: ContigTable | None = None,
) -> tuple[ContigTable, dict[str, dict]]:
    """kmer.fa -> (contig table, tracks per contig)."""
    seqs = read_fasta(kmer_fasta)
    if contigs is None:
        contigs = ContigTable(tuple(seqs.keys()),
                              tuple(len(v) for v in seqs.values()))
    tracks = {}
    for name in contigs.names:
        if name in seqs:
            tracks[name] = contig_tracks(seqs[name])
    return contigs, tracks
