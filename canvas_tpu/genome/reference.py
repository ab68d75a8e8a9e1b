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
    """FASTA -> dict of contig name -> uint8 byte array of bases.

    Single vectorized pass: header starts are '>' bytes at line starts;
    each record body drops newlines with one boolean-mask gather (a
    Python per-line loop costs ~10s per 100 Mbp; this is ~100x faster)."""
    data = Path(path).read_bytes()
    if not data:
        return {}
    arr = np.frombuffer(data, dtype=np.uint8)
    gt = np.flatnonzero(arr == ord(">"))
    starts = gt[(gt == 0) | (arr[np.maximum(gt - 1, 0)] == ord("\n"))]
    out: dict[str, np.ndarray] = {}
    for i, h in enumerate(starts):
        nl = data.find(b"\n", h)
        if nl < 0:
            break
        name = data[h + 1:nl].split()[0].decode()
        end = starts[i + 1] if i + 1 < len(starts) else len(data)
        body = arr[nl + 1:end]
        out[name] = body[(body != ord("\n")) & (body != ord("\r"))]
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

# 256-entry byte classification tables: one gather per track instead of
# several full-length compare passes (np.isin costs ~10s per 60 Mbp)
_POSSIBLE_TABLE = np.zeros(256, dtype=bool)
_POSSIBLE_TABLE[_UPPER_LO:_UPPER_HI + 1] = True
_POSSIBLE_TABLE[ord("N")] = False
_GC_TABLE = np.zeros(256, dtype=bool)
_GC_TABLE[_GC_BYTES] = True


def contig_tracks(bases: np.ndarray) -> dict:
    """Derive the binning input tracks from a kmer-flagged contig sequence."""
    possible = _POSSIBLE_TABLE[bases]
    is_gc = _GC_TABLE[bases]
    # leading-n offset without materializing a full index array
    offset = int(np.argmax(bases != _LOWER_N))
    if offset == 0 and len(bases) and bases[0] == _LOWER_N:
        offset = len(bases)   # all-n contig
    return {"possible": possible, "is_gc": is_gc, "offset": offset,
            "length": len(bases)}


def load_reference_tracks(
    kmer_fasta: str | Path, contigs: ContigTable | None = None,
) -> tuple[ContigTable, dict[str, dict]]:
    """kmer.fa -> (contig table, tracks per contig).

    The first load parses the FASTA and writes a `<kmer.fa>.tracks/`
    sidecar (bit-packed possible/is_gc per contig + meta.json keyed on the
    FASTA's size/mtime); later loads skip the parse (~6 s per 100 Mbp)
    and just read+unpack (~8x smaller than the FASTA).  Set
    CANVAS_TPU_NO_TRACK_CACHE=1 to disable."""
    import json
    import os

    src = Path(kmer_fasta)
    cache_dir = src.with_name(src.name + ".tracks")
    meta_path = cache_dir / "meta.json"
    use_cache = not os.environ.get("CANVAS_TPU_NO_TRACK_CACHE")
    st = src.stat()
    if use_cache and meta_path.exists():
        try:
            meta = json.loads(meta_path.read_text())
            if meta["src_size"] == st.st_size and \
                    meta["src_mtime"] == st.st_mtime:
                names = meta["names"]
                if contigs is None:
                    contigs = ContigTable(tuple(names),
                                          tuple(meta["lengths"]))
                tracks = {}
                for i, name in enumerate(names):
                    if name not in contigs.names:
                        continue
                    L = meta["lengths"][i]
                    p = np.unpackbits(
                        np.load(cache_dir / f"{i}.possible.npy"),
                        count=L).view(bool)
                    g = np.unpackbits(
                        np.load(cache_dir / f"{i}.gc.npy"),
                        count=L).view(bool)
                    tracks[name] = {"possible": p, "is_gc": g,
                                    "offset": meta["offsets"][i],
                                    "length": L}
                return contigs, tracks
        except Exception:
            pass  # stale/corrupt sidecar: fall through to a fresh parse

    seqs = read_fasta(kmer_fasta)
    if contigs is None:
        contigs = ContigTable(tuple(seqs.keys()),
                              tuple(len(v) for v in seqs.values()))
    tracks = {}
    for name in contigs.names:
        if name in seqs:
            tracks[name] = contig_tracks(seqs[name])
    if use_cache:
        try:
            cache_dir.mkdir(exist_ok=True)
            names, lengths, offsets = [], [], []
            for name, v in seqs.items():
                i = len(names)
                t = tracks.get(name) or contig_tracks(v)
                np.save(cache_dir / f"{i}.possible.npy",
                        np.packbits(t["possible"]))
                np.save(cache_dir / f"{i}.gc.npy", np.packbits(t["is_gc"]))
                names.append(name)
                lengths.append(t["length"])
                offsets.append(t["offset"])
            meta_path.write_text(json.dumps({
                "src_size": st.st_size, "src_mtime": st.st_mtime,
                "names": names, "lengths": lengths, "offsets": offsets}))
        except OSError:
            pass  # read-only reference folder: cache is best-effort
    return contigs, tracks
