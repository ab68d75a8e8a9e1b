"""BinSet — the central coverage-bin data structure.

The reference threads List<SampleGenomicBin> (chr, start, stop, gc, count)
through every stage as gzipped text (CanvasIO.WriteToTextFile, IO.cs:15-25:
"chr\\tstart\\tstop\\tcount:F2\\tgc").  Here bins are a struct-of-arrays keyed
by contig index, ready to be placed on device; text files remain supported
for interop with reference outputs.
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass, replace
from pathlib import Path

import numpy as np

from canvas_tpu.genome.contigs import ContigTable


@dataclass
class BinSet:
    """Variable-width coverage bins for one sample, sorted by (contig, start)."""

    contigs: ContigTable
    contig_id: np.ndarray  # int32 [n]
    start: np.ndarray      # int64 [n] 0-based inclusive
    end: np.ndarray        # int64 [n] 0-based exclusive
    gc: np.ndarray         # int16 [n] integer GC percent 0..100
    count: np.ndarray      # float32 [n]

    def __post_init__(self):
        n = len(self.contig_id)
        assert all(len(a) == n for a in (self.start, self.end, self.gc, self.count))

    def __len__(self) -> int:
        return len(self.contig_id)

    @property
    def sizes(self) -> np.ndarray:
        return self.end - self.start

    def select(self, mask: np.ndarray) -> "BinSet":
        return replace(
            self,
            contig_id=self.contig_id[mask],
            start=self.start[mask],
            end=self.end[mask],
            gc=self.gc[mask],
            count=self.count[mask].copy(),
        )

    def with_count(self, count: np.ndarray) -> "BinSet":
        return replace(self, count=np.asarray(count, dtype=np.float32))

    def for_contig(self, name: str) -> "BinSet":
        return self.select(self.contig_id == self.contigs.index(name))

    def contig_slices(self) -> dict[str, slice]:
        """Slices into the flat arrays per contig (bins are sorted by contig)."""
        out: dict[str, slice] = {}
        boundaries = np.flatnonzero(np.diff(self.contig_id)) + 1
        starts = np.concatenate([[0], boundaries])
        ends = np.concatenate([boundaries, [len(self)]])
        for s, e in zip(starts, ends):
            if s == e:
                continue
            out[self.contigs.names[self.contig_id[s]]] = slice(int(s), int(e))
        return out

    def present_contig_names(self) -> list[str]:
        return list(self.contig_slices().keys())

    # -- text interop (reference format) ----------------------------------

    def write_text(self, path: str | Path) -> None:
        names = self.contigs.names
        # one join + one write: per-line f.write into a gzip stream costs
        # ~15x more than compressing a single buffer at level 1
        body = "".join(
            f"{names[cid]}\t{s}\t{e}\t{c:.2f}\t{g}\n"
            for cid, s, e, g, c in zip(
                self.contig_id.tolist(), self.start.tolist(),
                self.end.tolist(), self.gc.tolist(), self.count.tolist())
        ).encode()
        if str(path).endswith(".gz"):
            with gzip.open(str(path), "wb", compresslevel=1) as f:
                f.write(body)
        else:
            Path(path).write_bytes(body)

    @classmethod
    def read_text(cls, path: str | Path, contigs: ContigTable) -> "BinSet":
        name_to_id = {n: i for i, n in enumerate(contigs.names)}
        try:  # C-engine CSV parse is ~10x the Python line loop
            import pandas as pd

            df = pd.read_csv(str(path), sep="\t", header=None,
                             names=["chrom", "start", "end", "count", "gc"],
                             dtype={"chrom": str, "start": np.int64,
                                    "end": np.int64, "count": np.float64,
                                    "gc": np.int32},
                             float_precision="round_trip")  # == float()
            cid = df["chrom"].map(name_to_id).to_numpy(dtype=np.int32)
            return cls(
                contigs=contigs,
                contig_id=cid,
                start=df["start"].to_numpy(),
                end=df["end"].to_numpy(),
                gc=df["gc"].to_numpy(np.int16),
                count=df["count"].to_numpy(np.float32),
            )
        except ImportError:
            pass
        opener = gzip.open if str(path).endswith(".gz") else open
        cid, start, end, gc, count = [], [], [], [], []
        with opener(str(path), "rt") as f:
            for line in f:
                fields = line.rstrip("\n").split("\t")
                cid.append(name_to_id[fields[0]])
                start.append(int(fields[1]))
                end.append(int(fields[2]))
                count.append(float(fields[3]))
                gc.append(int(fields[4]))
        return cls(
            contigs=contigs,
            contig_id=np.asarray(cid, dtype=np.int32),
            start=np.asarray(start, dtype=np.int64),
            end=np.asarray(end, dtype=np.int64),
            gc=np.asarray(gc, dtype=np.int16),
            count=np.asarray(count, dtype=np.float32),
        )

    @classmethod
    def concatenate(cls, parts: list["BinSet"]) -> "BinSet":
        assert parts
        return cls(
            contigs=parts[0].contigs,
            contig_id=np.concatenate([p.contig_id for p in parts]),
            start=np.concatenate([p.start for p in parts]),
            end=np.concatenate([p.end for p in parts]),
            gc=np.concatenate([p.gc for p in parts]),
            count=np.concatenate([p.count for p in parts]),
        )


def to_padded(
    binset: BinSet, pad_to: int | None = None
) -> tuple[np.ndarray, np.ndarray, dict[str, int]]:
    """Pack per-contig coverage into a padded [n_contigs, max_bins] matrix.

    Returns (coverage[float32 C×T], mask[bool C×T], contig→row map).  This is
    the device layout for vmapped per-contig segmentation.
    """
    slices = binset.contig_slices()
    rows = {name: i for i, name in enumerate(slices)}
    width = max((s.stop - s.start for s in slices.values()), default=0)
    if pad_to is not None:
        width = max(width, pad_to)
    cov = np.zeros((len(slices), width), dtype=np.float32)
    mask = np.zeros((len(slices), width), dtype=bool)
    for name, sl in slices.items():
        n = sl.stop - sl.start
        cov[rows[name], :n] = binset.count[sl]
        mask[rows[name], :n] = True
    return cov, mask, rows
