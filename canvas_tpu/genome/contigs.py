"""Contig table: the static genome coordinate frame.

Every device array in the pipeline is keyed by contig index into this table.
Mirrors the role of Isas GenomeMetadata/GenomeSize.xml in the reference
(CanvasSegmentWriter.cs:66-71 reads GenomeSize.xml for ##contig headers and
the chromosome ordering of VCF output).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass
from pathlib import Path

import numpy as np

_AUTOSOME_RE = re.compile(r"^(chr)?(\d+)$", re.IGNORECASE)
_ALLOSOME_RE = re.compile(r"^(chr)?([XYZW])$", re.IGNORECASE)


def is_autosome(name: str) -> bool:
    return _AUTOSOME_RE.match(name) is not None


def is_allosome(name: str) -> bool:
    return _ALLOSOME_RE.match(name) is not None


def is_canonical(name: str) -> bool:
    """Autosome or sex chromosome — the contigs CanvasBin processes
    (CanvasRunner.cs:333-389 skips decoys/unplaced)."""
    return is_autosome(name) or is_allosome(name)


@dataclass(frozen=True)
class ContigTable:
    """Ordered contig names and lengths; order defines output order."""

    names: tuple[str, ...]
    lengths: tuple[int, ...]

    def __post_init__(self):
        assert len(self.names) == len(self.lengths)

    def __len__(self) -> int:
        return len(self.names)

    def __contains__(self, name: str) -> bool:
        return name in self.names

    def index(self, name: str) -> int:
        return self.names.index(name)

    def length(self, name: str) -> int:
        return self.lengths[self.index(name)]

    @property
    def lengths_array(self) -> np.ndarray:
        return np.asarray(self.lengths, dtype=np.int64)

    def autosome_mask(self) -> np.ndarray:
        return np.asarray([is_autosome(n) for n in self.names], dtype=bool)

    def canonical(self) -> "ContigTable":
        keep = [(n, l) for n, l in zip(self.names, self.lengths) if is_canonical(n)]
        return ContigTable(tuple(n for n, _ in keep), tuple(l for _, l in keep))

    # -- GenomeSize.xml ----------------------------------------------------

    @classmethod
    def from_genome_size_xml(cls, path: str | Path) -> "ContigTable":
        root = ET.parse(str(path)).getroot()
        names, lengths = [], []
        for chrom in root.iter("chromosome"):
            names.append(chrom.attrib["contigName"])
            lengths.append(int(chrom.attrib["totalBases"]))
        return cls(tuple(names), tuple(lengths))

    def to_genome_size_xml(self, path: str | Path, genome_name: str = "genome") -> None:
        root = ET.Element("sequenceSizes", genomeName=genome_name)
        for name, length in zip(self.names, self.lengths):
            kind = "Autosome" if is_autosome(name) else (
                "Allosome" if is_allosome(name) else "Contig")
            ET.SubElement(
                root, "chromosome", fileName="genome.fa", contigName=name,
                totalBases=str(length), isCircular="false", ploidy="2",
                knownBases=str(length), type=kind)
        ET.ElementTree(root).write(str(path), encoding="unicode", xml_declaration=True)

    @classmethod
    def from_fasta_index(cls, fai_path: str | Path) -> "ContigTable":
        names, lengths = [], []
        for line in Path(fai_path).read_text().splitlines():
            fields = line.split("\t")
            names.append(fields[0])
            lengths.append(int(fields[1]))
        return cls(tuple(names), tuple(lengths))
