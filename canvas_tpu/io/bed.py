"""Plain BED interval loading (Utilities.LoadBedFile, Utilities.cs) and the
forbidden-interval test used by segment merging (CanvasSegment.cs:752-764)."""

from __future__ import annotations

import gzip
from pathlib import Path


def load_bed_intervals(path: str | Path) -> dict[str, list[tuple[int, int]]]:
    """chrom -> [(start, stop)] in file order (the reference keeps file
    order and relies on sorted input for the early-break in the
    forbidden-interval scan)."""
    out: dict[str, list[tuple[int, int]]] = {}
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(str(path), "rt") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith(("#", "track", "browser")):
                continue
            fields = line.split("\t")
            out.setdefault(fields[0], []).append(
                (int(fields[1]), int(fields[2])))
    return out


def is_forbidden_interval(
    chrom: str, start: int, end: int,
    excluded: dict[str, list[tuple[int, int]]] | None,
) -> bool:
    """True when any excluded-interval endpoint falls in [start, end]
    (CanvasSegment.IsForbiddenInterval, :752-764)."""
    if not excluded or chrom not in excluded:
        return False
    for s, e in excluded[chrom]:
        if start <= s <= end or start <= e <= end:
            return True
        if s > end:
            break
    return False
