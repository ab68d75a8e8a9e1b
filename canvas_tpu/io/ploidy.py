"""Reference-ploidy VCF handling (CanvasCommon/PloidyInfo.cs).

A ploidy VCF gives per-interval expected copy numbers (e.g. chrX/chrY for
XY samples).  GetReferenceCopyNumber returns the majority ploidy over a
segment (PloidyInfo.cs:56-72 + getPloidyCounts :94-109); uniformity checks
drive segmentation breakpoints at ploidy transitions."""

from __future__ import annotations

import gzip
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np


@dataclass
class PloidyInterval:
    chromosome: str
    start: int     # 1-based (VCF POS)
    end: int       # 1-based inclusive (INFO END)
    ploidy: int


@dataclass
class PloidyInfo:
    by_chromosome: dict[str, list[PloidyInterval]] = field(default_factory=dict)
    header_line: str | None = None

    def _ploidy_counts(self, chrom: str, one_start: int, one_end: int):
        """getPloidyCounts: base counts per ploidy over [one_start, one_end]
        (1-based inclusive)."""
        counts = np.zeros(5, dtype=np.int64)
        counts[2] = one_end - one_start + 1
        for iv in self.by_chromosome.get(chrom, []):
            if iv.ploidy == 2:
                continue
            o_start = max(one_start - 1, iv.start - 1)
            if o_start > iv.end:
                continue
            o_end = min(one_end, iv.end)
            bases = o_end - o_start
            if bases <= 0:
                continue
            counts[2] -= bases
            counts[iv.ploidy] += bases
        return counts

    def reference_copy_number(self, chrom: str, begin: int, end: int) -> int:
        """Majority ploidy for a 0-based [begin, end) span."""
        if chrom not in self.by_chromosome:
            return 2
        counts = self._ploidy_counts(chrom, begin + 1, end)
        best_count, best_cn = 0, 2
        for cn in range(len(counts)):
            if counts[cn] > best_count:
                best_count, best_cn = counts[cn], cn
        return best_cn

    def is_uniform(self, chrom: str, one_start: int, one_end: int) -> bool:
        if chrom not in self.by_chromosome:
            return True
        counts = self._ploidy_counts(chrom, one_start, one_end)
        return int(np.count_nonzero(counts > 0)) < 2

    def segment_ploidy_fn(self):
        """Callable(segment) -> reference CN, for the callers."""
        return lambda seg: self.reference_copy_number(
            seg.chrom, seg.begin, seg.end)

    def breaks_for_contig(self, chrom: str) -> np.ndarray:
        """1-based positions where reference ploidy changes (for the
        partition post-processing ploidy-break rule)."""
        breaks = []
        for iv in self.by_chromosome.get(chrom, []):
            if iv.ploidy != 2:
                breaks.extend([iv.start, iv.end + 1])
        return np.asarray(sorted(set(breaks)), dtype=np.int64)


def load_ploidy_vcf(path: str | Path, sample_id: str | None = None) -> PloidyInfo:
    """LoadPloidyFromVcfFile (PloidyInfo.cs:128-165)."""
    info = PloidyInfo()
    opener = gzip.open if str(path).endswith(".gz") else open
    sample_index = 0
    with opener(str(path), "rt") as f:
        for line in f:
            if line.startswith("##"):
                continue
            if line.startswith("#CHROM"):
                samples = line.rstrip("\n").split("\t")[9:]
                if not samples:
                    raise ValueError(f"'{path}' has no genotype column")
                if sample_id is not None:
                    if sample_id not in samples:
                        raise ValueError(
                            f"'{path}' lacks genotype column for {sample_id}")
                    sample_index = samples.index(sample_id)
                elif len(samples) > 1:
                    raise ValueError(
                        f"'{path}' needs a sample ID with >1 genotype columns")
                continue
            fields = line.rstrip("\n").split("\t")
            chrom = fields[0]
            end = None
            for kv in fields[7].split(";"):
                if kv.startswith("END="):
                    end = int(kv[4:])
            fmt = fields[8].split(":")
            col = dict(zip(fmt, fields[9 + sample_index].split(":")))
            if "CN" not in col:
                raise ValueError(f"'{path}' must contain a genotype CN column")
            cn = 2 if col["CN"] == "." else int(col["CN"])
            info.by_chromosome.setdefault(chrom, []).append(
                PloidyInterval(chrom, int(fields[1]), end, cn))
    return info


@dataclass(frozen=True)
class ReferencePloidyInterval:
    """One (chrom, 1-based inclusive interval, ploidy) run."""
    chromosome: str
    start: int
    end: int
    ploidy: int


class ReferencePloidy:
    """CanvasCommon/ReferencePloidy.cs: per-chromosome sorted non-2 ploidy
    runs from a (possibly multi-sample) ploidy VCF, with query splitting.

    Used by EvaluateCNV to assign reference ploidy to truth intervals
    (CNVChecker.cs:557-588)."""

    def __init__(self, regions: dict[str, list[tuple[int, int, int]]]):
        # regions: chrom -> [(start, end, ploidy)], validated + merged
        self._regions = regions

    @classmethod
    def from_intervals(
        cls, intervals: list[ReferencePloidyInterval]) -> "ReferencePloidy":
        by_chrom: dict[str, list[tuple[int, int, int]]] = {}
        for iv in intervals:
            by_chrom.setdefault(iv.chromosome, []).append(
                (iv.start, iv.end, iv.ploidy))
        out: dict[str, list[tuple[int, int, int]]] = {}
        for chrom, regs in by_chrom.items():
            merged: list[tuple[int, int, int]] = []
            cur_s, cur_e, cur_p = regs[0]
            for s, e, p in regs[1:]:
                if s <= cur_e and e >= cur_s:
                    raise ValueError(
                        f"Error in Ploidy VCF. Found overlapping intervals "
                        f"[{cur_s},{cur_e}] and [{s},{e}]")
                if (s, e) < (cur_s, cur_e):
                    raise ValueError(
                        f"Error in Ploidy VCF. Missorted intervals "
                        f"[{cur_s},{cur_e}] followed by [{s},{e}]")
                if cur_e + 1 == s and cur_p == p:       # LeftAdjacent merge
                    cur_e = e
                    continue
                merged.append((cur_s, cur_e, cur_p))
                cur_s, cur_e, cur_p = s, e, p
            merged.append((cur_s, cur_e, cur_p))
            out[chrom] = [(s, e, p) for s, e, p in merged if p != 2]
        return cls(out)

    @classmethod
    def load(cls, path: str | Path,
             sample_id: str | None = None) -> "ReferencePloidy":
        """ReferencePloidy.Load: start shifts by +1 when ALT is symbolic
        (VCF padding-base rule, ReferencePloidy.cs:128-131)."""
        intervals: list[ReferencePloidyInterval] = []
        opener = gzip.open if str(path).endswith(".gz") else open
        sample_index = 0
        with opener(str(path), "rt") as f:
            for line in f:
                if line.startswith("##"):
                    continue
                if line.startswith("#CHROM"):
                    samples = line.rstrip("\n").split("\t")[9:]
                    if sample_id is not None:
                        if sample_id not in samples:
                            raise ValueError(
                                f"VCF does not contain genotype column for "
                                f"sample '{sample_id}'")
                        sample_index = samples.index(sample_id)
                    continue
                fields = line.rstrip("\n").split("\t")
                end = None
                for kv in fields[7].split(";"):
                    if kv.startswith("END="):
                        end = int(kv[4:])
                if end is None:
                    raise ValueError(
                        f"Missing END field in INFO column: {line!r}")
                fmt = fields[8].split(":")
                col = dict(zip(fmt, fields[9 + sample_index].split(":")))
                if "CN" not in col or not col["CN"].isdigit():
                    raise ValueError(
                        f"CN field must be an unsigned integer: {line!r}")
                start = int(fields[1])
                if fields[4].startswith("<"):
                    start += 1
                intervals.append(ReferencePloidyInterval(
                    fields[0], start, end, int(col["CN"])))
        return cls.from_intervals(intervals)

    def reference_ploidy_intervals(
        self, chromosome: str, start: int, end: int,
    ) -> list[ReferencePloidyInterval]:
        """Adjacent runs spanning [start, end] (1-based inclusive), trimmed
        to the query; gaps fill with ploidy 2
        (ReferencePloidy.GetReferencePloidyIntervals)."""
        out: list[ReferencePloidyInterval] = []
        rem_s, rem_e = start, end
        for (s, e, p) in self._regions.get(chromosome, []):
            o_s, o_e = max(s, rem_s), min(e, rem_e)
            if o_s > o_e:
                continue
            if rem_s < s:
                out.append(ReferencePloidyInterval(chromosome, rem_s,
                                                   s - 1, 2))
                rem_s = s
            out.append(ReferencePloidyInterval(chromosome, o_s, o_e, p))
            if rem_e <= e:
                return out
            rem_s = e + 1
        out.append(ReferencePloidyInterval(chromosome, rem_s, rem_e, 2))
        return out

    def single_reference_ploidy(self, chromosome: str, start: int,
                                end: int) -> int:
        """GetSingleReferencePloidy (ReferencePloidyExtensions.cs): raises
        when the query spans regions of different ploidy."""
        runs = self.reference_ploidy_intervals(chromosome, start, end)
        if len(runs) != 1:
            raise ValueError(
                f"Reference interval '{chromosome}:{start}-{end}' overlaps "
                f"regions with different ploidy")
        return runs[0].ploidy


def write_ploidy_vcf(path: str | Path, sample_name: str,
                     intervals: list[PloidyInterval]) -> None:
    """Minimal ploidy VCF writer (Canvas.Wrapper CanvasPloidyVcfCreator)."""
    with open(path, "w") as f:
        f.write("##fileformat=VCFv4.1\n")
        f.write('##INFO=<ID=END,Number=1,Type=Integer,Description="End">\n')
        f.write('##FORMAT=<ID=CN,Number=1,Type=Integer,Description="CN">\n')
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                f"{sample_name}\n")
        for iv in intervals:
            f.write(f"{iv.chromosome}\t{iv.start}\t.\tN\t<CNV>\t.\tPASS\t"
                    f"END={iv.end}\tCN\t{iv.ploidy}\n")


def ploidy_vcf_from_karyotype(path: str | Path, sample_name: str,
                              contigs, karyotype: str) -> None:
    """Sex-karyotype ploidy VCF (Canvas.Wrapper CanvasPloidyVcfCreator +
    Isas PloidyCorrector): whole-allosome CN records from an XX/XY/X/XYY...
    karyotype string; autosomes stay implicit diploid."""
    k = karyotype.upper()
    n_x = k.count("X")
    n_y = k.count("Y")
    intervals = []
    for name in contigs.names:
        plain = name.replace("chr", "")
        if plain == "X" and n_x != 2:
            intervals.append(PloidyInterval(name, 1, contigs.length(name),
                                            n_x))
        elif plain == "Y" and n_y != 0:
            intervals.append(PloidyInterval(name, 1, contigs.length(name),
                                            n_y))
        elif plain == "Y" and n_y == 0:
            intervals.append(PloidyInterval(name, 1, contigs.length(name),
                                            0))
    write_ploidy_vcf(path, sample_name, intervals)
