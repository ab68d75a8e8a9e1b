"""B-allele frequency extraction (CanvasSNV) and VF-file interop.

Reference semantics (CanvasSNV/SNVReviewer.cs):
  * load single-nucleotide PASS variants for one chromosome from the
    normal/population VCF — somatic: het + GQX>=30; germline: het or
    hom-alt (:86-152);
  * pileup ref/alt base counts at those sites via CIGAR walk over primary,
    mapped, non-duplicate reads with MAPQ > minMapQ; bases with quality
    < 20 skipped (:172-271);
  * output "#Chromosome Position Ref Alt CountRef CountAlt" (gz) and a
    .baf CSV whose B allele follows the A<T<G<C dye preference (:299-365);
  * CanvasIO.ReadFrequencies maps counts into bin/segment intervals,
    dropping sites with total depth < 10 (IO.cs:134-179).
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from canvas_tpu.io.bam import BamFile

MIN_BASE_QSCORE = 20    # SNVReviewer.cs:31
MIN_TOTAL_COUNTS = 10   # IO.cs:137


@dataclass
class SnvSite:
    chrom: str
    position: int    # 1-based (VCF convention)
    ref: str
    alt: str
    count_ref: int = 0
    count_alt: int = 0


def _parse_gt(gt: str) -> list[str]:
    return gt.replace("|", "/").split("/")


def load_het_snvs(
    vcf_path: str | Path, chromosome: str, sample_name: str | None = None,
    is_somatic: bool = False, is_dbsnp: bool = False,
) -> list[SnvSite]:
    """LoadVariants (SNVReviewer.cs:86-152) for one chromosome."""
    return load_het_snvs_multi(vcf_path, [chromosome], sample_name,
                               is_somatic, is_dbsnp).get(chromosome, [])


def load_het_snvs_multi(
    vcf_path: str | Path, chromosomes: list[str],
    sample_name: str | None = None,
    is_somatic: bool = False, is_dbsnp: bool = False,
) -> dict[str, list[SnvSite]]:
    """LoadVariants for many chromosomes in ONE VCF pass (the reference
    spawns one CanvasSNV process per chromosome, each re-reading the VCF;
    here the dict of per-chromosome site lists comes from a single scan)."""
    wanted = set(chromosomes)
    sites: dict[str, list[SnvSite]] = {c: [] for c in chromosomes}
    opener = gzip.open if str(vcf_path).endswith(".gz") else open
    sample_idx = 0
    with opener(str(vcf_path), "rt") as f:
        for line in f:
            if line.startswith("##"):
                continue
            if line.startswith("#CHROM"):
                cols = line.rstrip("\n").split("\t")
                samples = cols[9:]
                if sample_name and not is_dbsnp:
                    if sample_name not in samples:
                        raise ValueError(
                            f"VCF lacks genotype column for {sample_name}")
                    sample_idx = samples.index(sample_name)
                elif len(samples) > 1:
                    raise ValueError("multi-sample VCF requires sample_name")
                continue
            fields = line.rstrip("\n").split("\t")
            if fields[0] not in wanted:
                continue
            ref, alts = fields[3], fields[4].split(",")
            if len(alts) != 1 or len(alts[0]) != 1 or len(ref) != 1:
                continue
            if len(fields) > 9:  # genotype columns present
                if fields[6] != "PASS":
                    continue
                fmt = fields[8].split(":")
                gcol = dict(zip(fmt, fields[9 + sample_idx].split(":")))
                if "FT" in gcol and gcol["FT"] not in ("PASS", "."):
                    continue
                if "GT" not in gcol:
                    continue
                alleles = _parse_gt(gcol["GT"])
                is_het = len(set(alleles)) > 1
                is_homalt = all(a == "1" for a in alleles)
                if is_somatic:
                    if not is_het:
                        continue
                    gqx = gcol.get("GQX")
                    if gqx is not None:
                        if gqx == "." or float(gqx) < 30:
                            continue
                else:
                    if not (is_het or is_homalt):
                        continue
            sites[fields[0]].append(
                SnvSite(fields[0], int(fields[1]), ref, alts[0]))
    return sites


def pileup_counts_native(
    bam_path: str | Path,
    sites_by_chrom: dict[str, list[SnvSite]],
    min_mapq: int = 0,
) -> bool:
    """One native streaming-BAM pileup pass over all chromosomes (fills the
    SnvSite counts in place).  Returns False when the native scanner is
    unavailable — callers fall back to the Python pileup."""
    from canvas_tpu import native

    if not native.available():
        return False
    refs = native.read_bam_refs(str(bam_path))
    if refs is None:
        return False
    ref_index = {name: i for i, (name, _) in enumerate(refs)}
    sites_by_ref = {}
    ordered: dict[int, list[SnvSite]] = {}
    for chrom, sites in sites_by_chrom.items():
        if chrom not in ref_index or not sites:
            continue
        r = ref_index[chrom]
        ordered[r] = sites
        sites_by_ref[r] = (
            np.array([s.position - 1 for s in sites], dtype=np.int64),
            [s.ref for s in sites], [s.alt for s in sites])
    if not sites_by_ref:
        return True
    res = native.pileup_sites_all(str(bam_path), sites_by_ref, len(refs),
                                  min_mapq=min_mapq,
                                  min_baseq=MIN_BASE_QSCORE)
    if res is None:
        return False
    for r, (cr, ca) in res.items():
        for i, s in enumerate(ordered[r]):
            s.count_ref = int(cr[i])
            s.count_alt = int(ca[i])
    return True


def pileup_counts(
    bam: BamFile, chromosome: str, sites: list[SnvSite],
    min_mapq: int = 0,
) -> list[SnvSite]:
    """ProcessBamFile + ProcessReadBases (SNVReviewer.cs:172-271).

    Counts in place and returns `sites`.  Positions are 1-based in sites,
    0-based in BAM."""
    if not sites:
        return sites
    ref_idx = bam.ref_index(chromosome)
    positions = np.array([s.position - 1 for s in sites])
    next_variant = 0
    for read in bam.records(want_seq=True):
        if read.ref_id > ref_idx:
            break
        if read.ref_id < ref_idx:
            continue
        if not read.is_main or not read.is_mapped:
            continue
        if read.flag & 0x400:
            continue
        if read.mapq <= min_mapq:
            continue
        while next_variant < len(sites) and \
                positions[next_variant] < read.pos:
            next_variant += 1
        if next_variant >= len(sites):
            break
        if read.pos + 1000 < positions[next_variant]:
            continue
        # CIGAR walk
        position = read.pos
        base_index = 0
        vi = next_variant
        for length, op in read.cigar:
            if op == "M":
                seg_end = position + length
                while vi < len(sites) and positions[vi] < position:
                    vi += 1
                while vi < len(sites) and positions[vi] < seg_end:
                    p = positions[vi]
                    bi = base_index + (p - position)
                    if read.qual[bi] >= MIN_BASE_QSCORE:
                        b = read.seq[bi]
                        if b == sites[vi].ref:
                            sites[vi].count_ref += 1
                        if b == sites[vi].alt:
                            sites[vi].count_alt += 1
                    vi += 1
                position = seg_end
                base_index += length
            elif op in ("S", "I"):
                base_index += length
            elif op == "D":
                position += length
            else:
                break
    return sites


_B_PREFERENCE = {"a": 0, "t": 1, "g": 2, "c": 3}


def b_allele_frequency(site: SnvSite) -> float | None:
    """GetBAlleleFrequency (SNVReviewer.cs:318-337)."""
    total = site.count_ref + site.count_alt
    if total < 1 or site.ref == "." or site.alt == ".":
        return None
    if _B_PREFERENCE[site.ref.lower()] < _B_PREFERENCE[site.alt.lower()]:
        return site.count_ref / total
    return site.count_alt / total


# ---------------------------------------------------------------------------
# VF file I/O
# ---------------------------------------------------------------------------

def is_variant_site(site: SnvSite, is_dbsnp: bool = False) -> bool:
    """SNVReviewer.IsVariantSite (:74-81): drop zero-depth sites; for a
    population (dbSNP) VCF require at least one variant-allele read."""
    total = site.count_ref + site.count_alt
    if total == 0:
        return False
    if is_dbsnp and site.count_alt == 0:
        return False
    return True


def write_baf_csv(path: str | Path, sites: list[SnvSite]) -> None:
    """The .baf CSV companion (WriteBAlleleFrequencies, SNVReviewer.cs
    :299-316): 'Chromosome,Position,BAF' rows, B allele by the A<T<G<C dye
    preference."""
    with open(str(path), "w", newline="\n") as f:
        f.write("Chromosome,Position,BAF\n")
        for s in sites:
            baf = b_allele_frequency(s)
            if baf is None:
                continue
            f.write(f"{s.chrom},{s.position},{baf}\n")


def write_frequencies(path: str | Path, sites: list[SnvSite]) -> None:
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(str(path), "wt") as f:
        f.write("#Chromosome\tPosition\tRef\tAlt\tCountRef\tCountAlt\n")
        for s in sites:
            f.write(f"{s.chrom}\t{s.position}\t{s.ref}\t{s.alt}"
                    f"\t{s.count_ref}\t{s.count_alt}\n")


def read_frequencies(
    path: str | Path,
    intervals_by_chrom: dict[str, list[tuple[int, int]]],
    min_counts: int = MIN_TOTAL_COUNTS,
) -> dict[str, list[list[tuple[int, int, int]]]]:
    """CanvasIO.ReadFrequencies (IO.cs:134-179): per chromosome, one list of
    (position, countRef, countAlt) per interval."""
    out = {chrom: [[] for _ in intervals]
           for chrom, intervals in intervals_by_chrom.items()}
    opener = gzip.open if str(path).endswith(".gz") else open
    index = 0
    prev_chrom = ""
    with opener(str(path), "rt") as f:
        for line in f:
            if not line or line[0] == "#":
                continue
            cols = line.rstrip("\n").split("\t")
            chrom = cols[0]
            if chrom != prev_chrom:
                prev_chrom = chrom
                index = 0
            if chrom not in intervals_by_chrom:
                continue
            position = int(cols[1])
            count_ref, count_alt = int(cols[4]), int(cols[5])
            if count_ref + count_alt < min_counts:
                continue
            intervals = intervals_by_chrom[chrom]
            while index < len(intervals) and intervals[index][1] <= position:
                index += 1
            if index >= len(intervals) or intervals[index][0] > position:
                continue
            out[chrom][index].append((position, count_ref, count_alt))
    return out


def concatenate_frequencies(parts: list[str | Path], out_path: str | Path) -> None:
    """ConcatenateCanvasSNVResults (CanvasRunner.cs:688-710)."""
    opener = gzip.open if str(out_path).endswith(".gz") else open
    with opener(str(out_path), "wt") as out:
        wrote_header = False
        for part in parts:
            po = gzip.open if str(part).endswith(".gz") else open
            with po(str(part), "rt") as f:
                for line in f:
                    if line.startswith("#"):
                        if not wrote_header:
                            out.write(line)
                            wrote_header = True
                        continue
                    out.write(line)


def load_somatic_snv_vafs(vcf_path: str | Path) -> np.ndarray:
    """Somatic SNV variant frequencies from a Strelka-style VCF
    (EstimatePurityFromSomaticSNVs, SomaticCaller.cs:2679-2728): PASS
    single-nucleotide records, VF = altTierCounts / (alt + ref) from the
    AU/CU/GU/TU fields of the LAST genotype column; VF >= 0.5 dropped."""
    vafs: list[float] = []
    opener = gzip.open if str(vcf_path).endswith(".gz") else open
    with opener(str(vcf_path), "rt") as f:
        for line in f:
            if line.startswith("#"):
                continue
            fields = line.rstrip("\n").split("\t")
            if len(fields) < 10 or fields[6] != "PASS":
                continue
            ref, alts = fields[3], fields[4].split(",")
            if len(ref) != 1 or len(alts) != 1 or len(alts[0]) != 1 \
                    or alts[0] == ".":
                continue
            fmt = fields[8].split(":")
            gcol = dict(zip(fmt, fields[-1].split(":")))
            ref_tag, alt_tag = f"{ref}U", f"{alts[0]}U"
            if ref_tag not in gcol or alt_tag not in gcol:
                continue
            ref_count = sum(int(x) for x in gcol[ref_tag].split(","))
            alt_count = sum(int(x) for x in gcol[alt_tag].split(","))
            total = ref_count + alt_count
            if total == 0:
                continue
            vf = alt_count / total
            if vf < 0.5:
                vafs.append(vf)
    return np.asarray(vafs, dtype=np.float32)
