"""FlagUniqueKmers — build kmer.fa (Tools/FlagUniqueKmers).

Flags every genome position whose 35-mer (canonical of forward / reverse
complement, 2-bit packed) occurs exactly once genome-wide: unique starts are
written UPPERCASE, everything else lowercase (KmerChecker.cs:30-105,
WriteOutputs :203-229).  K-mers containing N are never unique.

The reference uses a capped multi-pass dictionary (400M entries) to bound
memory; here the canonical keys are uint64-packed numpy arrays deduplicated
with sort-based counting — one vectorized pass per chunk, multi-pass over
key ranges to bound memory the same way.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from canvas_tpu.genome.reference import read_fasta, write_fasta

K = 35

_CODE = np.full(256, 255, dtype=np.uint8)
for i, b in enumerate(b"ACGT"):
    _CODE[b] = i
    _CODE[b + 32] = i  # lowercase

_COMP = np.array([3, 2, 1, 0], dtype=np.uint8)  # A<->T, C<->G


def _pack_kmers(codes: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All K-length windows packed into 70-bit (hi, lo) canonical keys —
    2 bits/base like the reference's 9-byte string key
    (KmerChecker.GetKeyForKmer): hi carries the first K-32 bases, lo the
    last 32.  Returns (hi, lo, valid) — valid False where the window
    contains N."""
    n = len(codes) - K + 1
    if n <= 0:
        z = np.zeros(0, np.uint64)
        return z, z, np.zeros(0, bool)
    bad = codes == 255
    codes2 = np.where(bad, 0, codes).astype(np.uint64)
    n_hi = K - 32
    # forward key: bases 0..n_hi-1 in hi (MSB-first), bases n_hi..K-1 in lo
    hi = np.zeros(n, dtype=np.uint64)
    lo = np.zeros(n, dtype=np.uint64)
    for j in range(n_hi):
        hi |= codes2[j:j + n] << np.uint64(2 * (n_hi - 1 - j))
    for j in range(n_hi, K):
        lo |= codes2[j:j + n] << np.uint64(2 * (K - 1 - j))
    # reverse-complement key: base K-1-j complemented at weight j (T=0..A=3)
    comp = _COMP[np.where(bad, 0, codes)].astype(np.uint64)
    rhi = np.zeros(n, dtype=np.uint64)
    rlo = np.zeros(n, dtype=np.uint64)
    for j in range(K):
        w = K - 1 - j            # weight of reversed position j (MSB-first)
        src = comp[K - 1 - j:K - 1 - j + n]
        if w >= 32:
            rhi |= src << np.uint64(2 * (w - 32))
        else:
            rlo |= src << np.uint64(2 * w)
    take_fwd = (hi < rhi) | ((hi == rhi) & (lo <= rlo))
    c_hi = np.where(take_fwd, hi, rhi)
    c_lo = np.where(take_fwd, lo, rlo)
    # valid windows: no N inside
    bad_cum = np.concatenate([[0], np.cumsum(bad)])
    valid = (bad_cum[K:] - bad_cum[:-K]) == 0
    return c_hi, c_lo, valid


def flag_unique_kmers(
    genome_fa: str | Path, out_fa: str | Path, n_passes: int | None = None,
) -> dict[str, np.ndarray]:
    """Write kmer.fa; returns per-contig uniqueness masks.

    n_passes > 1 splits the key space to bound memory (the reference's
    400M-entry dictionary cap, FlagUniqueKmers/Main :231-298); None/0 picks
    ~one pass per 250 Mbp so a whole-genome run stays under a few GB."""
    seqs = read_fasta(genome_fa)
    if not n_passes:
        total = sum(len(s) for s in seqs.values())
        n_passes = max(1, int(round(total / 250_000_000)))

    from canvas_tpu import native

    unique_masks = native.flag_unique_kmers(seqs, n_passes=n_passes)
    if unique_masks is None:
        unique_masks = _flag_unique_numpy(seqs, n_passes)

    out_seqs = {}
    for name, bases in seqs.items():
        s = np.frombuffer(bytes(bases), dtype=np.uint8).copy()
        lower = np.where((s >= 65) & (s <= 90), s + 32, s)
        upper = np.where((s >= 97) & (s <= 122), s - 32, s)
        mask = unique_masks[name]
        out = np.where(mask, upper, lower)
        out_seqs[name] = out.tobytes()
    write_fasta(out_fa, out_seqs)
    return unique_masks


def _flag_unique_numpy(seqs: dict, n_passes: int) -> dict[str, np.ndarray]:
    """Vectorized numpy fallback: lexsorted (hi, lo) keys, runs of length 1
    are unique.  n_passes > 1 partitions the key space by lo % n_passes to
    bound memory (the reference's 400M-entry dictionary cap,
    FlagUniqueKmers/Main :231-298)."""
    per_contig = {}
    for name, bases in seqs.items():
        per_contig[name] = _pack_kmers(_CODE[bases])

    unique_masks = {name: np.zeros(len(seqs[name]), dtype=bool)
                    for name in seqs}
    for p in range(n_passes):
        hi_parts, lo_parts, owners = [], [], []
        for name, (hi, lo, valid) in per_contig.items():
            m = valid if n_passes == 1 \
                else valid & ((lo % np.uint64(n_passes)) == np.uint64(p))
            hi_parts.append(hi[m])
            lo_parts.append(lo[m])
            owners.append((name, np.flatnonzero(m)))
        if not hi_parts:
            continue
        all_hi = np.concatenate(hi_parts)
        all_lo = np.concatenate(lo_parts)
        if len(all_hi) == 0:
            continue
        order = np.lexsort((all_lo, all_hi))
        h, l = all_hi[order], all_lo[order]
        new_run = np.ones(len(h), dtype=bool)
        new_run[1:] = (h[1:] != h[:-1]) | (l[1:] != l[:-1])
        run_id = np.cumsum(new_run) - 1
        run_len = np.bincount(run_id)
        is_unique_sorted = run_len[run_id] == 1
        is_unique = np.empty(len(h), dtype=bool)
        is_unique[order] = is_unique_sorted
        offset = 0
        for name, idx in owners:
            part = is_unique[offset:offset + len(idx)]
            unique_masks[name][idx[part]] = True
            offset += len(idx)
    return unique_masks


def check_flags(kmer_fa_a: str | Path, kmer_fa_b: str | Path,
                log=print) -> float:
    """Uniqueness-flag concordance of two kmer.fa files
    (CheckFlags.ProcessReferenceFASTA, CheckFlags.cs:59-105): per contig,
    count positions flagged unique in both / only A / only B / neither and
    report percent agreement.  Returns the final agreement percentage."""
    a = read_fasta(kmer_fa_a)
    b = read_fasta(kmer_fa_b)
    count_ab = count_a = count_b = count_neither = 0
    for name, bases_a in a.items():
        if name not in b:
            continue
        sa = np.frombuffer(bytes(bases_a), dtype=np.uint8)
        sb = np.frombuffer(bytes(b[name]), dtype=np.uint8)
        if len(sa) != len(sb):
            raise ValueError(f"length mismatch on {name}")
        ua, ub = sa < ord("a"), sb < ord("a")
        count_ab += int(np.count_nonzero(ua & ub))
        count_a += int(np.count_nonzero(ua & ~ub))
        count_b += int(np.count_nonzero(~ua & ub))
        count_neither += int(np.count_nonzero(~ua & ~ub))
        log(f"After {name}: {count_ab},{count_a},{count_b},{count_neither}")
    total = count_ab + count_a + count_b + count_neither
    pct = 100.0 * (count_ab + count_neither) / total if total else 100.0
    log(f"Percent agreement: {pct:.2f}")
    return pct


def main(argv=None) -> int:
    """CLI: FlagUniqueKmers genome.fa kmer.fa (Tools/FlagUniqueKmers), or
    --check kmerA.fa kmerB.fa for flag concordance (CheckFlags.cs)."""
    import argparse

    p = argparse.ArgumentParser(prog="flag_unique_kmers")
    p.add_argument("genome_fa")
    p.add_argument("kmer_fa")
    p.add_argument("--passes", type=int, default=0,
                   help="key-space passes to bound memory (0 = auto, "
                        "~1 per 250 Mbp)")
    p.add_argument("--check", action="store_true",
                   help="compare two kmer.fa files' uniqueness flags "
                        "instead of building one")
    args = p.parse_args(argv)
    if args.check:
        check_flags(args.genome_fa, args.kmer_fa)
    else:
        flag_unique_kmers(args.genome_fa, args.kmer_fa, n_passes=args.passes)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
