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


def _pack_kmers(codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All K-length windows packed into uint64 keys (2 bits/base).
    Returns (keys, valid) — valid False where the window contains N."""
    n = len(codes) - K + 1
    if n <= 0:
        return np.zeros(0, np.uint64), np.zeros(0, bool)
    bad = codes == 255
    codes2 = np.where(bad, 0, codes).astype(np.uint64)
    # forward keys via sliding polynomial: key[i] = sum codes[i+j] << 2*(K-1-j)
    keys = np.zeros(n, dtype=np.uint64)
    for j in range(K):
        keys |= codes2[j:j + n] << np.uint64(2 * (K - 1 - j))
    # reverse-complement keys
    comp = np.where(bad, 0, _COMP[np.where(bad, 0, codes)]).astype(np.uint64)
    rkeys = np.zeros(n, dtype=np.uint64)
    for j in range(K):
        rkeys |= comp[j:j + n] << np.uint64(2 * j)
    canonical = np.minimum(keys, rkeys)
    # valid windows: no N inside
    bad_cum = np.concatenate([[0], np.cumsum(bad)])
    valid = (bad_cum[K:] - bad_cum[:-K]) == 0
    return canonical, valid


def flag_unique_kmers(
    genome_fa: str | Path, out_fa: str | Path, n_passes: int = 1,
) -> dict[str, np.ndarray]:
    """Write kmer.fa; returns per-contig uniqueness masks.

    n_passes > 1 splits the key space to bound memory (the reference's
    400M-entry dictionary cap, FlagUniqueKmers/Main :231-298)."""
    seqs = read_fasta(genome_fa)
    per_contig: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for name, bases in seqs.items():
        codes = _CODE[bases]
        per_contig[name] = _pack_kmers(codes)

    unique_masks = {name: np.zeros(len(seqs[name]), dtype=bool)
                    for name in seqs}
    space = np.uint64(0xFFFFFFFFFFFFFFFF)
    for p in range(n_passes):
        lo = np.uint64((int(space) // n_passes) * p)
        hi = np.uint64((int(space) // n_passes) * (p + 1)) \
            if p < n_passes - 1 else space
        keys_parts, owners = [], []
        for name, (keys, valid) in per_contig.items():
            m = valid & (keys >= lo) & (keys <= hi)
            keys_parts.append(keys[m])
            owners.append((name, np.flatnonzero(m)))
        if not keys_parts:
            continue
        allk = np.concatenate(keys_parts)
        uniq, counts = np.unique(allk, return_counts=True)
        unique_set = uniq[counts == 1]
        for (name, idx), part in zip(owners, keys_parts):
            isuniq = np.isin(part, unique_set)
            unique_masks[name][idx[isuniq]] = True

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


def main(argv=None) -> int:
    """CLI: FlagUniqueKmers genome.fa kmer.fa (Tools/FlagUniqueKmers)."""
    import argparse

    p = argparse.ArgumentParser(prog="flag_unique_kmers")
    p.add_argument("genome_fa")
    p.add_argument("kmer_fa")
    p.add_argument("--passes", type=int, default=1,
                   help="key-space passes to bound memory")
    args = p.parse_args(argv)
    flag_unique_kmers(args.genome_fa, args.kmer_fa, n_passes=args.passes)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
