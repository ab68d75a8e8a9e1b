"""Roofline the native BAM scanner against raw zlib inflate.

BGZF decompression is the irreducible cost of reading a BAM: every byte
must pass through zlib inflate exactly once, so the per-host speed limit is
  inflate_bandwidth_per_core x cores  (compressed bytes/s).
This harness measures (1) single-core zlib inflate bandwidth on the very
blocks the scanner will read, and (2) the scanner's end-to-end throughput
over the same file, and reports attainment = scanner / roofline.

Reference hot loop being replaced: CanvasBin.cs:207-275 (single-threaded
C# BAM parse per chromosome job).

Usage: python benchmarks/roofline_scanner.py [genome_mbp] [depth]
"""

import os
import sys
import time
import zlib
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from benchmarks import _synth
from canvas_tpu import native


def inflate_single_core(path: Path) -> tuple[float, int, int]:
    """Decompress every BGZF member once on one core.

    Returns (seconds, compressed_bytes, decompressed_bytes)."""
    data = path.read_bytes()
    t0 = time.perf_counter()
    pos, total_out = 0, 0
    n = len(data)
    while pos < n:
        # BGZF: gzip member with BSIZE in the extra field at offset 16
        bsize = int.from_bytes(data[pos + 16: pos + 18], "little") + 1
        comp = data[pos: pos + bsize]
        out = zlib.decompress(comp, wbits=31)
        total_out += len(out)
        pos += bsize
    return time.perf_counter() - t0, len(data), total_out


def main():
    mbp = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    depth = float(sys.argv[2]) if len(sys.argv) > 2 else 12.0
    contigs = {f"chr{i}": mbp * 1_000_000 // 4 for i in range(1, 5)}
    rate = depth / _synth.READ_LEN
    bam = Path(os.environ.get("TMPDIR", "/tmp")) / f"roofline_{mbp}_{depth}.bam"
    if not bam.exists():
        _synth.write_sample_bam(bam, contigs, rate, {}, seed=7)
    comp_bytes = bam.stat().st_size

    inflate_s, _, decomp_bytes = inflate_single_core(bam)
    inflate_bw = comp_bytes / inflate_s                    # 1 core

    refs = native.read_bam_refs(str(bam))
    lengths = [L for _, L in refs]
    # warm page cache pass, then best of 3 timed
    native.scan_read_starts_all(str(bam), lengths)
    scan_s = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = native.scan_read_starts_all(str(bam), lengths)
        scan_s = min(scan_s, time.perf_counter() - t0)
    assert out is not None and sum(int(o.sum()) for o in out) > 0

    cores = os.cpu_count() or 1
    roofline = inflate_bw * cores
    scan_bw = comp_bytes / scan_s
    ratio = decomp_bytes / comp_bytes
    print({
        "bam_mb": round(comp_bytes / 1e6, 1),
        "compression_ratio": round(ratio, 1),
        "inflate_mb_s_per_core": round(inflate_bw / 1e6, 1),
        "cores": cores,
        "roofline_mb_s": round(roofline / 1e6, 1),
        "scanner_mb_s": round(scan_bw / 1e6, 1),
        "record_walk_mb_s": round(decomp_bytes / scan_s / 1e6, 1),
        "attainment": round(scan_bw / roofline, 3),
        "note": "attainment ~1.0 = inflate-bound (the hardware limit for "
                "reading BAMs).  Synthetic BAMs compress ~4-5x better than "
                "real ones (constant quals), which inflates the walk's "
                "share: on real ~3-4x-ratio BAMs the same record_walk_mb_s "
                "covers proportionally more compressed bytes, so real-data "
                "attainment is ~record_walk/ratio_real vs this harness's "
                "pessimistic figure",
    })


if __name__ == "__main__":
    main()
