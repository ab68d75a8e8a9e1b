"""canvas_tpu — a TPU-native CNV-calling engine.

A from-scratch reimplementation of the Illumina Canvas method (read-depth CNV
calling from WGS/enrichment BAMs) as fused, sharded JAX/XLA array computations
with Pallas kernels for the hot inner loops (binning scan, Viterbi decode,
CBS max-t permutation, Haar wavelet decomposition).

Where the reference (see /root/reference, Canvas v1.40.0) is nine file-piped C#
executables, this package is one process group: genome state lives in sharded
device arrays keyed by a static contig table, stages are jitted functions, and
files appear only at ingest (BAM/FASTA/VCF) and egress (VCF, metrics).

Layout:
  genome/    contig table, FASTA + kmer-uniqueness reference tracks
  io/        BAM/BGZF, bin files, BED, VCF read/write, allele-frequency files
  ops/       array kernels: binning, normalization, segmentation (HMM/CBS/wavelet)
  models/    copy-number callers: diploid, somatic (purity/ploidy), pedigree
  parallel/  device mesh + contig sharding helpers
  pipeline/  orchestration of the five Canvas run modes, checkpointing, CLI
  tools/     EvaluateCNV and FlagUniqueKmers equivalents
"""

__version__ = "0.1.0"

import os as _os

from canvas_tpu import config as config


def _enable_persistent_xla_cache() -> None:
    """Kernel compiles (~5s each) dominate short runs; cache them on disk so
    they are paid once per machine, not once per process.  Opt out with
    CANVAS_TPU_NO_XLA_CACHE=1."""
    if _os.environ.get("CANVAS_TPU_NO_XLA_CACHE"):
        return
    try:
        import jax

        cache_dir = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.expanduser("~/.cache/canvas_tpu/xla"))
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # 0: persist even trivial eager-op compiles — over a tunneled TPU
        # every compile pays ~0.5s of RPC, so dozens of tiny
        # convert_element_type/squeeze ops otherwise recompile per process
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_persistent_xla_cache()
