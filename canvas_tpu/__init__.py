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

from canvas_tpu import config as config
