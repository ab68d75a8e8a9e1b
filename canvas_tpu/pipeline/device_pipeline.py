"""Fused, shardable device pipeline steps.

These are the jit-compiled workhorses: one function from per-position
tracks to bins (binning step) and one from padded per-lane coverage to
Viterbi copy-number paths (segmentation step).  Both are pure jnp — under a
Mesh with sharded inputs, GSPMD inserts the cross-device collectives
(the reference's file-based merges, CanvasBin.cs:965-1035).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from canvas_tpu.ops import hmm


@partial(jax.jit, static_argnames=("use_all_states", "n_dim"))
def segmentation_step(
    coverage: jnp.ndarray,     # [B, T, D] clamped coverage lanes
    mask: jnp.ndarray,         # [B, T]
    log_tables: jnp.ndarray,   # [S, D, V] log NB densities
    log_trans: jnp.ndarray,    # [S, S]
    log_init: jnp.ndarray,     # [S]
    use_all_states: bool = True,
    n_dim: int = 1,
) -> jnp.ndarray:
    """Emission lookup + tropical-scan Viterbi; the segmentation forward.

    This is the flagship jitted step: lanes (contigs × samples) batch on the
    leading axis and shard across the mesh 'contig' axis.
    """
    S, D, V = log_tables.shape
    logt = log_tables
    if not use_all_states:
        m01 = jnp.maximum(logt[0], logt[1])
        m34 = jnp.maximum(logt[3], logt[4])
        logt = logt.at[0].set(m01).at[1].set(m01).at[3].set(m34).at[4].set(m34)
    idx = jnp.clip(jnp.rint(coverage).astype(jnp.int32), 0, V - 1)
    factor = jnp.take_along_axis(
        logt[None, None], idx[:, :, None, :, None], axis=-1)[..., 0]  # [B,T,S,D]
    ems = []
    for j in range(S):
        combos = hmm.genotype_combinations(n_dim, j)
        geno = jnp.asarray(np.array(combos, dtype=np.int32))          # [G,D]
        f = factor[:, :, geno, jnp.arange(D)]                         # [B,T,G,D]
        ems.append(jnp.max(jnp.sum(f, axis=-1), axis=-1))
    log_em = jnp.stack(ems, axis=-1)
    log_em = jnp.where(mask[..., None], log_em, 0.0)
    return hmm.viterbi_decode_chunked(log_em, log_trans, log_init, mask)


@partial(jax.jit, static_argnames=("bin_size", "max_bins"))
def binning_step(
    possible: jnp.ndarray,    # [C, L] bool, per-contig position tracks
    capped_obs: jnp.ndarray,  # [C, L] float32
    is_gc: jnp.ndarray,       # [C, L] bool
    offsets: jnp.ndarray,     # [C] int32
    bin_size: int,
    max_bins: int,
):
    """Vmapped variable-width binning over padded contigs.

    Returns (start, end, gc, count, valid) each [C, max_bins].  The
    position axis can be sharded over a 'pos' mesh axis: the cumsums become
    sharded scans, searchsorted an all-gathered lookup.
    """
    from canvas_tpu.ops.binning import bin_contig_device

    def one(p, o, g, off):
        return bin_contig_device(p, o, g, off, bin_size, max_bins)

    return jax.vmap(one)(possible, capped_obs, is_gc, offsets)


@jax.jit
def rate_step(possible: jnp.ndarray, observed: jnp.ndarray) -> jnp.ndarray:
    """Per-contig observed/possible rates [C] (CanvasBin.cs:55-60); a
    sharded reduction that GSPMD turns into per-device partial sums +
    psum."""
    n_obs = jnp.sum((observed > 0).astype(jnp.int32), axis=-1)
    n_pos = jnp.sum(possible.astype(jnp.int32), axis=-1)
    return n_obs / jnp.maximum(n_pos, 1)


@partial(jax.jit, static_argnames=("max_cn",))
def caller_step(
    states: jnp.ndarray,   # [C, T] Viterbi state path per lane
    coverage: jnp.ndarray, # [C, T] normalized bin coverage
    valid: jnp.ndarray,    # [C, T]
    max_cn: int = 10,
) -> jnp.ndarray:
    """Device diploid-caller assignment (CanvasDiploidCaller.cs:125-179):
    per Viterbi segment, mean coverage -> nearest CN model, where model
    coverage = diploidCoverage * CN/2 and distance weight 0.6/diploidCoverage.
    Per-segment stats use segment_sum over state-change run ids, so the step
    stays one fused jnp pass under the mesh (the host caller computes exact
    medians on the final small segment list; the device step is the
    sharded bulk-assignment analogue).  Returns [C, T] called CN per bin."""
    C, T = states.shape
    first = jnp.concatenate(
        [jnp.ones((C, 1), bool), states[:, 1:] != states[:, :-1]], axis=1)
    seg_id = jnp.cumsum(first.astype(jnp.int32), axis=1) - 1

    def one(sid, c, v):
        w = v.astype(jnp.float32)
        s = jax.ops.segment_sum(c * w, sid, num_segments=T)
        n = jax.ops.segment_sum(w, sid, num_segments=T)
        return (s / jnp.maximum(n, 1.0))[sid]

    seg_cov = jax.vmap(one)(seg_id, coverage, valid)          # [C, T]
    diploid_cov = (jnp.sum(jnp.where(valid, coverage, 0.0))
                   / jnp.maximum(jnp.sum(valid), 1))          # collective
    weight = 0.6 / jnp.maximum(diploid_cov, 1e-6)
    cn = jnp.arange(max_cn + 1, dtype=jnp.float32)
    model_cov = diploid_cov * cn / 2.0
    d = ((model_cov[None, None] - seg_cov[..., None]) * weight) ** 2
    return jnp.argmin(d, axis=-1).astype(jnp.int32)


def full_pipeline_step(
    possible, observed, is_gc, offsets, bin_size: int, max_bins: int,
    log_tables, log_trans, log_init):
    """Binning -> per-lane bin counts -> global scale -> Viterbi -> caller.

    One fused step from position tracks to per-bin called copy numbers,
    used by the multi-chip dryrun; every stage is plain jnp so sharding
    propagates and cross-lane reductions become collectives.
    """
    capped = jnp.where(possible, jnp.minimum(observed, 10.0), 0.0)
    start, end, gc, counts, valid = binning_step(
        possible, capped, is_gc, offsets, bin_size, max_bins)
    # genome-wide median-ish scale (cross-lane reduction -> collective)
    total = jnp.sum(jnp.where(valid, counts, 0.0))
    nvalid = jnp.maximum(jnp.sum(valid), 1)
    mean_count = total / nvalid
    norm = counts * (100.0 / jnp.maximum(mean_count, 1e-6))
    states = segmentation_step(
        norm[..., None], valid, log_tables, log_trans, log_init)
    called_cn = caller_step(states, norm, valid)
    return states, called_cn, (start, end, gc, counts, valid)
