"""Pallas TPU kernels for the chunked Viterbi decode.

The XLA lax.scan implementation (hmm.viterbi_decode_chunked) pays per-step
carry round-trips to HBM; these kernels keep the [S, S, lanes] carry in
VMEM for the whole chunk, so HBM traffic collapses to one emission read per
phase plus the int8 path outputs:

  kernel 1: per-chunk (max,+) transfer matrices      (phase 1)
  kernel 2: in-chunk forward + backtrack of all S
            assumed chunk-end states                 (phases 3 + 4a fused)

The tiny cross-chunk associative scan (phase 2) and the chunk-boundary
pointer chase (phase 4b) stay in XLA.  Layout is lane-last throughout:
lanes = B * n_chunks, padded to a multiple of the lane block.

Mosaic notes:
  * masks are not shipped as [chunk, L] arrays (dynamic sublane indexing is
    unsupported); instead each lane carries its chunk-start time offset and
    its sequence length, and step masks are recomputed as scalar
    comparisons — valid because Canvas masks are always prefix masks;
  * backtrack gathers are unrolled S-way selects (no per-lane cross-sublane
    gather on TPU).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# Default lane block for chunk=512 (the (chunk x S x lane_block) emission
# block, double-buffered, plus the int8 path buffers must stay under the
# 16MB VMEM scoped limit; 512x512 overflows by ~200KB).  The kernels are
# SERIALIZATION-bound, not VPU-bound: each fori_loop step runs vector ops
# over only [S, S, lane_block] elements, so for big workloads a SMALLER
# chunk with a WIDER lane block (same VMEM) does the same element work in
# fewer, fatter sequential steps — see _pick_chunk_lanes.
LANE_BLOCK = 256


def _pick_chunk_lanes(B: int, T: int, S: int, chunk: int | None):
    """(chunk, lane_block) under the VMEM budget: prefer wide lane blocks
    (fewer sequential fori_loop steps) when there are enough lanes
    (lanes = B * ceil(T/chunk)) to fill them."""
    if chunk is not None:               # caller pinned the chunk size
        return chunk, LANE_BLOCK
    for chunk, lanes in ((128, 1024), (256, 512)):
        n_lanes = B * -(-T // chunk)
        if n_lanes >= lanes:
            return chunk, lanes
    return 512, LANE_BLOCK


def _select_by_index(idx, values):
    """values[idx] with idx a per-lane int array: unrolled where-chain."""
    out = values[0]
    for i in range(1, len(values)):
        out = jnp.where(idx == i, values[i], out)
    return out


def _const_col(vals):
    """[S, 1] f32 column built from iota compares — pallas kernels cannot
    capture device constants, so materialize from python floats."""
    S = len(vals)
    i = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    out = jnp.full((S, 1), float(vals[0]), jnp.float32)
    for k in range(1, S):
        out = jnp.where(i == k, float(vals[k]), out)
    return out


def _uniform_trans(log_trans):
    """(self, off) when the transition matrix is uniform (equal diagonal,
    equal off-diagonal — Canvas's 0.99/uniform-rest, HMM.cs:16), else None.

    The (max,+) product then collapses exactly: max_k M[i,k] + lt[k][j]
    = max(M[i,j] + self, rowmax_i + off), because fl(x + c) is monotone in
    x so the max commutes with the add — bit-identical to the full chain,
    at S+1 instead of S^2 ops per row."""
    S = len(log_trans)
    if S < 2:
        return None
    self_p = log_trans[0][0]
    off = log_trans[0][1]
    if off >= self_p:
        return None
    for i in range(S):
        for j in range(S):
            if log_trans[i][j] != (self_p if i == j else off):
                return None
    return self_p, off


def _chunk_matrix_kernel(em_ref, base_ref, len_ref, out_ref, *, chunk, S,
                         log_trans, log_init):
    """2D-carry (max,+) transfer matrices: the whole [S, S, LB] carry moves
    through each step as one array, so every vector op runs on S*S sublane
    rows instead of a single row — ~1.6x the 1D-list form on v5e."""
    lt, li = log_trans, log_init
    uni = _uniform_trans(lt)
    base = base_ref[0]                    # [LB] global-t at k=0 for each lane
    length = len_ref[0]                   # [LB] valid sequence length
    LB = em_ref.shape[-1]
    li_col = _const_col(li)

    def step(k, M):                       # M: [S, S, LB]
        e = em_ref[k]                     # [S, LB]
        t = base + k
        m = (t < length)[None, None, :]
        t0 = (t == 0)[None, None, :]
        if uni is not None:
            ls, lo = uni
            rowmax = jnp.max(M, axis=1, keepdims=True)        # [S, 1, LB]
            acc = jnp.maximum(M + ls, rowmax + lo)            # [S, S, LB]
        else:
            cols = []
            for j in range(S):
                a = M[:, 0, :] + lt[0][j]
                for kk in range(1, S):
                    a = jnp.maximum(a, M[:, kk, :] + lt[kk][j])
                cols.append(a)
            acc = jnp.stack(cols, axis=1)
        reg = acc + e[None, :, :]
        t0v = jnp.broadcast_to((li_col + e)[None, :, :], M.shape)
        return jnp.where(m, jnp.where(t0, t0v, reg), M)

    ii = jax.lax.broadcasted_iota(jnp.int32, (S, S, LB), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (S, S, LB), 1)
    M0 = jnp.where(ii == jj, 0.0, NEG_INF).astype(jnp.float32)
    out_ref[...] = jax.lax.fori_loop(0, chunk, step, M0)


def _forward_backtrack_kernel(em_ref, base_ref, len_ref, ss_ref,
                              paths_ref, prevend_ref, bp_scratch, *,
                              chunk, S, log_trans, log_init):
    """2D-carry forward + backtrack: scores carry [S, LB], backpointers
    written [S, LB] per step into VMEM scratch."""
    lt, li = log_trans, log_init
    base = base_ref[0]
    length = len_ref[0]
    uni = _uniform_trans(lt)
    LB = em_ref.shape[-1]
    li_col = _const_col(li)
    j_iota = jax.lax.broadcasted_iota(jnp.int32, (S, LB), 0)

    def fstep(k, V):                      # V: [S, LB]
        e = em_ref[k]
        t = base + k
        m = (t < length)[None, :]
        t0 = (t == 0)[None, :]
        if uni is not None:
            # uniform transitions: one rounded off-diagonal scan shared by
            # every j.  First-max ties must be taken over the ROUNDED
            # V[i]+off values (not V itself) to match the general chain;
            # jnp.argmax returns the first max.
            ls, lo = uni
            w = V + lo                                        # [S, LB]
            A = jnp.max(w, axis=0, keepdims=True)             # [1, LB]
            fa = jnp.argmax(w, axis=0)[None, :].astype(jnp.int32)
            Bj = V + ls
            acc = jnp.maximum(A, Bj)
            arg = jnp.where((A > Bj) | ((A == Bj) & (fa < j_iota)),
                            fa, j_iota)
        else:
            accs, args = [], []
            for j in range(S):
                a = V[0] + lt[0][j]
                g = jnp.zeros_like(a, dtype=jnp.int32)
                for i2 in range(1, S):
                    c = V[i2] + lt[i2][j]
                    better = c > a
                    a = jnp.maximum(a, c)
                    g = jnp.where(better, i2, g)
                accs.append(a)
                args.append(g)
            acc = jnp.stack(accs)
            arg = jnp.stack(args)
        reg = acc + e
        t0v = li_col + e
        bp_scratch[k] = jnp.where(m & ~t0, arg, j_iota).astype(jnp.int8)
        return jnp.where(m, jnp.where(t0, t0v, reg), V)

    jax.lax.fori_loop(0, chunk, fstep, ss_ref[...])

    # ---- backtrack all S assumed end states: carry [S, LB] int32
    def bstep(tt, state):
        k = chunk - 1 - tt                # walk k = chunk-1 .. 1
        bp_k = bp_scratch[k].astype(jnp.int32)                # [S, LB]
        paths_ref[k] = state.astype(jnp.int8)
        new = jnp.broadcast_to(bp_k[0][None, :], state.shape)
        for i in range(1, S):
            new = jnp.where(state == i, bp_k[i][None, :], new)
        return new

    init = jax.lax.broadcasted_iota(jnp.int32, (S, LB), 0)
    state = jax.lax.fori_loop(0, chunk - 1, bstep, init)
    bp0 = bp_scratch[0].astype(jnp.int32)
    paths_ref[0] = state.astype(jnp.int8)
    pe = jnp.broadcast_to(bp0[0][None, :], state.shape)
    for i in range(1, S):
        pe = jnp.where(state == i, bp0[i][None, :], pe)
    prevend_ref[...] = pe.astype(jnp.int8)


def _maxplus_combine(a, b):
    return jnp.max(a[..., :, :, None] + b[..., None, :, :], axis=-2)


def viterbi_decode_pallas(
    log_em: jnp.ndarray,    # [B, T, S]
    log_trans,              # [S, S] HOST array (baked into the kernels)
    log_init,               # [S] HOST array
    mask: jnp.ndarray,      # [B, T]; must be a prefix mask per lane
    chunk: int | None = None,
) -> jnp.ndarray:
    """Drop-in replacement for hmm.viterbi_decode_chunked (same outputs).

    log_trans/log_init must be host constants — they unroll into the kernel
    body as scalars.  mask must be True-prefix per row (Canvas's padded-tail
    masks always are).  chunk=None picks (chunk, lane_block) by workload
    size; pass a chunk to pin it (lane block then stays at LANE_BLOCK)."""
    lt = tuple(tuple(float(x) for x in row) for row in np.asarray(log_trans))
    li = tuple(float(x) for x in np.asarray(log_init))
    B, T, S = log_em.shape
    chunk, lane_block = _pick_chunk_lanes(B, T, S, chunk)
    lengths = jnp.sum(mask.astype(jnp.int32), axis=1)      # [B]
    interpret = jax.default_backend() == "cpu"  # pallas CPU = interpreter
    return _viterbi_pallas_jit(log_em, lengths, lt, li, chunk, interpret,
                               lane_block)


@partial(jax.jit,
         static_argnames=("lt", "li", "chunk", "interpret", "lane_block"))
def _viterbi_pallas_jit(log_em, lengths, lt, li, chunk, interpret,
                        lane_block=LANE_BLOCK):
    LANE_BLOCK = lane_block
    B, T, S = log_em.shape
    pad_t = (-T) % chunk
    if pad_t:
        log_em = jnp.pad(log_em, ((0, 0), (0, pad_t), (0, 0)))
    Tp = T + pad_t
    nC = Tp // chunk
    L = B * nC

    em = jnp.transpose(log_em.reshape(B, nC, chunk, S), (2, 3, 0, 1))
    em = em.reshape(chunk, S, L)
    # per-lane chunk-start offset and sequence length (lane = b * nC + c)
    base = jnp.tile(jnp.arange(nC, dtype=jnp.int32) * chunk, B)     # [L]
    lane_len = jnp.repeat(lengths.astype(jnp.int32), nC)            # [L]

    pad_l = (-L) % LANE_BLOCK
    if pad_l:
        em = jnp.pad(em, ((0, 0), (0, 0), (0, pad_l)))
        base = jnp.pad(base, (0, pad_l))
        lane_len = jnp.pad(lane_len, (0, pad_l))
    Lp = L + pad_l
    grid = (Lp // LANE_BLOCK,)
    base2 = base.reshape(1, Lp)
    len2 = lane_len.reshape(1, Lp)

    em_spec = pl.BlockSpec((chunk, S, LANE_BLOCK), lambda i: (0, 0, i),
                           memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, LANE_BLOCK), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    chunk_mats = pl.pallas_call(
        partial(_chunk_matrix_kernel, chunk=chunk, S=S, log_trans=lt,
                log_init=li),
        grid=grid,
        in_specs=[em_spec, vec_spec, vec_spec],
        out_specs=pl.BlockSpec((S, S, LANE_BLOCK), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, S, Lp), jnp.float32),
        interpret=interpret,
    )(em, base2, len2)

    # phase 2 (small, XLA)
    cm = jnp.transpose(chunk_mats[:, :, :L].reshape(S, S, B, nC), (2, 3, 0, 1))
    prefix = jax.lax.associative_scan(_maxplus_combine, cm, axis=1)
    scores_end = jnp.max(prefix, axis=-2)            # [B, nC, S]
    start_scores = jnp.concatenate(
        [jnp.zeros((B, 1, S)), scores_end[:, :-1]], axis=1)
    ss = jnp.transpose(start_scores, (2, 0, 1)).reshape(S, L).astype(jnp.float32)
    if pad_l:
        ss = jnp.pad(ss, ((0, 0), (0, pad_l)))

    paths_all, prev_end = pl.pallas_call(
        partial(_forward_backtrack_kernel, chunk=chunk, S=S, log_trans=lt,
                log_init=li),
        grid=grid,
        in_specs=[em_spec, vec_spec, vec_spec,
                  pl.BlockSpec((S, LANE_BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((chunk, S, LANE_BLOCK), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, LANE_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((chunk, S, Lp), jnp.int8),
            jax.ShapeDtypeStruct((S, Lp), jnp.int8),
        ],
        scratch_shapes=[pltpu.VMEM((chunk, S, LANE_BLOCK), jnp.int8)],
        interpret=interpret,
    )(em, base2, len2, ss)

    # phase 4b: chunk-boundary pointer chase (XLA, tiny)
    last_end = jnp.argmax(scores_end[:, -1], axis=-1).astype(jnp.int32)
    pe = jnp.transpose(prev_end[:, :L].astype(jnp.int32).reshape(S, B, nC),
                       (2, 1, 0))                     # [nC, B, S]

    def p4b(carry, pe_c):
        prev = jnp.take_along_axis(pe_c, carry[:, None], axis=-1)[:, 0]
        return prev, carry

    _, chunk_end_states = jax.lax.scan(p4b, last_end, pe, reverse=True)
    chunk_end_states = jnp.moveaxis(chunk_end_states, 0, 1)  # [B, nC]

    sel = chunk_end_states.reshape(1, 1, L)
    states = jnp.take_along_axis(
        paths_all[:, :, :L].astype(jnp.int32), sel, axis=1)[:, 0]
    states = jnp.transpose(states.reshape(chunk, B, nC), (1, 2, 0))
    return states.reshape(B, Tp)[:, :T]
