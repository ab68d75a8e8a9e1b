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
LANE_BLOCK = 512


def _select_by_index(idx, values):
    """values[idx] with idx a per-lane int array: unrolled where-chain."""
    out = values[0]
    for i in range(1, len(values)):
        out = jnp.where(idx == i, values[i], out)
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
    lt, li = log_trans, log_init
    uni = _uniform_trans(lt)
    base = base_ref[0]                    # [LB] global-t at k=0 for each lane
    length = len_ref[0]                   # [LB] valid sequence length

    def step(k, M):
        e = em_ref[k]                     # [S, LB]
        t = base + k
        m = t < length
        t0 = t == 0
        out = []
        for i in range(S):
            if uni is not None:
                ls, lo = uni
                rowmax = M[i * S + 0]
                for kk in range(1, S):
                    rowmax = jnp.maximum(rowmax, M[i * S + kk])
            for j in range(S):
                if uni is not None:
                    acc = jnp.maximum(M[i * S + j] + ls, rowmax + lo)
                else:
                    acc = M[i * S + 0] + lt[0][j]
                    for kk in range(1, S):
                        acc = jnp.maximum(acc, M[i * S + kk] + lt[kk][j])
                reg = acc + e[j]
                t0v = li[j] + e[j]
                out.append(jnp.where(m, jnp.where(t0, t0v, reg),
                                     M[i * S + j]))
        return out

    LB = em_ref.shape[-1]
    eye = [jnp.full((LB,), 0.0 if i == j else NEG_INF, jnp.float32)
           for i in range(S) for j in range(S)]
    M = jax.lax.fori_loop(0, chunk, step, eye)
    for i in range(S):
        for j in range(S):
            out_ref[i, j] = M[i * S + j]


def _forward_backtrack_kernel(em_ref, base_ref, len_ref, ss_ref,
                              paths_ref, prevend_ref, bp_scratch, *,
                              chunk, S, log_trans, log_init):
    lt, li = log_trans, log_init
    base = base_ref[0]
    length = len_ref[0]

    # ---- forward: scores carry [S][LB], backpointers into VMEM scratch
    uni = _uniform_trans(lt)

    def fstep(k, V):
        e = em_ref[k]
        t = base + k
        m = t < length
        t0 = t == 0
        news = []
        if uni is not None:
            # uniform transitions: one rounded off-diagonal scan shared by
            # every j.  First-max ties must be taken over the ROUNDED
            # V[i]+off values (not V itself) to match the general chain.
            ls, lo = uni
            w0 = V[0] + lo
            A = w0
            fa = jnp.zeros_like(w0, dtype=jnp.int32)
            for i in range(1, S):
                wi = V[i] + lo
                better = wi > A
                A = jnp.maximum(A, wi)
                fa = jnp.where(better, i, fa)
        for j in range(S):
            if uni is not None:
                Bj = V[j] + ls
                acc = jnp.maximum(A, Bj)
                arg = jnp.where((A > Bj) | ((A == Bj) & (fa < j)), fa, j)
            else:
                acc = V[0] + lt[0][j]
                arg = jnp.zeros_like(acc, dtype=jnp.int32)
                for i in range(1, S):
                    cand = V[i] + lt[i][j]
                    better = cand > acc
                    acc = jnp.maximum(acc, cand)
                    arg = jnp.where(better, i, arg)
            reg = acc + e[j]
            t0v = li[j] + e[j]
            news.append(jnp.where(m, jnp.where(t0, t0v, reg), V[j]))
            bp_j = jnp.where(m & ~t0, arg, j)
            bp_scratch[k, j] = bp_j.astype(jnp.int8)
        return news

    V0 = [ss_ref[j] for j in range(S)]
    jax.lax.fori_loop(0, chunk, fstep, V0)

    # ---- backtrack all S assumed end states: carry [S][LB] int32
    def bstep(tt, state):
        k = chunk - 1 - tt                # walk k = chunk-1 .. 1
        bp_k = [bp_scratch[k, i].astype(jnp.int32) for i in range(S)]
        new = []
        for s in range(S):
            paths_ref[k, s] = state[s].astype(jnp.int8)
            new.append(_select_by_index(state[s], bp_k))
        return new

    LB = em_ref.shape[-1]
    init = [jnp.full((LB,), s, jnp.int32) for s in range(S)]
    state = jax.lax.fori_loop(0, chunk - 1, bstep, init)
    bp0 = [bp_scratch[0, i].astype(jnp.int32) for i in range(S)]
    for s in range(S):
        paths_ref[0, s] = state[s].astype(jnp.int8)
        prevend_ref[s] = _select_by_index(state[s], bp0).astype(jnp.int8)


def _maxplus_combine(a, b):
    return jnp.max(a[..., :, :, None] + b[..., None, :, :], axis=-2)


def viterbi_decode_pallas(
    log_em: jnp.ndarray,    # [B, T, S]
    log_trans,              # [S, S] HOST array (baked into the kernels)
    log_init,               # [S] HOST array
    mask: jnp.ndarray,      # [B, T]; must be a prefix mask per lane
    chunk: int = 256,
) -> jnp.ndarray:
    """Drop-in replacement for hmm.viterbi_decode_chunked (same outputs).

    log_trans/log_init must be host constants — they unroll into the kernel
    body as scalars.  mask must be True-prefix per row (Canvas's padded-tail
    masks always are)."""
    lt = tuple(tuple(float(x) for x in row) for row in np.asarray(log_trans))
    li = tuple(float(x) for x in np.asarray(log_init))
    lengths = jnp.sum(mask.astype(jnp.int32), axis=1)      # [B]
    interpret = jax.default_backend() == "cpu"  # pallas CPU = interpreter
    return _viterbi_pallas_jit(log_em, lengths, lt, li, chunk, interpret)


@partial(jax.jit, static_argnames=("lt", "li", "chunk", "interpret"))
def _viterbi_pallas_jit(log_em, lengths, lt, li, chunk, interpret):
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
