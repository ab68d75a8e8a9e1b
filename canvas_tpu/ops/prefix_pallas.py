"""Fused Pallas prefix-sum kernel for the binning stage.

The binning stage (CanvasBin.cs:568-661 semantics, see ops/binning.py) needs
three genome-length prefix arrays per contig:

    pcum  = cumsum(possible masked to [offset, real_len))
    ocum  = cumsum(min(observed, cap) * possible)
    gccum = cumsum(is_gc)                       (unmasked, like the oracle)

XLA lowers each jnp.cumsum to a multi-pass log-scan with HBM round trips
(measured 93.7ms for the 3 cumsums over 134M positions on one chip; this
kernel: 4.7ms, ~430GB/s effective — a 20x speedup).  The kernel makes one
pass: each sequential grid block loads PACKED tiles of all three tracks
into VMEM (1 bit/position for possible/is_gc, 4 bits for observed — the
tracks stay packed all the way from the host through HBM, which matters
both on a thin host->device wire and for HBM footprint at chr1 scale),
unpacks them in-register, computes the in-block inclusive cumsum with two
MXU triangular matmuls (lane cumsum = x @ upper_tri, row offsets =
strict_lower_tri @ row_totals), adds a running int32 carry kept in SMEM,
and writes int32 prefixes.  The offset/real_len live mask is recomputed
per block from SMEM scalars instead of materializing genome-length iota /
mask arrays (those temps alone exceeded HBM at chr1 scale).

Packed layouts (host side, see pack_tracks_rows / pack_obs_rows):
  * positions reshape row-major to [rows, 128] (row r, lane c = position
    r*128 + c);
  * bit-packing groups 8 consecutive ROWS per lane: byte[j, c] holds
    positions (8j+k)*128 + c for k=0..7, MSB first;
  * nibble-packing groups 2 rows: byte[j, c] = obs[2j, c] << 4 | obs[2j+1, c].
  In-kernel unpack is then a lane-local shift/mask + sublane interleave.

Exactness:
  * per-block sums are computed in f32 over integer values; the worst case
    (ROWS=512, lanes=128, values <= 15) is 512*128*15 < 2^24, so every f32
    intermediate is an exact integer;
  * the global carry is int32 with two's-complement wrap; per-bin counts
    are differences of prefixes, exact under modular arithmetic as long as
    each individual bin sum < 2^31 (always true: ~binSize*cap <= ~10^5);
  * pcum itself must not wrap (searchsorted needs monotonicity) — fine, it
    is bounded by contig length (chr1 ~ 2.5e8 < 2^31).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 512          # block = ROWS * 128 = 65,536 positions
LANES = 128
BLOCK = ROWS * LANES


def pack_tracks_rows(x: np.ndarray) -> np.ndarray:
    """bool [Lp] -> uint8 [Lp/1024, 128]: row-major [rows,128] then 8
    consecutive rows per byte, MSB first (kernel layout, see module doc).
    Lp must be a multiple of 1024."""
    x2 = np.asarray(x, bool).reshape(-1, 8, LANES)
    return np.packbits(x2, axis=1)[:, 0, :]


def pack_obs_rows(obs: np.ndarray) -> np.ndarray:
    """uint8 [Lp] (values clamped to 15) -> uint8 [Lp/256, 128]: row-major
    [rows,128] then 2 consecutive rows per byte (hi nibble = even row)."""
    o2 = np.minimum(np.asarray(obs, np.uint8), 15).reshape(-1, 2, LANES)
    return (o2[:, 0] << 4) | o2[:, 1]


def _unpack_bits_tile(packed_i32, rows8):
    """[rows8, 128] int32 bytes -> [rows8*8, 128] f32 of 0/1 bits."""
    cols = [((packed_i32 >> (7 - k)) & 1) for k in range(8)]
    u = jnp.stack(cols, axis=1)                  # [rows8, 8, 128]
    return u.reshape(rows8 * 8, LANES).astype(jnp.float32)


def _prefix_kernel(off_ref, len_ref, p_ref, o_ref, g_ref,
                   pcum_ref, ocum_ref, gccum_ref, carry, *, cap):
    """One grid step: unpack + in-block cumsum of the three tracks + carry.

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

    # live mask from block-local position index (no genome-length temps)
    pos_r = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0)
    pos_c = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    pos = i * BLOCK + pos_r * LANES + pos_c
    live = ((pos >= off_ref[0]) & (pos < len_ref[0])).astype(jnp.float32)

    p = _unpack_bits_tile(p_ref[:].astype(jnp.int32), ROWS // 8) * live
    g = _unpack_bits_tile(g_ref[:].astype(jnp.int32), ROWS // 8)
    ob = o_ref[:].astype(jnp.int32)
    o = jnp.stack([(ob >> 4) & 0xF, ob & 0xF], axis=1) \
        .reshape(ROWS, LANES).astype(jnp.float32)
    o = jnp.minimum(o, float(cap)) * p

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
def fused_prefix_sums_packed(p_packed, obs_packed, gc_packed, offset,
                             real_len, cap=10, interpret=False):
    """Inclusive int32 prefix sums of (possible & live, min(obs, cap) *
    possible, is_gc) in one Pallas pass over PACKED inputs.

    p_packed / gc_packed: uint8 [Lp/1024, 128] (pack_tracks_rows layout);
    obs_packed: uint8 [Lp/256, 128] (pack_obs_rows, values <= 15);
    offset / real_len: int32 [1] arrays (live range [offset, real_len)).
    Lp (=rows*128) must be a multiple of ROWS*128.

    Returns (pcum, ocum, gccum), each int32 [Lp]."""
    rows8 = p_packed.shape[0]
    Lp = rows8 * 8 * LANES
    nb = Lp // BLOCK

    def spec(block_rows):
        return pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    scal = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_spec = spec(ROWS)
    pcum, ocum, gccum = pl.pallas_call(
        partial(_prefix_kernel, cap=int(cap)),
        grid=(nb,),
        in_specs=[scal, scal, spec(ROWS // 8), spec(ROWS // 2),
                  spec(ROWS // 8)],
        out_specs=[out_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((Lp // LANES, LANES), jnp.int32)] * 3,
        scratch_shapes=[pltpu.SMEM((3,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(offset, real_len, p_packed, obs_packed, gc_packed)
    return pcum.reshape(Lp), ocum.reshape(Lp), gccum.reshape(Lp)


def fused_prefix_sums(p_u8, obs_u8, gc_u8, cap=10, interpret=False):
    """Unpacked-input convenience wrapper (tests, small arrays): packs on
    host and runs the packed kernel with a full live range."""
    L = int(p_u8.shape[0])
    pad = (-L) % BLOCK
    p = np.pad(np.asarray(p_u8, np.uint8), (0, pad)).astype(bool)
    o = np.pad(np.asarray(obs_u8, np.uint8), (0, pad))
    g = np.pad(np.asarray(gc_u8, np.uint8), (0, pad)).astype(bool)
    pcum, ocum, gccum = fused_prefix_sums_packed(
        jnp.asarray(pack_tracks_rows(p)),
        jnp.asarray(pack_obs_rows(o)),
        jnp.asarray(pack_tracks_rows(g)),
        jnp.asarray(np.zeros(1, np.int32)),
        jnp.asarray(np.full(1, L + pad, np.int32)),
        cap=cap, interpret=interpret)
    return pcum, ocum, gccum
