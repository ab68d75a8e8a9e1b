"""Pallas Viterbi kernel vs the XLA chunked implementation (interpret mode
on CPU; the same code compiles with Mosaic on TPU)."""

import numpy as np
import jax.numpy as jnp

from canvas_tpu.ops import hmm
from canvas_tpu.ops.viterbi_pallas import viterbi_decode_pallas


def test_pallas_matches_chunked(rng):
    B, T, S = 3, 300, 5
    log_em = rng.normal(size=(B, T, S)).astype(np.float32)
    lt = np.asarray(hmm.log_transition(S), np.float32)
    li = np.log(np.full(S, 0.2, np.float32))
    mask = np.ones((B, T), dtype=bool)
    mask[1, 211:] = False
    mask[2, 37:] = False
    want = np.asarray(hmm.viterbi_decode_chunked(
        jnp.asarray(log_em), jnp.asarray(lt), jnp.asarray(li),
        jnp.asarray(mask), chunk=64))
    got = np.asarray(viterbi_decode_pallas(
        jnp.asarray(log_em), lt, li, jnp.asarray(mask), chunk=64))
    np.testing.assert_array_equal(got[mask], want[mask])


def test_pallas_realistic(rng):
    T = 600
    cov = rng.poisson(100.0, size=T).astype(np.float64)
    cov[200:300] = rng.poisson(150.0, size=100)
    tables, _, clamped = hmm.build_emission_tables(cov[:, None], 5)
    x = jnp.asarray(clamped, jnp.float32)[None]
    mask = jnp.ones((1, T), dtype=bool)
    log_em = hmm.emission_log_probs(x, tables, mask)
    lt = np.asarray(hmm.log_transition(5), np.float32)
    li = np.log(np.full(5, 0.2, np.float32))
    got = np.asarray(viterbi_decode_pallas(log_em, lt, li, mask, chunk=128))
    assert set(np.unique(got[0, 205:295])) == {3}
    assert set(np.unique(got[0, :195])) == {2}
