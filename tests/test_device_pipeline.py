"""Fused device pipeline steps vs host oracles (virtual CPU mesh)."""

import numpy as np
import jax.numpy as jnp

from canvas_tpu.pipeline.device_pipeline import caller_step, full_pipeline_step
from canvas_tpu.ops import hmm


def test_caller_step_nearest_model():
    # two lanes, three coverage plateaus: CN1 / CN2 / CN4 at diploid=100
    T = 120
    cov = np.full((2, T), 100.0, np.float32)
    cov[0, :40] = 50.0
    cov[1, 60:] = 200.0
    states = np.full((2, T), 2, np.int32)
    states[0, :40] = 1
    states[1, 60:] = 4
    valid = np.ones((2, T), bool)
    cn = np.asarray(caller_step(jnp.asarray(states), jnp.asarray(cov),
                                jnp.asarray(valid)))
    # diploid coverage = global mean of cov
    mean = cov.mean()
    exp = np.round(cov / (mean / 2.0)).astype(np.int32)
    np.testing.assert_array_equal(cn, exp)


def test_caller_step_masks_invalid_bins():
    T = 64
    cov = np.full((1, T), 80.0, np.float32)
    cov[0, 32:] = 9999.0              # garbage in padded tail
    states = np.zeros((1, T), np.int32)
    valid = np.zeros((1, T), bool)
    valid[0, :32] = True
    cn = np.asarray(caller_step(jnp.asarray(states), jnp.asarray(cov),
                                jnp.asarray(valid)))
    # the one valid segment has mean 80 = diploid mean -> CN2
    assert (cn[0, :32] == 2).all()


def test_full_pipeline_step_returns_called_cn():
    C, L, bs = 2, 4096, 16
    rng = np.random.default_rng(0)
    possible = rng.random((C, L)) < 0.8
    observed = rng.poisson(0.5, size=(C, L)).astype(np.float32)
    observed[~possible] = 0.0
    is_gc = rng.random((C, L)) < 0.4
    offsets = np.zeros(C, np.int32)
    max_bins = L // bs

    S, V = 5, 64
    means = np.maximum(np.arange(S)[:, None], 0.1) * 50.0
    tables = hmm.negative_binomial_table(means, np.full((S, 1), 400.0), V)
    logt = np.where(tables > 0, np.log(np.maximum(tables, 1e-300)),
                    hmm.NEG_INF).astype(np.float32)
    states, called, (s, e, g, c, v) = full_pipeline_step(
        jnp.asarray(possible), jnp.asarray(observed), jnp.asarray(is_gc),
        jnp.asarray(offsets), bs, max_bins, jnp.asarray(logt),
        jnp.asarray(np.asarray(hmm.log_transition(S), np.float32)),
        jnp.asarray(np.log(np.full(S, 1.0 / S, np.float32))))
    assert called.shape == (C, max_bins)
    valid = np.asarray(v)
    # flat diploid-ish coverage -> the dominant call is CN2
    vals, counts = np.unique(np.asarray(called)[valid], return_counts=True)
    assert vals[np.argmax(counts)] == 2
