"""Order-statistics tie conventions (reference Utilities.cs semantics)."""

import numpy as np
import jax.numpy as jnp
import pytest

from canvas_tpu.ops import stats


def test_median_even_odd():
    assert stats.median([3.0, 1.0, 2.0]) == 2.0
    assert stats.median([4.0, 1.0, 3.0, 2.0]) == 2.5
    assert stats.median([5.0]) == 5.0


def test_median_int():
    assert stats.median_int([1, 2]) == 1       # (1+2)/2 C# int division
    assert stats.median_int([1, 2, 3, 4]) == 2
    assert stats.median_int([7]) == 7


def test_quartiles_even():
    # 8 points: halves of 4; quartiles are averages of middles
    q = stats.quartiles(np.arange(1, 9, dtype=float))
    assert q == (2.5, 4.5, 6.5)
    # 6 points: halves of 3 -> quartile = mid of half
    q = stats.quartiles(np.arange(1, 7, dtype=float))
    assert q == (2.0, 3.5, 5.0)


def test_quartiles_4n1():
    # n=9 = 4*2+1: q1 = .25*x[1] + .75*x[2]; q3 = .75*x[6] + .25*x[7]
    x = np.arange(1, 10, dtype=float)
    q = stats.quartiles(x)
    assert q[0] == pytest.approx(0.25 * 2 + 0.75 * 3)
    assert q[1] == 5.0
    assert q[2] == pytest.approx(0.75 * 7 + 0.25 * 8)


def test_quartiles_4n3():
    # n=7 = 4*1+3: q1 = .75*x[1] + .25*x[2]; q3 = .25*x[4] + .75*x[5]
    x = np.arange(1, 8, dtype=float)
    q = stats.quartiles(x)
    assert q[0] == pytest.approx(0.75 * 2 + 0.25 * 3)
    assert q[1] == 4.0
    assert q[2] == pytest.approx(0.25 * 5 + 0.75 * 6)


def test_mad():
    x = [1.0, 2.0, 3.0, 100.0]
    m = stats.median(x)  # 2.5
    assert stats.mad(x) == stats.median(np.abs(np.array(x) - m))


def test_weighted_quantiles_reference_rule():
    # cumulative <= p keeps overwriting; value with cum > p never selected
    vals = [1.0, 2.0, 3.0, 4.0]
    w = [1.0, 1.0, 1.0, 1.0]
    # cum probs: .25 .5 .75 1.0 ; p=0.5 -> last value with cum<=0.5 is 2
    assert stats.weighted_median(vals, w) == 2.0
    out = stats.weighted_quantiles(vals, w, [0.25, 0.5, 0.75])
    assert list(out) == [1.0, 2.0, 3.0]


def test_variance_and_cv():
    x = [1.0, 2.0, 3.0, 4.0]
    assert stats.variance(x) == pytest.approx(np.var(x, ddof=1))
    assert stats.coefficient_of_variation(x) == pytest.approx(
        np.std(x) / np.mean(x))


def test_masked_median_matches_host(rng):
    for n in [1, 2, 5, 8, 13]:
        x = rng.normal(size=(3, 16)).astype(np.float32)
        mask = np.zeros((3, 16), dtype=bool)
        mask[:, :n] = True
        got = np.asarray(stats.masked_median(jnp.asarray(x), jnp.asarray(mask)))
        for b in range(3):
            assert got[b] == pytest.approx(stats.median(x[b, :n]), rel=1e-6)


def test_masked_quartiles_matches_host(rng):
    for n in [1, 4, 5, 7, 9, 12]:
        x = rng.normal(size=(2, 16)).astype(np.float32)
        mask = np.zeros((2, 16), dtype=bool)
        mask[:, :n] = True
        q1, q2, q3 = stats.masked_quartiles(jnp.asarray(x), jnp.asarray(mask))
        for b in range(2):
            ref = stats.quartiles(x[b, :n])
            assert float(q1[b]) == pytest.approx(ref[0], rel=1e-5)
            assert float(q2[b]) == pytest.approx(ref[1], rel=1e-5)
            assert float(q3[b]) == pytest.approx(ref[2], rel=1e-5)


def test_masked_mad(rng):
    x = rng.normal(size=(1, 32)).astype(np.float32)
    mask = np.ones((1, 32), dtype=bool)
    got = float(stats.masked_mad(jnp.asarray(x), jnp.asarray(mask))[0])
    assert got == pytest.approx(stats.mad(x[0]), rel=1e-5)


def test_median_filter():
    x = [1.0, 5.0, 2.0, 8.0, 3.0]
    out = stats.median_filter(x, 1)
    assert list(out) == [3.0, 2.0, 5.0, 3.0, 5.5]


def test_nan_sorts_first_like_csharp():
    # C# Double.CompareTo: NaN < -Inf < finite < +Inf (Utilities.cs sorts
    # lists that can contain MAD/median = NaN ratios, Segmentation.cs:343)
    vals = [1.0, np.nan, -np.inf, 3.0, np.nan]
    # median of sorted [NaN, NaN, -inf, 1, 3] is -inf
    assert stats.median(vals) == -np.inf
    q1, q2, q3 = stats.quartiles(vals)
    # n=5=4k+1, k=1: Q1 = 0.25*x[0]+0.75*x[1] (NaN), Q3 = 0.75*x[3]+0.25*x[4]
    assert q2 == -np.inf and np.isnan(q1) and q3 == 1.5


def test_variability_all_zero_window_is_nan_not_crash():
    from canvas_tpu.ops import metrics
    cov = np.concatenate([np.full(120, 100.0), np.zeros(120),
                          np.full(120, 100.0)])
    rv = metrics.variability_by_window({"chr1": cov}, 100)
    assert len(rv) == 3 and np.isnan(rv[1])  # 0/0 window -> NaN like C#
    v = metrics.coverage_variability(
        {"chr1": np.concatenate([cov] * 400)}, 10_000)
    assert v is not None
