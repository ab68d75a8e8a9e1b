"""Unbalanced Haar wavelet segmentation tests."""

import numpy as np
import pytest

from canvas_tpu.ops import metrics, wavelets


def reference_inner_products(x):
    """Literal WaveletSegmentation.GetInnerProdIter recurrence (:19-48)."""
    n = len(x)
    I_plus = np.zeros(n - 1)
    I_minus = np.zeros(n - 1)
    I_plus[0] = np.sqrt(1 - 1.0 / n) * x[0]
    sumX = float(np.sum(x[1:]))
    mean = (x[0] + sumX) / n
    I_minus[0] = (1.0 / np.sqrt(n * (n - 1))) * sumX
    for m in range(1, n - 1):
        factor = np.sqrt((n - m - 1) * m / (m + 1) / (n - m))
        I_plus[m] = I_plus[m - 1] * factor + x[m] * np.sqrt(1.0 / (m + 1) - 1.0 / n)
        I_minus[m] = I_minus[m - 1] / factor - x[m] / np.sqrt(n * n / (m + 1) - n)
    return I_plus - I_minus, mean


def test_inner_products_match_reference_recurrence(rng):
    for n in [2, 3, 5, 17, 100]:
        x = rng.normal(50, 10, size=n)
        got, mean = wavelets.inner_products(x)
        want, wmean = reference_inner_products(x)
        np.testing.assert_allclose(got, want, rtol=1e-9)
        assert mean == pytest.approx(wmean)


def test_decompose_covers_all_points(rng):
    """The decomposition recursion terminates with every node's children
    reduced to single points, covering the whole vector."""
    x = rng.normal(100, 20, size=37)
    tree, smooth = wavelets.decompose(x)
    assert tree[0].shape == (1, 5)
    assert int(tree[0][0, 4]) == 37
    last = tree[-1]
    assert np.all(last[:, 4] - last[:, 2] <= 1)
    assert smooth == pytest.approx(np.sum(x) / np.sqrt(37))


def test_reconstruction_detects_step(rng):
    x = np.concatenate([rng.normal(100, 1, 50), rng.normal(200, 1, 50)])
    tree, smooth = wavelets.decompose(x)
    # top split should be at the step
    assert int(tree[0][0, 3]) == 50


def test_haar_wavelets_finds_cnv(rng):
    base = rng.normal(100, 5, size=300)
    base[100:200] *= 0.5
    cmads = [0.001] * 9
    bps = wavelets.haar_wavelets(
        base, 0.05, 80.0, is_germline=True, mad_factor=5.0,
        coeff_variability=0.05, factor_of_three_cmads=cmads)
    assert any(abs(b - 100) <= 6 for b in bps)
    assert any(abs(b - 200) <= 6 for b in bps)


def test_heal_bad_splits_removes_similar():
    ratio = np.concatenate([np.full(50, 100.0), np.full(50, 101.0),
                            np.full(50, 300.0)])
    healed = wavelets.heal_bad_splits([0, 50, 100], ratio, [0.05] * 9)
    # 100 vs 101 medians differ by 1 < 0.05*4*weightedMedian -> healed out
    assert 50 not in healed
    assert 100 in healed


def test_factor_of_three_cmads(rng):
    cov = {"chr1": rng.normal(100, 10, size=3**7)}
    cmads = metrics.factor_of_three_cmads(cov)
    assert cmads[0] == 0.0
    assert len(cmads) == 9
    # scale-1 CMAD of N(100,10) is around 0.09 (average abs deviation)
    assert 0.03 < cmads[1] < 0.2


def test_evenness_score_uniform(rng):
    # perfectly even coverage has evenness ~100
    cov = {"chr1": np.full(250_000, 100.0)}
    # constant coverage c sums 101 levels of w/(c*w) -> 1.01 -> 101.0
    score = metrics.evenness_score(cov, window=100_000)
    assert 95.0 <= score <= 101.5


def test_coverage_variability(rng):
    cov = {"chr1": rng.normal(100, 10, size=120_000)}
    v = metrics.coverage_variability(cov, window=10_000)
    assert v == pytest.approx(0.0674, abs=0.02)  # MAD/median of N(100,10)
    assert metrics.coverage_variability({"chr1": np.zeros(10)}, 10_000) is None


def _decompose_oracle(x):
    """Sequential per-node recursion — the reference's tree construction
    (FindBestUnbalancedHaarDecomposition, WaveletSegmentation.cs:264-379)."""
    x = np.asarray(x, np.float64)
    n = len(x)
    ind, _, coeff = wavelets._best_split(x)
    tree = [[(1.0, coeff, 1.0, float(ind), float(n))]]
    j = 0
    while True:
        level = tree[j]
        if sum(e - s - 1 for (_, _, s, _, e) in level) == 0:
            break
        nxt = []
        for (idx, _, s, sp, e) in level:
            if sp - s >= 1:
                i2, _, c2 = wavelets._best_split(x[int(s) - 1:int(sp)])
                nxt.append((2 * idx - 1, c2, s, i2 + s - 1, sp))
            if e - sp >= 2:
                i2, _, c2 = wavelets._best_split(x[int(sp):int(e)])
                nxt.append((2 * idx, c2, sp + 1, i2 + sp, e))
        tree.append(nxt)
        j += 1
    return tree


@pytest.mark.parametrize("case", ["noise", "zero_region", "all_zero",
                                  "leading_zero"])
def test_decompose_matches_sequential_oracle(rng, case):
    # zero spans take the injected-chain fast path; every tree must match
    # the per-node construction level-for-level (order within a level is
    # not consumed downstream)
    data = {
        "noise": np.abs(rng.normal(100, 10, 400)),
        "zero_region": np.concatenate([
            np.abs(rng.normal(100, 10, 150)), np.zeros(120),
            np.abs(rng.normal(100, 10, 130))]),
        "all_zero": np.zeros(64),
        "leading_zero": np.concatenate([
            np.zeros(50), np.abs(rng.normal(100, 10, 100))]),
    }[case]
    tree, _ = wavelets.decompose(data)
    oracle = _decompose_oracle(data)
    assert len(tree) == len(oracle)
    for tl, ol in zip(tree, oracle):
        got = sorted((r[2], r[3], r[4], r[1]) for r in tl)
        want = sorted((s, sp, e, c) for (_, c, s, sp, e) in ol)
        assert got == pytest.approx(want)
