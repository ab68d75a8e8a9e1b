"""CI gates derived from the adversarial accuracy suite
(benchmarks/accuracy_adversarial.py): q-score calibration, noise
degradation ordering, score-distribution goldens, somatic purity
recovery, and allosome reference-ploidy semantics.

These are the non-saturated checks VERDICT r3/r4 asked for: a regression
that halves q-score discrimination, breaks clustering under
subclonality, or mis-normalizes GC now fails CI instead of sailing
through the clean planted-truth smoke tests.

Reference semantics under test: SegmentScoringModel.cs:12-171 (logistic
q-scores), SomaticCaller.cs:1619-2094 (purity/ploidy under noise),
CanvasClean.cs GC chain, CanvasSegment.GetCnvTypeAndAlleleCopyNumbers
(:280-330, ploidy-aware VCF types).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent
                       / "benchmarks"))

import accuracy_adversarial as aa  # noqa: E402


@pytest.fixture(scope="module")
def germline_runs():
    """Three fixed-seed germline scenarios at test scale (~2k bins x 3)."""
    out = {}
    for name, kw in [("clean", dict(nb_r=200.0)),
                     ("noisy", dict(nb_r=20.0)),
                     ("very_noisy", dict(nb_r=8.0))]:
        rng = np.random.default_rng(7)
        bins, truth = aa.make_binset(rng, n_contigs=3,
                                     bins_per_contig=2000, **kw)
        called = aa.run_germline(bins)
        out[name] = (bins, truth, called,
                     aa.score_germline(bins, truth, called))
    return out


def test_noise_degradation_is_ordered_and_nonsaturated(germline_runs):
    """Recall must degrade monotonically with overdispersion and the
    hardest scenario must be neither saturated nor collapsed — the band
    that makes this a real canary for normalization/HMM regressions."""
    r_clean = germline_runs["clean"][3]["recall"]
    r_noisy = germline_runs["noisy"][3]["recall"]
    r_hard = germline_runs["very_noisy"][3]["recall"]
    assert r_clean >= r_noisy >= r_hard
    assert r_clean > 97.0
    assert 30.0 < r_hard < 97.0          # non-saturated by construction
    for run in germline_runs.values():
        assert run[3]["precision"] > 90.0


def test_qscore_calibration_gate(germline_runs):
    """Pooled PASS calls: observed precision must not decrease from the
    low-q to the high-q bins, and the expected calibration error against
    the q-score's own probability reading stays bounded."""
    qrec = []
    for _bins, _truth, _called, sc in germline_runs.values():
        qrec.extend(sc["qrec"])
    assert len(qrec) >= 25
    cal = aa.calibration_table(qrec)
    assert cal["ece"] is not None and cal["ece"] < 0.15
    rows = cal["bins"]
    # monotone trend: every bin above q>=20 at least matches the lowest bin
    if len(rows) >= 2:
        lo = rows[0]["observed_precision"]
        for r in rows[1:]:
            assert r["observed_precision"] >= lo - 0.05, rows


def test_qscore_distribution_golden(germline_runs):
    """Score DISTRIBUTION pin (round-3 task 8): exact q-score quantiles of
    the fixed clean fixture.  The logistic coefficients, the predictor
    inputs (LogisticGermline reads binCount/MADs/distance), and the merge
    order all feed these values — any of them drifting moves the
    quantiles.  Reference: SegmentScoringModel.cs:26-41."""
    _bins, _truth, called, _sc = germline_runs["clean"]
    qs = np.sort([s.qscore for s in called])
    # distribution shape: deciles pinned to 2 decimals (deterministic
    # fixture; CPU backend enforced by conftest)
    deciles = np.percentile(qs, [0, 25, 50, 75, 100])
    want = GOLDEN_QSCORE_QUANTILES
    np.testing.assert_allclose(deciles, want, atol=0.01), qs


# Pinned on first run of the fixed fixture (seed 7, 3x2000 bins, r=200);
# update ONLY with an explanation of what legitimately moved the scores.
GOLDEN_QSCORE_QUANTILES = [12.0, 17.0, 22.0, 23.0, 25.0]


def test_somatic_purity_recovery_and_loh():
    """Moderate purity (0.40) through the full clustering + grid must
    recover purity within 0.05 and find every copy-neutral LOH event."""
    rng = np.random.default_rng(23)
    segs, truth = aa.make_somatic_segments(rng, 0.40)
    from canvas_tpu.models import somatic as som
    model, _ = som.call_somatic(segs, max(s.end for s in segs),
                                clustering_mode="Density")
    assert abs(model.purity - 0.40) <= 0.05
    cn_ok = sum(1 for i, cn, _ in truth if segs[i].copy_number == cn)
    assert cn_ok / len(truth) >= 0.9
    loh = [(i, cn, mcc) for i, cn, mcc in truth if (cn, mcc) == (2, 2)]
    loh_ok = sum(1 for i, _cn, _m in loh
                 if segs[i].copy_number == 2
                 and segs[i].major_chromosome_count == 2)
    assert loh_ok == len(loh)


def test_allosome_reference_ploidy_vcf_semantics():
    out = aa.allosome_scenario(np.random.default_rng(5))
    assert out["chrY_cn1_reported_as_REF"]
    assert out["planted_chrX_cn0_called_LOSS"]
    assert out["spurious_allosome_losses"] == 0
