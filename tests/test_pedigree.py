"""Pedigree caller tests: joint likelihood, de novo scoring, MCC."""

import numpy as np
import pytest

from canvas_tpu.models import pedigree as ped
from canvas_tpu.models.segment_model import Segment


def make_segment(chrom, begin, end, mean, nbins=50, rng=None, balleles=True,
                 maf=0.5, depth=60):
    rng = rng or np.random.default_rng(0)
    counts = rng.poisson(mean, size=nbins).astype(np.float32)
    seg = Segment(chrom, begin, end, counts)
    if balleles:
        n = 20
        a = rng.binomial(depth, maf, size=n).astype(np.int32)
        b = (depth - a).astype(np.int32)
        seg.baf_count_a = np.maximum(a, b)
        seg.baf_count_b = np.minimum(a, b)
        seg.baf_total_coverage = (a + b).astype(np.int32)
        seg.baf_frequencies = (b / (a + b)).astype(np.float32)
    return seg


def test_nb_clumping_floor():
    # variance barely above mean forces huge r; floor applies when r small
    t_adj = ped.negative_binomial_table(50.0, 5000.0, 200, adjust_clumping=True)
    t_raw = ped.negative_binomial_table(50.0, 5000.0, 200, adjust_clumping=False)
    # r_formula = 2500/4950 ~ 0.5 -> floors 6 vs 2 give different tables
    assert not np.allclose(t_adj, t_raw)
    assert t_adj.sum() == pytest.approx(1.0, abs=0.01)


def test_transition_matrix():
    t = ped.transition_matrix(5)
    assert t[0, 0] == 1.0 and t[0, 1:].sum() == 0
    np.testing.assert_allclose(t[2].sum(), 1.0, atol=0.01)
    # diploid parent: Poisson(1) has P(0)=P(1) as the joint maximum
    assert t[2, 0] == pytest.approx(t[2, 1])
    assert t[2, 1] > t[2, 2]


def test_phased_genotypes():
    gts = ped.phased_genotypes(3)
    assert gts == [(0, 0), (0, 1), (1, 0), (0, 2), (1, 1), (2, 0)]


def test_joint_likelihood_trio_normal():
    """All-diploid trio should call CN2 everywhere."""
    model_liks = np.array([1e-10, 1e-4, 0.9, 1e-4, 1e-10])
    trans = ped.transition_matrix(5)
    res = ped.pedigree_joint_likelihood(
        [model_liks, model_liks], [model_liks], trans)
    assert res.best == {"parent1": 2, "parent2": 2, "child0": 2}
    assert res.total_marginal > 0


def test_joint_likelihood_denovo_configuration():
    """Parents strongly CN2, child strongly CN3 -> de novo gain config wins."""
    parent = np.array([1e-12, 1e-8, 0.9, 1e-8, 1e-12])
    child = np.array([1e-12, 1e-8, 1e-6, 0.9, 1e-12])
    trans = ped.transition_matrix(5)
    res = ped.pedigree_joint_likelihood([parent, parent], [child], trans)
    assert res.best["parent1"] == 2 and res.best["parent2"] == 2
    assert res.best["child0"] == 3
    dq = ped.denovo_quality(res, 0, 3, 2, 2, 2)
    assert dq > 20


def test_is_shared_cnv():
    ploidies = {"f": 2, "m": 2, "p": 2}
    # both parents have the gain -> shared
    assert ped.is_shared_cnv({"f": 3, "m": 3, "p": 3}, ploidies, ["f", "m"], "p")
    # neither parent has it -> de novo (not shared)
    assert not ped.is_shared_cnv({"f": 2, "m": 2, "p": 3}, ploidies, ["f", "m"], "p")
    assert not ped.is_shared_cnv({"f": 2, "m": 2, "p": 1}, ploidies, ["f", "m"], "p")
    # one parent has it -> shared
    assert ped.is_shared_cnv({"f": 3, "m": 2, "p": 3}, ploidies, ["f", "m"], "p")


def test_single_sample_qscore():
    liks = np.array([0.0, 0.01, 0.98, 0.01, 0.0])
    q = ped.single_sample_qscore(liks, 2)
    assert q == pytest.approx(-10 * np.log10(0.02 / 1.0), rel=1e-6)
    assert ped.single_sample_qscore(np.array([0, 0, 1.0, 0, 0]), 2) == 100.0


def test_call_pedigree_trio_recovers_denovo(rng):
    """3 segments: all-normal, inherited CNV, de novo CNV."""
    base = 100.0
    segs = {}
    types = {"father": "Father", "mother": "Mother", "proband": "Proband"}
    for name in types:
        segs[name] = [
            make_segment("chr1", 0, 100000, base, rng=rng),
            make_segment("chr1", 100000, 200000,
                         base * 1.5 if name in ("father", "proband") else base,
                         rng=rng, maf=0.33 if name in ("father", "proband") else 0.5),
            make_segment("chr1", 200000, 300000,
                         base * 0.5 if name == "proband" else base,
                         rng=rng, maf=0.05 if name == "proband" else 0.5),
        ]
    out = ped.call_pedigree(segs, types)
    # segment 0: everyone CN2
    assert all(out[n][0].copy_number == 2 for n in types)
    # segment 1: father + proband CN3 (inherited, no DQ)
    assert out["father"][1].copy_number == 3
    assert out["proband"][1].copy_number == 3
    assert out["proband"][1].dq_score is None
    # segment 2: proband CN1, de novo with DQ
    assert out["proband"][2].copy_number == 1
    assert out["mother"][2].copy_number == 2
    assert out["proband"][2].dq_score is not None
    assert out["proband"][2].dq_score > 20
    # MCC: father's CN3 segment should have MCC 2
    assert out["father"][1].major_chromosome_count == 2


def test_call_pedigree_no_pedigree_mode(rng):
    # s2 has a CN3 segment against its own diploid baseline of 100
    segs = {"s1": [make_segment("chr1", 0, 100000, 100.0, rng=rng),
                   make_segment("chr1", 100000, 200000, 100.0, rng=rng),
                   make_segment("chr1", 200000, 300000, 100.0, rng=rng)],
            "s2": [make_segment("chr1", 0, 100000, 100.0, rng=rng),
                   make_segment("chr1", 100000, 200000, 150.0, rng=rng),
                   make_segment("chr1", 200000, 300000, 100.0, rng=rng)]}
    types = {"s1": "Other", "s2": "Other"}
    out = ped.call_pedigree(segs, types)
    assert [s.copy_number for s in out["s1"]] == [2, 2, 2]
    assert [s.copy_number for s in out["s2"]] == [2, 3, 2]


def test_haplotype_caller_trio(rng):
    """HaplotypeVariantCaller path: same trio plan as the default caller."""
    base = 100.0
    segs = {}
    types = {"father": "Father", "mother": "Mother", "proband": "Proband"}
    for name in types:
        segs[name] = [
            make_segment("chr1", 0, 100000, base, rng=rng),
            make_segment("chr1", 100000, 200000,
                         base * 1.5 if name in ("father", "proband") else base,
                         rng=rng,
                         maf=0.33 if name in ("father", "proband") else 0.5),
            # the haplotype caller gates de novo transitions at 1e-5, so the
            # deletion needs decisive coverage + allele evidence
            make_segment("chr1", 200000, 300000,
                         base * 0.35 if name == "proband" else base,
                         rng=rng, maf=0.01 if name == "proband" else 0.5,
                         depth=150),
        ]
    # threshold 5: parent q-scores sit near 10 (the (1,2)/(2,1) confusion
    # is diluted by the 1/nBalleles scaling) and the de novo gate requires
    # every pedigree member to clear it
    out = ped.call_pedigree_haplotype(segs, types, quality_threshold=5)
    assert all(out[n][0].copy_number == 2 for n in types)
    assert out["father"][1].copy_number == 3
    assert out["proband"][1].copy_number == 3
    # phased genotype assignment gives an MCC directly
    assert out["father"][1].major_chromosome_count == 2
    assert out["proband"][2].copy_number == 1
    assert out["mother"][2].copy_number == 2
    assert out["proband"][2].dq_score is not None


def test_haplotype_loh_detection(rng):
    """Copy-neutral LOH: CN2 coverage with extreme MAF -> (0,2) genotype."""
    types = {"s": "Other"}
    segs = {"s": [make_segment("chr1", 0, 100000, 100.0, rng=rng),
                  make_segment("chr1", 100000, 200000, 100.0, rng=rng,
                               maf=0.02)]}
    out = ped.call_pedigree_haplotype(segs, types)
    assert out["s"][0].copy_number == 2
    assert out["s"][0].major_chromosome_count == 1
    assert out["s"][1].copy_number == 2
    assert out["s"][1].major_chromosome_count == 2   # LOH (0,2)


def test_batched_joint_likelihood_matches_scalar(rng):
    """The [G, S, S, K] device contraction must reproduce the per-segment
    scalar loop exactly: best CNs, max log-likelihood, marginals, and the
    full config dictionaries (VariantCaller.cs:319-380)."""
    trans = ped.transition_matrix()
    S = ped.MAX_COPY_NUMBER
    G = 40
    for n_children in (1, 2):
        pl = rng.random((G, 2, S)) + 1e-6
        cl = rng.random((G, n_children, S)) + 1e-6
        batched = ped.pedigree_joint_likelihood_batched(
            pl, cl, trans, use_device=False)
        for g in range(G):
            scalar = ped.pedigree_joint_likelihood(
                [pl[g, 0], pl[g, 1]], [cl[g, c] for c in range(n_children)],
                trans)
            assert batched[g].best == scalar.best, (n_children, g)
            assert batched[g].maximal_log_likelihood == pytest.approx(
                scalar.maximal_log_likelihood, rel=1e-12)
            assert batched[g].total_marginal == pytest.approx(
                scalar.total_marginal, rel=1e-12)
            assert set(batched[g].configs) == set(scalar.configs)
            for key, v in scalar.configs.items():
                assert batched[g].configs[key] == pytest.approx(v, rel=1e-12)


def test_batched_joint_likelihood_device_path(rng):
    """use_device=True (jit) agrees with the numpy path on best CNs and
    closely on marginals (f32 on accelerators)."""
    trans = ped.transition_matrix()
    S = ped.MAX_COPY_NUMBER
    G = 16
    pl = rng.random((G, 2, S)) + 1e-6
    cl = rng.random((G, 1, S)) + 1e-6
    a = ped.pedigree_joint_likelihood_batched(pl, cl, trans, use_device=True)
    b = ped.pedigree_joint_likelihood_batched(pl, cl, trans, use_device=False)
    for x, y in zip(a, b):
        assert x.best == y.best
        assert x.total_marginal == pytest.approx(y.total_marginal, rel=1e-5)


def test_genotype_log_likelihoods_multi_matches_scalar(rng):
    model = ped.CopyNumberModel(5, 200, 100.0, 50.0)
    ca = rng.integers(0, 80, size=12).astype(np.int64)
    cb = rng.integers(0, 80, size=12).astype(np.int64)
    gts = [(a, b) for a in range(5) for b in range(5) if a + b < 5]
    batch = model.genotype_log_likelihoods_multi(ca, cb, gts)
    for k, (a, b) in enumerate(gts):
        assert batch[k] == pytest.approx(
            model.genotype_log_likelihood(ca, cb, a, b), rel=1e-12, abs=1e-12)
    assert np.array_equal(
        model.genotype_log_likelihoods_multi(np.zeros(0), np.zeros(0), gts),
        np.zeros(len(gts)))
