"""Vectorized grid engine vs the scalar model evaluation."""

import numpy as np
import pytest

from canvas_tpu.models import somatic as som
from canvas_tpu.models import somatic_grid as sg
from tests.test_somatic import build_tumor


def test_grid_matches_scalar(rng):
    segs, _ = build_tumor(rng, purity=0.65, diploid_cov=90.0)
    infos, _ = som.usable_segments_with_relaxation(segs)
    cov_all = np.concatenate([i.segment.bin_counts for i in infos])
    mean_cov = float(np.mean(cov_all, dtype=np.float64))
    cw = som.coverage_weighting_factor(90, 96.0)
    ploidies = som.initialize_ploidies(mean_cov)
    genome_length = 24_000_000

    coverages = np.array([60.0, 90.0, 120.0])
    purities = np.array([0.3, 0.65, 0.9])
    res = sg.evaluate_grid(coverages, purities, infos, ploidies, cw,
                           genome_length)
    for k in range(3):
        model = som.PurityModel(coverages[k], purities[k])
        som.model_deviation(model, ploidies, infos, cw)
        som.diploid_model_distance(model, infos, genome_length)
        assert res["deviation"][k] == pytest.approx(model.deviation, rel=1e-9)
        assert res["precision"][k] == pytest.approx(
            model.precision_deviation, rel=1e-9)
        assert res["accuracy"][k] == pytest.approx(
            model.accuracy_deviation, rel=1e-9)
        assert res["ploidy"][k] == pytest.approx(model.ploidy, rel=1e-12)
        np.testing.assert_allclose(res["percent_cn"][k], model.percent_cn,
                                   rtol=1e-12)
        assert res["diploid_distance"][k] == pytest.approx(
            model.diploid_distance, rel=1e-9)
        np.testing.assert_array_equal(res["cns"][k], model.cns)


def test_grid_matches_scalar_with_clusters(rng):
    segs, _ = build_tumor(rng, purity=0.7, diploid_cov=100.0)
    # replicate segments to get >100 with MAF
    import copy
    big = []
    pos = 0
    for rep in range(12):
        for s in segs:
            c = copy.deepcopy(s)
            c.begin, c.end = pos, pos + s.length
            pos += s.length
            big.append(c)
    infos, _ = som.usable_segments_with_relaxation(big)
    cov_all = np.concatenate([i.segment.bin_counts for i in infos])
    mean_cov = float(np.mean(cov_all, dtype=np.float64))
    cw = som.coverage_weighting_factor(100, 96.0)
    ploidies = som.initialize_ploidies(mean_cov)
    genome_length = pos

    from canvas_tpu.ops import clustering as cl
    seg_cov = np.array([i.coverage for i in infos])
    seg_maf = np.array([i.maf for i in infos])
    seg_w = np.array([i.weight for i in infos])
    knn, knn_cut = cl.knearest_neighbour_cutoff(seg_cov, seg_maf, cw)
    clu = cl.density_cluster(seg_cov, seg_maf, seg_w, cw, knn_cut, 0.03)
    assert clu.n_clusters >= 2

    coverages = np.array([70.0, 100.0])
    purities = np.array([0.5, 0.7])
    res = sg.evaluate_grid(coverages, purities, infos, ploidies, cw,
                           genome_length, clu.cluster_ids, clu.n_clusters,
                           mean_cov)
    for k in range(2):
        model = som.PurityModel(coverages[k], purities[k])
        som.model_deviation(model, ploidies, infos, cw, clu.cluster_ids,
                            clu.n_clusters, mean_cov)
        assert res["deviation"][k] == pytest.approx(model.deviation, rel=1e-6)
        assert res["het_index"][k] == pytest.approx(
            model.heterogeneity_index or 0.0)


def _grid_inputs(rng, n_models=40):
    segs, _ = build_tumor(rng, purity=0.65, diploid_cov=90.0)
    infos, _ = som.usable_segments_with_relaxation(segs)
    cov_all = np.concatenate([i.segment.bin_counts for i in infos])
    mean_cov = float(np.mean(cov_all, dtype=np.float64))
    cw = som.coverage_weighting_factor(90, 96.0)
    ploidies = som.initialize_ploidies(mean_cov)
    g = np.random.default_rng(4)
    coverages = g.uniform(40, 160, size=n_models)
    purities = g.uniform(0.2, 1.0, size=n_models)
    return infos, ploidies, cw, coverages, purities, mean_cov


def test_device_grid_matches_numpy_oracle(rng):
    """The jax device path (SURVEY §7(5): grid as device contraction) must
    reproduce the float64 numpy oracle: identical CN assignments and
    discrete selections, float metrics to f32 accuracy."""
    infos, ploidies, cw, coverages, purities, _ = _grid_inputs(rng)
    genome_length = 24_000_000
    ref = sg.evaluate_grid_numpy(coverages, purities, infos, ploidies, cw,
                                 genome_length)
    dev = sg.evaluate_grid_device(coverages, purities, infos, ploidies, cw,
                                  genome_length, chunk=16)
    np.testing.assert_array_equal(dev["cns"], ref["cns"])
    for key in ("deviation", "precision", "accuracy", "ploidy",
                "percent_cn2", "percent_normal", "diploid_distance"):
        np.testing.assert_allclose(dev[key], ref[key], rtol=2e-5, atol=2e-6)
    # model ranking (the selection input) is preserved
    assert np.argmin(dev["deviation"]) == np.argmin(ref["deviation"])


def test_device_grid_matches_numpy_oracle_with_clusters(rng):
    import copy

    segs, _ = build_tumor(rng, purity=0.7, diploid_cov=100.0)
    big = []
    pos = 0
    for rep in range(12):
        for s in segs:
            c = copy.deepcopy(s)
            c.begin, c.end = pos, pos + s.length
            pos += s.length
            big.append(c)
    infos, _ = som.usable_segments_with_relaxation(big)
    cov_all = np.concatenate([i.segment.bin_counts for i in infos])
    mean_cov = float(np.mean(cov_all, dtype=np.float64))
    cw = som.coverage_weighting_factor(100, 96.0)
    ploidies = som.initialize_ploidies(mean_cov)

    from canvas_tpu.ops import clustering as cl
    seg_cov = np.array([i.coverage for i in infos])
    seg_maf = np.array([i.maf for i in infos])
    seg_w = np.array([i.weight for i in infos])
    knn, knn_cut = cl.knearest_neighbour_cutoff(seg_cov, seg_maf, cw)
    clu = cl.density_cluster(seg_cov, seg_maf, seg_w, cw, knn_cut, 0.03)

    g = np.random.default_rng(8)
    coverages = g.uniform(50, 150, size=24)
    purities = g.uniform(0.3, 1.0, size=24)
    ref = sg.evaluate_grid_numpy(coverages, purities, infos, ploidies, cw,
                                 pos, clu.cluster_ids, clu.n_clusters,
                                 mean_cov)
    dev = sg.evaluate_grid_device(coverages, purities, infos, ploidies, cw,
                                  pos, clu.cluster_ids, clu.n_clusters,
                                  mean_cov, chunk=8)
    np.testing.assert_array_equal(dev["cns"], ref["cns"])
    np.testing.assert_allclose(dev["het_index"], ref["het_index"],
                               rtol=0, atol=1e-12)
    for key in ("deviation", "precision", "accuracy"):
        np.testing.assert_allclose(dev[key], ref[key], rtol=5e-5, atol=5e-6)
