"""Density-peak and GMM clustering tests."""

import numpy as np
import pytest

from canvas_tpu.ops import clustering as cl


def make_blobs(rng, centers, n_per=40, cov_sd=2.0, maf_sd=0.01):
    cov, maf = [], []
    for c_cov, c_maf in centers:
        cov.extend(rng.normal(c_cov, cov_sd, n_per))
        maf.extend(rng.normal(c_maf, maf_sd, n_per))
    return np.array(cov), np.clip(np.array(maf), 0.0, 0.5)


def test_knn_cutoff_flags_outliers(rng):
    cov, maf = make_blobs(rng, [(100, 0.5), (70, 0.3)], n_per=80)
    cov = np.append(cov, 300.0)   # far outlier
    maf = np.append(maf, 0.1)
    knn, cutoff = cl.knearest_neighbour_cutoff(cov, maf, 1 / 100.0)
    assert knn[-1] >= cutoff
    assert np.sum(knn > cutoff) <= 2  # only the tail is flagged


def test_density_cluster_finds_blobs(rng):
    centers = [(100, 0.49), (70, 0.3), (130, 0.38)]
    cov, maf = make_blobs(rng, centers, n_per=50)
    w = np.ones(len(cov))
    _, knn_cut = cl.knearest_neighbour_cutoff(cov, maf, 1 / 100.0)
    res = cl.density_cluster(cov, maf, w, 1 / 100.0, knn_cut,
                             centroid_cutoff=0.03)
    assert res.n_clusters == 3
    # members of each blob share a cluster id
    for b in range(3):
        ids = res.cluster_ids[b * 50:(b + 1) * 50]
        ids = ids[ids != cl.OUTLIER_CLUSTER_FLAG]
        assert len(np.unique(ids)) == 1


def test_gmm_em_converges(rng):
    centers = [(100, 0.49), (60, 0.25)]
    cov, maf = make_blobs(rng, centers, n_per=60)
    w = np.ones(len(cov))
    knn, knn_cut = cl.knearest_neighbour_cutoff(cov, maf, 1 / 100.0)
    comps, post, ids, lik = cl.gmm_em(
        np.array([0.45, 0.3]), np.array([95.0, 65.0]),
        maf, cov, w, 1 / 100.0, knn, knn_cut)
    assert np.isfinite(lik)
    # components move to the true centers
    mus = sorted((c.mu[1], c.mu[0]) for c in comps)
    assert mus[0][0] == pytest.approx(60, abs=3)
    assert mus[1][0] == pytest.approx(100, abs=3)
    # each blob assigned consistently (ignoring knn outliers)
    a = ids[:60][ids[:60] != cl.OUTLIER_CLUSTER_FLAG]
    b = ids[60:][ids[60:] != cl.OUTLIER_CLUSTER_FLAG]
    assert len(np.unique(a)) == 1
    assert len(np.unique(b)) == 1
    assert a[0] != b[0]


def test_silhouette_prefers_true_k(rng):
    centers = [(100, 0.49), (60, 0.25), (140, 0.4)]
    cov, maf = make_blobs(rng, centers, n_per=50)
    w = np.ones(len(cov))
    knn, knn_cut = cl.knearest_neighbour_cutoff(cov, maf, 1 / 100.0)
    scores = {}
    for k, inits in [(2, ([0.45, 0.3], [95.0, 65.0])),
                     (3, ([0.45, 0.3, 0.42], [95.0, 65.0, 135.0]))]:
        comps, post, ids, _ = cl.gmm_em(
            np.array(inits[0]), np.array(inits[1]), maf, cov, w,
            1 / 100.0, knn, knn_cut)
        scores[k] = cl.silhouette(maf, cov, ids, 1 / 100.0, k)
    assert scores[3] > scores[2]
