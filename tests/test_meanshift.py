"""Mean-shift clustering + somatic windowing machinery."""

import numpy as np
import pytest

from canvas_tpu.models import somatic as som
from canvas_tpu.models.segment_model import Segment
from canvas_tpu.ops import meanshift as ms


def test_mean_shift_two_clusters(rng):
    a = rng.normal([0.25, 0.48], 0.002, size=(60, 2))
    b = rng.normal([0.35, 0.20], 0.002, size=(40, 2))
    pts = np.concatenate([a, b])
    res = ms.mean_shift(pts)
    assert res.n_clusters >= 2
    la, lb = res.labels[:60], res.labels[60:]
    # each blob is dominated by one label, and they differ
    ma = np.bincount(la).argmax()
    mb = np.bincount(lb).argmax()
    assert ma != mb
    assert np.mean(la == ma) > 0.9
    assert np.mean(lb == mb) > 0.9
    # modes land near the blob centers
    assert any(np.allclose(m, [0.25, 0.48], atol=0.01) for m in res.modes)
    assert any(np.allclose(m, [0.35, 0.20], atol=0.01) for m in res.modes)


def test_mean_shift_decide_nearest_seed(rng):
    pts = rng.normal([0.5, 0.3], 0.002, size=(30, 2))
    res = ms.mean_shift(pts)
    far = np.array([[0.9, 0.9]])
    # decide() works for arbitrary points (assignment via nearest seed)
    assert res.decide(far).shape == (1,)


def test_pruned_centers_requires_three_consecutive():
    modes = np.array([[0.1, 0.1], [0.5, 0.5]])
    seeds = modes.copy()
    res = ms.MeanShiftResult(modes, seeds, np.array([0, 1]),
                             np.zeros(0, np.int64))
    # cluster 0 has a 3-consecutive run; cluster 1 appears only scattered
    labels = np.array([0, 0, 0, 1, 0, 1, 0, 0, 1])
    good, cov, maf, size = ms.pruned_centers(res, labels, 400.0)
    assert list(good) == [0]
    assert cov == pytest.approx([0.1 * 400.0])
    assert maf == pytest.approx([0.1])


def _segment(chrom, begin, end, n_bins, coverage, mafs=None, positions=None):
    starts = begin + np.arange(n_bins) * ((end - begin) // n_bins)
    return Segment(
        chrom, begin, end,
        np.full(n_bins, coverage, dtype=np.float32),
        bin_starts=starts,
        baf_positions=np.asarray(positions if positions is not None else [],
                                 dtype=np.int64),
        baf_frequencies=np.asarray(mafs if mafs is not None else [],
                                   dtype=np.float32),
    )


def test_split_segment_windows_partitions_bins_and_alleles():
    pos = np.arange(0, 1_200_000, 10_000)
    seg = _segment("chr1", 0, 1_200_000, 600, 100.0,
                   mafs=np.full(len(pos), 0.5), positions=pos)
    wins = som.split_segment_windows(seg, 500_000)
    assert [(w.begin, w.end) for w in wins] == [
        (0, 500_000), (500_000, 1_000_000), (1_000_000, 1_200_000)]
    assert sum(len(w.bin_counts) for w in wins) == 600
    assert sum(len(w.baf_frequencies) for w in wins) == len(pos)
    assert len(wins[0].baf_frequencies) == 50


def test_windowed_usable_segments_sources():
    pos = np.arange(0, 1_000_000, 5_000)
    seg = _segment("chr1", 0, 1_000_000, 500, 100.0,
                   mafs=np.full(len(pos), 0.45), positions=pos)
    infos = som.get_usable_segments([seg], min_vf=5)
    windowed = som.windowed_usable_segments(infos, 100.0, min_vf=5)
    assert len(windowed) == 2
    for win, src in windowed:
        assert src is infos[0]
        assert win.coverage == pytest.approx(100.0)
        assert win.maf == pytest.approx(0.45)


def test_not_all_reference_ploidy_detection():
    # diploid background + one enormous, wildly deviant segment; coverage
    # noise gives the within-segment CVs a nonzero scale
    rng = np.random.default_rng(5)
    pos = np.arange(0, 500_000, 5_000)
    segs = []
    for i in range(4):
        s = _segment("chr1", i * 500_000, (i + 1) * 500_000, 250, 100.0,
                     mafs=np.full(100, 0.48), positions=pos[:100] + i * 500_000)
        s.bin_counts += rng.normal(0, 2.0, 250).astype(np.float32)
        segs.append(s)
    big = _segment("chr2", 0, 60_000_000, 1000, 300.0,
                   mafs=np.full(200, 0.1),
                   positions=np.arange(200) * 300_000)
    big.bin_counts += rng.normal(0, 2.0, 1000).astype(np.float32)
    infos = som.get_usable_segments(segs + [big], min_vf=5)
    windowed = som.windowed_usable_segments(infos, 100.0, min_vf=5)
    # huge deviant weight (60 Mb) -> clearly not all reference
    assert som.is_sample_clearly_not_all_reference_ploidy(
        infos, windowed, 100, 0.48)
    # without the big segment, everything matches the medians
    infos2 = som.get_usable_segments(segs, min_vf=5)
    windowed2 = som.windowed_usable_segments(infos2, 100.0, min_vf=5)
    assert not som.is_sample_clearly_not_all_reference_ploidy(
        infos2, windowed2, 100, 0.48)
