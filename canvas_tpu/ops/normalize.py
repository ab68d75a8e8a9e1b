"""Bin cleanup + GC normalization (CanvasClean) and T/N ratio
normalization (CanvasNormalize).

Reference semantics (CanvasClean/CanvasClean.cs driver :415-533):
  1. RemoveBigBins — drop bins larger than the 98th size percentile (:328);
  2. RemoveOutliers — drop single-bin Poisson outliers: chi^2 vs both
     neighbors > 6.635 (99th pct, 1 dof) (:363-413);
  3. local SD metric — SDs of consecutive-count diffs over 20-bin windows,
     averaged per-chromosome MADs (:268-298);
  4. GC normalization — MedianByGC (divide by per-GC median, weighted
     neighbor fallback under 100 bins; :163-196) or LOESS (LoessGCNormalizer);
  5. RemoveBinsWithExtremeGC (:207-237);
  6. NormalizeVarianceByGC — IQR-based variance stabilization (:34-97);
  7. RemoveBinsWithExtremeLocalSD for FFPE (:308-322).

All steps are expressed as masks/vector ops over the flat BinSet arrays.
"""

from __future__ import annotations

import numpy as np

from canvas_tpu.io.bins import BinSet
from canvas_tpu.ops import stats

N_GC_BINS = 101
MIN_BINS_PER_GC = 100
CHI2_99TH_1DOF = 6.635


# ---------------------------------------------------------------------------
# Outlier removal
# ---------------------------------------------------------------------------

def remove_big_bins(bins: BinSet) -> BinSet:
    """Drop bins above the 98th size percentile (CanvasClean.cs:328-355)."""
    sizes = np.sort(bins.sizes)
    index = int(0.98 * len(bins))
    if index >= len(sizes):
        return bins
    thresh = sizes[index]
    return bins.select(bins.sizes <= thresh)


def _significantly_different(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Chi^2 test that two Poisson counts differ (CanvasClean.cs:363-381)."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mu = (a + b) / 2.0
    tot = a + b
    with np.errstate(divide="ignore", invalid="ignore"):
        chi2 = ((a - mu) ** 2 + (b - mu) ** 2) / mu
    return np.where(tot == 0, False, chi2 > CHI2_99TH_1DOF)


def remove_outliers(bins: BinSet) -> BinSet:
    """Drop bins significantly different from BOTH neighbors
    (CanvasClean.cs:387-413).  A bin is kept if it agrees with at least one
    same-chromosome neighbor (or has no same-chromosome neighbors at all but
    is the only bin)."""
    n = len(bins)
    if n == 0:
        return bins
    c = bins.contig_id
    cnt = bins.count
    has_prev = np.zeros(n, dtype=bool)
    has_prev[1:] = c[1:] == c[:-1]
    has_next = np.zeros(n, dtype=bool)
    has_next[:-1] = c[:-1] == c[1:]
    diff_prev = np.zeros(n, dtype=bool)
    diff_prev[1:] = _significantly_different(cnt[1:], cnt[:-1])
    diff_next = np.zeros(n, dtype=bool)
    diff_next[:-1] = _significantly_different(cnt[:-1], cnt[1:])
    # note: the reference's first clause requires a previous bin in the file
    # (any chromosome) but same-chromosome equality for the comparison
    raw_prev = np.zeros(n, dtype=bool)
    raw_prev[1:] = True
    raw_next = np.zeros(n, dtype=bool)
    raw_next[:-1] = True
    keep = (
        (has_prev & ~diff_prev)
        | (has_next & ~diff_next)
        | (~raw_prev & ~raw_next)
    )
    # bins flanked by different chromosomes on both sides are dropped first
    isolated = (raw_prev & ~has_prev) & (raw_next & ~has_next)
    keep &= ~isolated
    return bins.select(keep)


# ---------------------------------------------------------------------------
# Local SD metric (FFPE detection)
# ---------------------------------------------------------------------------

def local_standard_deviation(bins: BinSet) -> tuple[float, np.ndarray]:
    """Per-20-bin-window SD of consecutive count diffs; returns
    (average of per-chromosome MADs of window SDs, per-bin deviation array)
    (CanvasClean.cs:268-298)."""
    n = len(bins)
    diffs = np.diff(bins.count.astype(np.float64))
    window = 20
    dev = np.zeros(n, dtype=np.float64)
    local_sds: list[float] = []
    window_chroms: list[int] = []
    ws = 0
    we = window
    while we < len(diffs):
        sd = stats.stddev(diffs, ws, we)
        local_sds.append(sd)
        window_chroms.append(int(bins.contig_id[ws]))
        dev[ws:we] = sd
        ws += window
        we += window
    if not local_sds:
        return -1.0, dev
    # average per-chromosome MAD (GetLocalStandardDeviationAverage :243-258)
    mads = []
    i_start = 0
    for i in range(len(local_sds)):
        if window_chroms[i] != window_chroms[i_start]:
            mads.append(stats.mad(local_sds, i_start, i))
            i_start = i
    mads.append(stats.mad(local_sds, i_start, len(local_sds)))
    return float(np.mean(mads)), dev


def remove_extreme_local_sd(
    bins: BinSet, dev: np.ndarray, local_sd_average: float,
    threshold: float = 20.0) -> BinSet:
    """Strip FFPE bins: dev > 2*threshold when sample average > 5
    (CanvasClean.cs:308-322)."""
    drop = (dev > threshold * 2.0) & (local_sd_average > 5.0)
    return bins.select(~drop)


# ---------------------------------------------------------------------------
# GC normalization
# ---------------------------------------------------------------------------

def _autosome_counts_by_gc(bins: BinSet):
    auto = bins.contigs.autosome_mask()[bins.contig_id]
    counts = bins.count[auto].astype(np.float64)
    gcs = np.asarray(bins.gc[auto], dtype=np.int64)
    return gcs, counts


def _weighted_counts_for_gc(counts_by_gc: list[np.ndarray], gc_bin: int,
                            min_count: int = MIN_BINS_PER_GC):
    """Neighbor-weighted fallback values/weights (CanvasClean.cs:107-132)."""
    values, weights = [], []
    radius, weight, total = 0, 1.0, 0
    while total < min_count:
        hi, lo = gc_bin + radius, gc_bin - radius
        if hi >= N_GC_BINS and lo < 0:
            break
        if hi < N_GC_BINS:
            values.append(counts_by_gc[hi])
            weights.append(np.full(len(counts_by_gc[hi]), weight))
            total += len(counts_by_gc[hi])
        if lo != hi and lo >= 0:
            values.append(counts_by_gc[lo])
            weights.append(np.full(len(counts_by_gc[lo]), weight))
            total += len(counts_by_gc[lo])
        radius += 1
        weight /= 2.0
    if not values:
        return np.zeros(0), np.zeros(0)
    return np.concatenate(values), np.concatenate(weights)


def _split_by_gc(gcs: np.ndarray, counts: np.ndarray) -> list[np.ndarray]:
    return [counts[gcs == g] for g in range(N_GC_BINS)]


def normalize_by_gc_median(bins: BinSet,
                           min_bins: int = MIN_BINS_PER_GC) -> BinSet:
    """MedianByGC: count *= globalMedian / medianOfSameGC
    (CanvasClean.cs:163-196).  Medians over autosomal bins only; min_bins
    is CanvasClean's -w/--weightedmedian threshold."""
    gcs, counts = _autosome_counts_by_gc(bins)
    by_gc = _split_by_gc(gcs, counts)
    global_median = stats.median(counts.astype(np.float32))
    medians = np.full(N_GC_BINS, np.nan)
    for g in range(N_GC_BINS):
        if len(by_gc[g]) >= min_bins:
            medians[g] = stats.median(by_gc[g].astype(np.float32))
        else:
            v, w = _weighted_counts_for_gc(by_gc, g, min_count=min_bins)
            if len(v):
                medians[g] = stats.weighted_median(v, w)
    med_of_bin = medians[np.asarray(bins.gc, dtype=np.int64)]
    ok = np.isfinite(med_of_bin) & (med_of_bin > 0)
    new_counts = np.where(
        ok, (global_median * bins.count.astype(np.float64) / med_of_bin),
        bins.count.astype(np.float64))
    return bins.with_count(new_counts.astype(np.float32))


def extreme_gc_keep_mask(
    bins: BinSet, threshold: int = MIN_BINS_PER_GC,
    min_for_weighted: int = MIN_BINS_PER_GC) -> np.ndarray:
    """Keep-mask for bins whose GC value has enough autosomal bins
    (CanvasClean.cs:207-237)."""
    gcs, counts = _autosome_counts_by_gc(bins)
    gc_counts = np.bincount(gcs, minlength=N_GC_BINS)
    total = gc_counts.sum()
    avg_per_gc = max(min_for_weighted, int(total / N_GC_BINS))
    threshold = min(threshold, avg_per_gc)
    return gc_counts[np.asarray(bins.gc, dtype=np.int64)] >= threshold


def remove_bins_with_extreme_gc(
    bins: BinSet, threshold: int = MIN_BINS_PER_GC,
    min_for_weighted: int = MIN_BINS_PER_GC) -> BinSet:
    """Drop bins whose GC value has too few autosomal bins
    (CanvasClean.cs:207-237)."""
    return bins.select(extreme_gc_keep_mask(bins, threshold, min_for_weighted))


def normalize_variance_by_gc(bins: BinSet) -> tuple[BinSet, bool]:
    """IQR-based variance stabilization per GC bin (CanvasClean.cs:34-97).
    Returns (bins, applied?)."""
    gcs, counts = _autosome_counts_by_gc(bins)
    by_gc = _split_by_gc(gcs, counts)
    gq = stats.quartiles(counts.astype(np.float32))
    global_iqr = gq[2] - gq[0]
    local_iqr = np.full(N_GC_BINS, -1.0)
    local_median = np.full(N_GC_BINS, -1.0)
    for g in range(N_GC_BINS):
        if len(by_gc[g]) == 0:
            continue
        if len(by_gc[g]) >= MIN_BINS_PER_GC:
            q = stats.quartiles(by_gc[g].astype(np.float32))
        else:
            v, w = _weighted_counts_for_gc(by_gc, g)
            qq = stats.weighted_quantiles(v, w, [0.25, 0.5, 0.75])
            q = (qq[0], qq[1], qq[2])
        local_iqr[g] = q[2] - q[0]
        local_median[g] = q[1]
    significant = int(np.sum(global_iqr * 2.0 < local_iqr[10:90]))
    if significant <= 0:
        return bins, False
    gc_of_bin = np.asarray(bins.gc, dtype=np.int64)
    scaled = local_iqr[gc_of_bin] * 0.8
    apply = global_iqr < scaled
    iqr_ratio = np.where(apply, scaled / global_iqr, 1.0)
    med = local_median[gc_of_bin]
    new_counts = np.where(
        apply, med + (bins.count - med) / iqr_ratio, bins.count)
    return bins.with_count(new_counts.astype(np.float32)), True


# ---------------------------------------------------------------------------
# LOESS GC normalization (LoessGCNormalizer.cs + LoessInterpolator.cs)
# ---------------------------------------------------------------------------

def _loess_window_bounds(x_sorted: np.ndarray, n_window: int) -> np.ndarray:
    """For each unique prediction x, the [left, right] index window of the
    n_window nearest points, computed with the reference's sliding rule
    (LoessInterpolator.cs:271-301): advance while the next right point is
    closer than the current leftmost."""
    n = len(x_sorted)
    left, right = 0, n_window - 1
    bounds = []
    for x in x_sorted:
        while right < n - 1 and x > x_sorted[right]:
            left += 1
            right += 1
        while right < n - 1 and x_sorted[right + 1] - x < x - x_sorted[left]:
            left += 1
            right += 1
        bounds.append((left, right))
    return np.asarray(bounds)


def _loess_predict_walk(
    xs: np.ndarray, ys: np.ndarray, rw: np.ndarray | None,
    queries_sorted_order: np.ndarray, queries: np.ndarray,
    n_window: int) -> np.ndarray:
    """Evaluate the weighted local linear fit at each query, walking the
    sliding bandwidth window in ascending-x order (LoessInterpolator.cs
    updateBandwidthInterval :271-301 + computeCoefficients :198-259)."""
    n = len(xs)
    out = np.empty(len(queries))
    left, right = 0, n_window - 1
    for pi in queries_sorted_order:
        xq = queries[pi]
        while right < n - 1 and xq > xs[right]:
            left += 1
            right += 1
        while right < n - 1 and xs[right + 1] - xq < xq - xs[left]:
            left += 1
            right += 1
        xw = xs[left:right + 1]
        yw = ys[left:right + 1]
        edge = xs[left] if (xq - xs[left]) > (xs[right] - xq) else xs[right]
        denom = abs(1.0 / (edge - xq)) if edge != xq else np.inf
        dist = np.abs(xq - xw) * denom
        w = np.clip(1 - dist ** 3, 0, None) ** 3
        if rw is not None:
            w = w * rw[left:right + 1]
        sw = w.sum()
        mean_x = (xw * w).sum() / sw
        mean_y = (yw * w).sum() / sw
        mean_xy = (xw * yw * w).sum() / sw
        mean_x2 = (xw * xw * w).sum() / sw
        denom2 = mean_x2 - mean_x * mean_x
        beta = 0.0 if denom2 == 0 else (mean_xy - mean_x * mean_y) / denom2
        alpha = mean_y - beta * mean_x
        out[pi] = alpha + beta * xq
    return out


def loess_fit_predict(
    x: np.ndarray, y: np.ndarray, x_pred: np.ndarray, bandwidth: float,
    robustness_iters: int = 0,
) -> np.ndarray:
    """Degree-1 LOESS with tricube weights; reference window semantics.

    robustness_iters > 0 runs the Apache-style bisquare reweighting loop
    (LoessInterpolator.cs:131-172): refit with robustness weights
    (1-(res/(6*medianRes))^2)^2, zero beyond 6x the median residual.

    Vectorised per prediction point over its window (windows are large —
    bandwidth*n points — but x_pred is ~101 integer GC values)."""
    order = np.argsort(x, kind="stable")
    xs, ys = x[order], y[order]
    n = len(xs)
    n_window = int(np.ceil(bandwidth * n))
    n_window = max(n_window, 2)
    rw = None
    if robustness_iters > 0:
        rw = np.ones(n)
        data_order = np.arange(n)
        for _ in range(robustness_iters):
            fitted = _loess_predict_walk(xs, ys, rw, data_order, xs, n_window)
            residuals = np.abs(ys - fitted)
            median_res = stats.median(residuals)
            if median_res == 0:
                break
            arg = residuals / (6.0 * median_res)
            rw = np.where(arg >= 1, 0.0, (1 - arg * arg) ** 2)
    p_order = np.argsort(x_pred, kind="stable")
    return _loess_predict_walk(xs, ys, rw, p_order, x_pred, n_window)


def golden_section_search(f, a: float, b: float, tol: float = 1e-5) -> float:
    """Utilities.cs:1014-1044."""
    gr = 0.618034
    c = b - gr * (b - a)
    d = a + gr * (b - a)
    fc, fd = f(c), f(d)
    while abs(d - c) > tol:
        if fc < fd:
            b, d, fd = d, c, fc
            c = b - gr * (b - a)
            fc = f(c)
        else:
            a, c, fc = c, d, fd
            d = a + gr * (b - a)
            fd = f(d)
    return (b + a) / 2


def normalize_by_gc_loess(bins: BinSet) -> BinSet:
    """LOESS GC normalization with log-transformed counts and
    golden-section bandwidth search in [0.3, 0.75], excluding chrY from the
    bandwidth fit (LoessGCNormalizer.cs:61-91)."""
    with np.errstate(divide="ignore"):
        logc = np.log(bins.count.astype(np.float64))
    finite = np.isfinite(logc)
    gcs = np.asarray(bins.gc, dtype=np.float64)[finite]
    counts = logc[finite]
    chry = np.array([
        bins.contigs.names[c].lower() in ("chry", "y")
        for c in bins.contig_id[finite]])
    gcs_fit, counts_fit = gcs[~chry], counts[~chry]

    def objective(bw: float) -> float:
        med = stats.median(counts_fit)
        min_gc, max_gc = int(gcs_fit.min()), int(gcs_fit.max())
        x_pred = np.arange(min_gc, min_gc + max_gc, dtype=np.float64)
        fitted = loess_fit_predict(gcs_fit, counts_fit, x_pred, bw)
        idx = gcs_fit.astype(np.int64) - min_gc
        normalized = counts_fit - fitted[idx] + med
        fitted2 = loess_fit_predict(gcs_fit, normalized, x_pred, bw)
        return stats.stddev(fitted2[idx])

    lo = max(2.0 / len(gcs_fit), 0.3)
    hi = min(1.0, 0.75)
    best_bw = golden_section_search(objective, lo, max(hi, lo))

    med = stats.median(counts)
    min_gc, max_gc = int(gcs.min()), int(gcs.max())
    x_pred = np.arange(min_gc, min_gc + max_gc, dtype=np.float64)
    fitted = loess_fit_predict(gcs, counts, x_pred, best_bw)
    idx = np.clip(np.asarray(bins.gc, dtype=np.int64) - min_gc,
                  0, len(fitted) - 1)
    smoothed = logc - fitted[idx] + med
    return bins.with_count(np.exp(smoothed).astype(np.float32))


# ---------------------------------------------------------------------------
# Full CanvasClean driver
# ---------------------------------------------------------------------------

def clean(
    bins: BinSet,
    do_size_filter: bool = True,
    do_outlier_removal: bool = True,
    do_gc_norm: bool = True,
    mode: str = "MedianByGC",
    compute_local_sd: bool = False,
    min_bins_per_gc: int = MIN_BINS_PER_GC,
) -> tuple[BinSet, float | None]:
    """CanvasClean.Main pipeline (CanvasClean.cs:415-533).
    Returns (cleaned bins, localSd metric or None)."""
    if do_size_filter:
        bins = remove_big_bins(bins)
    if do_outlier_removal:
        bins = remove_outliers(bins)
    local_sd = None
    dev = None
    if compute_local_sd and len(bins) >= 50000:
        local_sd, dev = local_standard_deviation(bins)
    if do_gc_norm:
        if mode == "MedianByGC":
            keep = extreme_gc_keep_mask(bins)
            stripped = bins.select(keep)
        else:
            keep = np.ones(len(bins), dtype=bool)
            stripped = bins
        if len(stripped) > 0:
            bins = stripped
            if dev is not None:
                # the reference stores CountDeviation on each bin object
                # (CanvasClean.cs:289-292), so it survives the extreme-GC
                # strip; carry it through the mask here.
                dev = dev[keep]
            if mode == "MedianByGC":
                bins = normalize_by_gc_median(bins, min_bins=min_bins_per_gc)
            else:
                bins = normalize_by_gc_loess(bins)
            if local_sd is not None and len(bins) > 500000:
                bins, applied = normalize_variance_by_gc(bins)
                if applied:
                    bins = (normalize_by_gc_median(bins,
                                                   min_bins=min_bins_per_gc)
                            if mode == "MedianByGC"
                            else normalize_by_gc_loess(bins))
    if local_sd is not None and dev is not None:
        bins = remove_extreme_local_sd(bins, dev, local_sd)
    return bins, local_sd
