"""Order statistics with the reference Canvas tie conventions.

The reference computes medians/quartiles with specific tie rules
(CanvasCommon/Utilities.cs:340-529).  These run on small host arrays (per-GC
medians over 101 buckets, per-segment medians) so they are implemented in
numpy at float64; device-side (masked, vmappable) versions are provided for
the fused per-segment reductions used by the callers.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Host (numpy) versions — exact reference semantics.
# ---------------------------------------------------------------------------

def _sort_csharp(x) -> np.ndarray:
    """Sort like C# List<double>.Sort(): NaN compares LESS than everything
    (Double.CompareTo), so NaNs go first; numpy puts them last.  Matters for
    reference-parity when upstream ratios produce NaN (e.g. MAD/median over
    an all-zero window, Segmentation.cs:343)."""
    a = np.sort(np.asarray(x, dtype=np.float64))  # numpy: NaNs sort last
    n_nan = int(np.count_nonzero(np.isnan(a)))
    if n_nan:
        a = np.concatenate([a[a.size - n_nan:], a[:a.size - n_nan]])
    return a


def median(x) -> float:
    """Median with average-of-middle-two on even length (Utilities.cs:340)."""
    a = _sort_csharp(x)
    n = a.size
    if n == 0:
        raise ValueError("median of empty array")
    mid = n // 2
    if n % 2 == 1:
        return float(a[mid])
    return float((a[mid - 1] + a[mid]) / 2.0)


def median_int(x) -> int:
    """Integer median: average of middle two with C# integer division."""
    a = np.sort(np.asarray(x, dtype=np.int64))
    n = a.size
    mid = n // 2
    if n % 2 == 1:
        return int(a[mid])
    s = int(a[mid - 1]) + int(a[mid])
    # C# integer division truncates toward zero.
    return int(np.trunc(s / 2))


def mad(x, start: int = 0, end: int | None = None) -> float:
    """Median absolute deviation (Utilities.cs:451)."""
    a = np.asarray(x, dtype=np.float64)[start:end]
    m = median(a)
    return median(np.abs(a - m))


def quartiles(x) -> tuple[float, float, float]:
    """(Q1, median, Q3) with the reference's split rules (Utilities.cs:361-419).

    Even n: halves split at the median, quartile = median of each half.
    n = 4k+1: Q1 = 0.25*x[k-1] + 0.75*x[k]; Q3 = 0.75*x[3k] + 0.25*x[3k+1].
    n = 4k+3: Q1 = 0.75*x[k]   + 0.25*x[k+1]; Q3 = 0.25*x[3k+1] + 0.75*x[3k+2].
    """
    a = _sort_csharp(x)
    n = a.size
    if n == 1:
        return float(a[0]), float(a[0]), float(a[0])
    mid = n // 2
    if n % 2 == 0:
        q2 = (a[mid - 1] + a[mid]) / 2.0
        mm = mid // 2
        if mid % 2 == 0:
            q1 = (a[mm - 1] + a[mm]) / 2.0
            q3 = (a[mid + mm - 1] + a[mid + mm]) / 2.0
        else:
            q1 = a[mm]
            q3 = a[mm + mid]
    else:
        q2 = a[mid]
        if (n - 1) % 4 == 0:
            k = (n - 1) // 4
            q1 = a[k - 1] * 0.25 + a[k] * 0.75
            q3 = a[3 * k] * 0.75 + a[3 * k + 1] * 0.25
        elif (n - 3) % 4 == 0:
            k = (n - 3) // 4
            q1 = a[k] * 0.75 + a[k + 1] * 0.25
            q3 = a[3 * k + 1] * 0.25 + a[3 * k + 2] * 0.75
        else:  # n == 1
            q1 = q2
            q3 = q2
    return float(q1), float(q2), float(q3)


def weighted_quantiles(values, weights, probs) -> np.ndarray:
    """Reference WeightedQuantiles (Utilities.cs:493-515).

    Returns, for each prob p, the LAST sorted value whose cumulative
    probability is still <= p (the reference keeps overwriting while
    cumulativeProb <= p); values with cumulative prob > p never overwrite.
    """
    v = np.asarray(values, dtype=np.float64)
    w = np.asarray(weights, dtype=np.float64)
    if np.any(w < 0):
        raise ValueError("Weight cannot be negative.")
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cum = np.cumsum(w) / np.sum(w)
    out = np.zeros(len(probs), dtype=np.float64)
    for i, p in enumerate(probs):
        mask = cum <= p
        if mask.any():
            out[i] = v[np.nonzero(mask)[0][-1]]
        else:
            out[i] = 0.0
    return out


def weighted_median(values, weights) -> float:
    return float(weighted_quantiles(values, weights, [0.5])[0])


def weighted_mean(x, weights) -> float:
    x = np.asarray(x, dtype=np.float64)
    w = np.asarray(weights, dtype=np.float64)
    return float(np.sum(x * w) / np.sum(w))


def variance(x) -> float:
    """Sample variance, n-1 denominator (Utilities.cs:290)."""
    a = np.asarray(x, dtype=np.float64)
    mu = a.mean()
    return float(np.sum((a - mu) ** 2) / (a.size - 1))


def stddev(x, start: int = 0, end: int | None = None) -> float:
    a = np.asarray(x, dtype=np.float64)[start:end]
    return float(np.sqrt(variance(a)))


def coefficient_of_variation(x) -> float:
    """stddev/mean with n (not n-1) denominator (Utilities.cs:536)."""
    a = np.asarray(x, dtype=np.float64)
    mu = a.mean()
    sd = np.sqrt(np.sum((a - mu) ** 2) / a.size)
    return float(sd / mu)


def median_filter(values, half_window: int) -> np.ndarray:
    """Rolling median with shrinking windows at the edges
    (Utilities.cs:767, used by CanvasSmooth)."""
    a = np.asarray(values, dtype=np.float64)
    n = a.size
    out = np.empty(n)
    for i in range(n):
        lo = max(0, i - half_window)
        hi = min(n, i + half_window + 1)
        out[i] = median(a[lo:hi])
    return out


# ---------------------------------------------------------------------------
# Device (jnp) versions — masked, vmappable.  Same tie conventions.
# ---------------------------------------------------------------------------

# numpy scalar, NOT jnp: a module-level jnp constant initializes the XLA
# backend at import, which breaks jax.distributed.initialize() in
# multi-host CLI runs (it must run before any backend init)
_BIG = np.float32(3.4e38)


def masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median of x[mask] along the last axis, average-of-middle-two.

    Invalid entries are sorted to the end with +inf sentinels; the median
    indices are computed from the valid count.  Returns NaN when count==0.
    """
    x = jnp.where(mask, x, jnp.inf)
    s = jnp.sort(x, axis=-1)
    n = jnp.sum(mask, axis=-1)
    mid = n // 2
    lo = jnp.take_along_axis(s, jnp.maximum(mid - 1, 0)[..., None], axis=-1)[..., 0]
    hi = jnp.take_along_axis(s, jnp.minimum(mid, x.shape[-1] - 1)[..., None], axis=-1)[..., 0]
    odd = (n % 2) == 1
    med = jnp.where(odd, hi, (lo + hi) / 2)
    return jnp.where(n > 0, med, jnp.nan)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    n = jnp.sum(mask, axis=-1)
    s = jnp.sum(jnp.where(mask, x, 0), axis=-1)
    return jnp.where(n > 0, s / jnp.maximum(n, 1), jnp.nan)


def masked_mad(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    med = masked_median(x, mask)
    return masked_median(jnp.abs(x - med[..., None]), mask)


def masked_quartiles(x: jnp.ndarray, mask: jnp.ndarray):
    """Vectorised version of `quartiles` over the last axis."""
    xs = jnp.sort(jnp.where(mask, x, jnp.inf), axis=-1)
    n = jnp.sum(mask, axis=-1)
    mid = n // 2

    def at(i):
        i = jnp.clip(i, 0, x.shape[-1] - 1)
        return jnp.take_along_axis(xs, i[..., None], axis=-1)[..., 0]

    # even-n path
    q2_e = (at(mid - 1) + at(mid)) / 2
    mm = mid // 2
    even_mid = (mid % 2) == 0
    q1_e = jnp.where(even_mid, (at(mm - 1) + at(mm)) / 2, at(mm))
    q3_e = jnp.where(even_mid, (at(mid + mm - 1) + at(mid + mm)) / 2, at(mm + mid))
    # odd-n path
    q2_o = at(mid)
    k1 = (n - 1) // 4
    k3 = (n - 3) // 4
    is41 = ((n - 1) % 4) == 0
    q1_o = jnp.where(is41, at(k1 - 1) * 0.25 + at(k1) * 0.75,
                     at(k3) * 0.75 + at(k3 + 1) * 0.25)
    q3_o = jnp.where(is41, at(3 * k1) * 0.75 + at(3 * k1 + 1) * 0.25,
                     at(3 * k3 + 1) * 0.25 + at(3 * k3 + 2) * 0.75)
    odd = (n % 2) == 1
    q1 = jnp.where(odd, q1_o, q1_e)
    q2 = jnp.where(odd, q2_o, q2_e)
    q3 = jnp.where(odd, q3_o, q3_e)
    one = n == 1
    q1 = jnp.where(one, q2, q1)
    q3 = jnp.where(one, q2, q3)
    bad = n == 0
    nanify = lambda q: jnp.where(bad, jnp.nan, q)
    return nanify(q1), nanify(q2), nanify(q3)
