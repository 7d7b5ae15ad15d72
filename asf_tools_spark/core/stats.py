"""Flood-depth estimators and robust statistics (pure numpy; scipy absent).

Semantics from ref: src/asf_tools/hydrosar/flood_map.py:
- ``logstat``            (ref flood_map.py:124-137)
- ``nmad``               (scipy.stats.median_abs_deviation(scale='normal',
                          nan_policy='omit'), ref flood_map.py:165-166)
- ``estimate_flood_depth`` (ref flood_map.py:140-180)
- ``get_pw_threshold``   (ref flood_map.py:34-38)
- ``iterative_water_level`` — deterministic replacement for the reference's
  scipy basinhopping (ref flood_map.py:69-121), which the reference's own
  test suite disables as non-deterministic
  (ref tests/hydrosar/test_flood_map.py:35-43 FIXME). We minimize the same
  1-TS / 1-FMI goal exactly, by exhaustive search over the finite set of
  water levels where the confusion matrix can change.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np

# scipy.stats.norm.ppf(0.75) to double precision — the 'normal' MAD scale
_NORMAL_MAD_SCALE = 0.6744897501960817


def logstat(data: np.ndarray, func: Callable = np.nanstd) -> float:
    """Statistic computed in log space, returned in linear space
    (ref flood_map.py:124-137)."""
    ld = np.log(np.asarray(data, dtype=np.float64))
    ld[np.isinf(ld)] = np.nan
    return float(np.exp(func(ld)))


def nmad(data: np.ndarray) -> float:
    """Normalized median absolute deviation, NaNs omitted."""
    x = np.asarray(data, dtype=np.float64)
    x = x[~np.isnan(x)]
    med = np.median(x)
    return float(np.median(np.abs(x - med)) / _NORMAL_MAD_SCALE)


def confusion_counts(hand: np.ndarray, extent: np.ndarray, water_level: float) -> tuple[int, int, int, int]:
    """(tp, tn, fp, fn) of predicted flood ``hand < w`` vs observed extent
    (ref flood_map.py:75-81). NaN HAND pixels contribute to neither count of
    their predicted class per np.nansum over boolean ANDs."""
    pred = hand < water_level
    ext = extent.astype(bool)
    tp = int(np.nansum(np.logical_and(pred, ext)))
    tn = int(np.nansum(np.logical_and(~pred, ~ext)))
    fp = int(np.nansum(np.logical_and(pred, ~ext)))
    fn = int(np.nansum(np.logical_and(~pred, ext)))
    return tp, tn, fp, fn


def iterative_water_level(
    hand: np.ndarray,
    extent: np.ndarray,
    water_levels: np.ndarray = np.arange(15),
    minimization_metric: str = "ts",
) -> float:
    """Deterministic exact minimizer of the reference's iterative goal.

    The goal (1 - threat score or 1 - Fowlkes-Mallows, ref
    flood_map.py:83-90) is a step function of w: it changes only when w
    crosses a HAND value. We therefore evaluate every candidate level —
    midpoints between distinct in-bounds HAND values plus the bounds — and
    return the arg-min (lowest w on ties). Unlike basinhopping this is
    reproducible; divergence from the reference is documented and the
    reference's own golden test for it is disabled upstream.
    """
    lo, hi = float(np.min(water_levels)), float(np.max(water_levels))
    hv = np.unique(np.asarray(hand, dtype=np.float64))
    hv = hv[~np.isnan(hv)]
    hv = hv[(hv > lo) & (hv < hi)]
    candidates = np.concatenate([[lo], (hv[:-1] + hv[1:]) / 2 if hv.size > 1 else hv, [hi]])
    candidates = np.unique(np.concatenate([candidates, hv]))

    def goal(w: float) -> float:
        tp, _tn, fp, fn = confusion_counts(hand, extent, w)
        with np.errstate(divide="ignore", invalid="ignore"):
            if minimization_metric == "ts":
                v = 1.0 - tp / (tp + fp + fn) if (tp + fp + fn) else np.inf
            else:  # fmi
                v = 1.0 - np.sqrt((tp / (tp + fp)) * (tp / (tp + fn))) if (tp + fp) and (tp + fn) else np.inf
        return float(v)

    goals = np.array([goal(w) for w in candidates])
    if not np.isfinite(goals).any():
        return float(np.inf)
    return float(candidates[int(np.argmin(goals))])


def estimate_flood_depth(
    label: int,
    hand: np.ndarray,
    flood_labels: np.ndarray,
    estimator: str = "nmad",
    water_level_sigma: float = 3.0,
    iterative_bounds: tuple[int, int] = (0, 15),
    iterative_min_size: int = 0,
    minimization_metric: str = "ts",
) -> float:
    """Water height for one flood label (ref flood_map.py:140-180)."""
    est = estimator.lower()
    sel = np.asarray(hand, dtype=np.float64)[np.asarray(flood_labels) == label]

    if est == "iterative":
        if sel.size < iterative_min_size:
            return float(np.nan)
        water_levels = np.arange(*iterative_bounds)
        return iterative_water_level(
            np.asarray(hand, dtype=np.float64),
            np.asarray(flood_labels) == label,
            water_levels=water_levels,
            minimization_metric=minimization_metric,
        )
    if est == "nmad":
        hand_mean = float(np.nanmean(sel))
        hand_std = nmad(sel)
    elif est == "numpy":
        hand_mean = float(np.nanmean(sel))
        hand_std = float(np.nanstd(sel))
    elif est == "logstat":
        hand_mean = logstat(sel, func=np.nanmean)
        hand_std = logstat(sel)
    else:
        raise ValueError(f"Unknown flood depth estimator {estimator}")
    return hand_mean + water_level_sigma * hand_std


def get_pw_threshold(water_array: np.ndarray) -> float:
    """Reverse-CDF 95% threshold over a perennial-water density histogram
    (ref flood_map.py:34-38). Uses Python banker's rounding like the ref."""
    hist, bin_edges = np.histogram(water_array, density=True, bins=100)
    reverse_cdf = np.cumsum(np.flipud(hist)) * (bin_edges[1] - bin_edges[0])
    ths_orig = np.flipud(bin_edges)[np.searchsorted(np.array(reverse_cdf), 0.95)]
    return round(float(ths_orig)) + 1
