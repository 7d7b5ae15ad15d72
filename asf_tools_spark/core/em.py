"""Expectation-Maximization tile threshold — the golden-contract classifier.

Re-implements the *semantics* of the reference's EM water-threshold
(ref: src/asf_tools/hydrosar/threshold.py:40-133
``expectation_maximization_threshold`` and helpers :4-37) with vectorized
numpy instead of per-pixel Python loops. Validated against the reference's
golden fixtures (tests/hydrosar/data/em_thresholds.npz, asserted to
``np.isclose`` exactly like ref tests/hydrosar/test_threshold.py:6-10).

Deliberate, validated differences from the reference:
- the per-pixel histogram loop (ref threshold.py:14-20) is replaced by
  ``np.add.at`` scatter-adds (same bins, same fractional weights, same
  ``uint8`` floor-cast wrap semantics);
- the posterior-probability block (ref threshold.py:96-115) is *elided*: its
  result is never used by the returned threshold, which depends only on the
  fitted class params and the crossover search (ref threshold.py:117-133).
  The reference's own tests assert only the threshold.

This function runs *inside* an ``applyInPandas`` grouped-map UDF per selected
tile (tiles are ~100x100 — driver-scale math, parallel across tiles).
"""

from __future__ import annotations

import numpy as np


def _histogram(image: np.ndarray | np.ma.MaskedArray) -> np.ndarray:
    """Fractional-split histogram + [1,2,3,2,1] smoothing.

    Semantics of ref threshold.py:4-24 ``_make_histogram``: each pixel value
    v with f = floor(v) cast to uint8 (wrap included) contributes (v - f) to
    bin f and 1-(v-f) to bin f-1, only when 0 < f < maximum-1. NaN/Inf are
    zeroed first; masked pixels are skipped (masked comparisons are falsy in
    the reference's per-pixel loop).
    """
    vals = np.asarray(np.ma.getdata(image), dtype=np.float64).ravel()
    skip = np.zeros(vals.shape, dtype=bool)
    if isinstance(image, np.ma.MaskedArray):
        skip = np.ma.getmaskarray(image).ravel().copy()
    bad = ~np.isfinite(vals)
    vals = np.where(bad & ~skip, 0.0, vals)

    maximum = int(np.ceil(np.max(np.ma.masked_array(vals, mask=skip)))) + 1
    floor_vals = np.floor(vals).astype(np.uint8).astype(np.int64)  # uint8 wrap, ref :15
    use = ~skip & (floor_vals > 0) & (floor_vals < maximum - 1)

    hist = np.zeros(maximum, dtype=np.float64)
    frac = vals[use] - floor_vals[use]
    np.add.at(hist, floor_vals[use], frac)
    np.add.at(hist, floor_vals[use] - 1, 1.0 - frac)

    smoothed = np.convolve(hist, [1, 2, 3, 2, 1])
    smoothed = smoothed[2 : smoothed.size - 3]  # ref :22 slice
    return smoothed / np.sum(smoothed)


def _gaussians(means: np.ndarray, variances: np.ndarray, props: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Mixture component densities, shape (len(x), k). Ref threshold.py:27-37."""
    x = np.atleast_1d(np.asarray(x, dtype=np.float64))
    d = x[:, None] - means[None, :]
    amp = props / np.sqrt(2.0 * np.pi * variances)
    return amp[None, :] * np.exp(-0.5 * d * d / variances[None, :])


def em_threshold(tile: np.ndarray | np.ma.MaskedArray, number_of_classes: int = 3) -> float:
    """Fit a k-Gaussian mixture to the tile histogram; return the crossover
    of the two lowest-mean components (the water/land boundary).

    Input is the integer-scaled tile exactly as the reference feeds it
    (``np.around(tile * scaling).astype(int)``, ref water_map.py:87).
    """
    flat = tile.ravel()
    minimum = float(np.ma.min(flat))
    shifted = flat - minimum + 1
    maximum = float(np.ma.max(shifted))

    hist_full = _histogram(shifted)
    nonzero = np.nonzero(hist_full)[0]
    hist = hist_full[nonzero].astype(np.float64)
    x = nonzero.astype(np.float64)

    k = number_of_classes
    means = (np.arange(k, dtype=np.float64) + 1) * maximum / (k + 1)
    variances = np.ones(k) * maximum
    props = np.ones(k) / k
    sml = float(np.mean(np.diff(nonzero))) / 1000.0
    eps = np.finfo(np.float64).eps

    while True:
        lik = _gaussians(means, variances, props, x)
        sum_lik = lik.sum(axis=1) + eps
        log_likelihood = float(np.sum(hist * np.log(sum_lik)))
        # M-step, class by class (means update feeds the variance update,
        # matching ref threshold.py:77-83 ordering)
        for j in range(k):
            post = hist * lik[:, j] / sum_lik
            props[j] = post.sum()
            means[j] = float(np.sum(x * post)) / props[j]
            vr = x - means[j]
            variances[j] = float(np.sum(vr * vr * post)) / props[j] + sml
        props += 1e-3
        props /= props.sum()
        lik = _gaussians(means, variances, props, x)
        new_ll = float(np.sum(hist * np.log(lik.sum(axis=1) + eps)))
        if (new_ll - log_likelihood) < 1e-6:
            break

    means = means + minimum - 1
    order = np.argsort(means)
    xvec = np.arange(means[order[0]], means[order[1]], 0.05)
    g1 = _gaussians(means[order[0]: order[0] + 1], variances[order[0]: order[0] + 1],
                    props[order[0]: order[0] + 1], xvec)
    g2 = _gaussians(means[order[1]: order[1] + 1], variances[order[1]: order[1] + 1],
                    props[order[1]: order[1] + 1], xvec)
    dx = np.abs(g1 - g2)
    return float(xvec[int(np.argmin(dx))])


def determine_em_threshold(tiles: np.ndarray | np.ma.MaskedArray, scaling: float) -> float:
    """Median of the 4 lowest per-tile EM thresholds
    (ref water_map.py:84-90 ``determine_em_threshold``).

    numpy banker's rounding (``np.around``) is used on purpose — Spark's
    HALF_UP ``round`` would drift off the goldens (SURVEY §2.8 F6).
    """
    thresholds = []
    for ii in range(tiles.shape[0]):
        test_tile = np.around(tiles[ii] * scaling).astype(int)
        thresholds.append(em_threshold(test_tile) / scaling)
    return float(np.median(np.sort(thresholds)[:4]))
