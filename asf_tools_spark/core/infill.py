"""Gaussian NaN infill — numpy core of the astropy kernel interpolation.

Semantics of ref: src/asf_tools/hydrosar/hand/calculate.py:25-37
``fill_nan``: replace each NaN with the Gaussian-kernel weighted mean of its
non-NaN neighbors (astropy ``interpolate_replace_nans``), iterating until no
NaNs remain. Kernel: Gaussian2DKernel(x_stddev=3) -> size 8*stddev+1,
normalized.
"""

from __future__ import annotations

import numpy as np


def gaussian_kernel(stddev: float = 3.0) -> np.ndarray:
    size = int(8 * stddev) + 1
    half = size // 2
    y, x = np.mgrid[-half : half + 1, -half : half + 1]
    k = np.exp(-(x * x + y * y) / (2.0 * stddev * stddev))
    return k / k.sum()


def interpolate_replace_nans(array: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """One astropy-style pass: NaN pixels get sum(w*v)/sum(w) over non-NaN
    neighbors; non-NaN pixels are unchanged; NaNs with no valid neighbor in
    the window stay NaN. Direct (FFT-free) convolution via stride tricks."""
    a = np.asarray(array, dtype=np.float64)
    nan_mask = np.isnan(a)
    if not nan_mask.any():
        return a.copy()
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    padded = np.pad(a, ((ph, ph), (pw, pw)), constant_values=np.nan)
    valid = ~np.isnan(padded)
    vals = np.where(valid, padded, 0.0)

    num = np.zeros_like(a)
    den = np.zeros_like(a)
    h, w = a.shape
    for i in range(kh):
        for j in range(kw):
            wgt = kernel[i, j]
            num += wgt * vals[i : i + h, j : j + w]
            den += wgt * valid[i : i + h, j : j + w]
    out = a.copy()
    with np.errstate(invalid="ignore", divide="ignore"):
        repl = num / den
    out[nan_mask] = repl[nan_mask]
    return out


def fill_nan(array: np.ndarray, stddev: float = 3.0, max_iters: int = 1000) -> np.ndarray:
    """Iterate until no NaNs remain (ref calculate.py:32-36)."""
    kernel = gaussian_kernel(stddev)
    out = np.asarray(array, dtype=np.float64).copy()
    for _ in range(max_iters):
        if not np.isnan(out).any():
            break
        nxt = interpolate_replace_nans(out, kernel)
        if np.array_equal(np.isnan(nxt), np.isnan(out)):
            break  # no progress (isolated all-NaN region larger than kernel)
        out = nxt
    return out


def fill_hand(hand: np.ndarray, dem: np.ndarray) -> np.ndarray:
    """ref calculate.py:40-54: infill HAND via interpolated HOND."""
    hond = fill_nan(dem - hand)
    out = np.asarray(hand, dtype=np.float64).copy()
    mask = np.isnan(out)
    out[mask] = np.asarray(dem, dtype=np.float64)[mask] - hond[mask]
    out[out < 0] = 0
    return out
