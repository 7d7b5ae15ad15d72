"""Candidate-tile selection — driver-side logic over per-tile statistics.

The reference computes these from full pixel stacks
(ref: src/asf_tools/hydrosar/water_map.py:43-90). In the Spark engine the
*statistics* (valid fraction, per-tile median, sub-tile-mean std) are
distributed aggregates (one row per tile); the selection itself runs on that
tiny stats table with the reference's exact numpy semantics — including
``np.nanpercentile`` linear interpolation and the progressive 95th->5th
percentile relaxation ladder.
"""

from __future__ import annotations

import numpy as np


def select_hand_tiles_from_stats(
    tile_ids: np.ndarray,
    valid_low_fraction: np.ndarray,
    all_zero: bool,
    hand_fraction: float,
) -> np.ndarray:
    """Tile ids whose fraction of (valid & hand < threshold) pixels exceeds
    ``hand_fraction`` (ref water_map.py:43-59 ``select_hand_tiles``; the
    fraction's denominator is the full padded tile pixel count).
    """
    if all_zero:
        raise ValueError(
            "All pixels in scene have a HAND value of 0.0 (all water); "
            "scene is not a good candidate for water mapping."
        )
    tile_ids = np.asarray(tile_ids)
    frac = np.asarray(valid_low_fraction, dtype=np.float64)
    return tile_ids[frac > hand_fraction]


def select_backscatter_tiles_from_stats(
    sub_tile_means_std: np.ndarray,
    tile_medians: np.ma.MaskedArray,
    hand_candidates: np.ndarray,
) -> np.ndarray:
    """Pick <=5 highest-variance low-backscatter candidate tiles
    (ref water_map.py:62-81 ``select_backscatter_tiles``).

    Inputs are indexed by tile id (position i = tile i):
    - ``sub_tile_means_std``: std (ddof=0) of the four 2x2 sub-tile means,
      sub-tile means computed over ``filled(0)`` pixels (masked -> 0,
      ref water_map.py:34-40);
    - ``tile_medians``: masked median of valid pixels per tile.
    """
    tile_indexes = np.arange(len(sub_tile_means_std))
    tile_medians = np.ma.masked_invalid(tile_medians)
    sub_std = np.asarray(sub_tile_means_std, dtype=np.float64)

    tile_variance = sub_std / tile_medians

    low_mean_threshold = np.ma.median(tile_medians[hand_candidates])
    low_mean_candidates = tile_indexes[tile_medians < low_mean_threshold]
    potential_candidates = np.intersect1d(hand_candidates, low_mean_candidates)

    for variance_threshold in np.nanpercentile(tile_variance.filled(np.nan), np.arange(5, 96)[::-1]):
        variance_candidates = tile_indexes[tile_variance > variance_threshold]
        selected = np.intersect1d(variance_candidates, potential_candidates)
        # stable sort so ties order deterministically (higher tile_id first
        # after the reversal) — matches the distributed ladder's tie-break;
        # the reference's default argsort is tie-arbitrary (water_map.py:78)
        sort_index = np.argsort(sub_std[selected], kind="stable")[::-1]
        if len(selected) >= 5:
            return selected[sort_index][:5]
    return np.array([], dtype=np.int64)
