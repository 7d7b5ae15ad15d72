"""Single-node numpy mirror of the full water-map flow — the executable spec.

Follows the control flow of ref: src/asf_tools/hydrosar/water_map.py:191-362
``make_water_map`` exactly, built from this package's golden-validated core
functions (em, fuzzy, selection, labeling) instead of skfuzzy/skimage/GDAL.
The distributed plan (plans/water_map.py) is tested against THIS mirror on
synthetic grids; the mirror itself is pinned to the reference via the golden
fixtures (EM thresholds, estimators) and semantics tests.

Grid-space only: rasters in, boolean water map out; COG I/O is replaced by
the engine's table sinks.
"""

from __future__ import annotations

import numpy as np

from . import fuzzy
from .em import determine_em_threshold
from .labeling import label_components, remove_small_segments_mask
from .selection import select_backscatter_tiles_from_stats, select_hand_tiles_from_stats
from .tiles import padded_shape


def tile_stack(array: np.ma.MaskedArray, tile_shape: tuple[int, int], pad_value: float) -> np.ma.MaskedArray:
    """(rows,cols) -> (n_tiles, tr, tc) row-major with bottom/right padding
    (ref tile.py:4-67 semantics, vectorized reshape)."""
    tr, tc = tile_shape
    pr, pc = padded_shape(array.shape, tile_shape)
    data = np.full((pr, pc), pad_value, dtype=np.float64)
    mask = np.ones((pr, pc), dtype=bool)
    data[: array.shape[0], : array.shape[1]] = np.ma.getdata(array)
    mask[: array.shape[0], : array.shape[1]] = np.ma.getmaskarray(array)
    stacked = data.reshape(pr // tr, tr, pc // tc, tc).swapaxes(1, 2).reshape(-1, tr, tc)
    smask = mask.reshape(pr // tr, tr, pc // tc, tc).swapaxes(1, 2).reshape(-1, tr, tc)
    return np.ma.MaskedArray(stacked, mask=smask)


def untile_stack(tiles: np.ma.MaskedArray, array_shape: tuple[int, int]) -> np.ma.MaskedArray:
    """Inverse of :func:`tile_stack` (ref tile.py:70-135)."""
    n, tr, tc = tiles.shape
    pr, pc = padded_shape(array_shape, (tr, tc))
    data = np.ma.getdata(tiles).reshape(pr // tr, pc // tc, tr, tc).swapaxes(1, 2).reshape(pr, pc)
    mask = np.ma.getmaskarray(tiles).reshape(pr // tr, pc // tc, tr, tc).swapaxes(1, 2).reshape(pr, pc)
    return np.ma.MaskedArray(data, mask=mask)[: array_shape[0], : array_shape[1]]


def hand_tile_fractions(hand_tiles: np.ma.MaskedArray, hand_threshold: float) -> np.ndarray:
    masked = np.ma.masked_greater_equal(hand_tiles, hand_threshold)
    return np.sum(~np.ma.getmaskarray(masked), axis=(1, 2)) / (masked.shape[1] * masked.shape[2])


def select_hand_tiles(hand_tiles, hand_threshold, hand_fraction):
    """ref water_map.py:43-59 over the stack."""
    frac = hand_tile_fractions(hand_tiles, hand_threshold)
    return select_hand_tiles_from_stats(
        np.arange(hand_tiles.shape[0]), frac, bool(np.allclose(hand_tiles, 0.0)), hand_fraction
    )


def backscatter_stats(tiles: np.ma.MaskedArray):
    """Per-tile (sub-tile-mean std, median) — ref water_map.py:34-40,65-67."""
    n, tr, tc = tiles.shape
    filled = tiles.filled(0.0)
    quads = filled.reshape(n, 2, tr // 2, 2, tc // 2).swapaxes(2, 3).reshape(n, 4, -1)
    sub_means = quads.mean(axis=2)
    sub_std = sub_means.std(axis=1)
    medians = np.ma.median(tiles, axis=(1, 2))
    return sub_std, medians


def select_backscatter_tiles(tiles: np.ma.MaskedArray, hand_candidates: np.ndarray) -> np.ndarray:
    sub_std, medians = backscatter_stats(tiles)
    return select_backscatter_tiles_from_stats(sub_std, medians, hand_candidates)


def fuzzy_refinement(
    initial_map: np.ndarray,
    gaussian_array: np.ma.MaskedArray,
    hand_array: np.ndarray,
    pixel_size: float,
    gaussian_thresholds: tuple[float, float],
    membership_threshold: float = 0.45,
) -> np.ndarray:
    """ref water_map.py:160-188."""
    water_map = np.ones_like(initial_map, dtype=bool)

    water_segments = label_components(initial_map)
    areas = np.bincount(water_segments.ravel())
    seg_mem_by_id = fuzzy.segment_membership_by_area(areas, np.arange(len(areas)))
    water_segment_membership = seg_mem_by_id[water_segments]
    water_map &= ~np.isclose(water_segment_membership, 0.0)

    gaussian_membership = fuzzy.min_max_membership(
        gaussian_array, gaussian_thresholds[0], gaussian_thresholds[1], 0.005
    )
    water_map &= ~np.isclose(gaussian_membership, 0.0)

    hand_lower, hand_upper = fuzzy.determine_membership_limits(hand_array)
    hand_membership = fuzzy.min_max_membership(hand_array, hand_lower, hand_upper, 0.1)
    water_map &= ~np.isclose(hand_membership, 0.0)

    hand_slopes = fuzzy.calculate_slope_magnitude(hand_array, pixel_size)
    slope_membership = fuzzy.min_max_membership(hand_slopes, 0.0, 15.0, 0.1)
    water_map &= ~np.isclose(slope_membership, 0.0)

    weights = (
        gaussian_membership + hand_membership + slope_membership + water_segment_membership
    ) / 4.0
    water_map &= weights >= membership_threshold
    return water_map


def make_water_map(
    vv_array: np.ma.MaskedArray,
    vh_array: np.ma.MaskedArray,
    hand_array: np.ma.MaskedArray,
    tile_shape: tuple[int, int] = (100, 100),
    max_vv_threshold: float = -15.5,
    max_vh_threshold: float = -23.0,
    hand_threshold: float = 15.0,
    hand_fraction: float = 0.8,
    membership_threshold: float = 0.45,
    pixel_size: float = 30.0,
) -> dict:
    """ref water_map.py:191-362 in grid space. Returns intermediates for
    stage-by-stage comparison with the distributed plan."""
    if tile_shape[0] % 2 or tile_shape[1] % 2:
        raise ValueError(f"tile_shape {tile_shape} requires even values.")

    hand_tiles = tile_stack(hand_array, tile_shape, pad_value=np.nan)
    hand_tiles = np.ma.masked_invalid(hand_tiles)
    hand_candidates = select_hand_tiles(hand_tiles, hand_threshold, hand_fraction)

    out: dict = {"hand_candidates": hand_candidates}
    selected_tiles = None
    water_extent_maps = []
    for max_db_threshold, array, pol in ((max_vh_threshold, vh_array, "VH"), (max_vv_threshold, vv_array, "VV")):
        tiles = tile_stack(array, tile_shape, pad_value=0.0)
        tiles = np.ma.masked_less_equal(tiles, 0.0)
        if selected_tiles is None:
            selected_tiles = select_backscatter_tiles(tiles, hand_candidates)
            out["selected_tiles"] = selected_tiles

        with np.errstate(divide="ignore", invalid="ignore"):
            tiles = np.log10(tiles) + 30.0
        max_gaussian_threshold = max_db_threshold / 10.0 + 30.0
        if selected_tiles.size:
            scaling = 256 / (np.mean(tiles) + 3 * np.std(tiles))
            gaussian_threshold = determine_em_threshold(tiles[selected_tiles, :, :], scaling)
            gaussian_threshold = min(gaussian_threshold, max_gaussian_threshold)
            out[f"scaling_{pol}"] = scaling
        else:
            gaussian_threshold = max_gaussian_threshold
        out[f"gaussian_threshold_{pol}"] = gaussian_threshold

        gaussian_array = untile_stack(tiles, array.shape)
        # ref water_map.py:312: mask of masked_less_equal = prior mask OR
        # (unmasked data <= threshold) — masked (<=0-power) pixels start True
        water_map = np.ma.getmaskarray(np.ma.masked_less_equal(gaussian_array, gaussian_threshold)).copy()
        water_map &= ~np.ma.getmaskarray(array)
        out[f"initial_{pol}"] = water_map.copy()

        masked_power = np.ma.masked_where(~water_map, array)
        gaussian_lower_limit = np.log10(np.ma.median(masked_power)) + 30.0

        refined = fuzzy_refinement(
            water_map,
            gaussian_array,
            np.ma.getdata(hand_array),
            pixel_size=pixel_size,
            gaussian_thresholds=(gaussian_lower_limit, gaussian_threshold),
            membership_threshold=membership_threshold,
        )
        refined &= ~np.ma.getmaskarray(masked_power)
        out[f"fuzzy_{pol}"] = refined
        water_extent_maps.append(refined)

    combined = np.logical_or(*water_extent_maps)
    segments = label_components(combined)
    out["water_map"] = remove_small_segments_mask(segments, min_area=3)
    return out
