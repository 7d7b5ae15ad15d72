"""Distributed backscatter tile-selection ladder vs the exact driver path.

The reference ladder (ref water_map.py:62-81) walks 95th->5th percentile
variance thresholds on the driver over one collected row per tile; the
distributed plan (tiling.backscatter_selection_df) must pick the identical
tiles with zero O(n_tiles) collects.
"""

import numpy as np
import pandas as pd
import pytest

from asf_tools_spark.operators import tiling


def _scene(seed: int, shape=(120, 160)):
    rng = np.random.default_rng(seed)
    rows, cols = shape
    rr, cc = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
    hand = 18.0 * (1 + np.sin(rr / 23.0) * np.cos(cc / 31.0)) + rng.uniform(0, 4, shape)
    water = (rr - 40) ** 2 + (cc - 50) ** 2 < 28**2
    hand[water] *= 0.05
    vh = rng.lognormal(mean=-2.3, sigma=0.4, size=shape)
    vh[water] = rng.lognormal(mean=-5.2, sigma=0.25, size=shape)[water]
    nodata = np.zeros(shape, dtype=bool)
    nodata[:8, :12] = True
    return np.ma.MaskedArray(vh, mask=nodata), np.ma.MaskedArray(hand, mask=np.zeros(shape, bool))


def _exact(bs, hand_candidates, tile_shape, n_tiles):
    stats = tiling.backscatter_tile_stats(bs, tile_shape).collect()
    sub_std = np.full(n_tiles, np.nan)
    medians = np.ma.masked_all(n_tiles)
    for r in stats:
        sub_std[r.tile_id] = r.sub_std if r.sub_std is not None else np.nan
        if r.tile_median is not None:
            medians[r.tile_id] = r.tile_median
    return tiling.select_backscatter_tiles_from_stats(sub_std, medians, hand_candidates)


@pytest.mark.parametrize("seed", [123, 7, 2026])
def test_distributed_ladder_matches_exact(spark, seed):
    tile = (20, 20)
    shape = (120, 160)
    vh, hand = _scene(seed, shape)
    n_tiles = tiling.core_tiles.n_tiles(shape, tile)

    hand_g = tiling.long_grid_df(spark, hand, tile, pad_value=np.nan)
    cand = tiling.select_hand_tiles(hand_g, 15.0, 0.8, tile[0] * tile[1])
    assert cand.size  # scene is built to have low-HAND tiles

    bs = tiling.long_grid_df(spark, vh, tile, pad_value=0.0).withColumn(
        "valid_bs", tiling.F.col("valid") & (tiling.F.col("value") > 0.0)
    )
    exact = _exact(bs, cand, tile, n_tiles)

    hand_df = spark.createDataFrame(pd.DataFrame({"tile_id": cand.astype(np.int64)}))
    dist = tiling.backscatter_selection_df(
        tiling.backscatter_tile_stats(bs, tile), hand_df
    ).collect()
    assert [int(r.tile_id) for r in dist] == [int(t) for t in exact]


def test_hand_candidates_df_matches_exact(spark):
    tile = (20, 20)
    vh, hand = _scene(11)
    hand_g = tiling.long_grid_df(spark, hand, tile, pad_value=np.nan)
    exact = tiling.select_hand_tiles(hand_g, 15.0, 0.8, tile[0] * tile[1])
    dist = tiling.hand_candidate_tiles_df(hand_g, 15.0, 0.8, tile[0] * tile[1])
    assert sorted(r.tile_id for r in dist.collect()) == sorted(int(t) for t in exact)


def test_guard_dispatch_avoids_full_collect(spark, monkeypatch):
    """Above DRIVER_EXACT_MAX_TILES select_backscatter_tiles must not run the
    exact numpy ladder (which implies an O(n_tiles) collect)."""
    tile = (20, 20)
    shape = (120, 160)
    vh, hand = _scene(123, shape)
    n_tiles = tiling.core_tiles.n_tiles(shape, tile)
    hand_g = tiling.long_grid_df(spark, hand, tile, pad_value=np.nan)
    cand = tiling.select_hand_tiles(hand_g, 15.0, 0.8, tile[0] * tile[1])
    bs = tiling.long_grid_df(spark, vh, tile, pad_value=0.0).withColumn(
        "valid_bs", tiling.F.col("valid") & (tiling.F.col("value") > 0.0)
    )
    expected = tiling.select_backscatter_tiles(bs, cand, tile, n_tiles)

    def _boom(*a, **k):
        raise AssertionError("exact driver ladder used above the guard")

    monkeypatch.setattr(tiling, "DRIVER_EXACT_MAX_TILES", 1)
    monkeypatch.setattr(tiling, "select_backscatter_tiles_from_stats", _boom)
    got = tiling.select_backscatter_tiles(bs, cand, tile, n_tiles)
    assert [int(t) for t in got] == [int(t) for t in expected]
