"""Flood estimator goldens — mirrors ref tests/hydrosar/test_flood_map.py."""

import numpy as np
import pytest

from asf_tools_spark.core.stats import (
    estimate_flood_depth,
    get_pw_threshold,
    iterative_water_level,
    logstat,
    nmad,
)


def test_logstat_golden():
    # ref tests/hydrosar/test_flood_map.py:28-33
    assert np.isclose(logstat(np.array([10, 100, 1000, 10000, 100000])), 25.95455351947008)


def test_estimate_flood_depth_nmad(hand_window, flood_window):
    # ref tests/hydrosar/test_flood_map.py:60-73
    h = estimate_flood_depth(1, hand_window, flood_window, estimator="nmad", water_level_sigma=3)
    assert np.isclose(h, 7.887911175434299)


def test_estimate_flood_depth_numpy(hand_window, flood_window):
    # ref tests/hydrosar/test_flood_map.py:76-83 (float32 fixture arithmetic)
    h = estimate_flood_depth(
        1, hand_window.astype(np.float32), flood_window, estimator="numpy", water_level_sigma=3
    )
    assert np.isclose(h, 16.353520154953003)


def test_estimate_flood_depth_logstat(hand_window, flood_window):
    # ref tests/hydrosar/test_flood_map.py:46-57 (float32 fixture arithmetic)
    h = estimate_flood_depth(
        1, hand_window.astype(np.float32), flood_window, estimator="logstat", water_level_sigma=3
    )
    assert np.isclose(h, 21.02364492416382)


def test_nmad_basic():
    x = np.array([1.0, 2.0, 3.0, 4.0, 100.0])
    assert np.isclose(nmad(x), np.median(np.abs(x - 3.0)) / 0.6744897501960817)


def test_iterative_deterministic(hand_window, flood_window):
    w1 = iterative_water_level(hand_window, flood_window == 1, np.arange(0, 25))
    w2 = iterative_water_level(hand_window, flood_window == 1, np.arange(0, 25))
    assert w1 == w2
    assert 0 <= w1 <= 25


def test_get_pw_threshold():
    arr = np.concatenate([np.zeros(900), np.full(100, 50.0)])
    thr = get_pw_threshold(arr)
    assert isinstance(thr, (int, float))
    # 95% of reverse CDF mass reached within the top bins -> threshold near 0
    assert 0 <= thr <= 51
