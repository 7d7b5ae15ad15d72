"""EM classifier goldens — mirrors ref tests/hydrosar/test_threshold.py:6-10
and tests/hydrosar/test_water_map.py:10-14."""

import numpy as np

from asf_tools_spark.core.em import determine_em_threshold, em_threshold

SCALING = 8.732284197109262


def test_em_threshold_per_tile(em_tiles, em_thresholds):
    test_tiles = (np.around(em_tiles * SCALING)).astype(int)
    for tile, expected in zip(test_tiles, em_thresholds):
        assert np.isclose(em_threshold(tile), expected)


def test_determine_em_threshold_median(em_tiles):
    threshold = determine_em_threshold(em_tiles, SCALING)
    assert np.isclose(threshold, 27.482176801248677)
