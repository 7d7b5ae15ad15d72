"""Scalar functions vs reference unit tests
(ref tests/test_raster.py:8-68, tests/test_composite.py:10-40,
src/asf_tools/watermasking/utils.py:7-28)."""

import numpy as np
import pytest

from asf_tools_spark.core.misc import (
    convert_scale,
    get_area_raster,
    get_target_epsg_code,
    lat_lon_to_tile_string,
)


def test_convert_scale_amplitude_power_db():
    # values from ref tests/test_raster.py:8-47
    c = convert_scale(np.array([-10, -5, 0, 5, 10]), "amplitude", "power")
    assert np.allclose(c, [100, 25, 0, 25, 100])

    c = convert_scale(np.array([-10, -5, 0, 5, 10]), "amplitude", "db")
    with np.errstate(divide="ignore"):
        assert np.allclose(c, [20.0, 13.97940009, -np.inf, 13.97940009, 20.0])

    c = convert_scale(np.array([-1, 0, 1e-9, 1, 10]), "power", "amplitude")
    assert np.isnan(c[0])
    assert np.allclose(c[1:], [0.0, 3.16227766e-05, 1.0, 3.16227766e00])

    c = convert_scale(np.array([-1, 0, 1e-9, 1, 10]), "power", "db")
    assert np.isnan(c[0])
    with np.errstate(divide="ignore"):
        assert np.allclose(c[1:], [-np.inf, -90.0, 0.0, 10.0])

    c = convert_scale(np.array([np.nan, -np.inf, np.inf, -90, -10, 0, 10]), "db", "power")
    assert np.isnan(c[0])
    assert np.allclose(c[1:], [0.0, np.inf, 1e-9, 1e-1, 1.0, 10.0])

    c = convert_scale(np.array([np.nan, -np.inf, np.inf, -90, -10, 0, 10]), "db", "amplitude")
    assert np.isnan(c[0])
    assert np.allclose(c[1:], [0.0, np.inf, 3.16227766e-05, 3.16227766e-01, 1.0, 3.16227766e00])


def test_convert_scale_masked_mask_propagation():
    # ref tests/test_raster.py:50-68
    masked = np.ma.MaskedArray([-1, 0, 1, 4, 9], mask=[False, False, False, False, False])
    c = convert_scale(masked, "power", "amplitude")
    assert isinstance(c, np.ma.MaskedArray)
    assert np.all(c.mask == [True, False, False, False, False])
    assert np.allclose(c.compressed(), [0, 1, 2, 3])


def test_convert_scale_same_scale_roundtrip():
    arr = np.array([1.0, 2.0])
    assert convert_scale(arr, "db", "db") is arr
    with pytest.raises(ValueError):
        convert_scale(arr, "db", "bogus")


def test_get_target_epsg_code():
    # ref tests/test_composite.py:10-40
    assert get_target_epsg_code([32601]) == 32601
    assert get_target_epsg_code([32601, 32601]) == 32601
    assert get_target_epsg_code([32601, 32602]) == 32601
    assert get_target_epsg_code([32601, 32602, 32603]) == 32602
    assert get_target_epsg_code([32601, 32702]) == 32601  # ties -> North
    assert get_target_epsg_code([32701, 32702, 32601]) == 32701
    with pytest.raises(ValueError):
        get_target_epsg_code([32600])
    with pytest.raises(ValueError):
        get_target_epsg_code([32601, 99999])


def test_lat_lon_to_tile_string():
    assert lat_lon_to_tile_string(0, 0) == "n00e000.tif"
    assert lat_lon_to_tile_string(-1, -1) == "s01w001.tif"
    assert lat_lon_to_tile_string(45, -122, is_worldcover=True, postfix="") == "N45W122"
    assert lat_lon_to_tile_string(-45.7, 122.5) == "s45e122.tif"


def test_get_area_raster():
    assert get_area_raster("S1A_IW_20181102T155531_DVP_RTC30_G_gpuned_5685_VV.tif") == (
        "S1A_IW_20181102T155531_DVP_RTC30_G_gpuned_5685_area.tif"
    )
