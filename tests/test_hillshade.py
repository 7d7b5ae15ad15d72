"""hillshade_horn / aspect_horn vs independent pure-numpy Horn replays."""

import numpy as np
import pandas as pd

from asf_tools_spark.operators.fuzzy_ops import aspect_horn, hillshade_horn


def _numpy_hillshade(arr, pixel=30.0, az=315.0, alt=45.0, z=1.0):
    """Independent formulation: numpy slicing, vectorized over the whole
    interior at once (no per-window loop, no shared code with the operator)."""
    a = arr[:-2, :-2]; b = arr[:-2, 1:-1]; c = arr[:-2, 2:]
    d = arr[1:-1, :-2];                    f = arr[1:-1, 2:]
    g = arr[2:, :-2];  h = arr[2:, 1:-1];  i = arr[2:, 2:]
    dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / (8 * pixel)
    dzdy = ((g + 2 * h + i) - (a + 2 * b + c)) / (8 * pixel)
    slope = np.arctan(z * np.hypot(dzdx, dzdy))
    aspect = np.arctan2(dzdy, -dzdx)
    zen = np.radians(90 - alt)
    azm = np.radians(360 - az + 90)
    hs = 255.0 * (np.cos(zen) * np.cos(slope)
                  + np.sin(zen) * np.sin(slope) * np.cos(azm - aspect))
    return np.maximum(hs, 0.0)


def test_hillshade_matches_numpy(spark):
    rng = np.random.default_rng(7)
    arr = rng.normal(0.0, 5.0, (12, 15))
    rows, cols = np.mgrid[0:12, 0:15]
    pdf = pd.DataFrame({
        "row": rows.ravel().astype(np.int32),
        "col": cols.ravel().astype(np.int32),
        "value": arr.ravel(),
    })
    out = hillshade_horn(spark.createDataFrame(pdf), "value").toPandas()
    assert len(out) == 10 * 13  # interior only
    expect = _numpy_hillshade(arr)
    got = np.full((10, 13), np.nan)
    got[out["row"].to_numpy() - 1, out["col"].to_numpy() - 1] = out["hillshade"]
    np.testing.assert_allclose(got, expect, rtol=1e-9, atol=1e-9)


def test_hillshade_flat_is_constant(spark):
    rows, cols = np.mgrid[0:6, 0:6]
    pdf = pd.DataFrame({
        "row": rows.ravel().astype(np.int32),
        "col": cols.ravel().astype(np.int32),
        "value": np.full(36, 3.25),
    })
    out = hillshade_horn(spark.createDataFrame(pdf), "value").toPandas()
    # flat terrain: slope 0 -> shade = 255 * cos(zen) everywhere
    expect = 255.0 * np.cos(np.radians(45.0))
    np.testing.assert_allclose(out["hillshade"], expect, rtol=1e-12)


def _numpy_aspect(arr, pixel=30.0):
    a = arr[:-2, :-2]; b = arr[:-2, 1:-1]; c = arr[:-2, 2:]
    d = arr[1:-1, :-2];                    f = arr[1:-1, 2:]
    g = arr[2:, :-2];  h = arr[2:, 1:-1];  i = arr[2:, 2:]
    dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / (8 * pixel)
    dzdy = ((g + 2 * h + i) - (a + 2 * b + c)) / (8 * pixel)
    az = np.mod(np.mod(90.0 - np.degrees(np.arctan2(dzdy, -dzdx)), 360.0)
                + 360.0, 360.0)
    return np.where((dzdx == 0.0) & (dzdy == 0.0), -1.0, az)


def test_aspect_matches_numpy(spark):
    rng = np.random.default_rng(11)
    arr = rng.normal(0.0, 5.0, (12, 15))
    rows, cols = np.mgrid[0:12, 0:15]
    pdf = pd.DataFrame({
        "row": rows.ravel().astype(np.int32),
        "col": cols.ravel().astype(np.int32),
        "value": arr.ravel(),
    })
    out = aspect_horn(spark.createDataFrame(pdf), "value").toPandas()
    assert len(out) == 10 * 13
    expect = _numpy_aspect(arr)
    got = np.full((10, 13), np.nan)
    got[out["row"].to_numpy() - 1, out["col"].to_numpy() - 1] = out["aspect"]
    np.testing.assert_allclose(got, expect, rtol=1e-9, atol=1e-9)
    assert (out["aspect"].to_numpy() >= 0.0).all()  # nothing flat here


def test_aspect_flat_and_cardinal(spark):
    # a plane rising due south: steepest DESCENT points north -> aspect 0
    rows, cols = np.mgrid[0:6, 0:6]
    pdf = pd.DataFrame({
        "row": rows.ravel().astype(np.int32),
        "col": cols.ravel().astype(np.int32),
        "value": rows.ravel().astype(float) * 2.0,
    })
    out = aspect_horn(spark.createDataFrame(pdf), "value").toPandas()
    np.testing.assert_allclose(out["aspect"], 0.0, atol=1e-12)
    # flat plane -> sentinel
    pdf["value"] = 1.5
    out = aspect_horn(spark.createDataFrame(pdf), "value").toPandas()
    np.testing.assert_allclose(out["aspect"], -1.0)
