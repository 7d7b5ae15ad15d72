"""Tile-key math vs the reference's tile_array/untile_array semantics
(ref tests/test_tile.py:7-105 re-expressed in long form)."""

import numpy as np

from asf_tools_spark.core import tiles


def _ref_tile_values(array, tile_shape, pad_value=None):
    """Independent dense tiling used as oracle: row-major tiles, bottom/right
    padding (semantics of ref tile.py:4-67)."""
    r, c = array.shape
    tr, tc = tile_shape
    pr, pc = tiles.padded_shape((r, c), tile_shape)
    padded = np.full((pr, pc), np.nan if pad_value is None else pad_value, dtype=float)
    padded[:r, :c] = array
    out = []
    for i in range(0, pr, tr):
        for j in range(0, pc, tc):
            out.append(padded[i : i + tr, j : j + tc])
    return np.stack(out)


def test_tile_id_row_major_4x4():
    # the 4x4 doc example of ref tile.py:9-31: four 2x2 tiles 0..3
    array = np.array([[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]])
    rr, cc = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
    tid = tiles.tile_id(rr.ravel(), cc.ravel(), 4, (2, 2))
    assert (tid == array.ravel()).all()


def test_grid_to_long_roundtrip_with_padding():
    rng = np.random.default_rng(0)
    array = rng.normal(size=(5, 7))
    mask = rng.random((5, 7)) < 0.2
    marr = np.ma.MaskedArray(array, mask=mask)
    long = tiles.grid_to_long(marr, (3, 3), pad_value=np.nan)
    assert long["tile_id"].max() == tiles.n_tiles((5, 7), (3, 3)) - 1
    # padded pixels are invalid
    pad = (long["row"] >= 5) | (long["col"] >= 7)
    assert not long["valid"][pad].any()
    back = tiles.long_to_grid(
        long["tile_id"], long["row"], long["col"], long["value"], long["valid"], (5, 7)
    )
    assert np.allclose(back.filled(0), marr.filled(0))
    assert (np.ma.getmaskarray(back) == mask).all()


def test_long_form_tiles_match_dense_tiling():
    rng = np.random.default_rng(1)
    array = rng.integers(0, 100, size=(6, 6)).astype(float)
    for shape in ((2, 2), (3, 3), (2, 3), (3, 2)):
        dense = _ref_tile_values(array, shape, pad_value=0.0)
        long = tiles.grid_to_long(array, shape, pad_value=0.0)
        tr, tc = shape
        for t in range(dense.shape[0]):
            sel = long["tile_id"] == t
            got = np.full(shape, np.nan).ravel()
            r_in = long["row"][sel] % tr
            c_in = long["col"][sel] % tc
            got[r_in * tc + c_in] = long["value"][sel]
            assert np.allclose(got.reshape(shape), dense[t])


def test_subtile_id_quadrants():
    # 4x4 tile -> 2x2 sub-tiles in row-major order (ref water_map.py:34-40)
    rr, cc = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
    sub = tiles.subtile_id(rr.ravel(), cc.ravel(), (4, 4)).reshape(4, 4)
    assert (sub == np.array([[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]])).all()


def test_tile_id_sql_matches_numpy(spark):
    rng = np.random.default_rng(2)
    rows = rng.integers(0, 500, 300)
    cols = rng.integers(0, 700, 300)
    expected = tiles.tile_id(rows, cols, 700, (100, 100))
    df = spark.createDataFrame([(int(r), int(c)) for r, c in zip(rows, cols)], "row int, col int")
    sql = tiles.tile_id_sql("row", "col", 700, (100, 100))
    got = np.array([r.t for r in df.selectExpr(f"{sql} AS t").collect()])
    assert (got == expected).all()


def test_tile_pyramid_conserves_mass_and_halves_keys(spark):
    import pandas as pd

    from asf_tools_spark.operators.tiling import tile_pyramid

    pdf = pd.DataFrame({
        "lat": [-89.9, -89.9, 89.9, 0.1],
        "lon": [-179.9, -179.8, 179.9, 0.1],
        "value": [1.0, 2.0, 3.0, 4.0],
    })
    out = tile_pyramid(spark.createDataFrame(pdf), base_res=3).toPandas()
    # every zoom level conserves count and value mass
    g = out.groupby("res")[["n_pages", "sum_value"]].sum()
    assert set(g.index) == set(range(4))
    assert (g["n_pages"] == 4).all()
    np.testing.assert_allclose(g["sum_value"], 10.0)
    # the apex is a single world cell
    top = out[out["res"] == 0]
    assert len(top) == 1 and int(top.iloc[0]["n_pages"]) == 4
    # parent keys are the child keys halved
    for res in (3, 2, 1):
        child = out[out["res"] == res]
        parents = {(r // 2, c // 2) for r, c in zip(child["row"], child["col"])}
        got = {(r, c) for r, c in
               zip(out[out["res"] == res - 1]["row"], out[out["res"] == res - 1]["col"])}
        assert parents == got


def test_tile_pyramid_rejects_empty_res_range(spark):
    import pandas as pd
    import pytest as _pt

    from asf_tools_spark.operators.tiling import tile_pyramid

    df = spark.createDataFrame(pd.DataFrame({"lat": [0.0], "lon": [0.0], "value": [1.0]}))
    with _pt.raises(ValueError):
        tile_pyramid(df, base_res=3, min_res=5)
    with _pt.raises(ValueError):
        tile_pyramid(df, base_res=20)
