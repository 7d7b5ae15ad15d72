"""Spatial key columns: cell ids, tile ids, tile-name strings.

The cell/tile encodes are emitted as SQL expressions from the shared core
emitters, so the ids are bit-identical across the JVM path, the numpy/pandas
UDF path, and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..core import cells, tiles


def cell_col(lat: str, lon: str, res: int) -> Column:
    """Z-order cell id at ``res`` — pure JVM expression (no Python worker).

    NOTE: textual emitter (32x operand duplication) — use
    :func:`with_cell_col` in hot plans; this form is for literals/tests.
    """
    return F.expr(cells.morton_cell_sql(lat, lon, res)).alias("cell_id")


def with_cell_col(df, lat: str = "lat", lon: str = "lon", res: int = 8, out: str = "cell_id"):
    """Attach a Z-order cell id via a withColumn chain — each bit-spread
    level is one named projection, keeping whole-stage codegen compact
    (the inline emitter blows up 32x and stalls codegen)."""
    n = 1 << res
    mx = F.least(
        F.greatest(F.floor((F.col(lon) + 180.0) / 360.0 * n).cast("long"), F.lit(0)),
        F.lit(n - 1),
    )
    my = F.least(
        F.greatest(F.floor((F.col(lat) + 90.0) / 180.0 * n).cast("long"), F.lit(0)),
        F.lit(n - 1),
    )
    df = df.withColumn("_mx", mx).withColumn("_my", my)
    for shift, mask in cells.SPREAD_MASKS:
        m = int(mask)
        df = df.withColumn(
            "_mx", (F.col("_mx").bitwiseOR(F.shiftleft("_mx", shift))).bitwiseAND(F.lit(m))
        ).withColumn(
            "_my", (F.col("_my").bitwiseOR(F.shiftleft("_my", shift))).bitwiseAND(F.lit(m))
        )
    cell = F.shiftleft(F.lit(res).cast("long"), 54).bitwiseOR(
        F.col("_mx").bitwiseOR(F.shiftleft("_my", 1))
    )
    return df.withColumn(out, cell).drop("_mx", "_my")


def tile_col(row: str, col: str, array_cols: int, tile_shape: tuple[int, int]) -> Column:
    """Row-major asf-tools tile id (ref tile.py:123-128)."""
    return F.expr(tiles.tile_id_sql(row, col, array_cols, tile_shape)).alias("tile_id")


def subtile_col(row: str, col: str, tile_shape: tuple[int, int]) -> Column:
    """2x2 sub-tile index within a tile (ref water_map.py:34-40)."""
    return F.expr(tiles.subtile_id_sql(row, col, tile_shape)).alias("subtile_id")


def fill_missing_tiles(
    spark,
    existing,  # DataFrame with a tile_name column (the tiles already built)
    lat_range: tuple[int, int] = (-85, 85),
    lon_range: tuple[int, int] = (-180, 180),
    tile_size: tuple[int, int] = (5, 5),
    fill_value: int = 0,
    pixel_size: float = 0.00009009009,
):
    """ref watermasking/fill_missing_tiles.py:14-91: enumerate the lat/lon
    tile lattice over the dataset bounds, and for every tile NOT in the
    catalog emit a constant-fill tile row carrying the name, the fill value
    and the GDAL-style geotransform (origin + pixel size). The reference
    materializes a 55,500^2 byte raster per tile; as a table the fill is a
    constant column and the sink expands it — the anti-join against the
    catalog is the actual query.
    """
    th, tw = tile_size
    n_lat = (lat_range[1] - lat_range[0]) // th
    n_lon = (lon_range[1] - lon_range[0]) // tw
    lattice = spark.range(n_lat * n_lon).select(
        (F.lit(lat_range[0]) + (F.col("id") / n_lon).cast("int") * th).alias("lat"),
        (F.lit(lon_range[0]) + (F.col("id") % n_lon).cast("int") * tw).alias("lon"),
    )
    named = lattice.select(
        tile_name_col(F.col("lat").cast("double"), F.col("lon").cast("double"), postfix="")
        .alias("tile_name"),
        "lat", "lon",
    )
    missing = named.join(existing.select("tile_name"), "tile_name", "left_anti")
    return missing.select(
        "tile_name",
        F.col("lon").cast("double").alias("xmin"),
        F.col("lat").cast("double").alias("ymin"),
        F.lit(float(pixel_size)).alias("pixel_size"),
        F.lit(int(fill_value)).alias("fill_value"),
    )


def tile_name_col(lat: Column, lon: Column, is_worldcover: bool = False, postfix: str = ".tif") -> Column:
    """Zero-padded tile-name string (ref watermasking/utils.py:7-28) as a
    concat/lpad expression."""
    ns = ("N", "S") if is_worldcover else ("n", "s")
    ew = ("E", "W") if is_worldcover else ("e", "w")
    lat_i = F.floor(F.abs(lat)).cast("int")
    lat_i = F.when(lat >= 0, F.floor(lat).cast("int")).otherwise(F.floor(F.abs(lat)).cast("int"))
    lon_i = F.when(lon >= 0, F.floor(lon).cast("int")).otherwise(F.floor(F.abs(lon)).cast("int"))
    lat_part = F.concat(
        F.when(lat >= 0, F.lit(ns[0])).otherwise(F.lit(ns[1])),
        F.lpad(lat_i.cast("string"), 2, "0"),
    )
    lon_part = F.concat(
        F.when(lon >= 0, F.lit(ew[0])).otherwise(F.lit(ew[1])),
        F.lpad(lon_i.cast("string"), 3, "0"),
    )
    return F.concat(lat_part, lon_part, F.lit(postfix))
