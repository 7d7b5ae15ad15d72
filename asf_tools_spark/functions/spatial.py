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
    """Z-order cell id at ``res`` — pure JVM expression (no Python worker)."""
    return F.expr(cells.morton_cell_sql(lat, lon, res)).alias("cell_id")


def tile_col(row: str, col: str, array_cols: int, tile_shape: tuple[int, int]) -> Column:
    """Row-major asf-tools tile id (ref tile.py:123-128)."""
    return F.expr(tiles.tile_id_sql(row, col, array_cols, tile_shape)).alias("tile_id")


def subtile_col(row: str, col: str, tile_shape: tuple[int, int]) -> Column:
    """2x2 sub-tile index within a tile (ref water_map.py:34-40)."""
    return F.expr(tiles.subtile_id_sql(row, col, tile_shape)).alias("subtile_id")


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
