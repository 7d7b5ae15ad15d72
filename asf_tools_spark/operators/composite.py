"""Local-resolution-weighted composite (D. Small 2012).

Spark re-expression of ref: src/asf_tools/composite.py:153-254
``make_composite`` (SURVEY §2.3 J3 / §2.4 A6): the reference places each
reprojected raster into a union grid by row/col offsets and accumulates
``outputs += v * w``, ``weights += w``, ``counts += 1`` incrementally to
bound memory (ref :197-232). Here each raster is a long-form grid with a
driver-computed offset; the N-way positional outer join is a ``unionByName``
followed by ONE partial/final hash aggregation — no indexed join, no
incremental state, and the same result.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def make_composite(entries: list[dict], epsilon: float = 0.0) -> DataFrame:
    """entries: [{grid, area, row_off, col_off}] where ``grid`` is
    (row,col,value) with NULL/absent rows for nodata, ``area`` is
    (row,col,area) of the local scattering area (weight = 1/area,
    ref composite.py:189-196), offsets place the raster in the union grid.

    Returns (row, col, value, count): value = sum(v*w)/sum(w),
    count = number of contributing rasters (ref :199,226-229,234-235).
    """
    parts = []
    for e in entries:
        g = e["grid"].select(
            (F.col("row") + F.lit(int(e["row_off"]))).alias("row"),
            (F.col("col") + F.lit(int(e["col_off"]))).alias("col"),
            F.col("value"),
        )
        a = e["area"].select(
            (F.col("row") + F.lit(int(e["row_off"]))).alias("row"),
            (F.col("col") + F.lit(int(e["col_off"]))).alias("col"),
            F.col("area"),
        )
        p = g.join(a, ["row", "col"]).select(
            "row", "col",
            F.col("value"),
            (F.lit(1.0) / F.col("area")).alias("w"),
        )
        parts.append(p)

    unioned = reduce(lambda x, y: x.unionByName(y), parts)
    return (
        unioned.where(F.col("value").isNotNull())
        .groupBy("row", "col")
        .agg(
            (F.sum(F.col("value") * F.col("w")) / F.sum("w")).alias("value"),
            F.count(F.lit(1)).alias("count"),
        )
    )
