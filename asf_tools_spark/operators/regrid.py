"""Re-gridding join + distributed Gaussian NaN infill.

- ``regrid``: map source pixels onto a target grid (the Spark mapping of
  ref prepare.py:53-86 ``prepare_hand_for_raster`` warp, SURVEY §2.1 S6):
  each source pixel lands in a destination pixel via an affine
  (scale + offset) mapping; overlaps aggregate (mean for 'average',
  closest-center for 'nearest'). A groupBy on the destination key — no
  indexed join.
- ``fill_nan_distributed``: per-tile Gaussian infill with halo exchange
  (ref calculate.py:25-37 ``fill_nan``, SURVEY §2.5 W2): each round ships
  every tile plus a ``halo``-pixel border from its neighbors to a grouped
  UDF running the core kernel pass; the driver loops until no NaNs remain.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

from ..core.infill import gaussian_kernel, interpolate_replace_nans


def regrid(
    src: DataFrame,
    row_scale: float,
    col_scale: float,
    row_off: float = 0.0,
    col_off: float = 0.0,
    method: str = "average",
) -> DataFrame:
    """(row,col,value) -> destination grid: dst_row = floor(row*scale+off).

    'average': mean of contributing source pixels (area-style resampling);
    'nearest': the source pixel whose center maps closest to the destination
    pixel center wins (deterministic tie-break by source row/col).
    """
    dst_r = F.floor(F.col("row") * row_scale + row_off).cast("int")
    dst_c = F.floor(F.col("col") * col_scale + col_off).cast("int")
    mapped = src.select(dst_r.alias("row"), dst_c.alias("col"), "value",
                        F.col("row").alias("src_row"), F.col("col").alias("src_col"))
    if method == "average":
        return mapped.groupBy("row", "col").agg(F.avg("value").alias("value"))
    if method == "nearest":
        from pyspark.sql.window import Window

        center_r = (F.col("row") + 0.5 - row_off) / row_scale
        center_c = (F.col("col") + 0.5 - col_off) / col_scale
        d = (F.col("src_row") + 0.5 - center_r) ** 2 + (F.col("src_col") + 0.5 - center_c) ** 2
        w = Window.partitionBy("row", "col").orderBy(
            d.asc(), F.col("src_row").asc(), F.col("src_col").asc()
        )
        return (
            mapped.withColumn("rk", F.row_number().over(w))
            .where("rk = 1")
            .select("row", "col", "value")
        )
    if method == "lanczos":
        return _regrid_lanczos(src, row_scale, col_scale, row_off, col_off)
    raise ValueError(f"unknown method {method}")


_LANCZOS_A = 3  # kernel radius, matching GDAL's lanczos (the ref default,
# prepare.py:53-86 resampling_method='lanczos')


def _lanczos_w(t, a: int = _LANCZOS_A):
    """Windowed sinc L(t) = sinc(t)·sinc(t/a) for |t| < a — pure Catalyst."""
    pi_t = F.lit(float(np.pi)) * t
    val = (F.sin(pi_t) / pi_t) * (F.sin(pi_t / a) / (pi_t / a))
    return F.when(F.abs(t) < 1e-12, 1.0).when(F.abs(t) < a, val).otherwise(0.0)


def _regrid_lanczos(
    src: DataFrame, row_scale: float, col_scale: float, row_off: float, col_off: float
) -> DataFrame:
    """Separable Lanczos-3 remap as a scatter + weighted aggregate.

    Each source pixel is exploded into the destination pixels whose centers
    (mapped back to source coordinates) fall within the a=3 kernel support —
    ≤ (2a·scale+1)² candidates per pixel, all JVM-side (sequence/explode +
    sin expressions), then one groupBy(dst) computing Σw·v / Σw (edge-
    normalized, like GDAL). Kernel distances are measured between pixel
    CENTERS in source coordinates — exact for identity/upsampling warps (the
    reference's HAND-onto-scene-grid case); for heavy downsampling use
    'average' (Lanczos without kernel rescaling aliases there by design).
    """
    a = _LANCZOS_A
    sr = F.col("row") + 0.5
    sc = F.col("col") + 0.5
    r_lo = F.ceil((sr - a) * row_scale + row_off - 0.5).cast("int")
    r_hi = F.floor((sr + a) * row_scale + row_off - 0.5).cast("int")
    c_lo = F.ceil((sc - a) * col_scale + col_off - 0.5).cast("int")
    c_hi = F.floor((sc + a) * col_scale + col_off - 0.5).cast("int")
    cand = (
        src.select("row", "col", "value",
                   F.explode(F.sequence(r_lo, r_hi)).alias("dst_row"),
                   c_lo.alias("_clo"), c_hi.alias("_chi"))
        .select("row", "col", "value", "dst_row",
                F.explode(F.sequence(F.col("_clo"), F.col("_chi"))).alias("dst_col"))
    )
    t_r = (F.col("dst_row") + 0.5 - row_off) / row_scale - (F.col("row") + 0.5)
    t_c = (F.col("dst_col") + 0.5 - col_off) / col_scale - (F.col("col") + 0.5)
    w = _lanczos_w(t_r) * _lanczos_w(t_c)
    return (
        cand.withColumn("_w", w)
        .where(F.col("_w") != 0.0)
        .groupBy(F.col("dst_row").alias("row"), F.col("dst_col").alias("col"))
        .agg((F.sum(F.col("_w") * F.col("value")) / F.sum("_w")).alias("value"))
    )


_FILL_SCHEMA = StructType([
    StructField("row", IntegerType()),
    StructField("col", IntegerType()),
    StructField("value", DoubleType()),
])


def fill_nan_distributed(
    grid: DataFrame,
    grid_shape: tuple[int, int],
    tile_shape: tuple[int, int] = (64, 64),
    stddev: float = 3.0,
    max_rounds: int = 50,
) -> DataFrame:
    """Iterative per-tile Gaussian infill with halo replication.

    Each round: every pixel is exploded into the core tile it belongs to
    plus any neighbor tiles whose ``halo`` band contains it; the grouped UDF
    rebuilds tile+halo, runs one kernel pass, emits core pixels; the driver
    re-checks the NaN count. NaN regions wider than the kernel need more
    rounds, exactly like the reference's while-loop.
    """
    tr, tc = tile_shape
    halo = int(4 * stddev)
    rows_n, cols_n = grid_shape
    kernel = gaussian_kernel(stddev)

    current = grid.select("row", "col", F.col("value").cast("double"))
    # value NULL encodes NaN on the Spark side
    current = current.withColumn(
        "value", F.when(F.isnan("value"), None).otherwise(F.col("value"))
    ).localCheckpoint(eager=True)

    offsets = [(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)]

    def fill_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        t_r, t_c = int(pdf["_tr"].iloc[0]), int(pdf["_tc"].iloc[0])
        r0, c0 = t_r * tr - halo, t_c * tc - halo
        arr = np.full((tr + 2 * halo, tc + 2 * halo), np.nan)
        rr = pdf["row"].to_numpy() - r0
        cc = pdf["col"].to_numpy() - c0
        vals = pdf["value"].to_numpy(dtype=float)
        arr[rr, cc] = vals
        # outside-extent positions stay NaN but must not block convergence:
        # only in-extent core pixels are emitted
        out = interpolate_replace_nans(arr, kernel)
        core = out[halo : halo + tr, halo : halo + tc]
        gr, gc = np.mgrid[0:tr, 0:tc]
        gr, gc = gr + t_r * tr, gc + t_c * tc
        keep = (gr < rows_n) & (gc < cols_n)
        return pd.DataFrame({
            "row": gr[keep].astype(np.int32),
            "col": gc[keep].astype(np.int32),
            "value": core[keep],
        })

    for _ in range(max_rounds):
        n_nan = current.where(F.col("value").isNull()).limit(1).count()
        if n_nan == 0:
            break
        # one per-row array_distinct explode instead of a 9-way union +
        # distinct: the union shipped 9x the pixels into a dedup SHUFFLE
        # every round (288 tiny tasks/round at 32 partitions); the per-row
        # candidate-tile array dedups locally, so the only exchange left
        # is the groupBy placement shuffle and it carries ~1.2x the pixels
        # (guide §2.3/2.4). Same (tile, pixel) pairs reach fill_tile.
        cand = F.array_distinct(F.array(*[
            F.struct(
                F.floor((F.col("row") + dr * halo) / tr).cast("long").alias("_tr"),
                F.floor((F.col("col") + dc * halo) / tc).cast("long").alias("_tc"),
            )
            for dr, dc in offsets
        ]))
        exploded = (
            current.select(
                "row", "col",
                F.coalesce(F.col("value"), F.lit(float("nan"))).alias("value"),
                F.explode(cand).alias("_t"),
            )
            .select(
                "row", "col", "value",
                F.col("_t._tr").alias("_tr"), F.col("_t._tc").alias("_tc"),
            )
            .where((F.col("_tr") >= 0) & (F.col("_tc") >= 0))
        )
        filled = exploded.groupBy("_tr", "_tc").applyInPandas(fill_tile, schema=_FILL_SCHEMA)
        # multiple tiles may emit the same core pixel only if keys collide —
        # they cannot (core assignment is unique); halo copies are inputs only
        current = filled.withColumn(
            "value", F.when(F.isnan("value"), None).otherwise(F.col("value"))
        ).localCheckpoint(eager=True)
    return current.select("row", "col", F.coalesce(F.col("value"), F.lit(float("nan"))).alias("value"))
