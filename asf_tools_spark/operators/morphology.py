"""Binary morphology on dense (row, col, value) grids — erosion, dilation,
opening, closing with a 3x3 all-ones structuring element and zero padding.

The raster-cleanup primitives the reference applies around segmentation:
speckle/islet removal before connected components (opening drops
sub-element specks, ref: src/asf_tools/hydrosar/water_map.py
remove_small_segments semantics at the pixel scale) and gap closing on
masks (closing fills pinholes; the known-water mask unioning of
water_map.py:210-220 benefits from both).

Spark-first shape: no 9-way self-join. Each cell EXPLODES its 3x3
neighbor target positions (one Generate, 9x row amplification bounded by
the element size) and ONE partial/final hash aggregate per target cell
computes min/count (erosion) or max (dilation). Cost is O(9n) map work +
one shuffle on (row, col) per pass — at 10^12 pixels this is the same
shape as the engine's slope/infill stencils, and tiles of the grid
co-partition because the aggregate key is the cell itself. Zero padding:
an out-of-bounds neighbor contributes 0, so erosion requires all NINE
in-bounds contributors to be 1 (count == 9 AND min == 1) and dilation is
simply max == 1 over whatever contributors exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_OFFSETS = [(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)]


def _stencil(df: DataFrame, value: str, height: int, width: int) -> DataFrame:
    """Explode each cell onto the 3x3 targets it contributes to, keeping
    in-bounds targets only."""
    targets = F.array(
        *[
            F.struct(
                (F.col("row") + F.lit(dr)).alias("r"),
                (F.col("col") + F.lit(dc)).alias("c"),
            )
            for dr, dc in _OFFSETS
        ]
    )
    return (
        df.select(F.col(value).alias("_v"), F.explode(targets).alias("t"))
        .select(F.col("t.r").alias("row"), F.col("t.c").alias("col"), "_v")
        .where(
            (F.col("row") >= 0)
            & (F.col("row") < height)
            & (F.col("col") >= 0)
            & (F.col("col") < width)
        )
    )


def binary_erode(df: DataFrame, value: str, height: int, width: int) -> DataFrame:
    """3x3 zero-padded erosion of the 0/1 column ``value`` on a dense
    ``height`` x ``width`` grid -> (row, col, <value>)."""
    return (
        _stencil(df, value, height, width)
        .groupBy("row", "col")
        .agg(F.min("_v").alias("_mn"), F.count(F.lit(1)).alias("_n"))
        .select(
            "row",
            "col",
            ((F.col("_mn") == 1) & (F.col("_n") == 9)).cast("int").alias(value),
        )
    )


def binary_dilate(df: DataFrame, value: str, height: int, width: int) -> DataFrame:
    """3x3 zero-padded dilation of the 0/1 column ``value`` -> dense grid."""
    return (
        _stencil(df, value, height, width)
        .groupBy("row", "col")
        .agg(F.max("_v").alias("_mx"))
        .select("row", "col", (F.col("_mx") == 1).cast("int").alias(value))
    )


def binary_open(df: DataFrame, value: str, height: int, width: int) -> DataFrame:
    """Opening = dilation of the erosion: drops specks smaller than the
    structuring element, preserves everything else's shape."""
    return binary_dilate(binary_erode(df, value, height, width), value, height, width)


def binary_close(df: DataFrame, value: str, height: int, width: int) -> DataFrame:
    """Closing = erosion of the dilation: fills sub-element holes."""
    return binary_erode(binary_dilate(df, value, height, width), value, height, width)
