"""Flagship pipeline: assign pages to tiles, flag water-candidate tiles.

The Spark re-expression of the reference's front half of ``make_water_map``
(ref: src/asf_tools/hydrosar/water_map.py:261-292): catalog intersection ->
tile assignment -> per-tile HAND statistics -> candidate selection
(ref water_map.py:43-59 ``select_hand_tiles``), over a geotagged page table
instead of a raster.

Plan shape (see tests/test_explain.py for the physical-plan assertions):
scan (columns pruned to what's used) -> JVM cell encode -> broadcast join
with the polygon-cover build side -> salted partial/final aggregate ->
candidate filter. No wide exchange of the page table other than the final
per-(poly,cell) aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.spatial_join import spatial_join_polygons
from ..sources.polygons import watershed_boxes


def tile_assignments(
    pages: DataFrame,
    polygons: list[dict] | None = None,
    res: int = 8,
    hand_threshold: float = 15.0,
    hand_fraction: float = 0.8,
    salt_buckets: int = 16,
) -> DataFrame:
    """Per-(polygon, cell) page counts + HAND candidate flag.

    Output: (poly_id, cell_id, n_pages, mean_value, low_hand_fraction,
    hand_candidate). ``low_hand_fraction`` is the select_hand_tiles fraction
    (valid pixels below hand_threshold / all pixels, ref water_map.py:56-59)
    re-expressed per cell over page HAND values; the candidate predicate is
    ``fraction > hand_fraction``.

    The aggregation is two-phase salted: hotspot mega-cells (30% of pages in
    5 cells) would otherwise serialize into single reducers at 10^12 rows.
    """
    if polygons is None:
        polygons = watershed_boxes()
    joined = spatial_join_polygons(pages, polygons, res=res, how="inner")

    partial = (
        joined.withColumn("_salt", F.pmod(F.hash("lat", "lon"), F.lit(salt_buckets)))
        .groupBy("poly_id", "cell_id", "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("value").alias("_sv"),
            F.sum((F.col("hand") < F.lit(hand_threshold)).cast("long")).alias("_low"),
        )
    )
    return (
        partial.groupBy("poly_id", "cell_id")
        .agg(
            F.sum("_n").alias("n_pages"),
            (F.sum("_sv") / F.sum("_n")).alias("mean_value"),
            (F.sum("_low") / F.sum("_n")).alias("low_hand_fraction"),
        )
        .withColumn("hand_candidate", F.col("low_hand_fraction") > F.lit(hand_fraction))
    )
