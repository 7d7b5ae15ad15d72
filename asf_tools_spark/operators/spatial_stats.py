"""Spatial autocorrelation statistics over the cell grid.

Global Moran's I (Moran 1950) and local Getis-Ord Gi* (Getis & Ord 1992)
over per-cell aggregates of the geotagged page table — the inferential
twin of the density-based ``hotspot_clusters`` operator (that one finds
WHERE the dense clumps are; Gi* says how statistically surprising each
cell's neighborhood is, and Moran's I whether the whole surface clusters
at all). This is the statistic the reference's water-extent work reaches
for when deciding whether tile classifications are spatially coherent
(SURVEY §2 A-family; ref water_map.py's tile-neighborhood reasoning).

Spark shape — both statistics are built from the same three pieces, all
pure Catalyst:

1. one hash aggregate ``points -> (row, col, x)`` (per-cell mean value,
   rounded so both engines agree bit-for-bit downstream);
2. a 1-row global-moments aggregate ``(n, m, sxx)`` CROSS-JOIN-broadcast
   to every row (never collected to the driver);
3. a constant-fan-out neighbor expansion: each cell explodes its 8 (or
   9, for the star) offset targets and ONE equi-join back to the cell
   table realizes the spatial weights matrix — w_ij is never
   materialized as an O(n^2) object, and off-grid / empty neighbors
   drop out of the inner join by construction.

At 10^12 pages the page->cell aggregate dominates and is partial/final;
the neighbor join carries one row per OCCUPIED cell times 8/9 — bounded
by the grid (4^res), independent of page count.

The DuckDB oracles use the INDEPENDENT formulation (self-join on
``ABS(dr)<=1 AND ABS(dc)<=1`` predicates instead of offset explode), so
the weights-matrix construction itself is cross-verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["cell_value_grid", "morans_i", "getis_ord_gi_star"]


def cell_value_grid(
    points: DataFrame, res: int,
    lat: str = "lat", lon: str = "lon", value_col: str = "value",
) -> DataFrame:
    """(row, col, x): per-cell mean of ``value_col`` on the res-level
    grid. x is rounded to 6 so the float is pinned identically in both
    engines before any downstream algebra (repo-wide oracle discipline)."""
    from ..core import cells as C

    return (
        points.select(
            F.expr(C.grid_y_sql(lat, res)).alias("row"),
            F.expr(C.grid_x_sql(lon, res)).alias("col"),
            F.col(value_col).alias("_v"),
        )
        .groupBy("row", "col")
        .agg(F.round(F.avg("_v"), 6).alias("x"))
    )


def _global_moments(cells: DataFrame) -> DataFrame:
    """1-row (n, m, sxx) over the cell values; broadcast by the callers."""
    return cells.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x").alias("m"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )


def _offsets(include_self: bool) -> F.Column:
    offs = [
        (dr, dc)
        for dr in (-1, 0, 1) for dc in (-1, 0, 1)
        if include_self or (dr, dc) != (0, 0)
    ]
    return F.array(*[
        F.struct(F.lit(dr).alias("dr"), F.lit(dc).alias("dc")) for dr, dc in offs
    ])


def morans_i(cells: DataFrame) -> DataFrame:
    """Global Moran's I with binary queen (8-neighbor) weights over the
    occupied cells:

        I = (n / W) * sum_ij w_ij (x_i - m)(x_j - m) / sum_i (x_i - m)^2

    Returns ONE row ``(n_cells, w_sum, morans_i, expected_i)`` with
    ``expected_i = -1/(n-1)`` (the null-hypothesis mean). Degenerate
    inputs (no neighboring pairs, zero variance, n < 2) yield NULL
    rather than a division error, identically in the oracle.

    Pairs are ORDERED (each unordered neighbor pair contributes twice),
    the standard convention — symmetric w makes I invariant to it as
    long as W counts the same way, which both engines do.
    """
    contrib = (
        cells.withColumn("_o", F.explode(_offsets(include_self=False)))
        .select(
            (F.col("row") + F.col("_o.dr")).alias("row"),
            (F.col("col") + F.col("_o.dc")).alias("col"),
            F.col("x").alias("x_i"),
        )
    )
    pairs = contrib.join(cells, ["row", "col"])  # x = neighbor's value x_j
    g = _global_moments(cells)
    agg = pairs.crossJoin(F.broadcast(g)).agg(
        F.sum((F.col("x_i") - F.col("m")) * (F.col("x") - F.col("m"))).alias("cross_sum"),
        F.count(F.lit(1)).alias("w_sum"),
    )
    # S = sum (x-m)^2 = sxx - n*m^2 ; guard every degenerate denominator
    out = agg.crossJoin(F.broadcast(g)).select(
        F.col("n").alias("n_cells"),
        F.col("w_sum"),
        F.when(
            (F.col("n") >= 2) & (F.col("w_sum") > 0)
            & (F.col("sxx") - F.col("n") * F.col("m") * F.col("m") > 0),
            F.round(
                F.col("n") * F.col("cross_sum")
                / (F.col("w_sum") * (F.col("sxx") - F.col("n") * F.col("m") * F.col("m"))),
                6,
            ),
        ).alias("morans_i"),
        F.when(F.col("n") >= 2, F.round(F.lit(-1.0) / (F.col("n") - 1), 6)).alias("expected_i"),
    )
    return out


def getis_ord_gi_star(cells: DataFrame) -> DataFrame:
    """Local Getis-Ord Gi* z-score per occupied cell (binary 3x3 weights
    INCLUDING self — the star variant):

        Gi* = (sum_j w_ij x_j - m W_i)
              / ( s * sqrt( (n W_i - W_i^2) / (n - 1) ) )

    with m, s the global mean / population std over all occupied cells
    and W_i the count of occupied cells in i's 3x3 neighborhood.
    Returns ``(row, col, w_i, sum_x, gi_z)``; gi_z is NULL where the
    denominator degenerates (W_i = n or zero variance), identically in
    the oracle. |gi_z| >= 1.96 is the usual 5% hotspot/coldspot call —
    left to the consumer so the full surface stays inspectable.
    """
    contrib = (
        cells.withColumn("_o", F.explode(_offsets(include_self=True)))
        .select(
            (F.col("row") + F.col("_o.dr")).alias("row"),
            (F.col("col") + F.col("_o.dc")).alias("col"),
            F.col("x").alias("x_j"),
        )
    )
    sums = contrib.groupBy("row", "col").agg(
        F.sum("x_j").alias("sum_x"), F.count(F.lit(1)).alias("w_i")
    )
    # inner join back to cells: Gi* is evaluated at OCCUPIED cells only
    at_cells = cells.join(sums, ["row", "col"])
    g = _global_moments(cells)
    j = at_cells.crossJoin(F.broadcast(g))
    s2 = F.col("sxx") / F.col("n") - F.col("m") * F.col("m")
    var_term = (F.col("n") * F.col("w_i") - F.col("w_i") * F.col("w_i")) / (F.col("n") - 1)
    denom = F.sqrt(s2) * F.sqrt(var_term)
    return j.select(
        "row", "col", "w_i",
        F.round("sum_x", 6).alias("sum_x"),
        F.when(
            (F.col("n") >= 2) & (s2 > 0) & (var_term > 0),
            F.round((F.col("sum_x") - F.col("m") * F.col("w_i")) / denom, 6),
        ).alias("gi_z"),
    )
