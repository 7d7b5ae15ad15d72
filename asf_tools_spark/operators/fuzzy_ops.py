"""Distributed fuzzy-membership operators (Catalyst expressions + window
stencils) — the Spark half of ref water_map.py:93-136 semantics whose numpy
twins live in core.fuzzy.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions.membership import zmf_col


def interp_membership_col(
    x: Column, start: float, stop: float, step: float, a: float, b: float
) -> Column:
    """np.interp(x, arange(start, stop, step), zmf(grid, a, b)) as a pure
    Catalyst expression (ref water_map.py:110-114 ``min_max_membership``:
    the reference interpolates zmf sampled on a quantized grid rather than
    evaluating the closed form — we reproduce the sampled-grid values).

    ``start/stop/step`` come from global min/max aggregates (tiny scalars
    collected by the driver, like the reference's array.min()/max()).
    """
    npts = len(np.arange(start, stop, step))
    if npts < 2:
        return zmf_col(x, a, b)
    last = start + (npts - 1) * step
    i = F.least(
        F.greatest(F.floor((x - F.lit(start)) / F.lit(step)), F.lit(0)), F.lit(npts - 2)
    ).cast("double")
    g_i = F.lit(start) + i * F.lit(step)
    act_i = zmf_col(g_i, a, b)
    act_j = zmf_col(g_i + F.lit(step), a, b)
    t = (x - g_i) / F.lit(step)
    interp = act_i + t * (act_j - act_i)
    # NaN guard first: Spark orders NaN greater than everything (x >= last
    # would fire), numpy comparisons with NaN are all False and the pixel is
    # dropped downstream — NULL here reproduces the numpy outcome
    return (
        F.when(F.isnan(x), F.lit(None).cast("double"))
        .when(x <= F.lit(start), zmf_col(F.lit(float(start)), a, b))
        .when(x >= F.lit(last), zmf_col(F.lit(float(last)), a, b))
        .otherwise(interp)
    )


def membership_limits(grid: DataFrame, value_col: str = "value",
                      mask_percentile: float = 90.0, std_range: float = 3.0) -> tuple[float, float]:
    """Distributed twin of core.fuzzy.determine_membership_limits
    (ref water_map.py:100-107): 0-masked, p90-clipped median / median+3σ+5.
    Three tiny scalar aggregates; exact percentile (linear interpolation,
    same as np.nanpercentile)."""
    v = F.col(value_col)
    nonzero = grid.where(F.abs(v) > 1e-8)  # np.ma.masked_values(x, 0.0) atol
    cap = nonzero.agg(
        F.percentile(v, mask_percentile / 100.0).alias("p")
    ).collect()[0].p
    stats = nonzero.where(v <= F.lit(cap)).agg(
        F.median(v).alias("med"), F.stddev_pop(v).alias("sd")
    ).collect()[0]
    lower = float(stats.med)
    return lower, lower + std_range * float(stats.sd) + 5.0


def slope_magnitude_col(grid: DataFrame, value_col: str = "value",
                        pixel_size: float = 30.0, out: str = "slope") -> DataFrame:
    """np.gradient-along-rows slope in degrees (ref water_map.py:93-97,
    including the |d/drow|-only quirk — see core.fuzzy) as window lead/lag
    partitioned by column: central differences inside, one-sided at edges."""
    w = Window.partitionBy("col").orderBy("row")
    v = F.col(value_col)
    prev, nxt = F.lag(v).over(w), F.lead(v).over(w)
    dx = (
        F.when(prev.isNull() & nxt.isNull(), F.lit(0.0))
        .when(prev.isNull(), nxt - v)
        .when(nxt.isNull(), v - prev)
        .otherwise((nxt - prev) / 2.0)
    )
    mag = F.abs(dx) / F.lit(pixel_size)
    return grid.withColumn(out, F.atan(mag) / float(np.pi) * 180.0)


def horn_derivatives(
    grid: DataFrame, value_col: str = "value", pixel_size: float = 30.0,
) -> DataFrame:
    """Horn (1981) 3x3 finite differences — the shared stencil under
    hillshade/aspect (ref prepare_hand stack reads GDAL DEM derivatives;
    slope half is water_map.py:93-97):

        dz/dx = ((c + 2f + i) - (a + 2d + g)) / (8 * pixel)
        dz/dy = ((g + 2h + i) - (a + 2b + c)) / (8 * pixel)

    Shape: scatter-stencil — each pixel is exploded to the 9 windows it
    participates in (one narrow shuffle keyed by target cell), the 3x3
    window is rebuilt by conditional aggregation (each slot has exactly
    one contributor, so max() is the identity pick). No UDF, and no
    BETWEEN self-join (which would plan BNLJ). Interior cells only
    (count(*) = 9): edge conventions vary per tool, and at 100 TB the
    halo exchange for tile borders is this same explode with tile-id
    keys. Expected rows per input row: exactly 9 — linear, skew-free
    (grid keys are unique). Returns (trow, tcol, _dzdx, _dzdy)."""
    v = F.col(value_col).cast("double")
    offs = F.explode(F.array(*[
        F.struct(F.lit(dr).alias("dr"), F.lit(dc).alias("dc"))
        for dr in (-1, 0, 1) for dc in (-1, 0, 1)
    ])).alias("o")
    # source sits at relative offset (dr, dc) FROM the target window center
    cand = grid.select(F.col("row"), F.col("col"), v.alias("_v"), offs).select(
        (F.col("row") - F.col("o.dr")).alias("trow"),
        (F.col("col") - F.col("o.dc")).alias("tcol"),
        F.col("o.dr").alias("_dr"), F.col("o.dc").alias("_dc"), "_v",
    )

    def slot(dr: int, dc: int) -> Column:
        return F.max(
            F.when((F.col("_dr") == dr) & (F.col("_dc") == dc), F.col("_v"))
        )

    nine = cand.groupBy("trow", "tcol").agg(
        slot(-1, -1).alias("_a"), slot(-1, 0).alias("_b"), slot(-1, 1).alias("_c"),
        slot(0, -1).alias("_d"), slot(0, 1).alias("_f"),
        slot(1, -1).alias("_g"), slot(1, 0).alias("_h"), slot(1, 1).alias("_i"),
        F.count(F.lit(1)).alias("_n"),
    ).where(F.col("_n") == 9)
    eight_px = F.lit(8.0 * pixel_size)
    dzdx = ((F.col("_c") + 2.0 * F.col("_f") + F.col("_i"))
            - (F.col("_a") + 2.0 * F.col("_d") + F.col("_g"))) / eight_px
    dzdy = ((F.col("_g") + 2.0 * F.col("_h") + F.col("_i"))
            - (F.col("_a") + 2.0 * F.col("_b") + F.col("_c"))) / eight_px
    return nine.select(
        "trow", "tcol", dzdx.alias("_dzdx"), dzdy.alias("_dzdy")
    )


def hillshade_horn(
    grid: DataFrame, value_col: str = "value", pixel_size: float = 30.0,
    azimuth_deg: float = 315.0, altitude_deg: float = 45.0,
    z_factor: float = 1.0, out: str = "hillshade",
) -> DataFrame:
    """Horn hillshade — the `gdaldem hillshade` closed form over
    :func:`horn_derivatives`:

        shade = 255 * (cos(zen) * cos(slope)
                       + sin(zen) * sin(slope) * cos(az_math - aspect))

    with slope = atan(z * hypot(dz/dx, dz/dy)), aspect = atan2(dzdy,
    -dzdx), zen = radians(90 - altitude), az_math = radians(360 -
    azimuth + 90), clamped at 0 (GDAL/ESRI convention; cos is even and
    periodic so aspect needs no branch normalization). Pure
    whole-stage-codegen expression on top of the stencil aggregate."""
    nine = horn_derivatives(grid, value_col, pixel_size)
    slope_r = F.atan(F.lit(z_factor) * F.sqrt(
        F.col("_dzdx") * F.col("_dzdx") + F.col("_dzdy") * F.col("_dzdy")))
    aspect_r = F.atan2(F.col("_dzdy"), -F.col("_dzdx"))
    zen = float(np.radians(90.0 - altitude_deg))
    azm = float(np.radians(360.0 - azimuth_deg + 90.0))
    shade = F.lit(255.0) * (
        F.lit(float(np.cos(zen))) * F.cos(slope_r)
        + F.lit(float(np.sin(zen))) * F.sin(slope_r) * F.cos(F.lit(azm) - aspect_r)
    )
    return nine.select(
        F.col("trow").alias("row"), F.col("tcol").alias("col"),
        F.greatest(F.lit(0.0), shade).alias(out),
    )


def aspect_horn(
    grid: DataFrame, value_col: str = "value", pixel_size: float = 30.0,
    flat_sentinel: float = -1.0, out: str = "aspect",
) -> DataFrame:
    """`gdaldem aspect` companion over the same :func:`horn_derivatives`
    stencil: compass azimuth of steepest descent in degrees (0 = north,
    clockwise),

        aspect = ((90 - degrees(atan2(dzdy, -dzdx))) % 360 + 360) % 360

    with exactly-flat cells (dzdx = dzdy = 0 — an EXACT double test: both
    derivatives are the same closed form over the same rounded inputs in
    any engine) mapped to ``flat_sentinel`` (GDAL emits nodata there).
    The double-% keeps the result in [0, 360) under Java's and DuckDB's
    shared sign-of-dividend fmod semantics."""
    nine = horn_derivatives(grid, value_col, pixel_size)
    deg = F.lit(90.0) - F.degrees(F.atan2(F.col("_dzdy"), -F.col("_dzdx")))
    az = (deg % F.lit(360.0) + F.lit(360.0)) % F.lit(360.0)
    flat = (F.col("_dzdx") == 0.0) & (F.col("_dzdy") == 0.0)
    return nine.select(
        F.col("trow").alias("row"), F.col("tcol").alias("col"),
        F.when(flat, F.lit(flat_sentinel)).otherwise(az).alias(out),
    )
