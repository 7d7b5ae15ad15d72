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
