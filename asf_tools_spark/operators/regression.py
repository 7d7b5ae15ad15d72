"""Group-wise ordinary least squares — closed-form simple linear
regression per key, entirely in one hash aggregate.

The training-pipeline monitor: per-domain quality drift over crawl time,
per-event-type value trends, throughput regressions. At 10^12 rows this
is ONE partial/final aggregate on the group key (five sufficient
statistics per group: n, mean x, mean y, var x, covar xy) — no window, no
second pass, no driver state.

Numerical note: callers should CENTER the time axis near its range
(e.g. days since a fixed recent epoch, not raw epoch seconds) — the
sufficient statistics are one-pass and a 1e9-magnitude abscissa wastes
the mantissa on the offset. The registry row does exactly this.

Oracle independence: DuckDB verifies via its native REGR_SLOPE /
REGR_INTERCEPT / CORR aggregates — a genuinely separate implementation
of the same estimator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def groupwise_ols(
    df: DataFrame, key: str, x: str, y: str, min_n: int = 2
) -> DataFrame:
    """(key, n, slope, intercept, r) per group; groups with fewer than
    ``min_n`` points or zero x-variance are dropped (slope undefined)."""
    agg = df.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(x).alias("_mx"),
        F.avg(y).alias("_my"),
        F.var_pop(x).alias("_vx"),
        F.var_pop(y).alias("_vy"),
        F.covar_pop(x, y).alias("_cxy"),
    )
    slope = F.col("_cxy") / F.col("_vx")
    # r from the same sufficient statistics; F.corr under ANSI mode raises
    # divide-by-zero on a zero-variance group instead of returning NULL
    r = F.when(
        F.col("_vy") > 0, F.col("_cxy") / F.sqrt(F.col("_vx") * F.col("_vy"))
    )
    return (
        agg.where((F.col("n") >= min_n) & (F.col("_vx") > 0))
        .select(
            key,
            "n",
            slope.alias("slope"),
            (F.col("_my") - slope * F.col("_mx")).alias("intercept"),
            r.alias("r"),
        )
    )
