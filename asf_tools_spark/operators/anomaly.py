"""Robust per-group anomaly detection — median/MAD modified z-scores.

The classic robust outlier screen (Iglewicz & Hoaglin 1993, "How to Detect
and Handle Outliers"): an observation is flagged when

    |0.6745 * (x - median) / MAD| > cutoff        (cutoff 3.5 by default)

Median/MAD are 50%-breakdown estimators, so a contaminated metric stream
cannot drag its own threshold the way mean/stddev screens allow — the
telemetry/quality-signal twin of the reference's NMAD flood-depth statistic
(ref flood_map.py iterative estimator uses the same MAD core; see
core/stats.py nmad).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_MZ = 0.6745  # Phi^-1(0.75): scales MAD to sigma-equivalent units


def robust_outliers(
    df: DataFrame,
    key: str = "event_type",
    value_col: str = "value",
    cutoff: float = 3.5,
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """All input columns plus ``robust_z`` for rows whose modified z-score
    exceeds ``cutoff``; groups with MAD = 0 flag nothing (a constant-median
    group has no robust scale — the conventional convention, and it keeps
    the division NaN-free on both engines).

    Scale shape: two grouped percentile passes (median, then MAD) with the
    tiny per-key stats BROADCAST back each time — the fact table is never
    shuffled, only scanned. ``exact=True`` uses Spark's exact ``median``
    (per-group memory proportional to group size — fine for bounded key
    cardinality x sampled telemetry, and required for oracle parity);
    ``exact=False`` switches both passes to ``percentile_approx`` (KLL-type
    mergeable sketch, bounded executor memory) — the 10^12-row path, same
    plan otherwise.
    """
    val = F.col(value_col).cast("double")

    def _p50(col):
        return F.median(col) if exact else F.percentile_approx(col, 0.5, accuracy)

    med = df.groupBy(key).agg(_p50(val).alias("_med"))
    dev = df.join(F.broadcast(med), key).withColumn("_ad", F.abs(val - F.col("_med")))
    mad = dev.groupBy(key).agg(_p50(F.col("_ad")).alias("_mad"))
    z = F.lit(_MZ) * (val - F.col("_med")) / F.col("_mad")
    return (
        dev.join(F.broadcast(mad), key)
        .where((F.col("_mad") > 0) & (F.abs(z) > F.lit(float(cutoff))))
        .withColumn("robust_z", z)
        .drop("_med", "_ad", "_mad")
    )
