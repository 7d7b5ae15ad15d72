"""Z-shaped fuzzy membership as a Catalyst ``when`` chain (SURVEY §2.8 F4).

Closed-form zmf — the scale path. The bit-compatible quantized-grid variant
(the reference interpolates zmf sampled every ``resolution``,
ref water_map.py:110-114) lives in core.fuzzy and runs inside grouped-map
UDFs where golden parity matters.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zmf_col(x: Column, a: float, b: float) -> Column:
    if b == a:
        return F.when(x <= F.lit(a), 1.0).otherwise(0.0)
    mid = (a + b) / 2.0
    t = (x - F.lit(a)) / F.lit(b - a)
    u = (x - F.lit(b)) / F.lit(b - a)
    return (
        F.when(x <= F.lit(a), 1.0)
        .when(x <= F.lit(mid), 1.0 - 2.0 * t * t)
        .when(x < F.lit(b), 2.0 * u * u)
        .otherwise(0.0)
    )


def zmf_sql(x_expr: str, a: float, b: float) -> str:
    """Shared Spark/DuckDB SQL text for zmf — oracle parity."""
    if b == a:
        return f"CASE WHEN ({x_expr}) <= {a!r} THEN 1.0 ELSE 0.0 END"
    mid = (a + b) / 2.0
    ba = b - a

    def d(x: float) -> str:
        return f"CAST({x!r} AS DOUBLE)"

    one, two = d(1.0), d(2.0)
    return (
        f"CASE WHEN ({x_expr}) <= {d(a)} THEN {one} "
        f"WHEN ({x_expr}) <= {d(mid)} THEN {one} - {two} * POWER((({x_expr}) - {d(a)}) / {d(ba)}, 2) "
        f"WHEN ({x_expr}) < {d(b)} THEN {two} * POWER((({x_expr}) - {d(b)}) / {d(ba)}, 2) "
        f"ELSE {d(0.0)} END"
    )
