"""Radiometric scale conversions as pure Catalyst expressions.

Spark mapping of ref: src/asf_tools/raster.py:17-47 ``convert_scale`` (P1)
and the linear->Gaussian transforms of ref water_map.py:297-298 (P2).
NULL-in -> NULL-out replaces masked-array propagation; log10 of non-positive
values yields NULL (Spark) where numpy yields -inf/NaN — callers that need
the numpy semantics use ``F.when`` guards at the call site.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def convert_scale_col(col: Column, in_scale: str, out_scale: str) -> Column:
    if in_scale == out_scale:
        return col
    if in_scale == "db":
        if out_scale == "power":
            return F.pow(F.lit(10.0), col / 10.0)
        if out_scale == "amplitude":
            return F.pow(F.lit(10.0), col / 20.0)
    if in_scale == "amplitude":
        if out_scale == "power":
            return F.pow(col, 2.0)
        if out_scale == "db":
            return 10.0 * F.log10(F.pow(col, 2.0))
    if in_scale == "power":
        if out_scale == "amplitude":
            return F.sqrt(col)
        if out_scale == "db":
            return 10.0 * F.log10(col)
    raise ValueError(f"Cannot convert scale {in_scale} to {out_scale}")


def power_to_gaussian(col: Column) -> Column:
    """linear power -> 'Gaussian' thresholding scale (ref water_map.py:297)."""
    return F.log10(col) + 30.0


def db_to_gaussian(col: Column) -> Column:
    """db -> Gaussian scale (ref water_map.py:298)."""
    return col / 10.0 + 30.0
