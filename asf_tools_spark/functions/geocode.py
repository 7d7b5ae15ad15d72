"""Web-map geocodes: Bing-style quadkeys and base32 geohashes.

The two interoperable string geocodes every web-map / tile-serving stack
speaks (the reference's tile naming is its own equirectangular variant —
``functions.spatial.tile_name_col``, ref src/asf_tools/dem.py:12 and
src/asf_tools/tile.py:123-128; quadkey/geohash are the public-standard
twins a 100 TB page corpus gets bucketed by for map views and
spatial-prefix joins).

Both encodes are pure integer/bit arithmetic after ONE floor() per axis, so
the JVM plan, the staged-column Spark path, and the DuckDB oracle produce
bit-identical strings:

- ``quadkey``: Web-Mercator tile (x, y) at zoom ``z`` (Bing Maps tile
  system), digits MSB-first, digit = x_bit + 2*y_bit — each digit is
  literally the character '0'..'3' so the string is a CAST+CONCAT, no
  lookup table. The Mercator y uses LN/SIN; the scaled value is rounded to
  1e-9 BEFORE floor() on BOTH engines (the repo's transcendental-parity
  fence — java.lang.Math.log and libm log may differ in the last ulp).
- ``geohash``: standard base32 geohash at precision 6 (30 bits, 15 per
  axis, lon leads MSB-first). The bit interleave IS the Morton spread of
  core.cells with the axis roles swapped (lon at odd spread positions =
  lon leading when read MSB-first); chars come from SUBSTR over the
  base32 alphabet — 1-based and identical in Spark SQL and DuckDB.

Everything here is whole-stage-codegen friendly: the Column builders stage
each spread level / digit as a named projection (the textual emitters
duplicate operands and are reserved for the DuckDB oracle side, where
query text size is harmless).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..core import cells

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_MERC_MAX_LAT = 85.05112878  # Bing tile-system latitude clamp
_DBL = "CAST({0!r} AS DOUBLE)".format


def _merc_xy_sql(lat_expr: str, lon_expr: str, z: int) -> tuple[str, str]:
    """Web-Mercator integer tile coords as dialect-free SQL expressions."""
    n = 1 << z
    x = (
        f"LEAST(GREATEST(CAST(FLOOR((CAST({lon_expr} AS DOUBLE) + {_DBL(180.0)})"
        f" / {_DBL(360.0)} * {n}) AS BIGINT), 0), {n - 1})"
    )
    clat = (
        f"LEAST(GREATEST(CAST({lat_expr} AS DOUBLE),"
        f" {_DBL(-_MERC_MAX_LAT)}), {_DBL(_MERC_MAX_LAT)})"
    )
    s = f"SIN({clat} * PI() / {_DBL(180.0)})"
    merc = (
        f"({_DBL(0.5)} - LN(({_DBL(1.0)} + {s}) / ({_DBL(1.0)} - {s}))"
        f" / ({_DBL(4.0)} * PI())) * {n}"
    )
    y = f"LEAST(GREATEST(CAST(FLOOR(ROUND({merc}, 9)) AS BIGINT), 0), {n - 1})"
    return x, y


def quadkey_sql(lat_expr: str, lon_expr: str, z: int) -> str:
    """One SQL expression for the zoom-``z`` quadkey string.

    Textual emitter (operands duplicated per digit) — oracle/tests only;
    hot Spark plans use :func:`with_quadkey_col`.
    """
    if not 1 <= z <= 23:
        raise ValueError(f"zoom {z} not in [1, 23]")
    x, y = _merc_xy_sql(lat_expr, lon_expr, z)
    digits = [
        f"CAST((({x} >> {k}) & 1) + 2 * (({y} >> {k}) & 1) AS STRING)"
        for k in range(z - 1, -1, -1)
    ]
    return "CONCAT(" + ", ".join(digits) + ")"


def with_quadkey_col(
    df: DataFrame, lat: str = "lat", lon: str = "lon", z: int = 8,
    out: str = "quadkey",
) -> DataFrame:
    """Attach the quadkey via staged named columns (codegen-compact): one
    projection computes (x, y), then one concat of z tiny digit
    expressions each referencing x/y once."""
    if not 1 <= z <= 23:
        raise ValueError(f"zoom {z} not in [1, 23]")
    n = 1 << z
    x = F.least(
        F.greatest(F.floor((F.col(lon) + 180.0) / 360.0 * n).cast("long"), F.lit(0)),
        F.lit(n - 1),
    )
    clat = F.least(F.greatest(F.col(lat), F.lit(-_MERC_MAX_LAT)), F.lit(_MERC_MAX_LAT))
    # NOTE: clat * pi / 180 with SQL's left-to-right associativity — folding
    # the constant to (pi/180) first changes the double and breaks parity
    s = F.sin(clat * math.pi / 180.0)
    merc = (F.lit(0.5) - F.log((1.0 + s) / (1.0 - s)) / (4.0 * math.pi)) * n
    y = F.least(F.greatest(F.floor(F.round(merc, 9)).cast("long"), F.lit(0)), F.lit(n - 1))
    df = df.withColumn("_qx", x).withColumn("_qy", y)
    digits = [
        (
            F.shiftright("_qx", k).bitwiseAND(F.lit(1))
            + F.shiftright("_qy", k).bitwiseAND(F.lit(1)) * 2
        ).cast("string")
        for k in range(z - 1, -1, -1)
    ]
    return df.withColumn(out, F.concat(*digits)).drop("_qx", "_qy")


# ---------------------------------------------------------------------------
# geohash (precision 6 = 30 bits: 15 lon + 15 lat, lon leads)

_GH_BITS_PER_AXIS = 15
_GH_PRECISION = 6


def _gh_grid_sql(lat_expr: str, lon_expr: str) -> tuple[str, str]:
    b = _GH_BITS_PER_AXIS
    return (
        cells.grid_x_sql(lon_expr, b),
        cells.grid_y_sql(lat_expr, b),
    )


def geohash_sql(lat_expr: str, lon_expr: str) -> str:
    """One SQL expression for the precision-6 geohash string (textual
    emitter — oracle/tests only; hot plans use :func:`with_geohash_col`).

    Interleave = Morton spread with lon at the odd (shifted) positions so
    the MSB-first read is lon, lat, lon, lat, ... — the geohash bit order.
    """
    ix, iy = _gh_grid_sql(lat_expr, lon_expr)
    m = f"({cells._spread_sql(ix)} << 1 | {cells._spread_sql(iy)})"
    chars = [
        f"SUBSTR('{_BASE32}', CAST(({m} >> {5 * (_GH_PRECISION - 1 - k)}) & 31 AS INT) + 1, 1)"
        for k in range(_GH_PRECISION)
    ]
    return "CONCAT(" + ", ".join(chars) + ")"


def with_geohash_col(
    df: DataFrame, lat: str = "lat", lon: str = "lon", out: str = "geohash"
) -> DataFrame:
    """Attach the precision-6 geohash via staged named columns."""
    b = _GH_BITS_PER_AXIS
    n = 1 << b
    ix = F.least(
        F.greatest(F.floor((F.col(lon) + 180.0) / 360.0 * n).cast("long"), F.lit(0)),
        F.lit(n - 1),
    )
    iy = F.least(
        F.greatest(F.floor((F.col(lat) + 90.0) / 180.0 * n).cast("long"), F.lit(0)),
        F.lit(n - 1),
    )
    df = df.withColumn("_gx", ix).withColumn("_gy", iy)
    for shift, mask in cells.SPREAD_MASKS:
        m = int(mask)
        df = df.withColumn(
            "_gx", (F.col("_gx").bitwiseOR(F.shiftleft("_gx", shift))).bitwiseAND(F.lit(m))
        ).withColumn(
            "_gy", (F.col("_gy").bitwiseOR(F.shiftleft("_gy", shift))).bitwiseAND(F.lit(m))
        )
    df = df.withColumn("_gm", F.shiftleft("_gx", 1).bitwiseOR(F.col("_gy")))
    alpha = F.lit(_BASE32)
    chars = [
        F.substr(
            alpha,
            (F.shiftright("_gm", 5 * (_GH_PRECISION - 1 - k)).bitwiseAND(F.lit(31)) + 1).cast("int"),
            F.lit(1),
        )
        for k in range(_GH_PRECISION)
    ]
    return df.withColumn(out, F.concat(*chars)).drop("_gx", "_gy", "_gm")


# ---------------------------------------------------------------------------
# Hilbert curve (order-k xy -> d) — the locality-superior cousin of the
# Morton index: consecutive d values are ALWAYS grid-adjacent (no Z-order
# jumps), so range scans over d touch spatially-contiguous tiles.

def hilbert_xy2d_py(order: int, x: int, y: int) -> int:
    """Pure-python scalar Hilbert index (the classic Wikipedia/Warren
    iterative rotate-and-accumulate form) — the independent replay for
    the staged-column engine path below."""
    d = 0
    s = 1 << (order - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def with_hilbert_col(
    df: DataFrame, lat: str = "lat", lon: str = "lon", order: int = 8,
    out: str = "hilbert_d",
) -> DataFrame:
    """Attach the order-``order`` Hilbert index as staged JVM columns —
    the per-level rotation (reflect + swap) unrolls to ``order`` small
    projections, entirely whole-stage codegen (no UDF). Grid mapping is
    the same equirectangular floor as core.cells grid_xy."""
    if not 1 <= order <= 26:
        raise ValueError(f"order {order} not in [1, 26]")
    n = 1 << order
    x0 = F.least(
        F.greatest(F.floor((F.col(lon) + 180.0) / 360.0 * n).cast("long"), F.lit(0)),
        F.lit(n - 1),
    )
    y0 = F.least(
        F.greatest(F.floor((F.col(lat) + 90.0) / 180.0 * n).cast("long"), F.lit(0)),
        F.lit(n - 1),
    )
    df = df.withColumn("_hx", x0).withColumn("_hy", y0).withColumn(
        "_hd", F.lit(0).cast("long")
    )
    s = n >> 1
    while s > 0:
        rx = F.when(F.col("_hx").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        ry = F.when(F.col("_hy").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        df = (
            df.withColumn("_rx", rx)
            .withColumn("_ry", ry)
            .withColumn(
                "_hd",
                F.col("_hd")
                + F.lit(s * s).cast("long")
                * (F.col("_rx") * 3).bitwiseXOR(F.col("_ry")).cast("long"),
            )
        )
        # rotate: if ry == 0 { if rx == 1 reflect; swap(x, y) }
        refl_x = F.when(F.col("_rx") == 1, F.lit(s - 1) - F.col("_hx")).otherwise(
            F.col("_hx")
        )
        refl_y = F.when(F.col("_rx") == 1, F.lit(s - 1) - F.col("_hy")).otherwise(
            F.col("_hy")
        )
        new_x = F.when(F.col("_ry") == 0, refl_y).otherwise(F.col("_hx"))
        new_y = F.when(F.col("_ry") == 0, refl_x).otherwise(F.col("_hy"))
        df = (
            df.withColumn("_nx", new_x)
            .withColumn("_ny", new_y)
            .withColumn("_hx", F.col("_nx"))
            .withColumn("_hy", F.col("_ny"))
            .drop("_nx", "_ny", "_rx", "_ry")
        )
        s >>= 1
    return df.withColumn(out, F.col("_hd")).drop("_hx", "_hy", "_hd")
