"""H3/S2-style geocell index: Z-order (Morton) cells over lat/lon.

Plays the role of asf-tools' tile catalogs (1x1-degree DEM/HAND tiles looked
up by geometry intersection, ref: src/asf_tools/dem.py:12,
src/asf_tools/hydrosar/hand/prepare.py:15, and the row-major tile ids of
src/asf_tools/tile.py:123-128) as a proper hierarchical cell index:

- ``encode(lat, lon, res)``: equirectangular quadtree cell at resolution
  ``res`` (0..26). The globe is a 2^res x 2^res grid over lon in [-180,180)
  and lat in [-90,90); the cell id interleaves the x/y grid indices
  (Morton/Z-order) so that prefix = parent, which gives cheap parent/child,
  k-ring, and range-cover operations — the properties the engine needs from
  H3/S2 without the (unavailable) native libraries.
- ids pack the resolution in the top bits: id = (res << 54) | morton.

Everything is vectorized numpy (used inside pandas UDFs) and there is a
mirror SQL emitter (``morton_cell_sql``) producing the *identical* integer
ids as a pure SQL expression runnable by both Spark SQL and DuckDB — the
engine/oracle parity contract.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 26
_RES_SHIFT = 54


def _spread_bits32(v: np.ndarray) -> np.ndarray:
    """Spread the low 27 bits of ``v`` so bit i lands at position 2i."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _compact_bits32(v: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_spread_bits32`."""
    v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def grid_xy(lat: np.ndarray, lon: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """lat/lon -> integer grid coordinates at resolution ``res``."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"resolution {res} not in [0, {MAX_RES}]")
    n = 1 << res
    x = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * n).astype(np.int64)
    y = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * n).astype(np.int64)
    np.clip(x, 0, n - 1, out=x)
    np.clip(y, 0, n - 1, out=y)
    return x, y


def encode(lat: np.ndarray, lon: np.ndarray, res: int) -> np.ndarray:
    """Vectorized lat/lon -> cell id (int64)."""
    x, y = grid_xy(lat, lon, res)
    morton = _spread_bits32(x) | (_spread_bits32(y) << np.uint64(1))
    return ((np.uint64(res) << np.uint64(_RES_SHIFT)) | morton).astype(np.int64)


def from_xy(x: np.ndarray, y: np.ndarray, res: int) -> np.ndarray:
    morton = _spread_bits32(np.asarray(x)) | (_spread_bits32(np.asarray(y)) << np.uint64(1))
    return ((np.uint64(res) << np.uint64(_RES_SHIFT)) | morton).astype(np.int64)


def decode_xy(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell id -> (x, y, res)."""
    c = np.asarray(cell).astype(np.uint64)
    res = (c >> np.uint64(_RES_SHIFT)).astype(np.int64)
    morton = c & ((np.uint64(1) << np.uint64(_RES_SHIFT)) - np.uint64(1))
    x = _compact_bits32(morton).astype(np.int64)
    y = _compact_bits32(morton >> np.uint64(1)).astype(np.int64)
    return x, y, res


def cell_center(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """cell id -> (lat, lon) of the cell center."""
    x, y, res = decode_xy(cell)
    n = (np.int64(1) << res).astype(np.float64)
    lon = (x + 0.5) / n * 360.0 - 180.0
    lat = (y + 0.5) / n * 180.0 - 90.0
    return lat, lon


def parent(cell: np.ndarray, parent_res: int) -> np.ndarray:
    """Coarsen a cell id to ``parent_res`` (prefix property of Z-order)."""
    x, y, res = decode_xy(cell)
    shift = res - parent_res
    if np.any(shift < 0):
        raise ValueError("parent_res must be <= cell resolution")
    return from_xy(x >> shift, y >> shift, parent_res)


def k_ring(cell: int, k: int = 1) -> np.ndarray:
    """All cells within Chebyshev distance k (the kNN ring-expansion
    primitive; generalizes the reference's covering-tile lookup,
    ref: src/asf_tools/watermasking/generate_worldcover_tiles.py:143-188)."""
    x, y, res = decode_xy(np.asarray([cell]))
    x, y, res = int(x[0]), int(y[0]), int(res[0])
    n = 1 << res
    dx, dy = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1))
    xs = (x + dx.ravel()) % n  # wrap longitude
    ys = y + dy.ravel()
    keep = (ys >= 0) & (ys < n)  # clamp latitude (no polar wrap)
    return np.unique(from_xy(xs[keep], ys[keep], res))


def cover_bbox(min_lat: float, min_lon: float, max_lat: float, max_lon: float, res: int) -> np.ndarray:
    """All cells at ``res`` intersecting a bbox (partition-pruning cover;
    the Spark analogue of VRT tile-catalog intersection,
    ref: src/asf_tools/dem.py:39-45)."""
    x0, y0 = grid_xy(np.asarray([min_lat]), np.asarray([min_lon]), res)
    x1, y1 = grid_xy(np.asarray([max_lat]), np.asarray([max_lon]), res)
    xs = np.arange(int(x0[0]), int(x1[0]) + 1)
    ys = np.arange(int(y0[0]), int(y1[0]) + 1)
    gx, gy = np.meshgrid(xs, ys)
    return from_xy(gx.ravel(), gy.ravel(), res)


# ---------------------------------------------------------------------------
# Shared SQL emitter (Spark SQL == DuckDB): identical integer ids.
# ---------------------------------------------------------------------------

SPREAD_MASKS = [
    (16, "281470681808895"),     # 0x0000FFFF0000FFFF
    (8, "71777214294589695"),    # 0x00FF00FF00FF00FF
    (4, "1085102592571150095"),  # 0x0F0F0F0F0F0F0F0F
    (2, "3689348814741910323"),  # 0x3333333333333333
    (1, "6148914691236517205"),  # 0x5555555555555555
]


def _spread_sql(expr: str) -> str:
    """Inline bit-spread. WARNING: doubles the operand text per level (32x
    total) — fine for literals/tests; use :func:`cell_layered_select` or
    functions.spatial.with_cell_col in hot query plans."""
    out = expr
    for shift, mask in SPREAD_MASKS:
        out = f"(({out} | ({out} << {shift})) & {mask})"
    return out


def cell_layered_select(
    inner_sql: str,
    lat_col: str,
    lon_col: str,
    res: int,
    carry: list[str],
    out: str = "cell_id",
) -> str:
    """Layered (linear-size) cell-id computation as nested subqueries.

    ``inner_sql`` is a parenthesized relation exposing ``lat_col``,
    ``lon_col`` and the ``carry`` columns; the result exposes carry + lat +
    lon + ``out``. Each bit-spread level references named columns exactly
    once, so both Catalyst codegen and DuckDB stay compact.
    """
    if not 0 <= res <= 16:
        raise ValueError("SQL emitter supports res in [0, 16]")
    cols = ", ".join(dict.fromkeys(carry + [lat_col, lon_col]))
    sql = (
        f"(SELECT {cols}, {grid_x_sql(lon_col, res)} AS _mx, {grid_y_sql(lat_col, res)} AS _my"
        f" FROM {inner_sql} _cl0)"
    )
    for i, (shift, mask) in enumerate(SPREAD_MASKS):
        sql = (
            f"(SELECT {cols}, ((_mx | (_mx << {shift})) & {mask}) AS _mx,"
            f" ((_my | (_my << {shift})) & {mask}) AS _my FROM {sql} _cl{i + 1})"
        )
    return (
        f"(SELECT {cols}, (CAST({res} AS BIGINT) << {_RES_SHIFT}) | _mx | (_my << 1) AS {out}"
        f" FROM {sql} _clf)"
    )


def grid_x_sql(lon_expr: str, res: int) -> str:
    n = 1 << res
    # literals cast to DOUBLE: Spark would otherwise use DECIMAL arithmetic
    # where DuckDB uses DOUBLE, breaking bit parity on the floor() boundary
    return (
        f"LEAST(GREATEST(CAST(FLOOR(((CAST({lon_expr} AS DOUBLE)) + CAST(180.0 AS DOUBLE))"
        f" / CAST(360.0 AS DOUBLE) * {n}) AS BIGINT), 0), {n - 1})"
    )


def grid_y_sql(lat_expr: str, res: int) -> str:
    n = 1 << res
    return (
        f"LEAST(GREATEST(CAST(FLOOR(((CAST({lat_expr} AS DOUBLE)) + CAST(90.0 AS DOUBLE))"
        f" / CAST(180.0 AS DOUBLE) * {n}) AS BIGINT), 0), {n - 1})"
    )


def morton_cell_sql(lat_expr: str, lon_expr: str, res: int) -> str:
    """Emit one SQL expression computing exactly :func:`encode`.

    Uses only ``FLOOR/LEAST/GREATEST/CAST`` and bitwise ``<< & |`` — verified
    identical semantics on Spark SQL 4.1 and DuckDB 1.0. res <= 16 keeps the
    Morton code within a non-negative int64 even before the res tag.
    """
    if not 0 <= res <= 16:
        raise ValueError("SQL emitter supports res in [0, 16]")
    x = grid_x_sql(lon_expr, res)
    y = grid_y_sql(lat_expr, res)
    morton = f"({_spread_sql(x)} | ({_spread_sql(y)} << 1))"
    return f"(CAST({res} AS BIGINT) << {_RES_SHIFT}) | {morton}"
