"""Tile-key math replicating asf-tools' row-major tiling semantics.

The reference materializes a 3D tile stack by splitting a padded 2D array
(ref: src/asf_tools/tile.py:4-67 ``tile_array``) and reassembles with
``tile_id = ii * untiled_columns + jj`` (ref: src/asf_tools/tile.py:123-128
``untile_array``). Here tiling is *pure key arithmetic* over a long-form grid
``(row, col, value)`` — no data movement; Spark groupBys on the derived key.

Padding semantics (ref: tile.py:45-56): the grid is conceptually padded at
the right/bottom to a multiple of the tile shape; padded pixels carry
``valid=False`` (mask padded with True) and the pad value.
"""

from __future__ import annotations

import math

import numpy as np


def n_tile_cols(array_cols: int, tile_cols: int) -> int:
    return math.ceil(array_cols / tile_cols)


def n_tile_rows(array_rows: int, tile_rows: int) -> int:
    return math.ceil(array_rows / tile_rows)


def n_tiles(array_shape: tuple[int, int], tile_shape: tuple[int, int]) -> int:
    return n_tile_rows(array_shape[0], tile_shape[0]) * n_tile_cols(array_shape[1], tile_shape[1])


def tile_id(row: np.ndarray, col: np.ndarray, array_cols: int, tile_shape: tuple[int, int]) -> np.ndarray:
    """Row-major tile id for grid position (row, col).

    Matches ref tile.py:123-128 ordering exactly.
    """
    tr, tc = tile_shape
    ntc = n_tile_cols(array_cols, tc)
    return (np.asarray(row) // tr) * ntc + (np.asarray(col) // tc)


def tile_id_sql(row_expr: str, col_expr: str, array_cols: int, tile_shape: tuple[int, int]) -> str:
    """Shared Spark/DuckDB SQL for :func:`tile_id` (integer division)."""
    tr, tc = tile_shape
    ntc = n_tile_cols(array_cols, tc)
    return (
        f"(CAST(FLOOR(({row_expr}) / {tr}) AS BIGINT) * {ntc}"
        f" + CAST(FLOOR(({col_expr}) / {tc}) AS BIGINT))"
    )


def subtile_id(row: np.ndarray, col: np.ndarray, tile_shape: tuple[int, int]) -> np.ndarray:
    """2x2 sub-tile index (0..3) within a tile.

    Matches the reference's recursive split of each tile into four
    (tr/2, tc/2) sub-tiles in row-major order
    (ref: src/asf_tools/hydrosar/water_map.py:34-40 ``mean_of_subtiles``).
    """
    tr, tc = tile_shape
    r_in = np.asarray(row) % tr
    c_in = np.asarray(col) % tc
    return (r_in // (tr // 2)) * 2 + (c_in // (tc // 2))


def subtile_id_sql(row_expr: str, col_expr: str, tile_shape: tuple[int, int]) -> str:
    tr, tc = tile_shape
    return (
        f"(CAST(FLOOR((({row_expr}) % {tr}) / {tr // 2}) AS BIGINT) * 2"
        f" + CAST(FLOOR((({col_expr}) % {tc}) / {tc // 2}) AS BIGINT))"
    )


def padded_shape(array_shape: tuple[int, int], tile_shape: tuple[int, int]) -> tuple[int, int]:
    """Right/bottom padded shape (ref tile.py:45-46 ``-n % t`` padding)."""
    r, c = array_shape
    tr, tc = tile_shape
    return (r + (-r % tr), c + (-c % tc))


def grid_to_long(
    array: np.ndarray | np.ma.MaskedArray,
    tile_shape: tuple[int, int],
    pad_value: float = np.nan,
) -> dict[str, np.ndarray]:
    """2D (masked) array -> long-form columns incl. padded pixels.

    Returns dict of equal-length arrays ``tile_id,row,col,value,valid``
    that a DataFrame / pandas frame can be built from. Padded pixels get
    ``valid=False`` and ``pad_value`` (ref tile.py:51-56 semantics).
    """
    rows, cols = array.shape
    prows, pcols = padded_shape((rows, cols), tile_shape)
    values = np.full((prows, pcols), pad_value, dtype=np.float64)
    valid = np.zeros((prows, pcols), dtype=bool)
    if isinstance(array, np.ma.MaskedArray):
        filled = array.filled(pad_value).astype(np.float64)
        mask = np.ma.getmaskarray(array)
    else:
        filled = array.astype(np.float64)
        mask = ~np.isfinite(filled)
    values[:rows, :cols] = filled
    valid[:rows, :cols] = ~mask
    rr, cc = np.meshgrid(np.arange(prows), np.arange(pcols), indexing="ij")
    rr, cc = rr.ravel(), cc.ravel()
    return {
        "tile_id": tile_id(rr, cc, cols, tile_shape).astype(np.int64),
        "row": rr.astype(np.int32),
        "col": cc.astype(np.int32),
        "value": values.ravel(),
        "valid": valid.ravel(),
    }


def long_to_grid(
    tile_ids: np.ndarray,
    rows: np.ndarray,
    cols: np.ndarray,
    values: np.ndarray,
    valid: np.ndarray,
    array_shape: tuple[int, int],
) -> np.ma.MaskedArray:
    """Inverse of :func:`grid_to_long`; subsets away padding like
    ref tile.py:70-135 ``untile_array``."""
    prows = int(rows.max()) + 1 if len(rows) else array_shape[0]
    pcols = int(cols.max()) + 1 if len(cols) else array_shape[1]
    grid = np.full((prows, pcols), np.nan)
    mask = np.ones((prows, pcols), dtype=bool)
    grid[rows, cols] = values
    mask[rows, cols] = ~valid
    out = np.ma.MaskedArray(grid, mask=mask)
    return out[: array_shape[0], : array_shape[1]]
