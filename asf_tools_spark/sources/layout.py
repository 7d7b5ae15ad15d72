"""Scan-pruning data layout: cluster a table's files by a sort key so
parquet footer min/max statistics let readers skip files / row groups.

The 100 TB lever for selective spatial scans: pages written clustered by
their Morton cell id (core/cells.py — Z-order, so 2-D locality collapses
to 1-D ranges) give every file a narrow, DISJOINT cell range. A bbox
query then touches only the files whose [min, max] intersects the query
cells — the same mechanics Iceberg/Delta data-skipping uses, expressed
with plain parquet + Spark:

- ``repartitionByRange(key)`` makes file ranges disjoint (global sort
  boundaries via reservoir sampling — one extra exchange at write time);
- ``sortWithinPartitions(key)`` orders rows inside each file so EVERY
  row group (not just the file) carries tight min/max stats;
- the parquet writer records per-column min/max in the footer; Spark's
  reader prunes row groups from the pushed-down predicate
  (``PushedFilters`` in the scan), and table formats prune whole files
  from the same stats.

Write amplification is one range exchange — paid once, amortized over
every subsequent selective read. tests/test_layout.py pins both halves:
footer ranges disjoint after the clustered write (and NOT disjoint after
a round-robin write — the assertion is meaningful), and the equality
predicate reaching PushedFilters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_clustered(
    df: DataFrame, path: str, by: list[str] | str, n_files: int,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``n_files`` parquet files range-clustered on
    ``by``: disjoint key ranges across files, sorted rows within, so
    footer stats support file- and row-group-level skipping."""
    cols = [by] if isinstance(by, str) else list(by)
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )


def file_key_ranges(path: str, column: str) -> list[tuple]:
    """Per-file (min, max) of ``column`` from parquet footer statistics —
    the metadata a pruning reader consults, read here engine-agnostically
    via pyarrow (no Spark session needed)."""
    from pathlib import Path

    import pyarrow.parquet as pq

    out = []
    for f in sorted(Path(path).glob("*.parquet")):
        md = pq.ParquetFile(str(f)).metadata
        idx = md.schema.to_arrow_schema().get_field_index(column)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            out.append((lo, hi))
    return out


def ranges_disjoint(ranges: list[tuple]) -> bool:
    """True iff the (min, max) intervals are pairwise non-overlapping —
    the property that makes per-file skipping exact for range queries."""
    s = sorted(ranges)
    return all(s[i][0] > s[i - 1][1] for i in range(1, len(s)))
