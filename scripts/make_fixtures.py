"""Re-express the reference's golden .npz fixtures as long-form parquet.

Reads /root/reference/tests/hydrosar/data/*.npz (read-only) and writes
tests/fixtures/*.parquet in the long-form grid schema of FIXTURES.md §3:
(tile_id, row, col, value, valid). Run once; outputs are committed so the
test suite never needs the reference checkout.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REF = Path("/root/reference/tests/hydrosar/data")
OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures"
OUT.mkdir(parents=True, exist_ok=True)


def write(name: str, **cols: np.ndarray) -> None:
    table = pa.table({k: pa.array(v) for k, v in cols.items()})
    pq.write_table(table, OUT / f"{name}.parquet")
    print(name, table.num_rows, table.schema.names)


def main() -> None:
    d = np.load(REF / "em_tiles.npz")
    tiles, mask = d["tiles"], d["mask"]  # (5,100,100) float32 + bool
    n, h, w = tiles.shape
    tid = np.repeat(np.arange(n, dtype=np.int64), h * w)
    rr = np.tile(np.repeat(np.arange(h, dtype=np.int32), w), n)
    cc = np.tile(np.tile(np.arange(w, dtype=np.int32), h), n)
    write(
        "em_tiles",
        tile_id=tid,
        row=rr,
        col=cc,
        value=tiles.astype(np.float64).ravel(),
        valid=~mask.ravel(),
    )

    th = np.load(REF / "em_thresholds.npz")["thresholds"]
    write("em_thresholds", tile_id=np.arange(len(th), dtype=np.int64), threshold=th.astype(np.float64))

    hc = np.load(REF / "hand_candidates.npz")["hand_candidates"]
    write("hand_candidates", tile_id=hc.astype(np.int64))

    hw = np.load(REF / "hand_window.npz")["hand_window"]  # (25,101) float32
    r, c = np.meshgrid(np.arange(hw.shape[0], dtype=np.int32), np.arange(hw.shape[1], dtype=np.int32), indexing="ij")
    write("hand_window", row=r.ravel(), col=c.ravel(), hand=hw.astype(np.float64).ravel())

    fw = np.load(REF / "flood_window.npz")["flood_window"]  # (25,101) int32
    write("flood_window", row=r.ravel(), col=c.ravel(), label=fw.astype(np.int64).ravel())


if __name__ == "__main__":
    main()
