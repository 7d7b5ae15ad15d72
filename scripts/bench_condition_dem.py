"""Datapoint: hierarchical condition_dem on a 512x512 pitted DEM.

Reports rounds + wall time with the Barnes-style border-graph seed on vs
off (VERDICT r2 item 5: round count <= ~2 log with the coarse pass, vs the
O(tile-graph semi-perimeter) plain fixpoint), and verifies both against the
full-array numpy priority flood.

Usage: python scripts/bench_condition_dem.py [size] [tile] [--skip-plain]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from asf_tools_spark.core.dem import priority_flood_fill  # noqa: E402
from asf_tools_spark.operators.hand import condition_dem  # noqa: E402
from asf_tools_spark.session import get_spark  # noqa: E402


def main() -> None:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    skip_plain = "--skip-plain" in sys.argv

    rng = np.random.default_rng(42)
    elev = rng.uniform(10, 20, (size, size))
    n_pits = max(size // 32, 4)
    for i in range(n_pits):
        r = int(rng.integers(5, size - 30))
        c = int(rng.integers(5, size - 30))
        s = int(rng.integers(5, 25))
        elev[r:r + s, c:c + s] = 1.0 + 0.01 * r
    elev[size // 2:size // 2 + 20, 10:size - 10] = 15.0  # long flat shelf

    t0 = time.time()
    expected = priority_flood_fill(elev, eps=1e-5)
    t_numpy = time.time() - t0

    spark = get_spark("cond-bench", master="local[32]", shuffle_partitions=32)
    pdf = pd.DataFrame({
        "row": np.repeat(np.arange(size), size).astype(np.int32),
        "col": np.tile(np.arange(size), size).astype(np.int32),
        "elev": elev.ravel(),
    })
    grid = spark.createDataFrame(pdf)

    for label, coarse in (("coarse", True),) + ((("plain", False),) if not skip_plain else ()):
        stats: dict = {}
        t0 = time.time()
        out = condition_dem(grid, (tile, tile), eps=1e-5, coarse_init=coarse, stats=stats)
        got = {(r.row, r.col): r.elev for r in out.collect()}
        dt = time.time() - t0
        mism = sum(
            0 if np.isclose(got[(r, c)], e, rtol=0, atol=1e-12) else 1
            for (r, c), e in np.ndenumerate(expected)
        )
        print(f"{label}: size={size} tile={tile} rounds={stats['rounds']} "
              f"wall={dt:.1f}s exact_mismatches={mism} (numpy oracle {t_numpy:.1f}s)")
    spark.stop()


if __name__ == "__main__":
    main()
