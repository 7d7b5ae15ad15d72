"""Water-map pipeline datapoint: full make_water_map_grid on a synthetic
dual-pol scene (the BENCH/BASELINE.md "Full water-map pipeline" number).

Usage: python scripts/bench_watermap.py [rows cols] (default 1000 1500)
Prints one JSON line {"px": N, "elapsed_sec": s, "px_per_sec": r}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from asf_tools_spark.plans.water_map import make_water_map_grid  # noqa: E402
from asf_tools_spark.session import get_spark  # noqa: E402


def synth_scene(rows: int, cols: int, seed: int = 5):
    """Deterministic dual-pol backscatter + HAND arrays with water-like
    low-backscatter blobs (same construction as tests/test_water_pipeline)."""
    rng = np.random.default_rng(seed)
    rr, cc = np.mgrid[0:rows, 0:cols]
    water_mask = (np.sin(rr / 37.0) * np.cos(cc / 53.0) + np.sin((rr + cc) / 71.0)) < -0.8
    vh = rng.uniform(0.02, 0.4, (rows, cols))
    vh[water_mask] *= 0.02
    vv = rng.uniform(0.05, 0.8, (rows, cols))
    vv[water_mask] *= 0.03
    hand = np.abs(np.sin(rr / 91.0) * 20.0) + rng.uniform(0, 2, (rows, cols))
    hand[water_mask] *= 0.1
    return vv, vh, hand


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    cols = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))
    spark = get_spark("watermap-bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from asf_tools_spark.operators.tiling import long_grid_df

    vv, vh, hand = synth_scene(rows, cols)
    tile = (100, 100)
    vv_g = long_grid_df(spark, vv, tile).persist()
    vh_g = long_grid_df(spark, vh, tile).persist()
    hand_g = long_grid_df(spark, hand, tile).persist()
    vv_g.count(), vh_g.count(), hand_g.count()  # materialize inputs untimed

    t0 = time.time()
    out = make_water_map_grid(vv_g, vh_g, hand_g, (rows, cols), tile_shape=tile)
    n = out["water_map"].count()
    dt = time.time() - t0
    print(json.dumps({
        "px": rows * cols, "water_px": int(n),
        "elapsed_sec": round(dt, 2), "px_per_sec": round(rows * cols / dt, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
