"""Console entry points mirroring the reference's CLIs
(ref pyproject.toml:41-48: make_composite, water_map, flood_map,
calculate_hand) over long-form parquet grids instead of GeoTIFFs.

  python -m asf_tools_spark water_map OUT VV VH --hand HAND
  python -m asf_tools_spark flood_map OUT WATER HAND --estimator nmad
  python -m asf_tools_spark calculate_hand OUT DEM --acc-threshold 100
  python -m asf_tools_spark make_composite OUT RASTER:AREA[:ROFF:COFF] ...

Grid tables are parquet with columns (tile_id,row,col,value,valid) — the
engine's raster exchange format (core.tiles.grid_to_long).
"""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F

from .session import get_spark


def _read_grid(spark, path: str):
    return spark.read.parquet(path)


def cmd_water_map(args) -> None:
    from .plans.water_map import make_water_map_grid

    spark = get_spark("water_map")
    vv, vh, hand = (_read_grid(spark, p) for p in (args.vv, args.vh, args.hand))
    shape = tuple(args.grid_shape)
    out = make_water_map_grid(
        vv, vh, hand, shape, tuple(args.tile_shape),
        args.max_vv_threshold, args.max_vh_threshold,
        args.hand_threshold, args.hand_fraction, args.membership_threshold,
    )
    out["water_map"].write.mode("overwrite").parquet(args.out)
    print(f"water map written: {args.out}")


def cmd_flood_map(args) -> None:
    from .plans.flood_map import make_flood_map_grid

    spark = get_spark("flood_map")
    water = _read_grid(spark, args.water).select("row", "col")
    hand = _read_grid(spark, args.hand)
    vv_valid = hand.select("row", "col", F.lit(True).alias("valid"))
    out = make_flood_map_grid(
        water, None, vv_valid, hand, tuple(args.tile_shape),
        estimator=args.estimator, water_level_sigma=args.water_level_sigma,
        iterative_bounds=tuple(args.iterative_bounds),
    )
    out.write.mode("overwrite").parquet(args.out)
    print(f"flood map written: {args.out}")


def cmd_calculate_hand(args) -> None:
    from .operators.hand import calculate_hand

    spark = get_spark("calculate_hand")
    dem = _read_grid(spark, args.dem).select("row", "col", F.col("value").alias("elev"))
    out = calculate_hand(dem, acc_threshold=args.acc_threshold)
    out.write.mode("overwrite").parquet(args.out)
    print(f"HAND written: {args.out}")


def cmd_make_composite(args) -> None:
    from .operators.composite import make_composite

    spark = get_spark("make_composite")
    entries = []
    for spec in args.rasters:
        parts = spec.split(":")
        grid = _read_grid(spark, parts[0]).select("row", "col", "value")
        area = _read_grid(spark, parts[1]).select("row", "col", F.col("value").alias("area"))
        roff = int(parts[2]) if len(parts) > 2 else 0
        coff = int(parts[3]) if len(parts) > 3 else 0
        entries.append({"grid": grid, "area": area, "row_off": roff, "col_off": coff})
    make_composite(entries).write.mode("overwrite").parquet(args.out)
    print(f"composite written: {args.out}")


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="asf_tools_spark", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    w = sub.add_parser("water_map", help="surface water extent map (ref water_map.py)")
    w.add_argument("out"); w.add_argument("vv"); w.add_argument("vh")
    w.add_argument("--hand", required=True)
    w.add_argument("--grid-shape", type=int, nargs=2, required=True)
    w.add_argument("--tile-shape", type=int, nargs=2, default=(100, 100))
    w.add_argument("--max-vv-threshold", type=float, default=-15.5)
    w.add_argument("--max-vh-threshold", type=float, default=-23.0)
    w.add_argument("--hand-threshold", type=float, default=15.0)
    w.add_argument("--hand-fraction", type=float, default=0.8)
    w.add_argument("--membership-threshold", type=float, default=0.45)
    w.set_defaults(fn=cmd_water_map)

    f = sub.add_parser("flood_map", help="flood depth map (ref flood_map.py)")
    f.add_argument("out"); f.add_argument("water"); f.add_argument("hand")
    f.add_argument("--estimator", default="iterative",
                   choices=["iterative", "nmad", "numpy", "logstat"])
    f.add_argument("--water-level-sigma", type=float, default=3.0)
    f.add_argument("--iterative-bounds", type=int, nargs=2, default=(0, 15))
    f.add_argument("--tile-shape", type=int, nargs=2, default=(100, 100))
    f.set_defaults(fn=cmd_flood_map)

    h = sub.add_parser("calculate_hand", help="height above nearest drainage (ref hand/calculate.py)")
    h.add_argument("out"); h.add_argument("dem")
    h.add_argument("--acc-threshold", type=float, default=100.0)
    h.set_defaults(fn=cmd_calculate_hand)

    c = sub.add_parser("make_composite", help="local-resolution-weighted composite (ref composite.py)")
    c.add_argument("out")
    c.add_argument("rasters", nargs="+", metavar="GRID:AREA[:ROFF:COFF]")
    c.set_defaults(fn=cmd_make_composite)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
