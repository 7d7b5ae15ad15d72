"""convex_hull: closed-form pins, strict-turn/duplicate semantics, and the
O(n^3) extreme-point DUAL characterization as an independent differential
(a point is a hull vertex iff some directed line through it and one other
point has every remaining point strictly to the left)."""

import numpy as np

from asf_tools_spark.operators.geometry import _hull_ccw_np, convex_hull
from asf_tools_spark.sources.polygons import convex_hull_py


def _pts(spark, groups):
    rows = [
        (g, float(x), float(y)) for g, pts in groups.items() for x, y in pts
    ]
    return spark.createDataFrame(rows, "poly_id int, lon double, lat double")


def _extreme_points(pts):
    """Dual test: independent of any hull-scan implementation."""
    pts = sorted(set(pts))
    out = []
    for p in pts:
        for q in pts:
            if q == p:
                continue
            ok = True
            for r in pts:
                if r in (p, q):
                    continue
                cr = (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])
                if cr <= 0:
                    ok = False
                    break
            if ok:
                out.append(p)
                break
    return set(out)


def test_square_with_interior_point(spark):
    g = {0: [(0, 0), (2, 0), (2, 2), (0, 2), (1, 1)]}
    rows = convex_hull(_pts(spark, g)).orderBy("hull_idx").collect()
    assert [(r.lon, r.lat) for r in rows] == [(0, 0), (2, 0), (2, 2), (0, 2)]
    assert all(r.n_input == 5 for r in rows)


def test_collinear_edge_midpoint_dropped(spark):
    g = {0: [(0, 0), (1, 0), (2, 0), (2, 2), (0, 2)]}
    rows = convex_hull(_pts(spark, g)).orderBy("hull_idx").collect()
    assert [(r.lon, r.lat) for r in rows] == [(0, 0), (2, 0), (2, 2), (0, 2)]


def test_duplicates_deduped(spark):
    g = {0: [(0, 0), (0, 0), (3, 0), (3, 3), (3, 3), (0, 3)]}
    rows = convex_hull(_pts(spark, g)).orderBy("hull_idx").collect()
    assert [(r.lon, r.lat) for r in rows] == [(0, 0), (3, 0), (3, 3), (0, 3)]
    assert rows[0].n_input == 6  # raw input size reported


def test_degenerate_all_collinear(spark):
    g = {0: [(0, 0), (1, 1), (2, 2), (3, 3)]}
    rows = convex_hull(_pts(spark, g)).orderBy("hull_idx").collect()
    # chain degenerates to the two extreme endpoints
    assert [(r.lon, r.lat) for r in rows] == [(0, 0), (3, 3)]


def test_randomized_differential_vs_dual_and_replay(spark):
    rng = np.random.RandomState(11)
    groups = {
        g: [(float(x), float(y)) for x, y in rng.rand(40, 2)] for g in range(4)
    }
    out = convex_hull(_pts(spark, groups)).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.poly_id, []).append((r.hull_idx, r.lon, r.lat))
    for g, pts in groups.items():
        hull = [(x, y) for _, x, y in sorted(by_g[g])]
        # 1) exactly the extreme points (dual characterization)
        assert set(hull) == _extreme_points(pts)
        # 2) CCW from the lexicographically smallest vertex
        assert hull[0] == min(hull)
        area2 = sum(
            hull[i][0] * hull[(i + 1) % len(hull)][1]
            - hull[(i + 1) % len(hull)][0] * hull[i][1]
            for i in range(len(hull))
        )
        assert area2 > 0
        # 3) pure-Python replay (the oracle path) agrees vertex-for-vertex
        replay = convex_hull_py([{"poly_id": g, "ring": pts}])
        assert [(i, x, y) for _, i, x, y in replay] == [
            (i, x, y) for i, (x, y) in enumerate(hull)
        ]


def test_numpy_chain_matches_python_chain_on_lattice(spark):
    # 0.001-degree lattice coordinates (the corpus jitter grid): exercises
    # exact-collinearity paths in both implementations
    rng = np.random.RandomState(5)
    pts = [(round(float(x), 3), round(float(y), 3)) for x, y in rng.rand(120, 2)]
    hull_np = _hull_ccw_np([p[0] for p in pts], [p[1] for p in pts])
    replay = convex_hull_py([{"poly_id": 0, "ring": pts}])
    assert [(x, y) for _, _, x, y in replay] == [tuple(v) for v in hull_np]
