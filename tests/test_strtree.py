"""STR-packed R-tree: packing invariants, brute-force probe parity, and
end-to-end equality with the cover-cell PIP path."""

import numpy as np

from asf_tools_spark.operators.strtree import str_pack, str_query_points


def _rand_boxes(rng, n):
    x0 = rng.uniform(-170, 160, n)
    y0 = rng.uniform(-80, 70, n)
    return np.stack([x0, y0, x0 + rng.uniform(1, 15, n), y0 + rng.uniform(1, 12, n)], axis=1)


def test_str_pack_invariants():
    rng = np.random.default_rng(3)
    boxes = _rand_boxes(rng, 137)
    tree = str_pack(boxes, leaf_size=16)
    order, offs, lb = tree["order"], tree["offsets"], tree["leaf_bounds"]
    assert sorted(order.tolist()) == list(range(137))  # each box exactly once
    widths = np.diff(offs)
    assert widths.sum() == 137 and (widths <= 16).all() and (widths > 0).all()
    for i in range(len(lb)):
        member = boxes[order[offs[i]: offs[i + 1]]]
        assert lb[i, 0] <= member[:, 0].min() and lb[i, 2] >= member[:, 2].max()
        assert lb[i, 1] <= member[:, 1].min() and lb[i, 3] >= member[:, 3].max()


def test_str_query_matches_bruteforce():
    rng = np.random.default_rng(7)
    boxes = _rand_boxes(rng, 60)
    tree = str_pack(boxes, leaf_size=8)
    x = rng.uniform(-180, 180, 500)
    y = rng.uniform(-90, 90, 500)
    pi, bi = str_query_points(tree, x, y)
    got = set(zip(pi.tolist(), bi.tolist()))
    brute = {
        (p, b)
        for p in range(500) for b in range(60)
        if boxes[b, 0] <= x[p] <= boxes[b, 2] and boxes[b, 1] <= y[p] <= boxes[b, 3]
    }
    assert got == brute


def test_str_pack_empty():
    tree = str_pack(np.empty((0, 4)))
    pi, bi = str_query_points(tree, np.array([1.0]), np.array([2.0]))
    assert len(pi) == 0 and len(bi) == 0


def test_strtree_pip_equals_cover_path(spark):
    from asf_tools_spark.queries import q_pip_page_counts, q_pip_strtree

    sf = "/root/testdata/sf0.001"
    cover = {tuple(r) for r in q_pip_page_counts(spark, sf).collect()}
    strt = {tuple(r) for r in q_pip_strtree(spark, sf).collect()}
    assert cover == strt and len(cover) > 0


def test_tile_pyramid_random_differential(spark):
    """tile_pyramid vs an independent pure-python rollup, 3 seeds."""
    import random

    import pandas as pd

    from asf_tools_spark.operators.tiling import tile_pyramid

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        pts = [(rng.uniform(-90, 90), rng.uniform(-180, 180), rng.uniform(0, 2))
               for _ in range(200)]
        pdf = pd.DataFrame(pts, columns=["lat", "lon", "value"])
        out = tile_pyramid(spark.createDataFrame(pdf), base_res=4)
        got = {(r.res, r.row, r.col): (r.n_pages, round(r.sum_value, 9))
               for r in out.collect()}
        expect = {}
        for lat, lon, val in pts:
            n = 1 << 4
            row = min(max(int((lat + 90.0) / 180.0 * n), 0), n - 1)
            col = min(max(int((lon + 180.0) / 360.0 * n), 0), n - 1)
            for res in range(5):
                key = (res, row >> (4 - res), col >> (4 - res))
                c, s = expect.get(key, (0, 0.0))
                expect[key] = (c + 1, s + val)
        assert got.keys() == expect.keys()
        for k, (c, s) in expect.items():
            assert got[k][0] == c and abs(got[k][1] - s) < 1e-6
