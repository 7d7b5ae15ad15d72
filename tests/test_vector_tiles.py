"""Sutherland-Hodgman tile clipping: hand cases + numpy-vs-scalar
equality (the two implementations behind the vector_tiles oracle row)."""

import numpy as np

from asf_tools_spark.operators.geometry import _clip_ring_np, _ring_area_seq
from asf_tools_spark.sources.polygons import _ring_area_py, clip_ring_py


SQ_X = [1.0, 3.0, 3.0, 1.0]
SQ_Y = [1.0, 1.0, 3.0, 3.0]


def test_fully_inside_is_unchanged_up_to_rotation():
    cx, cy = clip_ring_py(list(SQ_X), list(SQ_Y), 0.0, 10.0, 0.0, 10.0)
    assert sorted(zip(cx, cy)) == sorted(zip(SQ_X, SQ_Y))
    assert _ring_area_py(cx, cy) == 4.0


def test_straddling_clip_hand_case():
    # clip the 2x2 square at x <= 2: left half remains, area 2
    cx, cy = clip_ring_py(list(SQ_X), list(SQ_Y), 0.0, 2.0, 0.0, 10.0)
    assert sorted(zip(cx, cy)) == [(1.0, 1.0), (1.0, 3.0), (2.0, 1.0), (2.0, 3.0)]
    assert _ring_area_py(cx, cy) == 4.0 / 2


def test_fully_outside_is_empty():
    cx, cy = clip_ring_py(list(SQ_X), list(SQ_Y), 5.0, 9.0, 5.0, 9.0)
    assert cx == [] and cy == []
    assert _ring_area_py(cx, cy) == 0.0


def test_corner_clip_area():
    # clip at x<=2, y<=2: unit corner square
    cx, cy = clip_ring_py(list(SQ_X), list(SQ_Y), 0.0, 2.0, 0.0, 2.0)
    assert _ring_area_py(cx, cy) == 1.0


def test_numpy_and_scalar_agree_bit_for_bit():
    rng = np.random.default_rng(11)
    for _ in range(25):
        k = int(rng.integers(3, 14))
        ang = np.linspace(0, 2 * np.pi, k, endpoint=False)
        rad = rng.uniform(0.5, 4.0, k)
        xs = (10.0 + rad * np.cos(ang)).tolist()
        ys = (20.0 + rad * np.sin(ang)).tolist()
        rect = (
            float(rng.uniform(6, 10)), float(rng.uniform(10, 14)),
            float(rng.uniform(16, 20)), float(rng.uniform(20, 24)),
        )
        ax, ay = _clip_ring_np(list(xs), list(ys), *rect)
        bx, by = clip_ring_py(list(xs), list(ys), *rect)
        assert ax == bx and ay == by  # exact float equality, not approx
        assert _ring_area_seq(ax, ay) == _ring_area_py(bx, by)
