"""End-to-end water-map pipeline: distributed plan vs the numpy mirror
(core.watermap_mirror is the golden-pinned spec; the distributed plan must
reproduce it stage for stage on a synthetic dual-pol scene)."""

import numpy as np
import pandas as pd
import pytest

from asf_tools_spark.core import watermap_mirror as mirror
from asf_tools_spark.operators.labeling import label_connected
from asf_tools_spark.operators.tiling import long_grid_df
from asf_tools_spark.plans.water_map import make_water_map_grid

SHAPE = (120, 160)
TILE = (20, 20)


@pytest.fixture(scope="module")
def scene():
    """Deterministic dual-pol scene: smooth terrain HAND, two water bodies
    (low backscatter, low HAND), speckle noise, a nodata wedge."""
    rng = np.random.default_rng(123)
    rows, cols = SHAPE
    rr, cc = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")

    hand = 18.0 * (1 + np.sin(rr / 23.0) * np.cos(cc / 31.0)) + rng.uniform(0, 4, SHAPE)
    lake1 = (rr - 40) ** 2 + (cc - 50) ** 2 < 28**2
    lake2 = (rr - 90) ** 2 / 0.6 + (cc - 120) ** 2 < 17**2
    water = lake1 | lake2
    hand[water] *= 0.05

    vh = rng.lognormal(mean=-2.3, sigma=0.4, size=SHAPE)
    vh[water] = rng.lognormal(mean=-5.2, sigma=0.25, size=SHAPE)[water]
    vv = rng.lognormal(mean=-1.4, sigma=0.4, size=SHAPE)
    vv[water] = rng.lognormal(mean=-4.2, sigma=0.25, size=SHAPE)[water]

    nodata = np.zeros(SHAPE, dtype=bool)
    nodata[:8, :12] = True
    vv_m = np.ma.MaskedArray(vv, mask=nodata)
    vh_m = np.ma.MaskedArray(vh, mask=nodata)
    hand_m = np.ma.MaskedArray(hand, mask=np.zeros(SHAPE, dtype=bool))
    return vv_m, vh_m, hand_m


@pytest.fixture(scope="module")
def mirror_result(scene):
    vv, vh, hand = scene
    return mirror.make_water_map(vv, vh, hand, tile_shape=TILE, pixel_size=30.0)


@pytest.fixture(scope="module")
def spark_result(spark, scene):
    vv, vh, hand = scene
    vv_g = long_grid_df(spark, vv, TILE, pad_value=0.0)
    vh_g = long_grid_df(spark, vh, TILE, pad_value=0.0)
    hand_g = long_grid_df(spark, hand, TILE, pad_value=np.nan)
    return make_water_map_grid(vv_g, vh_g, hand_g, SHAPE, tile_shape=TILE, pixel_size=30.0)


def _to_mask(df) -> np.ndarray:
    out = np.zeros(SHAPE, dtype=bool)
    for r in df.select("row", "col").collect():
        out[r.row, r.col] = True
    return out


def test_hand_candidates_match(mirror_result, spark_result):
    assert np.array_equal(spark_result["hand_candidates"], mirror_result["hand_candidates"])


def test_selected_tiles_match(mirror_result, spark_result):
    assert np.array_equal(spark_result["selected_tiles"], mirror_result["selected_tiles"])


def test_em_thresholds_match(mirror_result, spark_result):
    for pol in ("VH", "VV"):
        assert np.isclose(
            spark_result[f"gaussian_threshold_{pol}"], mirror_result[f"gaussian_threshold_{pol}"]
        ), pol


def test_initial_maps_match(mirror_result, spark_result):
    for pol in ("VH", "VV"):
        got = _to_mask(spark_result[f"initial_{pol}"])
        assert np.array_equal(got, mirror_result[f"initial_{pol}"]), pol


def test_final_water_map_matches(mirror_result, spark_result):
    got = _to_mask(spark_result["water_map"])
    exp = mirror_result["water_map"]
    # boolean map equality — label ids are arbitrary, the set of water
    # pixels is the contract
    assert np.array_equal(got, exp)


def test_distributed_labeling_matches_core(spark):
    """Cross-tile component merge vs single-array labeling on random flags."""
    rng = np.random.default_rng(7)
    flag = rng.random((60, 80)) < 0.35
    from asf_tools_spark.core.labeling import label_components

    expected = label_components(flag)

    arr = np.ma.MaskedArray(flag.astype(float), mask=~flag)
    g = long_grid_df(spark, arr, (16, 16), pad_value=0.0)
    labeled = label_connected(
        g.withColumn("flag", g["valid"] & (g["value"] > 0)).where("flag"), "flag", (16, 16)
    )
    got = np.zeros((60, 80), dtype=np.int64)
    for r in labeled.collect():
        got[r.row, r.col] = r.label
    # same pixel partition: canonicalize both labelings
    assert (got > 0).sum() == (expected > 0).sum()
    mapping = {}
    for e, g_ in zip(expected.ravel(), got.ravel()):
        if e == 0:
            assert g_ == 0
            continue
        assert g_ != 0
        if e in mapping:
            assert mapping[e] == g_, "component split or merged differently"
        else:
            mapping[e] = g_
    assert len(set(mapping.values())) == len(mapping), "two components merged"


def test_labeling_negative_coordinates(spark):
    """Connected components on a grid with negative row/col: the pmod edge
    mask and floor-based tile keys must merge across negative-index tiles."""
    from asf_tools_spark.core.labeling import label_components

    rng = np.random.default_rng(8)
    flag = rng.random((30, 30)) < 0.35
    expected = label_components(flag)
    off = -13
    pts = np.argwhere(flag)
    base = spark.createDataFrame(
        pd.DataFrame({
            "row": (pts[:, 0] + off).astype("int32"),
            "col": (pts[:, 1] + off).astype("int32"),
            "flag": True,
        })
    )
    out = label_connected(base, "flag", (10, 10))
    got = {(r.row - off, r.col - off): r.label for r in out.collect()}

    def canon(p):
        groups = {}
        for k, v in p.items():
            groups.setdefault(v, set()).add(k)
        return sorted(tuple(sorted(s)) for s in groups.values())

    exp_p = {(int(r), int(c)): int(expected[r, c]) for r, c in pts}
    assert canon(got) == canon(exp_p)


def test_distributed_merge_stress_10k_equivalences(spark):
    """Stress the no-driver merge: 256x256 at 30% water over 8x8 tiles
    (1,024 tiles) produces >10k cross-tile boundary equivalences; the
    iterative min-propagation must produce exactly the numpy components."""
    from asf_tools_spark.core.labeling import label_components

    rng = np.random.default_rng(4)
    flag = rng.random((256, 256)) < 0.3
    expected = label_components(flag)

    pts = np.argwhere(flag)
    pdf = pd.DataFrame({
        "row": pts[:, 0].astype("int32"), "col": pts[:, 1].astype("int32"), "flag": True
    })
    base = spark.createDataFrame(pdf)
    # local_max_px=0 forces the distributed path (the r6 small-grid
    # guard would otherwise label this on the driver)
    out = label_connected(base, "flag", (8, 8), merge_on_driver=False, local_max_px=0)
    got = {(r.row, r.col): r.label for r in out.collect()}
    assert len(got) == int(flag.sum())

    def canon(p):
        groups = {}
        for k, v in p.items():
            groups.setdefault(v, set()).add(k)
        return sorted(tuple(sorted(s)) for s in groups.values())

    exp_p = {(int(r), int(c)): int(expected[r, c]) for r, c in pts}
    assert canon(got) == canon(exp_p)


def test_distributed_labeling_distributed_merge(spark):
    """The no-driver merge path (iterative min propagation) agrees."""
    rng = np.random.default_rng(11)
    flag = rng.random((40, 40)) < 0.4
    arr = np.ma.MaskedArray(flag.astype(float), mask=~flag)
    g = long_grid_df(spark, arr, (10, 10), pad_value=0.0)
    base = g.withColumn("flag", g["valid"] & (g["value"] > 0)).where("flag")
    a = label_connected(base, "flag", (10, 10), merge_on_driver=True, local_max_px=0)
    b = label_connected(base, "flag", (10, 10), merge_on_driver=False, local_max_px=0)
    pa = {(r.row, r.col): r.label for r in a.collect()}
    pb = {(r.row, r.col): r.label for r in b.collect()}
    assert pa.keys() == pb.keys()
    # identical partitions (relabel both canonically)
    def canon(p):
        groups = {}
        for k, v in p.items():
            groups.setdefault(v, set()).add(k)
        return sorted(tuple(sorted(s)) for s in groups.values())

    assert canon(pa) == canon(pb)


def test_labeling_local_guard_matches_distributed(spark):
    """r6 small-grid guard: the driver-local labeling path must produce
    the same component PARTITION as the distributed tile+merge path
    (label ids are arbitrary-but-consistent by contract)."""
    rng = np.random.default_rng(7)
    flag = rng.random((64, 64)) < 0.35
    pts = np.argwhere(flag)
    pdf = pd.DataFrame({
        "row": pts[:, 0].astype("int32"), "col": pts[:, 1].astype("int32"), "flag": True
    })
    base = spark.createDataFrame(pdf)
    local = label_connected(base, "flag", (8, 8))  # guard fires (n << 2M)
    dist = label_connected(base, "flag", (8, 8), local_max_px=0)

    def canon(p):
        groups = {}
        for k, v in p.items():
            groups.setdefault(v, set()).add(k)
        return sorted(tuple(sorted(s)) for s in groups.values())

    pl = {(r.row, r.col): r.label for r in local.collect()}
    pd_ = {(r.row, r.col): r.label for r in dist.collect()}
    assert pl.keys() == pd_.keys()
    assert canon(pl) == canon(pd_)
