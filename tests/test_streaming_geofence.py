"""Streaming geofence alerts: entry/exit across batches, replay
idempotence, absence-keeps-open, snapshot pruning, singleton-batch
reduction to the batch operator's transitions, and a real availableNow
run."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from asf_tools_spark.sources.polygons import polygon_edges_df
from asf_tools_spark.streaming.geofence import (
    GeofenceAlertIndexer, fence_cover_df, prune_snapshots,
    start_geofence_alerts,
)

import numpy as np

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)

# one unit-square fence around (10, 10)
FENCE = [{
    "poly_id": 7,
    "ring": np.array([[9.5, 9.5], [10.5, 9.5], [10.5, 10.5], [9.5, 10.5]]),
}]
IN_PT = (10.0, 10.0)    # lat, lon inside
OUT_PT = (20.0, 20.0)   # outside


def _pings(spark, rows):
    """rows: (event_id, user_id, minutes_offset, (lat, lon))"""
    data = [
        (eid, uid, T0 + dt.timedelta(minutes=m), float(p[0]), float(p[1]))
        for eid, uid, m, p in rows
    ]
    df = spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, lat double, lon double"
    )
    from asf_tools_spark.functions.spatial import with_cell_col

    return with_cell_col(df, "lat", "lon", 8, "cell_id")


def _indexer(spark, tmp_path):
    edges = polygon_edges_df(spark, FENCE)
    cover = fence_cover_df(spark, FENCE)
    return GeofenceAlertIndexer(
        edges, cover, str(tmp_path / "state"), str(tmp_path / "alerts")
    )


def _alerts(spark, tmp_path):
    return sorted(
        (r.batch_id, r.user_id, r.poly_id, r.kind)
        for r in spark.read.parquet(str(tmp_path / "alerts")).collect()
    )


def test_entry_exit_replay_and_absence(spark, tmp_path):
    idx = _indexer(spark, tmp_path)
    # batch 0: user 1 inside, user 2 outside
    idx(_pings(spark, [(1, 1, 0, IN_PT), (2, 2, 0, OUT_PT)]), 0)
    assert _alerts(spark, tmp_path) == [(0, 1, 7, "entry")]

    # batch 1: user 1 pings OUTSIDE -> exit; user 3 enters
    idx(_pings(spark, [(3, 1, 60, OUT_PT), (4, 3, 60, IN_PT)]), 1)
    want = [(0, 1, 7, "entry"), (1, 1, 7, "exit"), (1, 3, 7, "entry")]
    assert _alerts(spark, tmp_path) == want

    # replay batch 1 (failure recovery): identical alerts + state
    idx(_pings(spark, [(3, 1, 60, OUT_PT), (4, 3, 60, IN_PT)]), 1)
    assert _alerts(spark, tmp_path) == want

    # batch 2: user 3 ABSENT -> visit stays open (no exit); user 1 re-enters
    idx(_pings(spark, [(5, 1, 120, IN_PT)]), 2)
    want += [(2, 1, 7, "entry")]
    assert _alerts(spark, tmp_path) == want

    # batch 3: user 3 reappears outside -> its exit finally fires
    idx(_pings(spark, [(6, 3, 180, OUT_PT)]), 3)
    want += [(3, 3, 7, "exit")]
    assert _alerts(spark, tmp_path) == want


def test_singleton_batches_reduce_to_ping_transitions(spark, tmp_path):
    """One ping per batch == the batch operator's ping-level entry/exit
    sequence (the documented reduction)."""
    idx = _indexer(spark, tmp_path)
    seq = [IN_PT, IN_PT, OUT_PT, IN_PT, OUT_PT]
    for i, p in enumerate(seq):
        idx(_pings(spark, [(i, 1, i * 10, p)]), i)
    got = [(b, k) for (b, _u, _p, k) in _alerts(spark, tmp_path)]
    assert got == [(0, "entry"), (2, "exit"), (3, "entry"), (4, "exit")]


def test_prune_snapshots(spark, tmp_path):
    idx = _indexer(spark, tmp_path)
    for i in range(5):
        idx(_pings(spark, [(i, 1, i * 10, IN_PT)]), i)
    pruned = prune_snapshots(spark, str(tmp_path / "state"), keep=2)
    assert pruned == [0, 1, 2]
    # stream continues fine off the kept snapshots
    idx(_pings(spark, [(9, 1, 90, OUT_PT)]), 5)
    assert _alerts(spark, tmp_path)[-1] == (5, 1, 7, "exit")
    with pytest.raises(ValueError):
        prune_snapshots(spark, str(tmp_path / "state"), keep=1)


def test_available_now_stream(spark, tmp_path):
    src = str(tmp_path / "src")
    _pings(spark, [(1, 1, 0, IN_PT), (2, 2, 0, OUT_PT)]).write.parquet(src)
    stream = spark.readStream.schema(
        "event_id long, user_id long, ts timestamp, lat double, lon double, cell_id long"
    ).parquet(src)
    edges = polygon_edges_df(spark, FENCE)
    cover = fence_cover_df(spark, FENCE)
    q = start_geofence_alerts(
        stream, edges, cover,
        str(tmp_path / "state"), str(tmp_path / "alerts"), str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    assert [(u, k) for (_b, u, _p, k) in _alerts(spark, tmp_path)] == [(1, "entry")]


def test_quiet_first_batch_alerts_readable(spark, tmp_path):
    from asf_tools_spark.streaming.geofence import read_alerts

    # no stream ever ran: reader returns a typed empty frame, not a crash
    empty = read_alerts(spark, str(tmp_path / "alerts"))
    assert empty.count() == 0 and "kind" in empty.columns

    # first batch has pings but zero fence activity -> still readable
    idx = _indexer(spark, tmp_path)
    idx(_pings(spark, [(1, 2, 0, OUT_PT)]), 0)
    assert read_alerts(spark, str(tmp_path / "alerts")).count() == 0
    # and alerts appear once something happens
    idx(_pings(spark, [(2, 1, 10, IN_PT)]), 1)
    got = read_alerts(spark, str(tmp_path / "alerts")).collect()
    assert [(r.user_id, r.kind) for r in got] == [(1, "entry")]
