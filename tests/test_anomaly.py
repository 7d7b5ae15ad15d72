"""robust_outliers vs an independent numpy median/MAD replay."""

import numpy as np
import pandas as pd

from asf_tools_spark.operators.anomaly import robust_outliers


def _numpy_flags(vals, cutoff=3.5):
    med = np.median(vals)
    mad = np.median(np.abs(vals - med))
    if mad == 0:
        return np.zeros(len(vals), bool), np.full(len(vals), np.nan)
    z = 0.6745 * (vals - med) / mad
    return np.abs(z) > cutoff, z


def test_robust_outliers_matches_numpy(spark):
    rng = np.random.default_rng(5)
    frames = []
    for g, (mu, sig) in (("a", (10.0, 1.0)), ("b", (-3.0, 0.5))):
        v = rng.normal(mu, sig, 200)
        v[:4] += np.array([30.0, -25.0, 40.0, -35.0]) * sig  # planted spikes
        frames.append(pd.DataFrame({"event_id": np.arange(200), "event_type": g, "value": v}))
    pdf = pd.concat(frames, ignore_index=True)
    out = robust_outliers(spark.createDataFrame(pdf)).toPandas()
    for g in ("a", "b"):
        vals = pdf[pdf["event_type"] == g]["value"].to_numpy()
        flags, z = _numpy_flags(vals)
        got = out[out["event_type"] == g].sort_values("event_id")
        assert set(got["event_id"]) == set(np.where(flags)[0])
        np.testing.assert_allclose(
            got["robust_z"].to_numpy(), z[flags][np.argsort(np.where(flags)[0])],
            rtol=1e-9,
        )


def test_robust_outliers_mad_zero_flags_nothing(spark):
    pdf = pd.DataFrame({
        "event_id": range(6), "event_type": "c",
        # median 5, >half the group constant -> MAD 0 even with a spike
        "value": [5.0, 5.0, 5.0, 5.0, 5.0, 1e9],
    })
    assert robust_outliers(spark.createDataFrame(pdf)).count() == 0


def test_robust_outliers_approx_path_same_flags(spark):
    rng = np.random.default_rng(9)
    v = rng.normal(0.0, 1.0, 500)
    v[:3] = [50.0, -60.0, 45.0]  # far outside any sketch error band
    pdf = pd.DataFrame({"event_id": range(500), "event_type": "x", "value": v})
    sdf = spark.createDataFrame(pdf)
    exact = {r.event_id for r in robust_outliers(sdf).collect()}
    approx = {r.event_id for r in robust_outliers(sdf, exact=False).collect()}
    assert exact == approx == {0, 1, 2}


def test_embedding_cov_matches_numpy(spark):
    import pyarrow.parquet as pq

    from asf_tools_spark.queries_text import q_embedding_cov

    out = q_embedding_cov(spark, "/root/testdata/sf0.001").toPandas()
    emb = np.stack(
        pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
        .column("embedding").to_pylist()
    ).astype(np.float64)[:, :8]
    expect = np.cov(emb, rowvar=False, bias=True)
    assert len(out) == 36
    for _, r in out.iterrows():
        assert r["n"] == emb.shape[0]
        np.testing.assert_allclose(
            r["cov"], expect[int(r["i"]), int(r["j"])], atol=2e-9
        )
