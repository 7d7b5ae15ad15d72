"""ANN quality gates: LSH recall@k vs the exact brute force, multiprobe
monotonicity, and IVF assignment-path agreement (JVM staged-argmax vs the
BLAS pandas-UDF scale path).

Recall is measured on PLANTED clusters (40 centers x 5 perturbed copies):
random unit vectors have no near-neighbor structure, so recall there is
noise — the planted set is what hyperplane LSH is for.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from asf_tools_spark.operators import similarity


@pytest.fixture(scope="module")
def planted(spark):
    rng = np.random.default_rng(9)
    base = rng.normal(size=(40, 32))
    rows, vid = [], 0
    for ci in range(40):
        for _ in range(5):
            v = base[ci] + rng.normal(scale=0.05, size=32)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return emb, base


def _recall(truth: dict, got: dict, k: int) -> float:
    return float(np.mean([len(truth[q] & got.get(q, set())) / k for q in truth]))


def _sets(rows):
    out: dict = {}
    for r in rows:
        out.setdefault(r.q_id, set()).add(r.c_id)
    return out


def test_lsh_recall_floor_and_multiprobe_monotone(planted):
    emb, _ = planted
    q = emb.where(F.col("vec_id") % 5 == 0).limit(10)
    truth = _sets(similarity.cosine_topk_bruteforce(emb, q, k=4).collect())
    recalls = []
    for mp in (0, 1):
        got = _sets(similarity.cosine_topk_lsh(emb, q, k=4, n_planes=8, multiprobe=mp, seed=7).collect())
        recalls.append(_recall(truth, got, 4))
    # measured on this seed: 0.9 at mp=0, 1.0 at mp=1 — pin a floor under both
    assert recalls[0] >= 0.85, recalls
    assert recalls[1] >= 0.95, recalls
    assert recalls[1] >= recalls[0]


def test_ivf_assignment_paths_agree(planted):
    """The staged-argmax JVM expression and the BLAS pandas UDF must produce
    identical list assignments (incl. the first-max tie-break)."""
    emb, base = planted
    cent = base[:12]
    jvm = {r.vec_id: r.list_id for r in
           similarity.ivf_assign(emb, cent, jvm_max_centroids=16).select("vec_id", "list_id").collect()}
    udf = {r.vec_id: r.list_id for r in
           similarity.ivf_assign(emb, cent, jvm_max_centroids=2).select("vec_id", "list_id").collect()}
    assert jvm == udf and len(jvm) == 200


def test_kmeans_recovers_planted_clusters(spark):
    """8 planted clusters, k=8, 3 Lloyd iterations: every cluster's members
    land in one list, and the 8 lists are distinct (perfect recovery on
    well-separated data)."""
    rng = np.random.default_rng(2)
    base = rng.normal(size=(8, 16)) * 4.0
    rows, vid = [], 0
    for ci in range(8):
        for _ in range(25):
            v = base[ci] + rng.normal(scale=0.05, size=16)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cent = similarity.kmeans_fit(emb, k=8, n_iters=3)
    assert cent.shape == (8, 16)
    assigned = similarity.ivf_assign(emb, cent)
    got = {r.vec_id: r.list_id for r in assigned.select("vec_id", "list_id").collect()}
    lists_per_cluster = [{got[ci * 25 + j] for j in range(25)} for ci in range(8)]
    assert all(len(s) == 1 for s in lists_per_cluster)
    assert len({next(iter(s)) for s in lists_per_cluster}) == 8


def test_kmeans_local_guard_matches_distributed(spark):
    """The small-corpus driver-local fit must agree with the distributed
    path on separated data: same cluster recovery, near-identical centroids
    (summation-order float drift only)."""
    rng = np.random.default_rng(11)
    base = rng.normal(size=(4, 8)) * 4.0
    rows = []
    for ci in range(4):
        for j in range(20):
            v = base[ci] + rng.normal(scale=0.05, size=8)
            rows.append((ci * 20 + j, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    local = similarity.kmeans_fit(emb, k=4, n_iters=2)          # 80 rows -> local
    dist = similarity.kmeans_fit(emb, k=4, n_iters=2, local_max_rows=0)
    assert local.shape == dist.shape == (4, 8)
    assert np.allclose(local, dist, atol=1e-9)


def test_int8_quantized_recall(spark):
    """Symmetric int8 quantization: cosine top-5 on the quantized arrays
    recovers >= 0.95 of the full-precision neighbors on the testdata
    embeddings (measured 0.98 on this deterministic input); schema is
    array<tinyint> (the 4-8x memory lever)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10)
    truth = _sets(similarity.cosine_topk_bruteforce(emb, q, k=5).collect())
    qemb = similarity.quantize_embeddings(emb).select(
        "vec_id", F.col("q_vec").alias("embedding"))
    assert dict(qemb.dtypes)["embedding"] == "array<tinyint>"
    got = _sets(similarity.cosine_topk_bruteforce(
        qemb, qemb.where(F.col("vec_id") < 10), k=5).collect())
    assert _recall(truth, got, 5) >= 0.95


def test_ivf_probe_lists_nprobe(planted):
    """nprobe probing: rank-1 probe == ivf_assign's list; nprobe lists are
    distinct and ordered by centroid cosine."""
    emb, base = planted
    cent = base[:12]
    q = emb.where(F.col("vec_id") < 6)
    probes = similarity.ivf_probe_lists(q, cent, nprobe=3).collect()
    assign = {r.vec_id: r.list_id for r in
              similarity.ivf_assign(q, cent, jvm_max_centroids=16).select("vec_id", "list_id").collect()}
    by_q = {}
    for r in probes:
        by_q.setdefault(r.vec_id, {})[r.probe_rank] = r.list_id
    assert set(by_q) == set(assign)
    for qid, ranks in by_q.items():
        assert len(ranks) == 3 and len(set(ranks.values())) == 3
        assert ranks[1] == assign[qid]


def test_ivf_probe_paths_agree(planted):
    """JVM staged-cosine probing and the BLAS pandas-UDF fallback produce
    identical (list_id, probe_rank) sets, tie-breaks included."""
    emb, base = planted
    q = emb.where(F.col("vec_id") < 8)
    jvm = {(r.vec_id, r.probe_rank): r.list_id for r in
           similarity.ivf_probe_lists(q, base[:12], nprobe=3, jvm_max_centroids=16).collect()}
    udf = {(r.vec_id, r.probe_rank): r.list_id for r in
           similarity.ivf_probe_lists(q, base[:12], nprobe=3, jvm_max_centroids=2).collect()}
    assert jvm == udf and len(jvm) == 8 * 3


def test_ivf_recall_floor_on_planted(planted):
    """IVF nprobe=1 over 40-cluster planted data: querying a vector probes
    its own list; cluster mates share the list almost always."""
    from pyspark.sql.window import Window

    emb, base = planted
    assigned = similarity.ivf_assign(emb, base[:20], jvm_max_centroids=64).persist()
    q = assigned.where(F.col("vec_id") % 5 == 0).limit(10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"),
        F.col("list_id").alias("ql"),
    )
    truth = _sets(similarity.cosine_topk_bruteforce(
        emb, emb.where(F.col("vec_id") % 5 == 0).limit(10), k=4).collect())
    cand = F.broadcast(q).join(
        assigned.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"), "list_id"),
        F.col("ql") == F.col("list_id"),
    ).where(F.col("q_id") != F.col("c_id"))
    cos = similarity.dot_cols("q_vec", "c_vec") / (
        similarity.norm_col("q_vec") * similarity.norm_col("c_vec"))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    got = _sets(
        cand.withColumn("cosine", cos).withColumn("rk", F.row_number().over(w))
        .where("rk <= 4").collect()
    )
    assigned.unpersist()
    assert _recall(truth, got, 4) >= 0.85


def test_kmeans_sampled_init_recovers_k32(spark, monkeypatch):
    """k=32 planted clusters: the sampled one-pass init (VERDICT r2 item 7)
    recovers all 32 without the k sequential full-corpus farthest-point
    scans — ivf_assign runs only for the Lloyd iterations."""
    rng = np.random.default_rng(5)
    base = rng.normal(size=(32, 16)) * 4.0
    rows, vid = [], 0
    for ci in range(32):
        for _ in range(12):
            v = base[ci] + rng.normal(scale=0.05, size=16)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    calls = {"n": 0}
    real_assign = similarity.ivf_assign

    def counting_assign(*a, **kw):
        calls["n"] += 1
        return real_assign(*a, **kw)

    monkeypatch.setattr(similarity, "ivf_assign", counting_assign)
    # local_max_rows=0 forces the DISTRIBUTED path (the subject under test);
    # the small-corpus guard would otherwise run the whole fit driver-side
    cent = similarity.kmeans_fit(emb, k=32, n_iters=2, local_max_rows=0)
    assert cent.shape == (32, 16)
    assert calls["n"] == 2, f"init must not scan the corpus k times (saw {calls['n']} assigns)"

    assigned = real_assign(emb, cent)
    got = {r.vec_id: r.list_id for r in assigned.select("vec_id", "list_id").collect()}
    lists_per_cluster = [{got[ci * 12 + j] for j in range(12)} for ci in range(32)]
    assert all(len(s) == 1 for s in lists_per_cluster)
    assert len({next(iter(s)) for s in lists_per_cluster}) == 32


def test_kmeans_zero_vector_and_empty_guards(spark):
    # ADVICE r4: a zero vector must not poison the local path with NaN
    # cosines (NaN argmin/argmax silently picks index 0); an empty corpus
    # must raise clearly, not crash on a 0-d norm.
    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(30)]
    rows.append((30, [0.0] * 8))  # zero vector in the corpus
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cent = similarity.kmeans_fit(emb, k=3, n_iters=2)
    assert np.isfinite(cent).all()

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        similarity.kmeans_fit(empty, k=2, n_iters=1)
