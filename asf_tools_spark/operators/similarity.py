"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exactness baseline — broadcast the (small)
  query set, JVM-side dot products via zip_with/aggregate, window rank
- LSH-bucketed ANN: random-hyperplane buckets with multi-probe — the scale
  path (per-bucket joins instead of the full cross product)
- IVF: coarse centroid assignment + nprobe nearest lists
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def dot_cols(a: str | Column, b: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )


def _safe_norms(X: np.ndarray) -> np.ndarray:
    """Row L2 norms with zeros replaced by 1: a zero vector then gets
    cosine 0 against everything (deterministic last pick) instead of NaN —
    NaN cosines make argmin/argmax silently pick index 0, and both Spark
    and DuckDB sort NaN first under DESC, so the bug would survive the
    oracle."""
    n = np.linalg.norm(X, axis=1, keepdims=True)
    return np.where(n == 0, 1.0, n)


def norm_col(a: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    ))


def cosine_topk_bruteforce(
    emb: DataFrame, queries: DataFrame, key: str = "vec_id", vec_col: str = "embedding", k: int = 5
) -> DataFrame:
    """Exact top-k by cosine for each query vector. The query set is
    broadcast (small side); the corpus streams through one whole-stage
    codegen pass; the only shuffle is the per-query top-k window."""
    from ..core.parallel import fan_out

    q = F.broadcast(
        queries.select(F.col(key).alias("q_id"), F.col(vec_col).alias("q_vec"))
    )
    # fan_out: the broadcast cross join keeps the corpus side's
    # partitioning, and higher-order-function dot/norm chains are
    # interpreted (CodegenFallback) — a single-file scan otherwise scores
    # every pair on one core (core/parallel.py; no-op at cluster scale)
    joined = fan_out(emb).select(F.col(key).alias("c_id"), F.col(vec_col).alias("c_vec")).crossJoin(q)
    # zero-norm vectors have no defined cosine; without this filter they
    # produce NaN, which Spark's (and DuckDB's) DESC ordering ranks FIRST —
    # a zero vector would become everyone's top neighbor
    joined = joined.where(
        (F.col("q_id") != F.col("c_id"))
        & (norm_col("q_vec") > 0.0) & (norm_col("c_vec") > 0.0)
    )
    cos = dot_cols("q_vec", "c_vec") / (norm_col("q_vec") * norm_col("c_vec"))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return (
        joined.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "c_id", "cosine", "rank")
    )


def _hyperplane_bucket(vec_col: str, planes: np.ndarray) -> Column:
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit = F.lit([float(x) for x in plane])  # one py4j call per plane
        d = F.aggregate(
            F.zip_with(F.col(vec_col), lit, lambda a, b: a.cast("double") * b),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        bucket = bucket.bitwiseOR(F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0)).cast("long"))
    return bucket


def cosine_topk_lsh(
    emb: DataFrame, queries: DataFrame, key: str = "vec_id", vec_col: str = "embedding",
    k: int = 5, n_planes: int = 6, seed: int = 7, dim: int | None = None,
    multiprobe: int = 1,
) -> DataFrame:
    """ANN top-k: corpus and queries bucketed by hyperplane sign bits;
    candidates = same bucket or any bucket within ``multiprobe`` flipped
    bits (ring expansion in Hamming space — the embedding-space analogue of
    the cell k-ring). Recall < 1 by design; rank within candidates exact."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_planes, dim))

    corpus = emb.select(F.col(key).alias("c_id"), F.col(vec_col).alias("c_vec")).withColumn(
        "bucket", _hyperplane_bucket("c_vec", planes)
    )
    q = queries.select(F.col(key).alias("q_id"), F.col(vec_col).alias("q_vec")).withColumn(
        "bucket", _hyperplane_bucket("q_vec", planes)
    )
    # probe every bucket within `multiprobe` flipped bits (Hamming ball) —
    # C(n_planes, <=multiprobe) probes per query, the recall/cost knob
    from itertools import combinations

    probes = [F.col("bucket")]
    for nbits in range(1, min(multiprobe, n_planes) + 1):
        for idxs in combinations(range(n_planes), nbits):
            m = 0
            for i in idxs:
                m |= 1 << i
            probes.append(F.col("bucket").bitwiseXOR(F.lit(m)))
    q = q.withColumn("probe", F.explode(F.array(*probes))).drop("bucket")

    cand = F.broadcast(q).join(corpus, q["probe"] == corpus["bucket"]).where(
        (F.col("q_id") != F.col("c_id"))
        & (norm_col("q_vec") > 0.0) & (norm_col("c_vec") > 0.0)  # NaN-cosine guard
    )
    cos = dot_cols("q_vec", "c_vec") / (norm_col("q_vec") * norm_col("c_vec"))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return (
        cand.withColumn("cosine", cos)
        .select("q_id", "c_id", "cosine")
        .distinct()
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def quantize_embeddings(
    emb: DataFrame, vec_col: str = "embedding", out_col: str = "q_vec"
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization: q_i = round(127 ·
    x_i / max|x|) stored as array<tinyint> — 4-8x less memory/shuffle than
    float/double embeddings, the first lever for ANN at corpus scale.
    Cosine is per-vector-scale invariant, so similarity search runs on the
    quantized arrays directly (no dequantize); the scale column is kept for
    consumers that need magnitudes back. Pure Catalyst transform.

    Both the max and the quantized array ride the repo's Generate fence
    (explode of a 1-element array): ``safe_mx`` referenced inside the
    transform lambda re-evaluates the array_max PER ELEMENT (O(d^2)/row),
    and downstream dot/norm lambdas referencing the un-fenced ``q_vec``
    expression re-substitute the whole quantize chain per use — measured
    as a seconds-long single stage on the int8 ANN row (guide §1.2)."""
    mx = F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double"))))
    safe_mx = F.when(mx > 0.0, mx).otherwise(F.lit(1.0))  # all-zero vectors stay zero
    staged = emb.select("*", F.explode(F.array(safe_mx)).alias("_qmx"))
    q = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") / F.col("_qmx") * 127.0).cast("tinyint"),
    )
    staged = staged.select("*", F.explode(F.array(q)).alias(out_col))
    return staged.withColumn(f"{out_col}_scale", F.col("_qmx") / 127.0).drop("_qmx")


def _staged_cosines(df: DataFrame, centroids: np.ndarray, vec_col: str) -> DataFrame:
    """One NAMED column per centroid cosine (_cos_i) plus _vn — shared by
    ivf_assign's JVM path and ivf_probe_lists so the (cos, -i) tie-break
    stays bit-identical. Named columns, never a when-chain: a chain embeds
    the running-best subtree twice per level (exponential expression tree,
    the known codegen stall)."""
    staged = df.withColumn("_vn", norm_col(vec_col))
    for i, c in enumerate(centroids):
        # ONE array literal per centroid (F.lit(list)), not one F.lit per
        # element: per-element lits cost dim py4j round-trips per centroid
        # and made driver-side plan construction the measured bottleneck of
        # Lloyd iterations (seconds per assign at dim=64)
        lit = F.lit([float(x) for x in c])
        cn = float(np.linalg.norm(c))
        staged = staged.withColumn(
            f"_cos_{i}", dot_cols(F.col(vec_col), lit) / (F.col("_vn") * F.lit(cn))
        )
    return staged


def _cos_structs(k: int):
    return [F.struct(F.col(f"_cos_{i}").alias("cos"), F.lit(-i).alias("ni")) for i in range(k)]


def ivf_probe_lists(
    queries: DataFrame, centroids: np.ndarray, nprobe: int = 2,
    vec_col: str = "embedding", jvm_max_centroids: int = 16,
) -> DataFrame:
    """(<query columns>, list_id, probe_rank) — each query's ``nprobe``
    nearest inverted lists (IVF's recall knob; nprobe=1 is ivf_assign's
    single list). Same two physical paths as ivf_assign: staged cosines +
    array_sort + slice (JVM, <= jvm_max_centroids) or a BLAS pandas-UDF
    arg-top-n for the k ~ sqrt(N) regime where k x dim literal plans bloat
    codegen. Both tie-break to the lowest list id."""
    centroids = np.asarray(centroids, dtype=np.float64)
    n = min(nprobe, len(centroids))
    if len(centroids) <= jvm_max_centroids:
        staged = _staged_cosines(queries, centroids, vec_col)
        arr = F.array_sort(F.array(*_cos_structs(len(centroids))))
        # ascending by (cos, -i): the LAST n are the nearest lists
        top = F.reverse(F.slice(arr, -n, n))
        return staged.select(
            *queries.columns,
            F.posexplode(top).alias("probe_rank0", "_s"),
        ).select(
            *queries.columns,
            (-F.col("_s.ni")).alias("list_id"),
            (F.col("probe_rank0") + 1).alias("probe_rank"),
        )

    cmat = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @F.pandas_udf("array<int>")
    def top_lists(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ cmat.T
        # stable sort on -sims: ties resolve to the lowest list id, matching
        # the (cos, -i) struct ordering of the JVM path
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n]
        return pd.Series([row.astype("int32").tolist() for row in order])

    out = queries.withColumn("_tl", top_lists(F.col(vec_col)))
    return out.select(
        *queries.columns, F.posexplode("_tl").alias("probe_rank0", "list_id")
    ).select(
        *queries.columns, "list_id", (F.col("probe_rank0") + 1).alias("probe_rank")
    )


def kmeans_fit(
    emb: DataFrame, k: int = 8, n_iters: int = 3, key: str = "vec_id",
    vec_col: str = "embedding", seed: int = 0,
    init_exact_max_k: int = 16, init_sample_size: int = 4096,
    local_max_rows: int = 4096,
) -> np.ndarray:
    """Distributed Lloyd k-means for IVF coarse centroids.

    Assignment is the narrow ivf_assign path (no shuffle); the update is one
    posexplode + two-level aggregate whose result (k x dim component means)
    is tiny and collects to the driver — centroids are driver state by
    design, exactly like the reference's scalar decisions. Deterministic
    farthest-point init (kmeans++-style, argmax instead of sampling): seed
    with the smallest seeded-xxhash64 vector, then k-1 times add the vector
    least similar to its nearest centroid — random init can double-seed one
    cluster and orphan another; farthest-point cannot on separated data.
    Empty lists keep their previous centroid.

    Init cost (VERDICT r2 item 7): k <= ``init_exact_max_k`` runs
    farthest-point over the CORPUS (k top-1 scans — fine for coarse k).
    Larger k — the k ~ sqrt(N) IVF regime, where k sequential corpus scans
    are the wrong shape — takes ONE pass: a seeded-xxhash64 top-N sample
    (TakeOrdered, no sort shuffle), then the same deterministic
    farthest-point ladder locally on the sample in numpy. The sample's
    first element is the global min-hash row, so both paths pick the same
    first centroid.

    Small-corpus guard (same pattern as the W8 exact driver path in
    core/selection.py): when the corpus has <= ``local_max_rows`` rows, the
    WHOLE fit — farthest-point init AND the Lloyd iterations — runs
    driver-locally in numpy on one ordered collect. Each distributed Lloyd
    round costs a plan build + job launch (measured: seconds per round on a
    2000-row corpus, ~90% of wall time), pure overhead below cluster scale;
    the distributed path is the shape for corpora that don't fit a driver.
    Results match the distributed path up to floating-point summation order
    (numpy pairwise sums vs zip_with/aggregate sequential adds) — exact
    ties break identically (lowest list id / first max). Set
    ``local_max_rows=0`` to force the distributed path.
    """
    # ONE ordered-limit job decides the path AND delivers the local data:
    # local_max_rows+1 rows back means the corpus is bigger than the guard
    rows = (
        emb.orderBy(F.xxhash64(F.col(key), F.lit(seed)), F.col(key))
        .limit(local_max_rows + 1).select(vec_col).collect()
    ) if local_max_rows > 0 else []
    if local_max_rows > 0 and len(rows) <= local_max_rows:
        if not rows:
            raise ValueError("kmeans_fit: empty corpus (no embedding rows)")
        X = np.array([list(r[0]) for r in rows], dtype=np.float64)
        Xn = X / _safe_norms(X)
        chosen = [0]  # global min-hash row, like both distributed inits
        best_cos = Xn @ Xn[0]
        for _ in range(min(k, len(X)) - 1):
            nxt = int(np.argmin(best_cos))  # least similar to nearest centroid
            chosen.append(nxt)
            best_cos = np.maximum(best_cos, Xn @ Xn[nxt])
        centroids = X[chosen]
        for _ in range(n_iters):
            cn = centroids / _safe_norms(centroids)
            sims = Xn @ cn.T
            assign = sims.argmax(axis=1)  # first max: lowest list id, like ivf_assign
            nxt_c = centroids.copy()
            for lid in range(len(centroids)):
                members = X[assign == lid]
                if len(members):  # empty lists keep their previous centroid
                    nxt_c[lid] = members.mean(axis=0)
            centroids = nxt_c
        return centroids

    if k <= init_exact_max_k:
        first = (
            emb.orderBy(F.xxhash64(F.col(key), F.lit(seed)), F.col(key))
            .limit(1).select(vec_col).collect()
        )
        cents = [list(first[0][0])]
        for _ in range(k - 1):
            assigned = ivf_assign(emb, np.array(cents, dtype=np.float64), key, vec_col)
            far = (
                assigned.orderBy(F.col("list_cosine").asc(), F.col(key).asc())
                .limit(1).select(vec_col).collect()
            )
            cents.append(list(far[0][0]))
        centroids = np.array(cents, dtype=np.float64)
    else:
        sample_rows = (
            emb.orderBy(F.xxhash64(F.col(key), F.lit(seed)), F.col(key))
            .limit(max(init_sample_size, 4 * k)).select(vec_col).collect()
        )
        X = np.array([list(r[0]) for r in sample_rows], dtype=np.float64)
        if not len(X):
            raise ValueError("kmeans_fit: empty init sample (no embedding rows)")
        Xn = X / _safe_norms(X)
        chosen = [0]  # global min-hash row, like the exact path
        best_cos = Xn @ Xn[0]
        for _ in range(k - 1):
            nxt = int(np.argmin(best_cos))  # least similar to nearest centroid
            chosen.append(nxt)
            best_cos = np.maximum(best_cos, Xn @ Xn[nxt])
        centroids = X[chosen]
    for _ in range(n_iters):
        assigned = ivf_assign(emb, centroids, key, vec_col)
        comp = (
            assigned.select("list_id", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("list_id", "pos")
            .agg(F.sum(F.col("x").cast("double")).alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        nxt = centroids.copy()
        seen = {}
        for r in comp:
            seen.setdefault(int(r.list_id), {})[int(r.pos)] = (float(r.s), int(r.n))
        for lid, cols in seen.items():
            for pos, (s, n) in cols.items():
                nxt[lid, pos] = s / n
        centroids = nxt
    return centroids


def ivf_assign(emb: DataFrame, centroids: np.ndarray, key: str = "vec_id",
               vec_col: str = "embedding", jvm_max_centroids: int = 16) -> DataFrame:
    """Coarse IVF list assignment: nearest centroid by cosine (centroids are
    a small seed-deterministic sample or k-means output). Partitioning the
    corpus by ``list_id`` co-locates each inverted list — the probe join
    then touches only nprobe lists.

    Two NARROW (no-shuffle) physical paths, chosen by centroid count:

    - <= ``jvm_max_centroids``: literal when-chain of zip_with/aggregate dot
      products — whole-stage codegen, zero Python;
    - larger (the k ~ sqrt(N) regime, where a when-chain blows up codegen):
      one Arrow-batched pandas UDF doing a single BLAS matmul argmax per
      batch against the broadcast centroid matrix.

    Both paths produce identical assignments up to floating-point summation
    order (zip_with/aggregate sequential adds vs one BLAS matmul): on
    near-exact cosine ties the argmax can differ by an ulp-level flip.
    Exact ties break to the lowest list_id on both paths.
    """
    centroids = np.asarray(centroids, dtype=np.float64)
    if len(centroids) <= jvm_max_centroids:
        # argmax via array_max of (cos, -i) structs over the shared staged
        # cosines. Tie-break: max(-i) = min i, matching numpy argmax
        # (first max wins).
        staged = _staged_cosines(emb, centroids, vec_col)
        best = F.array_max(F.array(*_cos_structs(len(centroids))))
        out = staged.withColumn("list_id", -best["ni"]).withColumn("list_cosine", best["cos"])
        return out.drop("_vn", *[f"_cos_{i}" for i in range(len(centroids))])

    cmat = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @F.pandas_udf("struct<list_id:int,list_cosine:double>")
    def assign(vecs: pd.Series) -> pd.DataFrame:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ cmat.T  # (batch, k) — one BLAS call
        best = sims.argmax(axis=1)  # argmax takes the FIRST max: lowest id
        return pd.DataFrame({
            "list_id": best.astype(np.int32),
            "list_cosine": sims[np.arange(len(best)), best],
        })

    out = emb.withColumn("_a", assign(F.col(vec_col)))
    return out.select(*emb.columns, F.col("_a.list_id").alias("list_id"),
                      F.col("_a.list_cosine").alias("list_cosine"))
