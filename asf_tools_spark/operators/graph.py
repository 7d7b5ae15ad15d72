"""Link-graph analytics — PageRank (Page & Brin 1998; the canonical
web-graph workload of a Common-Crawl-scale engine: domain authority for
crawl prioritization and quality weighting).

Formulation: the classic simplified power iteration (the one in Spark's
own published examples — public knowledge): every node starts at 1.0 and

    rank'(v) = (1 - d) + d * sum over in-edges (u,v) of rank(u)/outdeg(u)

Dangling nodes (no out-edges) contribute nothing; ranks are therefore
unnormalized (they do not sum to 1) but the ORDERING equals the
normalized variant's. A fixed iteration count keeps the operator
deterministic and lets the DuckDB oracle replay it as unrolled CTE
aggregates (aggregation is not allowed in a recursive term).

Spark-first: the edge table is hash-partitioned by src ONCE and persisted
with its out-degree attached — every iteration's contribution join then
reuses the same co-located edges; each iteration is one join + one
aggregate, all 10 iterations composing into a single lazy plan executed
in one job. ``checkpoint_interval`` truncates lineage for long power
iterations (localCheckpoint, eager) — at 10 iterations the plan is fine
without it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame, src: str = "src", dst: str = "dst",
    n_iters: int = 10, damping: float = 0.85,
    checkpoint_interval: int | None = None,
) -> DataFrame:
    """(node, rank) after ``n_iters`` power iterations. Multi-edges count
    once per row (pre-distinct the input for simple-graph semantics)."""
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    out_deg = edges.groupBy(src).agg(F.count(F.lit(1)).cast("long").alias("_deg"))
    e = (
        edges.select(src, dst)
        .join(out_deg, src)
        .repartition(F.col(src))
        .persist()
    )
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for i in range(n_iters):
        contribs = (
            e.join(ranks, e[src] == ranks["node"])
            .select(
                F.col(dst).alias("node"),
                (F.col("rank") / F.col("_deg")).alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_s"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(1.0 - damping)
                + F.lit(damping) * F.coalesce(F.col("_s"), F.lit(0.0))
            ).alias("rank"),
        )
        if checkpoint_interval and (i + 1) % checkpoint_interval == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
