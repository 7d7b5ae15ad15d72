"""HAND-style neighborhood accumulation: D8 flow direction, iterative flow
accumulation, and height-above-nearest-drainage as DataFrame fixpoints.

Spark re-expression of the pysheds chain in
ref: src/asf_tools/hydrosar/hand/calculate.py:57-142 (``calculate_hand``:
flowdir -> accumulation -> compute_hand; SURVEY §2.5 W6 — the one genuinely
iterative distributed algorithm). The grid is a table ``(row,col,elev)``;
every step is a neighbor equi-join; the driver loop runs to convergence with
``localCheckpoint`` every round to cut lineage (the north_rule's
checkpointed-lineage requirement).

Pit/depression filling and flat resolution are upstream conditioning steps
in pysheds; here, cells with no lower neighbor are sinks (flow_dir NULL),
which on the synthetic/test terrains plays the same role. NaN elevations are
treated as nodata (no flow in or out).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# D8 neighbor offsets in priority order (E, SE, S, SW, W, NW, N, NE)
D8 = [(0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1), (-1, 0), (-1, 1)]


def flow_direction(grid: DataFrame) -> DataFrame:
    """Steepest-descent D8 direction: (row,col,elev) ->
    (row,col,elev,to_row,to_col). Ties break by D8 priority order; cells
    with no strictly lower neighbor are sinks (to_row/to_col NULL)."""
    spark = grid.sparkSession
    offsets = spark.createDataFrame(
        [(i, dr, dc) for i, (dr, dc) in enumerate(D8)], "d8 int, dr int, dc int"
    )
    nbr = (
        grid.crossJoin(F.broadcast(offsets))
        .select(
            "row", "col", "elev", "d8",
            (F.col("row") + F.col("dr")).alias("nrow"),
            (F.col("col") + F.col("dc")).alias("ncol"),
            # diagonal distance sqrt(2) for slope, like D8
            F.when((F.col("dr") != 0) & (F.col("dc") != 0), 1.4142135623730951)
            .otherwise(1.0)
            .alias("dist"),
        )
        .join(
            grid.select(
                F.col("row").alias("nrow"), F.col("col").alias("ncol"),
                F.col("elev").alias("nelev"),
            ),
            ["nrow", "ncol"],
        )
        .withColumn("drop", (F.col("elev") - F.col("nelev")) / F.col("dist"))
        .where(F.col("drop") > 0)
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("row", "col").orderBy(F.col("drop").desc(), F.col("d8").asc())
    best = nbr.withColumn("rk", F.row_number().over(w)).where("rk = 1").select(
        "row", "col", F.col("nrow").alias("to_row"), F.col("ncol").alias("to_col")
    )
    return grid.join(best, ["row", "col"], "left")


def flow_accumulation(flow: DataFrame, max_iters: int = 64, checkpoint_every: int = 1) -> DataFrame:
    """Cells draining through each cell (incl. itself) in **O(log
    longest-path) rounds** by pointer-doubling prefix sums over the flow
    tree (ref pysheds ``accumulation``; SURVEY §2.5 W6).

    Invariant after round k (A = ``acc``, J = ``(to_row,to_col)``):

    - ``A_k(v)`` = mass of cells within the last ``2^k`` upstream hops of v
      (including v itself), starting from ``A_0(v) = 1``;
    - ``J_k(u) = f^(2^k)(u)`` — the 2^k-th downstream successor (NULL once
      the path falls off the tree at a sink).

    Recurrence: ``A_{k+1}(v) = A_k(v) + Σ_{m: J_k(m)=v} A_k(m)`` — each
    upstream cell u at distance d ∈ [2^k, 2^{k+1}) of v is counted exactly
    once via the unique m on its path with dist(m, v) = 2^k; and
    ``J_{k+1} = J_k ∘ J_k``. Terminates when every pointer is NULL, i.e.
    after ⌈log2(longest flow path)⌉ + 1 rounds — thousands-of-cells drainage
    paths cost ~12 shuffles instead of thousands. ``localCheckpoint``
    truncates lineage every ``checkpoint_every`` rounds (resumability per
    the north_rule); rounds are few, so the default checkpoints each round.
    """
    state = flow.select(
        "row", "col", F.lit(1.0).alias("acc"), "to_row", "to_col"
    ).localCheckpoint(eager=True)
    for i in range(max_iters):
        live = state.where(F.col("to_row").isNotNull())
        if live.limit(1).count() == 0:
            break
        contrib = live.groupBy(
            F.col("to_row").alias("row"), F.col("to_col").alias("col")
        ).agg(F.sum("acc").alias("up"))
        hop = state.select(
            F.col("row").alias("to_row"), F.col("col").alias("to_col"),
            F.col("to_row").alias("j_row"), F.col("to_col").alias("j_col"),
        )
        new_state = (
            state.join(contrib, ["row", "col"], "left")
            .join(hop, ["to_row", "to_col"], "left")
            .select(
                "row", "col",
                (F.col("acc") + F.coalesce("up", F.lit(0.0))).alias("acc"),
                F.col("j_row").alias("to_row"), F.col("j_col").alias("to_col"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            new_state = new_state.localCheckpoint(eager=True)
        state = new_state
    return state.select("row", "col", "acc")


def compute_hand(
    flow: DataFrame, acc: DataFrame, acc_threshold: float = 100.0, max_iters: int = 200
) -> DataFrame:
    """Height above nearest drainage (ref hand/calculate.py:124-129):
    drainage = cells with accumulation > threshold; every cell inherits the
    elevation of the drainage cell its flow path reaches, by iterative
    pointer propagation; HAND = elev - drainage_elev (>= 0)."""
    base = flow.join(acc, ["row", "col"])
    state = base.select(
        "row", "col", "elev", "to_row", "to_col",
        F.when(F.col("acc") > acc_threshold, F.col("elev")).alias("drain_elev"),
    ).localCheckpoint(eager=True)

    for _ in range(max_iters):
        unresolved = state.where(F.col("drain_elev").isNull() & F.col("to_row").isNotNull())
        if unresolved.limit(1).count() == 0:
            break
        downstream = state.select(
            F.col("row").alias("to_row"), F.col("col").alias("to_col"),
            F.col("drain_elev").alias("ds_drain"),
            F.col("to_row").alias("ds_to_row"), F.col("to_col").alias("ds_to_col"),
        )
        # resolve one hop AND pointer-double the unresolved chain
        nxt = (
            state.join(downstream, ["to_row", "to_col"], "left")
            .select(
                "row", "col", "elev",
                F.coalesce("drain_elev", "ds_drain").alias("drain_elev"),
                F.when(F.col("drain_elev").isNull() & F.col("ds_drain").isNull(), F.col("ds_to_row"))
                .otherwise(F.col("to_row")).alias("to_row"),
                F.when(F.col("drain_elev").isNull() & F.col("ds_drain").isNull(), F.col("ds_to_col"))
                .otherwise(F.col("to_col")).alias("to_col"),
            )
        )
        state = nxt.localCheckpoint(eager=True)

    return state.select(
        "row", "col",
        F.when(F.col("drain_elev").isNotNull(), F.greatest(F.col("elev") - F.col("drain_elev"), F.lit(0.0)))
        .alias("hand"),
    )


def calculate_hand(grid: DataFrame, acc_threshold: float = 100.0) -> DataFrame:
    """flowdir -> accumulation -> HAND (ref hand/calculate.py:108-129)."""
    flow = flow_direction(grid).localCheckpoint(eager=True)
    acc = flow_accumulation(flow)
    return compute_hand(flow, acc, acc_threshold)
