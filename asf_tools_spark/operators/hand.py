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

``condition_dem`` converges to the serial priority-flood fill to within its
convergence tolerance ``conv_tol`` (default eps*1e-6; pass 0 for the exact
fixpoint) — see its docstring for the near-tied-spill caveat.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BooleanType, DoubleType, IntegerType, StructField, StructType

# D8 neighbor offsets in priority order (E, SE, S, SW, W, NW, N, NE)
D8 = [(0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1), (-1, 0), (-1, 1)]

_COND_SCHEMA = StructType([
    StructField("row", IntegerType()),
    StructField("col", IntegerType()),
    StructField("elev", DoubleType()),
    StructField("f", DoubleType()),
    # per-pixel convergence flag computed inside solve_tile: the old
    # plan re-joined new state vs old state every round just to probe
    # for any drop > tol — one whole join+shuffle of pure bookkeeping
    StructField("dropped", BooleanType()),
])

_TILE_STRIDE = 1 << 31


def condition_dem(
    grid: DataFrame,
    tile_shape: tuple[int, int] = (32, 32),
    eps: float = 1e-5,
    max_rounds: int | None = None,
    coarse_init: bool = True,
    stats: dict | None = None,
    conv_tol: float | None = None,
) -> DataFrame:
    """Distributed DEM conditioning: epsilon priority-flood depression
    filling, the Spark stand-in for the pysheds chain fill_pits ->
    fill_depressions -> resolve_flats
    (ref src/asf_tools/hydrosar/hand/calculate.py:108-118).

    Tiled halo-merge fixpoint (the standard parallel priority-flood shape):

    - state: per-cell filled level ``f`` — elevation on the global grid
      border (the drain), +inf elsewhere;
    - per round: each tile receives the current ``f`` of the halo ring of
      cells around it (only tile-EDGE cells cross tiles — a tiny fraction),
      then re-solves the tile-local fill exactly with core.dem
      ``priority_flood_fill`` seeded at every current upper bound;
    - ``f`` is monotonically nonincreasing and converges to exactly the
      full-array answer in O(tile-graph diameter) rounds — each round is one
      halo shuffle + one Arrow-batched grouped-map, NOT one round per cell.

    Returns (row, col, elev) with the FILLED elevations: every interior cell
    gains a strictly lower neighbor (the +eps ramp), so ``flow_direction``
    finds no spurious interior sinks and no flats. The reference likewise
    computes flowdir and HAND on the inflated DEM (calculate.py:119-129).

    ``coarse_init``: hierarchical border-graph pass (VERDICT r2 item 5),
    the shape of Barnes 2016's *parallel priority-flood* (public
    literature). One grouped-map job summarizes each tile by its
    border-to-border spill functions (for border cells a,b: the realized
    fill level A and hop count L of a local flood seeded at a — any seed
    level s then fills b at <= max(A, s + eps*L)); the driver runs ONE
    exact Dijkstra over the border-cell graph (within-tile summary edges +
    one-hop cross-tile edges, global-border cells as sources), producing a
    tight upper bound g on every border cell's true fill. Seeding ``f`` at
    g lets long-range fill information arrive before the first halo round,
    so the fixpoint is local cleanup only: measured 2-3 rounds instead of
    O(tile-graph semi-perimeter). The seed does not change the fixpoint —
    ``f`` decreases monotonically from any upper bound to the unique
    fixpoint (= the global priority flood), reached to within ``conv_tol``
    (exactly, when ``conv_tol=0``). Only border cells (cells/tile_perimeter
    fraction) ever reach the driver; guarded to the plain fixpoint when
    the border graph itself would be too big (the next rung is recursing
    the same summarization over tiles-of-tiles).

    ``stats``: pass a dict to receive {"rounds": int, "coarse": bool}.

    ``conv_tol`` (default ``eps * 1e-6``): the convergence gate stops when
    no cell's ``f`` drops by more than this between rounds. The default
    sits ~3 orders above the measured float-resummation noise floor and 6
    below eps, but it makes the stopping rule a TOLERANCE: two competing
    spill paths within conv_tol of each other may freeze at the higher
    elevation, so parity with a serial priority flood holds only outside
    near-tied spill configurations. Pass ``conv_tol=0`` for the exact
    fixpoint (every improvement counts; costs O(diameter) extra rounds of
    ~1e-14 noise chasing on large grids).
    """
    from ..core.dem import priority_flood_fill

    tol = eps * 1e-6 if conv_tol is None else conv_tol
    tr, tc = tile_shape
    ext = grid.agg(
        F.min("row").alias("r0"), F.max("row").alias("r1"),
        F.min("col").alias("c0"), F.max("col").alias("c1"),
    ).collect()[0]
    rmin, rmax, cmin, cmax = int(ext.r0), int(ext.r1), int(ext.c0), int(ext.c1)
    if max_rounds is None:
        # fill information crosses one tile layer per round: the tile-graph
        # semi-perimeter bounds border-to-anywhere propagation
        max_rounds = ((rmax - rmin) // tr + 1) + ((cmax - cmin) // tc + 1) + 2

    on_border = (
        (F.col("row") == rmin) | (F.col("row") == rmax)
        | (F.col("col") == cmin) | (F.col("col") == cmax)
    )
    tile_key = (
        F.floor(F.col("row") / tr).cast("long") * _TILE_STRIDE
        + F.floor(F.col("col") / tc).cast("long")
    )
    state = grid.select(
        "row", "col", F.col("elev").cast("double").alias("elev"),
        F.when(on_border, F.col("elev").cast("double"))
        .otherwise(F.lit(float("inf"))).alias("f"),
    )
    if coarse_init:
        state = _border_graph_seed(state, tile_shape, eps, (rmin, rmax, cmin, cmax))
    state = state.localCheckpoint(eager=True)

    def solve_tile(key, pdf: pd.DataFrame) -> pd.DataFrame:
        own = pdf[~pdf["is_halo"]]
        if own.empty:
            return pd.DataFrame(columns=["row", "col", "elev", "f", "dropped"])
        t0r = int(own["row"].min()) // tr * tr
        t0c = int(own["col"].min()) // tc * tc
        e = np.full((tr + 2, tc + 2), np.nan)
        fc = np.full((tr + 2, tc + 2), np.inf)
        rr = pdf["row"].to_numpy() - t0r + 1
        cc = pdf["col"].to_numpy() - t0c + 1
        e[rr, cc] = pdf["elev"].to_numpy()
        fc[rr, cc] = pdf["f"].to_numpy()
        # halo cells are fixed boundary conditions: pin elev to their current
        # f so local relaxation can read through but never lower them
        halo = pdf["is_halo"].to_numpy()
        e[rr[halo], cc[halo]] = fc[rr[halo], cc[halo]]
        seeds = [
            (int(r), int(c), float(fc[r, c]))
            for r, c in zip(rr, cc)
            if np.isfinite(fc[r, c])
        ]
        filled = priority_flood_fill(e, eps=eps, seeds=seeds)
        orow = own["row"].to_numpy()
        ocol = own["col"].to_numpy()
        newf = filled[orow - t0r + 1, ocol - t0c + 1]
        oldf = own["f"].to_numpy()
        outf = np.minimum(newf, oldf)
        return pd.DataFrame({
            "row": orow, "col": ocol,
            "elev": own["elev"].to_numpy(),
            "f": outf,
            "dropped": outf < oldf - tol,
        })

    converged = False
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        # pmod, not %: Java % is negative for negative coordinates, which
        # would silently stop tiles at negative row/col from exporting halos
        edge = state.where(
            (F.pmod(F.col("row"), tr).isin(0, tr - 1) | F.pmod(F.col("col"), tc).isin(0, tc - 1))
            & ~F.isnull("f") & (F.col("f") != float("inf"))
        )
        # per-row array_distinct explode instead of an 8-way union +
        # distinct SHUFFLE of the halo rows every round: the candidate
        # target-tile set dedups locally, so the only exchange left is
        # the groupBy placement shuffle (guide §2.3/2.4); the same
        # (tile, pixel) halo rows reach solve_tile
        tgt = F.array_distinct(F.array(*[
            (F.floor((F.col("row") + dr) / tr).cast("long") * _TILE_STRIDE
             + F.floor((F.col("col") + dc) / tc).cast("long"))
            for dr, dc in D8
        ]))
        halos = (
            edge.select(
                "row", "col", F.lit(None).cast("double").alias("elev"), "f",
                F.explode(tgt).alias("_lt"), tile_key.alias("_own"),
            )
            .where(F.col("_lt") != F.col("_own"))
            .drop("_own").withColumn("is_halo", F.lit(True))
        )
        own = state.withColumn("_lt", tile_key).withColumn("is_halo", F.lit(False))
        new_state = (
            own.unionByName(halos)
            .groupBy("_lt")
            .applyInPandas(solve_tile, schema=_COND_SCHEMA)
            .localCheckpoint(eager=True)
        )
        # convergence ignores drops below eps*1e-6: re-solving a tile
        # re-evaluates the same eps-add chains in a different summation
        # order, producing ~1e-14 float dribbles that otherwise drag the
        # fixpoint on for O(diameter) pure-noise rounds (measured: rounds
        # 2-17 of the 256x256 test were all <= 1.1e-14 'improvements').
        # NOTE this is a TOLERANCE, not exactness: a genuine improvement is
        # the gap between two competing spill elevations, which can be an
        # arbitrarily small real — two spills within eps*1e-6 (1e-11 at the
        # default eps) freeze at the higher one. The gate sits ~3 orders
        # above the measured noise floor and 6 below eps, so only
        # pathologically near-tied spill paths are affected; the priority-
        # flood oracle tests cover the realistic regime.
        changed = new_state.where("dropped").limit(1).count()
        state = new_state.drop("dropped")
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"condition_dem did not converge within max_rounds={max_rounds}; "
            "a partially-filled DEM (interior f may still be +inf) would "
            "silently corrupt flow_direction/HAND — raise max_rounds or "
            "enlarge tile_shape"
        )
    if stats is not None:
        stats["rounds"] = rounds
        stats["coarse"] = coarse_init
    return state.select("row", "col", F.col("f").alias("elev"))


_EDGE_SCHEMA = StructType([
    StructField("ar", IntegerType()),
    StructField("ac", IntegerType()),
    StructField("br", IntegerType()),
    StructField("bc", IntegerType()),
    StructField("a", DoubleType()),
    StructField("l", IntegerType()),
])


def _tile_transfer_fronts(
    e: np.ndarray, eps: float, bi: np.ndarray, bj: np.ndarray, max_bp: int = 8
):
    """Exact border-to-border transfer fronts of one tile, all sources at
    once (source-vectorized Bellman-Ford DP over hop budgets).

    A chain from border cell a to b carries (A, L): A = its eps-relaxed
    pass maximum (A_v = max(elev_v, A_u + eps), A_a = elev(a)), L = hops.
    For ANY seed level s, the chain fills b at <= max(A, s + eps*L) (fill
    is monotone in s — no s >= seed caveat). The Pareto front
    {(k, A_k(a,b))}: A_k = min chain-A over walks of <= k hops; the
    envelope min_k max(A_k, s + eps*k) IS the tile's exact transfer
    function, so the driver Dijkstra composing these fronts is exact, not
    just an upper bound.

    DP: A_{k+1}(v) = min(A_k(v), max(elev_v, min_{u in N8(v)} A_k(u) + eps)),
    iterated to convergence, vectorized over all |border| sources as a 3D
    (src, rows, cols) array. Returns per (a_idx, b_idx) the breakpoint list
    [(L, A), ...], capped at ``max_bp`` per pair (keep min-hop, min-A, and
    the largest interior drops — dropping points only loosens, never
    invalidates).
    """
    h, w = e.shape
    p = len(bi)
    ok = np.isfinite(e)
    INF = np.inf
    A = np.full((p, h, w), INF)
    A[np.arange(p), bi, bj] = e[bi, bj]
    hist = [A[:, bi, bj].copy()]  # hist[k][s, t] = A_k(source s -> border t)
    ev = np.where(ok, e, INF)
    # iteration cap bounds hist memory; early-stopped A_k values are still
    # valid bounds (min over <= k-hop walks), merely potentially looser
    for _ in range(min(h * w, 512)):
        ap = np.full((p, h + 2, w + 2), INF)
        ap[:, 1:-1, 1:-1] = A
        nbr_min = np.minimum.reduce([
            ap[:, 1 + dr:h + 1 + dr, 1 + dc:w + 1 + dc] for dr, dc in D8
        ])
        cand = np.maximum(ev[None, :, :], nbr_min + eps)
        newA = np.minimum(A, cand)
        if np.array_equal(newA, A, equal_nan=True):
            break
        A = newA
        hist.append(A[:, bi, bj].copy())
    H = np.stack(hist)  # (K+1, p, p)
    prev = np.concatenate([np.full((1, p, p), INF), H[:-1]])
    bp = np.isfinite(H) & (H < prev)
    fronts: dict[tuple[int, int], list[tuple[int, float]]] = {}
    ks, ss, ts = np.nonzero(bp)
    for k, s, t in zip(ks.tolist(), ss.tolist(), ts.tolist()):
        if s == t:
            continue
        fronts.setdefault((s, t), []).append((k, float(H[k, s, t])))
    for key, bps in fronts.items():
        if len(bps) > max_bp:
            # keep min-hop, min-A, and the largest interior drops
            drops = sorted(
                range(1, len(bps) - 1),
                key=lambda i: bps[i - 1][1] - bps[i][1], reverse=True,
            )[: max_bp - 2]
            keep = sorted({0, len(bps) - 1, *drops})
            fronts[key] = [bps[i] for i in keep]
    return fronts


def _border_graph_seed(
    state: DataFrame, tile_shape: tuple[int, int], eps: float,
    extent: tuple[int, int, int, int],
) -> DataFrame:
    """Barnes-2016-style coarse pass: per-tile border-to-border transfer
    fronts (one grouped-map job, see ``_tile_transfer_fronts``) + ONE
    exact driver Dijkstra over the border-cell graph, broadcast back as
    initial upper bounds on ``f``.

    Bound validity: each within-tile edge (a -> b, A, L) is a concrete
    chain whose exact pass-max is A and length L, so for ANY seed level s
    it fills b at <= max(A, s + eps*L); cross-tile edges are the literal
    one-hop fine relaxation max(elev_b, f_a + eps). Every walk in this
    graph maps to a concrete fine walk, so the Dijkstra distances g
    satisfy g(b) >= f_true(b) — a legal initialization for the
    monotone-decreasing fixpoint — and because the fronts are the tiles'
    exact transfer functions (up to the per-pair breakpoint cap), g is
    exact on ~99.9% of border cells (measured), leaving the fixpoint one
    real round of interior fill + one confirming round.

    Only tile-border cells reach the driver. Guarded: above ~5M summary
    pairs (n_tiles * (2(tr+tc))^2) fall back to the plain fixpoint — the
    next rung is recursing the summarization over tiles-of-tiles.
    """
    import heapq

    tr, tc = tile_shape
    rmin, rmax, cmin, cmax = extent
    spark = state.sparkSession

    n_tiles_est = ((rmax - rmin) // tr + 1) * ((cmax - cmin) // tc + 1)
    p = 2 * (tr + tc)
    if n_tiles_est * p * p > 5_000_000 or n_tiles_est < 4:
        return state

    border_pred = (
        F.pmod(F.col("row"), tr).isin(0, tr - 1)
        | F.pmod(F.col("col"), tc).isin(0, tc - 1)
        | F.col("row").isin(rmin, rmax)
        | F.col("col").isin(cmin, cmax)
    )

    tile_key = (
        F.floor(F.col("row") / tr).cast("long") * _TILE_STRIDE
        + F.floor(F.col("col") / tc).cast("long")
    )

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = pdf["row"].to_numpy()
        cols = pdf["col"].to_numpy()
        el = pdf["elev"].to_numpy(dtype=np.float64, na_value=np.nan)
        t0r = (int(rows.min()) // tr) * tr  # python // floors for negatives
        t0c = (int(cols.min()) // tc) * tc
        e = np.full((tr, tc), np.nan)
        li = rows - t0r
        lj = cols - t0c
        e[li, lj] = el
        isb = (
            (li == 0) | (li == tr - 1) | (lj == 0) | (lj == tc - 1)
            | (rows == rmin) | (rows == rmax) | (cols == cmin) | (cols == cmax)
        ) & np.isfinite(el)
        bi, bj = li[isb], lj[isb]
        if len(bi) == 0:
            return pd.DataFrame({c: [] for c in ["ar", "ac", "br", "bc", "a", "l"]})
        fronts = _tile_transfer_fronts(e, eps, bi, bj)
        ar_, ac_, br_, bc_, a_, l_ = [], [], [], [], [], []
        for (s, t), bps in fronts.items():
            for k, aval in bps:
                ar_.append(bi[s] + t0r)
                ac_.append(bj[s] + t0c)
                br_.append(bi[t] + t0r)
                bc_.append(bj[t] + t0c)
                a_.append(aval)
                l_.append(k)
        return pd.DataFrame({
            "ar": np.array(ar_, dtype=np.int64), "ac": np.array(ac_, dtype=np.int64),
            "br": np.array(br_, dtype=np.int64), "bc": np.array(bc_, dtype=np.int64),
            "a": np.array(a_, dtype=np.float64), "l": np.array(l_, dtype=np.int64),
        })

    edges = (
        state.withColumn("_lt", tile_key)
        .groupBy("_lt")
        .applyInPandas(lambda k, pdf: summarize(pdf), schema=_EDGE_SCHEMA)
        .collect()
    )
    bcells = state.where(border_pred).select("row", "col", "elev", "f").collect()

    elev_of = {}
    g = {}
    heap = []
    for r in bcells:
        node = (r.row, r.col)
        ev = r.elev
        if ev is None or not np.isfinite(ev):
            continue
        elev_of[node] = float(ev)
        if r.f is not None and np.isfinite(r.f):  # global-border source
            g[node] = float(r.f)
            heapq.heappush(heap, (float(r.f), node))
    adj: dict = {}
    for r in edges:
        adj.setdefault((r.ar, r.ac), []).append((r.br, r.bc, r.a, r.l))

    INF = float("inf")
    while heap:
        f, u = heapq.heappop(heap)
        if f > g.get(u, INF):
            continue
        for br_, bc_, a_, l_ in adj.get(u, ()):
            v = (br_, bc_)
            nf = max(a_, f + eps * l_)
            if nf < g.get(v, INF):
                g[v] = nf
                heapq.heappush(heap, (nf, v))
        ur, uc = u
        utile = (ur // tr, uc // tc)
        for dr, dc in D8:
            v = (ur + dr, uc + dc)
            ev = elev_of.get(v)
            if ev is None or (v[0] // tr, v[1] // tc) == utile:
                continue
            nf = max(ev, f + eps)
            if nf < g.get(v, INF):
                g[v] = nf
                heapq.heappush(heap, (nf, v))

    if not g:
        return state
    gdf = spark.createDataFrame(
        pd.DataFrame({
            "row": np.array([k[0] for k in g], dtype=np.int32),
            "col": np.array([k[1] for k in g], dtype=np.int32),
            "gb": np.array(list(g.values()), dtype=np.float64),
        })
    )
    return (
        state.join(F.broadcast(gdf), ["row", "col"], "left")
        .select("row", "col", "elev", F.least(F.col("f"), F.col("gb")).alias("f"))
    )


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


def calculate_hand(
    grid: DataFrame,
    acc_threshold: float = 100.0,
    condition: bool = False,
    tile_shape: tuple[int, int] = (32, 32),
) -> DataFrame:
    """(condition ->) flowdir -> accumulation -> HAND
    (ref hand/calculate.py:108-129). With ``condition=True`` the DEM is
    depression-filled/flat-resolved first and — like the reference, which
    feeds the inflated DEM to flowdir AND compute_hand — all downstream
    steps use the conditioned elevations."""
    if condition:
        grid = condition_dem(grid, tile_shape=tile_shape)
    flow = flow_direction(grid).localCheckpoint(eager=True)
    acc = flow_accumulation(flow)
    return compute_hand(flow, acc, acc_threshold)
