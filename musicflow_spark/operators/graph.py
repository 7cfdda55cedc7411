"""Iterative graph algorithms as DataFrame plans: weighted PageRank
in exact integer fixed-point arithmetic (beyond-reference extension —
the reference has no graph tier; the nearest analogue is ranking
match candidates, `dags/main.py` score ordering).

Why integer fixed-point: float PageRank sums are order-dependent, so
a Spark run and a DuckDB oracle replay could diverge in the last bits
and a value-hash compare would be meaningless.  Here ranks live as
int64 "units" (a fixed ``total`` mass, default 1e12) and every
per-iteration expression is integer multiply + integer ``div`` —
associative, commutative, engine-portable, so N iterations later the
two engines agree bit-for-bit.  The floor losses are bounded by
(edges + 2) units per iteration — at total=1e12 that is ~1e-9 of the
mass, far below any ranking-relevant difference.

Execution shape (the GraphX/Pregel pattern, DataFrame-native):

- edge "shares" (the row-normalized transition matrix, scaled to
  integers) are computed ONCE: one groupBy(src) + one equi-join;
- each iteration is one keyed equi-join (ranks ⋈ shares on src) +
  one groupBy(dst) partial-agg shuffle + a 1-row dangling-mass
  broadcast — never anything quadratic;
- ranks are ``localCheckpoint``ed per iteration so the lineage stays
  flat (the standard fix for exponentially-growing iterative plans);
- at web scale the edge table dominates: repartition it by ``src``
  once and every iteration's join reuses that partitioning, so only
  the (much smaller) rank frame moves per step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PAGERANK_TOTAL = 10**12
PAGERANK_SCALE = 10**6


def edge_shares(edges: DataFrame, scale: int = PAGERANK_SCALE) -> DataFrame:
    """Row-normalized integer transition shares: for each directed
    edge (src, dst, w) emit s = (w * scale) div out(src), where
    out(src) is the total outgoing weight.  Σ_dst s ≤ scale (floor
    loss stays in the dangling/teleport slack, never inflates mass).

    ``w * scale`` must fit int64: with scale=1e6 that allows per-edge
    weights up to ~9e12 — beyond any per-key count a 100 TB fact
    table produces after aggregation."""
    out = edges.groupBy("src").agg(F.sum("w").alias("__out__"))
    return edges.join(out, "src").select(
        "src", "dst", F.expr(f"(w * {int(scale)}) div __out__").alias("s")
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 10,
    damping_num: int = 85,
    damping_den: int = 100,
    total: int = PAGERANK_TOTAL,
    scale: int = PAGERANK_SCALE,
    checkpoint_interval: int = 1,
) -> DataFrame:
    """Weighted PageRank over ``edges`` (src, dst, w>0 long) for the
    node set ``nodes`` (single column ``node``; must cover every src/
    dst).  Returns (node, rank_units long), Σ rank_units ≈ total.

    Per iteration, with d = damping_num/damping_den:

        rank'(v) = teleport + d·Σ_u rank(u)·s(u,v) div scale
                            + d·dangling div n          (all integer)

    where teleport = (1-d)·total div n and dangling is the rank mass
    sitting on nodes with no outgoing edge (redistributed uniformly,
    the standard dangling-node treatment).  Every operation is
    integer, so the result is deterministic and exactly replayable by
    a SQL engine (see queries/graph.py for the unrolled DuckDB twin).

    ``checkpoint_interval``: iterations to chain lazily between
    ``localCheckpoint``s.  On a dangling-free graph each lazy
    iteration references the rank frame once (linear plan growth);
    with dangling nodes it is referenced twice (inflow join +
    dangling scalar), so the plan doubles per lazy step — keep the
    interval at 1 there.  Measured on the nation trade graph the
    per-iteration checkpoint wins (2.5 s vs 2.9–3.6 s for intervals
    of 3–10 at sf0.1): recomputation under the doubled references
    costs more than the job-scheduling it saves."""
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank needs a non-empty node set")
    shares = edge_shares(edges, scale).localCheckpoint(eager=True)
    srcs = shares.select("src").distinct().localCheckpoint(eager=True)
    # one-time structural check: a graph with no dangling nodes (every
    # node has an out-edge) drops the dangling aggregate from every
    # iteration — its contribution is identically 0, so the result is
    # unchanged and each lazy iteration references the rank frame only
    # once (linear plan growth instead of doubling)
    has_dangling = nodes.join(srcs, nodes["node"] == srcs["src"], "left_anti").count() > 0
    teleport = (damping_den - damping_num) * total // (damping_den * n)
    ranks = nodes.select("node", F.lit(total // n).cast("long").alias("rank"))
    ranks = ranks.localCheckpoint(eager=True)
    for it in range(n_iter):
        inflow = (
            shares.join(ranks, shares["src"] == ranks["node"])
            .select(
                "dst", F.expr(f"(rank * s) div {int(scale)}").alias("__c__")
            )
            .groupBy("dst")
            .agg(F.sum("__c__").alias("__inflow__"))
        )
        rank_expr = F.lit(teleport).cast("long") + F.expr(
            f"({int(damping_num)} * coalesce(__inflow__, 0))"
            f" div {int(damping_den)}"
        )
        stepped = nodes.join(inflow, nodes["node"] == inflow["dst"], "left")
        if has_dangling:
            dangling = (
                ranks.join(srcs, ranks["node"] == srcs["src"], "left_anti")
                .agg(
                    F.coalesce(F.sum("rank"), F.lit(0))
                    .cast("long")
                    .alias("__dang__")
                )
            )
            stepped = stepped.crossJoin(F.broadcast(dangling))
            rank_expr = rank_expr + F.expr(
                f"({int(damping_num)} * __dang__) div {int(damping_den) * n}"
            )
        ranks = stepped.select("node", rank_expr.cast("long").alias("rank"))
        if (it + 1) % checkpoint_interval == 0 and it + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.col("rank").alias("rank_units"))


def pagerank_bounded(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 10,
    damping_num: int = 85,
    damping_den: int = 100,
    total: int = PAGERANK_TOTAL,
    scale: int = PAGERANK_SCALE,
) -> DataFrame:
    """Single-task PageRank for DIMENSION-BOUNDED graphs — same
    contract and bit-identical results as :func:`pagerank`.

    When the aggregated graph is bounded by a dimension cardinality
    (|nations|² for the trade graph), the distributed tier's cost is
    not data but BARRIERS: ~9 scheduled stages per iteration to move
    a few hundred rows, on a cluster just as on local[32] (measured
    at sf0.1: 91 stages/run, none over 0.25 s).  This tier folds the
    whole recurrence into one task: (node ∪ edge) rows coalesce into
    a single partition and a mapInPandas kernel replays the exact
    integer fixed-point recurrence in Python longs — floor division
    on non-negative int64 everywhere, so the result is bit-identical
    to the distributed tier (pytest-cross-checked) and to the DuckDB
    oracle replay.  The plan keeps the scale-relevant part (the edge
    aggregation over the fact tables) fully distributed; only the
    dimension-bounded iteration is single-task, the same bound class
    as the k-row centroid folds (knn_ivf_trained) already in
    SINGLE_OK.  NOT for data-sized graphs (|V|·k edge rows):
    embedding_centrality_pagerank stays on :func:`pagerank`."""
    dn, dd = int(damping_num), int(damping_den)
    tot, sc, iters = int(total), int(scale), int(n_iter)
    # tag-union instead of nullable columns: every column stays
    # non-null int64 end to end, so Arrow→pandas never widens to
    # float64 (which would corrupt ids/weights past 2^53)
    tagged = nodes.select(
        F.col("node").cast("long").alias("a"),
        F.lit(0).cast("long").alias("b"),
        F.lit(0).cast("long").alias("w"),
        F.lit(0).alias("tag"),
    ).unionByName(
        edges.select(
            F.col("src").cast("long").alias("a"),
            F.col("dst").cast("long").alias("b"),
            F.col("w").cast("long").alias("w"),
            F.lit(1).alias("tag"),
        )
    )

    def kernel(batches):
        import pandas as pd

        node_ids: list[int] = []
        raw: list[tuple[int, int, int]] = []
        for pdf in batches:
            for a, b, w, tag in zip(
                pdf["a"].tolist(), pdf["b"].tolist(),
                pdf["w"].tolist(), pdf["tag"].tolist(),
            ):
                if tag == 0:
                    node_ids.append(int(a))
                else:
                    raw.append((int(a), int(b), int(w)))
        n = len(node_ids)
        if n == 0:
            raise ValueError("pagerank needs a non-empty node set")
        out: dict[int, int] = {}
        for s, _d, w in raw:
            out[s] = out.get(s, 0) + w
        shares = [(s, d, (w * sc) // out[s]) for s, d, w in raw]
        dangling = [v for v in node_ids if v not in out]
        teleport = (dd - dn) * tot // (dd * n)
        rank = {v: tot // n for v in node_ids}
        for _ in range(iters):
            inflow: dict[int, int] = {}
            for s, d, sv in shares:
                inflow[d] = inflow.get(d, 0) + (rank[s] * sv) // sc
            dang_term = (dn * sum(rank[v] for v in dangling)) // (dd * n)
            rank = {
                v: teleport + (dn * inflow.get(v, 0)) // dd + dang_term
                for v in node_ids
            }
        yield pd.DataFrame(
            {"node": node_ids, "rank_units": [rank[v] for v in node_ids]}
        )

    return tagged.coalesce(1).mapInPandas(kernel, "node long, rank_units long")


def pagerank_oracle_sql(
    nodes_sql: str,
    edges_sql: str,
    n_iter: int = 10,
    damping_num: int = 85,
    damping_den: int = 100,
    total: int = PAGERANK_TOTAL,
    scale: int = PAGERANK_SCALE,
) -> str:
    """The exact DuckDB replay of :func:`pagerank` as unrolled CTEs
    (standard SQL allows only one recursive self-reference, but each
    step needs the rank frame twice — inflow join + dangling scalar —
    so the iterations are generated textually instead).

    ``nodes_sql`` must yield (node), ``edges_sql`` (src, dst, w).
    Emits CTEs nodes/edges/shares/nn/r0..r{n_iter} and a final
    ``SELECT node, rank AS rank_units FROM r{n_iter}``; callers wrap
    or extend the tail as needed."""
    dn, dd = int(damping_num), int(damping_den)
    steps = []
    for t in range(n_iter):
        steps.append(f"""
r{t + 1} AS MATERIALIZED (
  SELECT nd.node,
         CAST(((({dd} - {dn}) * {total}) // ({dd} * nn.n))
              + ({dn} * COALESCE(infl.i, 0)) // {dd}
              + ({dn} * dang.d) // ({dd} * nn.n) AS BIGINT) AS rank
  FROM nodes nd
  CROSS JOIN nn
  CROSS JOIN (SELECT COALESCE(SUM(r.rank), 0) AS d
              FROM r{t} r
              WHERE r.node NOT IN (SELECT src FROM shares)) dang
  LEFT JOIN (SELECT s.dst AS node, SUM((r.rank * s.s) // {scale}) AS i
             FROM shares s JOIN r{t} r ON r.node = s.src
             GROUP BY s.dst) infl ON infl.node = nd.node)""")
    return f"""
WITH nodes AS MATERIALIZED ({nodes_sql}),
edges AS MATERIALIZED ({edges_sql}),
nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes),
outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src),
shares AS MATERIALIZED (
  SELECT e.src, e.dst, CAST((e.w * {scale}) // o.ow AS BIGINT) AS s
  FROM edges e JOIN outw o ON o.src = e.src),
r0 AS MATERIALIZED (SELECT node, CAST({total} // nn.n AS BIGINT) AS rank
       FROM nodes CROSS JOIN nn),{",".join(steps)}
SELECT node, rank AS rank_units FROM r{n_iter}
"""


# ----------------------------------------- connected components (stars)
def _canonical(e: DataFrame) -> DataFrame:
    """Distinct edges oriented (hi, lo), self-loops dropped."""
    return (
        e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def star_components(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce
    and Beyond", SoCC'14) — the O(log² n)-round alternative to plain
    min-label propagation (operators/dedup.py::dedup_clusters), which
    needs O(diameter) rounds and so degrades on long path-shaped
    components (chained near-dup documents, linked-record graphs).

    large-star: every node u sends its strictly-larger neighbors to
    m = min(Γ(u) ∪ {u}); small-star: orient edges (hi, lo), every hi
    node re-hangs its smaller neighbors (and itself) under their
    minimum.  Each step computes its per-u minimum as a PARTITION
    WINDOW over the edge list instead of a groupBy + join back: the
    min and the emit read the same shuffled partition, so a step is
    ONE exchange (+ the distinct's), where the agg+join form paid the
    aggregate's exchange AND re-shuffled the edge list for the join —
    measured 6 → 4 exchanges and two SortMergeJoins removed per
    round (guide §2.4: two operations keyed the same way share one
    exchange).  Skew behavior is unchanged: both forms co-locate each
    u's edges in one task; hot hubs shrink by the algorithm itself
    (every round re-hangs their neighbors under the minimum).  The
    edge frame is localCheckpointed per round to keep lineage flat.
    Converged when the canonical edge set is a fixpoint, at which
    point every component is a star rooted at its minimum id.

    The fixpoint probe is COUNT-GATED (r13, guide §1.2/§2.4): both
    edge sets are canonical (distinct), so different cardinalities
    prove non-convergence without comparing the sets — the per-round
    count() doubles as the lazy checkpoint's materializing action,
    and the full-outer symmetric-difference join (two sorted probes
    of the edge frames) runs only on the rare count-equal rounds
    (in practice: the final round, plus any same-size reshuffle of
    the edge set).  Measured at sf0.1 the join probe was ~30% of
    every round's job; the gate pays one cheap count per round
    instead.

    Returns (id_col, cluster_id, keep) — identical contract to
    ``dedup_clusters`` (cluster_id = min reachable id, keeper =
    root), so the two are interchangeable and cross-checkable.
    """
    wu = Window.partitionBy("u")
    edges = _canonical(
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    ).localCheckpoint(eager=False)
    n_edges = edges.count()
    for _ in range(max_iter):
        # large-star over the symmetric neighbor list: m = min(Γ(u) ∪ {u}).
        # NOT deduplicated between the stars (r13, guide §2.4): the
        # small-star min ignores duplicate (u, v) rows and the final
        # per-round distinct canonicalizes the emitted set, so the
        # intermediate distinct bought nothing semantically — and its
        # skew protection was redundant, because the small-star window
        # partition for key v holds at most degree(v) rows either way
        # (duplicates of (v, m) come one-per-smaller-neighbor), the
        # same bound the large-star window already carries.  Removing
        # it removes one exchange/barrier per round: 4 -> 3.
        sym = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        large = (
            sym.withColumn("m", F.least(F.col("u"), F.min("v").over(wu)))
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # small-star over the (hi, lo) orientation: every v < u (and u
        # itself) re-hangs under min(Γ_small(u)); both emitted edges
        # come from ONE windowed row via explode, so the window pass
        # runs once, not once per union branch
        # LAZY checkpoint: the delta count below is the first action on
        # the frame, so it materializes the checkpoint in the SAME job
        # — one scheduled job per round instead of two
        small = _canonical(
            large.withColumn("m", F.min("v").over(wu))
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("v").alias("u"), F.col("m").alias("v")),
                        F.struct(F.col("u").alias("u"), F.col("m").alias("v")),
                    )
                ).alias("e")
            )
            .select("e.u", "e.v")
        ).localCheckpoint(eager=False)
        # count gate: the count materializes the lazy checkpoint; a
        # cardinality change proves non-convergence (both sets are
        # distinct), so the set-equality join below is skipped
        n_small = small.count()
        converged = False
        if n_small == n_edges:
            # one full-outer join: rows missing on either side ==
            # symmetric difference of the two canonical edge sets —
            # both sides already materialized checkpoints here
            delta = (
                small.withColumn("__n__", F.lit(1))
                .join(edges.withColumn("__o__", F.lit(1)), ["u", "v"], "full")
                .filter(F.col("__n__").isNull() | F.col("__o__").isNull())
                .count()
            )
            converged = delta == 0
        edges, n_edges = small, n_small
        if converged:
            break
    else:
        raise RuntimeError(f"star_components did not converge in {max_iter} rounds")
    roots = edges.groupBy("u").agg(F.min("v").alias("root"))
    return (
        nodes.select(F.col(id_col).alias("id"))
        .join(roots, F.col("id") == roots["u"], "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("root", F.col("id")).alias("cluster_id"),
            F.col("root").isNull().alias("keep"),
        )
    )


# ---------------------------------------------------- triangle counting
def triangle_counts(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-node triangle counts by degree-ordered edge orientation
    (Suri & Vassilvitskii, "Counting Triangles and the Curse of the
    Last Reducer", WWW'11).  Naive wedge enumeration groups on the
    shared vertex, so one hub of degree d creates d²/2 wedge rows —
    the "last reducer" that kills the job at 100 TB.  Orienting every
    edge from its lower-(degree, id) endpoint to the higher one caps
    every oriented out-degree at O(√E), so the wedge join is bounded
    by E^{3/2} TOTAL and, more importantly, no single key is
    quadratic in a hub's degree.

    Plan: degrees (one groupBy) → orientation (two broadcast-or-
    shuffle joins against the degree frame) → wedge self-equi-join on
    the oriented source → closing-edge equi-join.  Each triangle
    {x,y,z} materializes exactly once (its vertices appear in strict
    (degree, id) order), then explodes to 3 per-node contributions.
    Everything is keyed equi-joins and aggregations — no cartesian,
    no collect.

    Returns (id_col, n_triangles) for EVERY node (zeros included).
    """
    e = _canonical(
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    )
    deg = (
        e.select(F.col("u").alias("n"))
        .unionByName(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    keyed = (
        e.join(deg.select(F.col("n").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("n").alias("v"), F.col("d").alias("dv")), "v")
        .select(
            "u", "v",
            F.struct(F.col("du").alias("d"), F.col("u").alias("i")).alias("ku"),
            F.struct(F.col("dv").alias("d"), F.col("v").alias("i")).alias("kv"),
        )
    )
    # orient src -> dst by ascending (degree, id); struct comparison
    # is lexicographic, so the order is total and deterministic
    oe = keyed.select(
        F.when(F.col("ku") < F.col("kv"), F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(F.col("ku") < F.col("kv"), F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(F.col("ku") < F.col("kv"), F.col("kv")).otherwise(F.col("ku")).alias("kdst"),
    )
    x = oe.select("src", F.col("dst").alias("a"), F.col("kdst").alias("ka"))
    y = oe.select("src", F.col("dst").alias("b"), F.col("kdst").alias("kb"))
    wedges = x.join(y, "src").filter(F.col("ka") < F.col("kb")).select("src", "a", "b")
    closing = oe.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    tri = wedges.join(closing, ["a", "b"])
    counts = (
        tri.select(F.explode(F.array("src", "a", "b")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        nodes.select(F.col(id_col).alias("id"))
        .join(counts, F.col("id") == counts["n"], "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
        )
    )


# ------------------------------------------------------ link prediction
def link_prediction(
    pairs: DataFrame,
    ra_scale: int = 10**6,
    max_hub_deg: int | None = None,
) -> DataFrame:
    """Common-neighbor link prediction over an undirected edge list
    (doc_a, doc_b): for every NON-adjacent pair sharing at least one
    neighbor, the common-neighbor count and the Resource-Allocation
    index (Zhou, Lü & Zhang, EPJ B 2009) — RA = Σ_z 1/deg(z) over
    shared neighbors z.

    RA instead of Adamic-Adar on purpose: AA's 1/ln(deg) weights need
    a transcendental whose last-ulp may differ across engines, while
    RA in integer micro-units (``ra_scale div deg``) is a sum of
    exact integers — associative, order-independent, bit-identical on
    Spark and the DuckDB oracle replay.

    Scale shape: wedges group on the shared vertex z, so a hub of
    degree d emits d² candidate rows — the same last-reducer hazard
    as naive triangle counting.  ``max_hub_deg`` drops hubs ABOVE the
    cap from wedge generation (the df-cap pattern of the shingle
    inverted index, operators/dedup.py::jaccard_pairs): a
    boilerplate-hub's CN score is noise for near-dup mining anyway.
    None = uncapped (exact).
    """
    e = _canonical(
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    )
    adj = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    hub = deg if max_hub_deg is None else deg.filter(F.col("deg") <= max_hub_deg)
    # wedge join on the shared vertex z: (x)-(z)-(y), x < y
    za = adj.select(F.col("u").alias("z"), F.col("v").alias("x"))
    zb = adj.select(F.col("u").alias("z"), F.col("v").alias("y"))
    wedges = (
        za.join(zb, "z")
        .filter(F.col("x") < F.col("y"))
        .join(hub.select(F.col("u").alias("z"), "deg"), "z")
    )
    scored = wedges.groupBy("x", "y").agg(
        F.count(F.lit(1)).alias("cn"),
        F.sum(F.expr(f"{int(ra_scale)} div deg")).alias("ra_micro"),
    )
    # drop already-adjacent pairs: candidates are NEW links only
    existing = e.select(F.col("v").alias("x"), F.col("u").alias("y"))
    return scored.join(existing, ["x", "y"], "left_anti").select(
        F.col("x").alias("doc_a"),
        F.col("y").alias("doc_b"),
        "cn",
        "ra_micro",
    )


# --------------------------------------------------------------- k-core
def kcore(
    nodes: DataFrame,
    pairs: DataFrame,
    k: int,
    n_rounds: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """Members of the k-core (maximal subgraph where every node has
    degree ≥ k) by synchronous peeling: each round recomputes degrees
    over the surviving subgraph and deletes every node below k.
    Peeling is monotone — once the core is reached, further rounds
    are no-ops — so a FIXED ``n_rounds`` with slack is deterministic
    and exactly replayable as unrolled SQL (``kcore_oracle_sql``),
    unlike a loop-until-fixpoint whose round count depends on data.

    Returns (id_col, core_deg) for core members only.

    Each round is one groupBy(u) degree count + two semi-joins of the
    edge list against the survivor set — keyed shuffles, edge-linear;
    the edge frame is localCheckpointed per round to keep lineage
    flat.  Rounds needed = peeling depth, typically ≪ diameter; for
    similarity graphs single digits.
    """
    e = _canonical(
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    )
    adj = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    for _ in range(n_rounds):
        deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        alive = deg.filter(F.col("deg") >= k).select("u")
        adj = (
            adj.join(alive, "u", "left_semi")
            .join(alive.select(F.col("u").alias("v")), "v", "left_semi")
            .localCheckpoint(eager=True)
        )
    final_deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("core_deg"))
    return (
        nodes.select(F.col(id_col).alias("u"))
        .join(final_deg, "u")
        .filter(F.col("core_deg") >= k)
        .select(F.col("u").alias(id_col), "core_deg")
    )


def kcore_oracle_sql(
    edges_sql: str, k: int, n_rounds: int, id_name: str = "vec_id"
) -> str:
    """Unrolled ANSI-SQL replay of ``kcore``: ``edges_sql`` must
    yield undirected distinct (doc_a, doc_b); each round is a degree
    CTE + a survivor-filtered edge CTE, mirroring the Spark loop
    round for round (same fixed n_rounds, same ≥ k predicate)."""
    # every per-round CTE is MATERIALIZED: each round references the
    # previous one three times (FROM + two EXISTS), so default CTE
    # inlining would re-expand the base scan 3^n_rounds times
    parts = [
        f"""e AS MATERIALIZED (
  SELECT least(doc_a, doc_b) AS v, greatest(doc_a, doc_b) AS u
  FROM ({edges_sql}) src0 WHERE doc_a <> doc_b
),
adj0 AS MATERIALIZED (
  SELECT DISTINCT u, v FROM e
  UNION ALL
  SELECT DISTINCT v AS u, u AS v FROM e
)"""
    ]
    for i in range(n_rounds):
        parts.append(
            f"""deg{i} AS MATERIALIZED (SELECT u, count(*) AS deg FROM adj{i} GROUP BY u),
alive{i} AS MATERIALIZED (SELECT u FROM deg{i} WHERE deg >= {k}),
adj{i + 1} AS MATERIALIZED (
  SELECT a.u, a.v FROM adj{i} a
  WHERE EXISTS (SELECT 1 FROM alive{i} s WHERE s.u = a.u)
    AND EXISTS (SELECT 1 FROM alive{i} s WHERE s.u = a.v)
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
fin AS (SELECT u, count(*) AS core_deg FROM adj{n_rounds} GROUP BY u)
SELECT u AS {id_name}, core_deg FROM fin WHERE core_deg >= {k}"""
    )


# ------------------------------------------------ BFS hop distances
def bfs_hops(
    seeds: DataFrame,
    pairs: DataFrame,
    n_rounds: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Multi-source BFS shortest-hop distances over an undirected
    graph: ``seeds`` (one id column named ``id_col``) start at hop 0;
    each round relaxes one edge — dist'(v) = min(dist(v), min over
    neighbors u of dist(u) + 1) — so after ``n_rounds`` rounds every
    node within ``n_rounds`` hops of a seed carries its exact
    shortest distance (classic Bellman-Ford / Pregel BFS).  Distances
    are small exact integers; the round count is FIXED, so the
    unrolled SQL replay (``bfs_oracle_sql``) agrees bit-for-bit
    whether or not the frontier has quiesced.

    Scale shape: per round one equi-join of the (much smaller)
    distance frame against the src-keyed symmetric adjacency, one
    min-combine groupBy — edge-linear keyed shuffles only, the same
    per-round lattice as ``pagerank``; the distance frame is
    localCheckpointed per round to keep lineage flat.  Unreached
    nodes never materialize (no |V| dense vector).
    """
    adj = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    ).distinct().localCheckpoint(eager=True)
    dist = seeds.select(
        F.col(id_col).alias("node"), F.lit(0).cast("int").alias("hops")
    ).localCheckpoint(eager=True)
    for _ in range(n_rounds):
        relaxed = dist.join(adj, dist["node"] == adj["u"]).select(
            F.col("v").alias("node"), (F.col("hops") + 1).alias("hops")
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("hops").alias("hops"))
            .localCheckpoint(eager=True)
        )
    return dist.select(F.col("node").alias(id_col), "hops")


def bfs_oracle_sql(
    seeds_sql: str, edges_sql: str, n_rounds: int, id_name: str = "doc_id"
) -> str:
    """Unrolled ANSI-SQL replay of ``bfs_hops``: one min-combine CTE
    per round over the same symmetric adjacency."""
    parts = [
        f"""adj AS MATERIALIZED (
  SELECT DISTINCT u, v FROM (
    SELECT doc_a AS u, doc_b AS v FROM ({edges_sql}) s0
    UNION ALL
    SELECT doc_b AS u, doc_a AS v FROM ({edges_sql}) s1)
),
d0 AS MATERIALIZED (SELECT {id_name} AS node, 0 AS hops FROM ({seeds_sql}) sd)"""
    ]
    for i in range(n_rounds):
        parts.append(
            f"""d{i + 1} AS MATERIALIZED (
  SELECT node, min(hops) AS hops FROM (
    SELECT node, hops FROM d{i}
    UNION ALL
    SELECT a.v AS node, d.hops + 1 AS hops FROM d{i} d JOIN adj a ON a.u = d.node)
  GROUP BY node
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT node AS {id_name}, CAST(hops AS INT) AS hops FROM d{n_rounds}"
    )
