"""PageRank (operators/graph.py): numpy power-iteration agreement,
dangling-node mass handling, determinism, and oracle-generator parity
on a hand-built graph."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from musicflow_spark.operators.graph import (
    PAGERANK_TOTAL,
    edge_shares,
    pagerank,
    pagerank_bounded,
    pagerank_oracle_sql,
)

#: (src, dst, w) — two hubs, one dangling node (4 has no out-edge),
#: asymmetric weights so every rank is distinct.
EDGES = [
    (0, 1, 3), (0, 2, 1), (1, 2, 2), (2, 0, 5),
    (2, 3, 1), (3, 0, 1), (3, 4, 4), (1, 4, 1),
]
NODES = [0, 1, 2, 3, 4]


def _numpy_pagerank(nodes, edges, n_iter=10, d=0.85):
    """Float reference: textbook weighted PageRank with uniform
    dangling redistribution (probability mass, sums to 1)."""
    n = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    m = np.zeros((n, n))
    out = {}
    for s, _, w in edges:
        out[s] = out.get(s, 0) + w
    for s, t, w in edges:
        m[idx[t], idx[s]] += w / out[s]
    dangling = np.array([1.0 if v not in out else 0.0 for v in nodes])
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        r = (1 - d) / n + d * (m @ r) + d * (dangling @ r) / n
    return {v: r[idx[v]] for v in nodes}


@pytest.fixture(scope="module")
def frames(spark):
    nodes = spark.createDataFrame([(v,) for v in NODES], "node long")
    edges = spark.createDataFrame(EDGES, "src long, dst long, w long")
    return nodes, edges


def test_pagerank_matches_numpy_power_iteration(spark, frames):
    nodes, edges = frames
    got = {r["node"]: r["rank_units"] for r in pagerank(nodes, edges).collect()}
    want = _numpy_pagerank(NODES, EDGES)
    assert set(got) == set(NODES)
    for v in NODES:
        # integer floors lose ≤ (edges+2)/total mass per iteration;
        # at total=1e12 the relative gap to the float reference is
        # dominated by the share quantization (scale=1e6) — 1e-5 is
        # orders of magnitude of headroom while still pinning ranks.
        assert got[v] / PAGERANK_TOTAL == pytest.approx(want[v], abs=1e-5)


def test_pagerank_mass_conserved_and_deterministic(spark, frames):
    nodes, edges = frames
    a = {r["node"]: r["rank_units"] for r in pagerank(nodes, edges).collect()}
    b = {r["node"]: r["rank_units"] for r in pagerank(nodes, edges).collect()}
    assert a == b
    total = sum(a.values())
    # floor losses only ever shrink the mass, never inflate it; the
    # dominant loss is share quantization (≤ out-degree/scale ≈ 3e-6
    # of the transported mass per node-iteration here)
    assert PAGERANK_TOTAL * (1 - 1e-4) < total <= PAGERANK_TOTAL


def test_pagerank_oracle_generator_replays_spark(spark, frames):
    nodes, edges = frames
    got = {r["node"]: r["rank_units"] for r in pagerank(nodes, edges, n_iter=4).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e AS SELECT * FROM (VALUES "
        + ",".join(f"({s},{t},{w})" for s, t, w in EDGES)
        + ") t(src, dst, w)"
    )
    sql = pagerank_oracle_sql(
        "SELECT * FROM (VALUES (0),(1),(2),(3),(4)) t(node)",
        "SELECT src, dst, w FROM e",
        n_iter=4,
    )
    want = {int(n): int(r) for n, r in con.execute(sql).fetchall()}
    assert got == want  # bit-exact, not approximate


@pytest.mark.slow
def test_pagerank_bounded_bit_identical_to_distributed(spark, frames):
    """The single-task bounded tier must replay the distributed
    integer recurrence exactly — including the dangling branch (node
    4 has no out-edge here)."""
    nodes, edges = frames
    for n_iter in (1, 4, 10):
        dist = {
            r["node"]: r["rank_units"]
            for r in pagerank(nodes, edges, n_iter=n_iter).collect()
        }
        bnd = {
            r["node"]: r["rank_units"]
            for r in pagerank_bounded(nodes, edges, n_iter=n_iter).collect()
        }
        assert bnd == dist  # bit-exact, not approximate


def test_pagerank_bounded_dangling_free_graph(spark):
    """Dangling-free variant (every node has an out-edge) exercises
    the has_dangling=False fast path of the distributed tier against
    the kernel's unconditional (identically-zero) dangling term."""
    edges_rows = [(0, 1, 2), (1, 2, 1), (2, 0, 3), (2, 1, 1)]
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "node long")
    edges = spark.createDataFrame(edges_rows, "src long, dst long, w long")
    dist = {
        r["node"]: r["rank_units"] for r in pagerank(nodes, edges).collect()
    }
    bnd = {
        r["node"]: r["rank_units"]
        for r in pagerank_bounded(nodes, edges).collect()
    }
    assert bnd == dist


def test_dangling_node_receives_and_forwards_no_mass(spark, frames):
    nodes, edges = frames
    ranks = {r["node"]: r["rank_units"] for r in pagerank(nodes, edges).collect()}
    # node 4 is dangling but is fed by 1 and 3 — it must hold real
    # rank (teleport + inflow), and the sink must not capture the
    # whole graph (its mass is redistributed each round)
    teleport_only = PAGERANK_TOTAL * 15 // (100 * len(NODES))
    assert ranks[4] > teleport_only
    assert ranks[4] < PAGERANK_TOTAL // 2


def test_edge_shares_row_normalized(spark, frames):
    _, edges = frames
    rows = edge_shares(edges).collect()
    by_src: dict[int, int] = {}
    for r in rows:
        by_src[r["src"]] = by_src.get(r["src"], 0) + r["s"]
    for s, tot in by_src.items():
        assert tot <= 10**6, s
        assert tot > 10**6 - len(EDGES)  # floor loss < 1 unit/edge


# ------------------------------------------ star-contraction components
def _uf_components(n_nodes, edges):
    """Union-find reference: id -> min reachable id."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n_nodes)}


def _run_star(spark, n_nodes, edges):
    from musicflow_spark.operators.graph import star_components

    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "doc_id long")
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(0, 0)], "doc_a long, doc_b long"
    )
    if not edges:
        pairs = pairs.limit(0)
    return {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in star_components(nodes, pairs).collect()
    }


def test_star_components_path_graph(spark):
    """A 30-node path — the O(diameter) worst case for min-label
    propagation — must resolve to one cluster rooted at 0 within the
    star-contraction round budget."""
    edges = [(i, i + 1) for i in range(29)]
    got = _run_star(spark, 30, edges)
    assert got == {i: (0, i == 0) for i in range(30)}


def test_star_components_random_vs_union_find(spark):
    import random

    rng = random.Random(7)
    n = 60
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
    edges = [(a, b) for a, b in edges if a != b]
    ref = _uf_components(n, edges)
    got = _run_star(spark, n, edges)
    assert {k: v[0] for k, v in got.items()} == ref
    for k, (cl, keep) in got.items():
        assert keep == (cl == k)


def test_star_components_agrees_with_label_propagation(spark):
    import random

    from musicflow_spark.operators.dedup import dedup_clusters

    rng = random.Random(11)
    n = 40
    edges = list({(min(a, b), max(a, b))
                  for a, b in ((rng.randrange(n), rng.randrange(n))
                               for _ in range(30)) if a != b})
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    from musicflow_spark.operators.graph import star_components

    a = sorted(map(tuple, star_components(nodes, pairs).collect()))
    b = sorted(map(tuple, dedup_clusters(nodes, pairs).collect()))
    assert a == b


def test_star_components_empty_edges_all_singletons(spark):
    got = _run_star(spark, 5, [])
    assert got == {i: (i, True) for i in range(5)}


# ----------------------------------------------------- triangle counting
def _brute_triangles(n_nodes, edges):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {i: set() for i in range(n_nodes)}
    for a, b in es:
        adj[a].add(b)
        adj[b].add(a)
    tris = {
        tuple(sorted((a, b, c)))
        for a, b in es
        for c in adj[a] & adj[b]
    }
    counts = {i: 0 for i in range(n_nodes)}
    for t in tris:
        for v in t:
            counts[v] += 1
    return counts


def test_triangle_counts_random_vs_brute(spark):
    import random

    from musicflow_spark.operators.graph import triangle_counts

    rng = random.Random(3)
    n = 40
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(120)]
    ref = _brute_triangles(n, edges)
    nodes = spark.createDataFrame([(i,) for i in range(n)], "vec_id long")
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["vec_id"]: r["n_triangles"]
        for r in triangle_counts(nodes, pairs).collect()
    }
    assert got == ref
    assert sum(ref.values()) % 3 == 0 and sum(ref.values()) > 0


def test_triangle_counts_hub_graph(spark):
    """A star hub (degree n-1) plus one rim edge: exactly one
    triangle; the degree orientation must keep the hub's oriented
    out-degree at 0 (every edge points AT the hub), so no wedge
    explosion on the hot key."""
    from musicflow_spark.operators.graph import triangle_counts

    n = 30
    edges = [(0, i) for i in range(1, n)] + [(1, 2)]
    nodes = spark.createDataFrame([(i,) for i in range(n)], "vec_id long")
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["vec_id"]: r["n_triangles"]
        for r in triangle_counts(nodes, pairs).collect()
    }
    expect = {i: 0 for i in range(n)}
    expect[0] = expect[1] = expect[2] = 1
    assert got == expect


def test_link_prediction_known_graph(spark):
    """Path 1-2-3-4 plus chord 1-3: the only non-adjacent pairs with
    a shared neighbor are (1,4) and (2,4), both through hub 3
    (deg 3), so cn=1 and ra_micro = 1e6 div 3 for each; adjacent
    pairs like (2,3) (shared neighbor 1) must be anti-joined away."""
    from musicflow_spark.operators.graph import link_prediction

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 3)], "doc_a long, doc_b long"
    )
    got = {
        (r["doc_a"], r["doc_b"]): (r["cn"], r["ra_micro"])
        for r in link_prediction(pairs).collect()
    }
    assert got == {(1, 4): (1, 333333), (2, 4): (1, 333333)}


def test_link_prediction_hub_cap_drops_hot_wedges(spark):
    """A degree-10 hub z=0 creates 45 candidate pairs; capping
    max_hub_deg below 10 removes every wedge through it."""
    from musicflow_spark.operators.graph import link_prediction

    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 11)], "doc_a long, doc_b long"
    )
    assert link_prediction(pairs).count() == 45
    assert link_prediction(pairs, max_hub_deg=9).count() == 0


def test_kcore_triangle_with_tail(spark):
    """Triangle {1,2,3} + tail 3-4: node 4 peels at k=2 (and its
    removal must NOT drag 3 below k); at k=3 the whole graph peels."""
    from musicflow_spark.operators.graph import kcore

    nodes = spark.createDataFrame([(i,) for i in range(1, 5)], "vec_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "doc_a long, doc_b long"
    )
    core2 = {
        r["vec_id"]: r["core_deg"]
        for r in kcore(nodes, pairs, k=2, n_rounds=4).collect()
    }
    assert core2 == {1: 2, 2: 2, 3: 2}
    assert kcore(nodes, pairs, k=3, n_rounds=4).count() == 0


def test_kcore_path_cascades_from_both_ends(spark):
    """A 6-node path at k=2 unravels one layer per round from each
    end — after enough rounds nothing survives, and the fixed-round
    unrolling must reach that fixpoint (3 rounds needed here)."""
    from musicflow_spark.operators.graph import kcore

    nodes = spark.createDataFrame([(i,) for i in range(6)], "vec_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "doc_a long, doc_b long"
    )
    assert kcore(nodes, pairs, k=2, n_rounds=3).count() == 0
    # insufficient rounds leave a partial (still-deterministic) residue
    assert kcore(nodes, pairs, k=2, n_rounds=1).count() == 2


def test_bfs_hops_path_graph_exact_distances(spark):
    """Path 0-1-2-3-4-5 seeded at {0, 5}: hop counts are the min
    distance to either end; 4 rounds reach everything; a node beyond
    the round horizon stays absent."""
    from musicflow_spark.operators.graph import bfs_hops

    edges = [(i, i + 1) for i in range(5)] + [(10, 11), (11, 12)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    seeds = spark.createDataFrame([(0,), (5,)], "doc_id long")
    got = {
        r["doc_id"]: r["hops"]
        for r in bfs_hops(seeds, pairs, n_rounds=4).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 2, 4: 1, 5: 0}

    # 2 rounds: the middle nodes carry their exact distance already
    got2 = {
        r["doc_id"]: r["hops"]
        for r in bfs_hops(seeds, pairs, n_rounds=2).collect()
    }
    assert got2 == {0: 0, 1: 1, 2: 2, 3: 2, 4: 1, 5: 0}


def test_bfs_oracle_generator_replays_spark(spark):
    """The unrolled SQL replays the Spark rounds bit-for-bit on a
    random graph, including a disconnected never-reached island."""
    import random

    from musicflow_spark.operators.graph import bfs_hops, bfs_oracle_sql

    rng = random.Random(7)
    edges = sorted({
        tuple(sorted(rng.sample(range(40), 2))) for _ in range(60)
    })
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    seeds = spark.createDataFrame([(0,), (13,)], "doc_id long")
    got = {
        r["doc_id"]: r["hops"]
        for r in bfs_hops(seeds, pairs, n_rounds=3).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e AS SELECT * FROM (VALUES "
        + ",".join(f"({a},{b})" for a, b in edges)
        + ") t(doc_a, doc_b)"
    )
    sql = bfs_oracle_sql(
        "SELECT * FROM (VALUES (0), (13)) s(doc_id)",
        "SELECT doc_a, doc_b FROM e",
        n_rounds=3,
    )
    want = dict(con.execute(sql).fetchall())
    assert got == want
