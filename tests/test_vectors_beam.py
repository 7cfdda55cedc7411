"""Graph-ANN beam search (operators/similarity.py::beam_search_topk).

Covers (VERDICT r08 item 4):
* structural correctness — the beam walks exactly `rounds` hops, so a
  best node placed r hops from every entry appears iff rounds >= r;
* the recall-vs-budget contract against IVF — on CLUSTERED vectors
  (the geometry real embeddings have, and the regime graph ANN exists
  for) the beam matches-or-beats IVF recall at a strictly smaller
  candidate budget (distance evaluations per query);
* recall floor on the parquet fixture — whose near-random vectors are
  the anti-navigable worst case; the beam still clears 0.65 recall@10
  there (0.7625 measured at sf0.01, parity with IVF probe=3 at equal
  budget).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from musicflow_spark.operators.similarity import (
    beam_search_topk,
    brute_force_topk,
    ivf_topk,
    lsh_topk,
    nearest_centroids,
    random_hyperplanes,
)


def _edges(df):
    fwd = df.select(F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst"))
    return fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


# ------------------------------------------------------- structural
@pytest.mark.slow
def test_beam_walks_exactly_rounds_hops(spark):
    # path graph in vector space: node i = (i, 0, ...) scaled so that
    # cosine to the query (at node 4's position) increases along the
    # path; entry at node 0, best node 4 is 4 hops out
    dim = 4
    rows = [(i, [float(i + 1), 1.0, 0.0, 0.0]) for i in range(5)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # query vector aligned with high-i nodes
    queries = spark.createDataFrame(
        [(100, [10.0, 0.9, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(4)] + [(i + 1, i) for i in range(4)],
        "src long, dst long",
    )
    entry = queries.select(F.col("vec_id").alias("query_id")).crossJoin(
        spark.createDataFrame([(0,)], "node long")
    )
    for rounds, best_reachable in [(0, 0), (2, 2), (4, 4)]:
        got = beam_search_topk(
            corpus, queries, edges, entry, k=1, beam=1, rounds=rounds
        ).collect()
        assert got[0]["neighbor_id"] == best_reachable, (rounds, got)
    assert dim == 4  # silence unused in case of refactor


# ------------------------------------- clustered: beam vs IVF budget
def _clustered(spark, n_clusters=20, per=30, dim=16):
    """Deterministic well-separated clusters: center = ±3 hypercube
    corner keyed by a Knuth hash of the cluster id, point = center +
    small md5-keyed jitter (a MIXED hash matters: a linear-congruent
    jitter makes in-cluster similarity periodic in vec_id, which
    collapses the kNN graph onto residue-class lattices and made an
    earlier version of this test walk only ids ≡ 0 mod 3).  True
    top-10 of any point lie inside its own cluster."""
    import hashlib

    rows = []
    for c in range(n_clusters):
        h = (c * 2654435761) % (1 << 32)
        center = [3.0 if (h >> (d % 32)) & 1 else -3.0 for d in range(dim)]
        for j in range(per):
            vid = c * per + j
            vec = [
                center[d]
                + (
                    (
                        int(
                            hashlib.md5(f"{vid},{d}".encode()).hexdigest()[:8],
                            16,
                        )
                        % 11
                    )
                    - 5
                )
                * 0.05
                for d in range(dim)
            ]
            rows.append((vid, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.mark.slow
def test_beam_matches_ivf_recall_at_smaller_budget_clustered(spark):
    dim, n_q, k = 16, 8, 10
    corpus = _clustered(spark, dim=dim)
    # queries: one member of 8 different clusters (ids 30c+7)
    qids = [30 * c + 7 for c in range(8)]
    queries = corpus.filter(F.col("vec_id").isin(qids))
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(corpus, queries, k=k).collect()
    }

    # --- beam tier: degree-6 LSH graph, one coarse entry per cluster
    # (every 30th id), ef-bounded frontier (expand=4)
    g = lsh_topk(
        corpus, corpus, k=6, dim=dim, n_planes=6, n_tables=8, seed=42,
        broadcast_queries=False,
    )
    coarse = corpus.filter(F.col("vec_id") % 30 == 0).select(
        F.col("vec_id").alias("node")
    )
    entry = queries.select(F.col("vec_id").alias("query_id")).crossJoin(
        F.broadcast(coarse)
    )
    beam_out, visited = beam_search_topk(
        corpus, queries, _edges(g), entry, k=k, beam=10, rounds=4,
        return_visited=True, expand=4,
    )
    beam_hits = {(r.query_id, r.neighbor_id) for r in beam_out.collect()}
    beam_recall = len(beam_hits & exact) / len(exact)
    # budget: distinct nodes whose exact distance the beam evaluated
    beam_budget = (
        visited.groupBy("query_id").count().agg(F.avg("count")).collect()[0][0]
    )

    # --- IVF tier: stride centroids (the knn_ivf construction), probe 1
    cent = corpus.filter(F.col("vec_id") % 97 == 3).select(
        F.col("vec_id").alias("cluster_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("centroid"),
    )
    n_cent = cent.count()
    ivf_hits = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(
            corpus, queries, k=k, n_probe=1, centroids=cent
        ).collect()
    }
    ivf_recall = len(ivf_hits & exact) / len(exact)
    # budget: scanned members of the probed cell + the centroid evals
    assigned = nearest_centroids(
        corpus, cent, "vec_id", "embedding", "neighbor_id", "c_vec", 1
    ).select("cluster_id", "neighbor_id")
    probed = nearest_centroids(
        queries, cent, "vec_id", "embedding", "query_id", "q_vec", 1
    ).select("cluster_id", "query_id")
    ivf_budget = (
        assigned.join(F.broadcast(probed), "cluster_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id")
        .count()
        .agg(F.avg("count"))
        .collect()[0][0]
    ) + n_cent

    # the VERDICT contract: recall >= IVF at equal (here: strictly
    # smaller) per-query candidate budget
    assert beam_recall >= ivf_recall, (beam_recall, ivf_recall)
    assert beam_recall >= 0.95, beam_recall
    assert beam_budget < ivf_budget, (beam_budget, ivf_budget)


# ----------------------------------------------- NN-descent quality
def test_nn_descent_improves_edge_recall(spark, sf_dir):
    """One refinement round must never lose edge recall (the current
    edges stay in the candidate set, so the top-k can only improve)
    and strictly gains on the fixture at the REGISTERED construction
    (measured 0.331 -> 0.374 at sf0.01 — knn_graph_refine_recall
    reports the same numbers through the driver)."""
    from musicflow_spark.operators.similarity import nn_descent_round
    from musicflow_spark.queries.vectors import (
        GRAPH_TABLES,
        K_GRAPH,
        LSH_DIM,
        LSH_PLANES,
        LSH_SEED,
    )
    from musicflow_spark.sources.catalog import read_table

    corpus = read_table(spark, sf_dir, "embeddings")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(corpus, corpus, k=K_GRAPH).collect()
    }
    g = lsh_topk(
        corpus, corpus, k=K_GRAPH, dim=LSH_DIM, n_planes=LSH_PLANES,
        n_tables=GRAPH_TABLES, seed=LSH_SEED, broadcast_queries=False,
    )
    lsh = {(r.query_id, r.neighbor_id) for r in g.collect()}
    refined = {
        (r.query_id, r.neighbor_id)
        for r in nn_descent_round(
            corpus,
            g.select(
                F.col("query_id").alias("src"),
                F.col("neighbor_id").alias("dst"),
            ),
            k=K_GRAPH,
        ).collect()
    }
    r_lsh = len(lsh & exact) / len(exact)
    r_ref = len(refined & exact) / len(exact)
    assert r_ref > r_lsh, (r_lsh, r_ref)  # strict gain, never a loss


# --------------------------------------------- parquet-fixture floor
def test_beam_recall_floor_on_fixture(spark, sf_dir):
    from musicflow_spark.queries.vectors import (
        BEAM_ROUNDS,
        BEAM_WIDTH,
        N_QUERY_VECS,
        TOP_K,
        _beam_edges,
        _beam_entry_cand,
    )
    from musicflow_spark.sources.catalog import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=TOP_K).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in beam_search_topk(
            emb, queries, _beam_edges(emb), _beam_entry_cand(emb, queries),
            k=TOP_K, beam=BEAM_WIDTH, rounds=BEAM_ROUNDS,
        ).collect()
    }
    recall = len(got & exact) / len(exact)
    # near-random 64-dim vectors are the graph-walk worst case; the
    # coarse-descent beam still holds a 0.65 floor (0.7625 at sf0.01)
    assert recall >= 0.65, recall
    assert random_hyperplanes(4, 2)  # determinism helper smoke


# ------------------------------------- incremental graph maintenance
def test_graph_ingest_reverse_update_and_delta_isolation(spark, sf_dir):
    """knn_graph_ingest contract on the fixture: (a) side='delta'
    rows exist for exactly the delta ids and never list the node
    itself; (b) every side='base_updated' node's new top-k really
    contains a delta neighbor, carries dense ranks from 1, and its
    base (non-delta) neighbors are a subset of the stored base
    graph's edges for that node — the re-rank only ever merges
    existing edges with delta candidates, never invents base pairs."""
    from musicflow_spark.queries.vectors import (
        GRAPH_TABLES,
        K_GRAPH,
        KNN_INGEST_MOD,
        LSH_DIM,
        LSH_PLANES,
        LSH_SEED,
        knn_graph_ingest,
    )
    from musicflow_spark.sources.catalog import read_table

    rows = knn_graph_ingest(spark, sf_dir).collect()
    assert rows
    delta_rows = [r for r in rows if r["side"] == "delta"]
    upd_rows = [r for r in rows if r["side"] == "base_updated"]
    assert delta_rows and upd_rows
    assert all(r["query_id"] % KNN_INGEST_MOD == 0 for r in delta_rows)
    assert all(r["query_id"] % KNN_INGEST_MOD != 0 for r in upd_rows)
    assert all(r["query_id"] != r["neighbor_id"] for r in rows)
    by_q: dict[int, list] = {}
    for r in upd_rows:
        by_q.setdefault(r["query_id"], []).append(r)
    emb = read_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % KNN_INGEST_MOD != 0)
    g_base = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(
            base, base, k=K_GRAPH, dim=LSH_DIM, n_planes=LSH_PLANES,
            n_tables=GRAPH_TABLES, seed=LSH_SEED, broadcast_queries=False,
        ).collect()
    }
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert any(r["neighbor_id"] % KNN_INGEST_MOD == 0 for r in rs)
        for r in rs:
            if r["neighbor_id"] % KNN_INGEST_MOD != 0:
                assert (q, r["neighbor_id"]) in g_base


def test_hnsw_layer_nesting_and_schedule():
    """Hierarchy invariants: layer membership is nested (every apex
    node is a layer-1 node), the schedule descends width-monotone,
    and the final width covers TOP_K."""
    from musicflow_spark.queries.vectors import (
        HNSW_MOD1,
        HNSW_MOD2,
        HNSW_SCHEDULE,
        TOP_K,
    )

    assert HNSW_MOD2 % HNSW_MOD1 == 0  # id % 64 == 0 => id % 8 == 0
    widths = [w for w, _ in HNSW_SCHEDULE]
    assert widths == sorted(widths)
    assert TOP_K <= widths[-1]


@pytest.mark.slow
def test_hnsw_beats_beam_at_smaller_budget(spark, sf_dir):
    """The point of the hierarchy (VERDICT r09 item 3): the layered
    descent must reach AT LEAST the single-layer beam tier's
    recall@10 while scoring NO MORE candidates per query (measured at
    sf0.01: 0.8250 vs 0.7625 recall at 251 vs 258 visited)."""
    from musicflow_spark.operators.similarity import (
        beam_search_topk,
        brute_force_topk,
        hnsw_topk,
        lsh_topk,
    )
    from musicflow_spark.queries.vectors import (
        BEAM_ROUNDS,
        BEAM_WIDTH,
        HNSW_DEG1,
        HNSW_DEG2,
        HNSW_MOD1,
        HNSW_MOD2,
        HNSW_PLANES1,
        HNSW_SCHEDULE,
        HNSW_TABLES1,
        LSH_DIM,
        LSH_SEED,
        N_QUERY_VECS,
        TOP_K,
        _beam_edges,
        _beam_entry_cand,
        _sym_edges,
    )
    from musicflow_spark.sources.catalog import read_table

    emb = read_table(spark, sf_dir, "embeddings").localCheckpoint(eager=True)
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=TOP_K).collect()
    }
    e0 = _beam_edges(emb).localCheckpoint(eager=True)
    beam_out, beam_vis = beam_search_topk(
        emb, queries, e0, _beam_entry_cand(emb, queries),
        k=TOP_K, beam=BEAM_WIDTH, rounds=BEAM_ROUNDS, return_visited=True,
    )
    l1 = emb.filter(F.col("vec_id") % HNSW_MOD1 == 0)
    l2 = emb.filter(F.col("vec_id") % HNSW_MOD2 == 0)
    e2 = _sym_edges(brute_force_topk(l2, l2, k=HNSW_DEG2))
    e1 = _sym_edges(
        lsh_topk(
            l1, l1, k=HNSW_DEG1, dim=LSH_DIM, n_planes=HNSW_PLANES1,
            n_tables=HNSW_TABLES1, seed=LSH_SEED, broadcast_queries=False,
        )
    )
    (w2, r2), (w1, r1), (w0, r0) = HNSW_SCHEDULE
    ent = queries.select(F.col("vec_id").alias("query_id")).crossJoin(
        F.broadcast(l2.select(F.col("vec_id").alias("node")))
    )
    hnsw_out, hnsw_vis = hnsw_topk(
        emb, queries, [(e2, w2, r2), (e1, w1, r1), (e0, w0, r0)], ent,
        k=TOP_K, return_visited=True,
    )
    beam_set = {(r.query_id, r.neighbor_id) for r in beam_out.collect()}
    hnsw_set = {(r.query_id, r.neighbor_id) for r in hnsw_out.collect()}
    r_beam = len(beam_set & exact) / len(exact)
    r_hnsw = len(hnsw_set & exact) / len(exact)
    v_beam = beam_vis.count()
    v_hnsw = hnsw_vis.count()
    assert r_hnsw >= r_beam, (r_beam, r_hnsw)
    assert v_hnsw <= v_beam, (v_beam, v_hnsw)
    assert r_hnsw >= 0.7, r_hnsw


@pytest.mark.slow
def test_hnsw_ingest_write_set_semantics(spark, sf_dir):
    """Incremental layered-HNSW maintenance invariants: delta rows
    appear exactly at the layers their id stride assigns; every
    changed base node's layer-l list is a contiguous re-ranked top
    list that actually contains a delta neighbor; reverse updates
    never touch delta-side nodes."""
    from musicflow_spark.queries.vectors import (
        BEAM_GRAPH_K,
        HNSW_DEG1,
        HNSW_DEG2,
        HNSW_MOD1,
        HNSW_MOD2,
        KNN_INGEST_MOD,
        knn_hnsw_ingest,
    )

    rows = knn_hnsw_ingest(spark, sf_dir).collect()
    assert rows
    degs = {0: BEAM_GRAPH_K, 1: HNSW_DEG1, 2: HNSW_DEG2}
    mods = {0: 1, 1: HNSW_MOD1, 2: HNSW_MOD2}
    deltas = [r for r in rows if r["side"] == "delta"]
    upd = [r for r in rows if r["side"] == "base_updated"]
    assert deltas and upd
    seen_layers = {r["layer"] for r in rows}
    assert seen_layers == {0, 1, 2}
    for r in deltas:
        assert r["query_id"] % KNN_INGEST_MOD == 0
        assert r["query_id"] % mods[r["layer"]] == 0
        assert r["neighbor_id"] % KNN_INGEST_MOD != 0  # links into BASE
        assert r["rank"] <= degs[r["layer"]]
    by_key: dict[tuple, list] = {}
    for r in upd:
        assert r["query_id"] % KNN_INGEST_MOD != 0
        by_key.setdefault((r["query_id"], r["layer"]), []).append(r)
    for (q, layer), rs in by_key.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= degs[layer]
        assert any(r["neighbor_id"] % KNN_INGEST_MOD == 0 for r in rs)
