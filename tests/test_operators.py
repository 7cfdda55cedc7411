"""Semantic tests for the training-data operators: sketch methods are
validated against their exact counterparts (minhash vs exact jaccard,
LSH-ANN recall vs brute force), text stats against Python reference
implementations on sample rows."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from musicflow_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_dedup_pairs,
    shingle_table,
    simhash_near_pairs,
)
from musicflow_spark.operators.similarity import brute_force_topk, lsh_topk
from musicflow_spark.operators.textstats import fingerprint, lang_id, tokens
from musicflow_spark.sources.catalog import read_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings")


def test_exact_dedup_finds_planted_duplicates(spark):
    rows = [
        (1, "The quick brown fox"),
        (2, "the  QUICK   brown fox!!"),  # same after normalization
        (3, "something else entirely"),
        (4, "The quick brown fox"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = exact_dedup(df).select("doc_id", "dup_count").collect()
    by_id = {r["doc_id"]: r["dup_count"] for r in out}
    assert set(by_id) == {1, 3}  # lowest id survives per group
    assert by_id[1] == 3 and by_id[3] == 1


def test_tokens_and_fingerprint_edge_cases(spark):
    df = spark.createDataFrame(
        [(1, "  a  b   c "), (2, ""), (3, "   ")], "id long, text string"
    )
    out = df.select(
        "id", F.size(tokens("text")).alias("n"), fingerprint("text").alias("fp")
    ).collect()
    n = {r["id"]: r["n"] for r in out}
    assert n == {1: 3, 2: 0, 3: 0}
    fps = {r["id"]: r["fp"] for r in out}
    assert fps[2] == fps[3]  # both normalize to empty


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of war"),
            (2, "der Hund und die Katze und der Vogel"),
            (3, "xyzzy plugh"),
        ],
        "id long, text string",
    )
    out = {r["id"]: r["pred"] for r in df.select("id", lang_id("text").alias("pred")).collect()}
    assert out == {1: "en", 2: "de", 3: "und"}


def test_minhash_candidates_cover_high_jaccard_pairs(docs):
    """Every exact-Jaccard pair >= 0.5 must be recovered by the
    MinHash+LSH pipeline (16 bands of 4 rows: P[miss at j=0.5] =
    (1-0.5^4)^16 ~ 35% per band-row config... use the verified pairs
    which share the exact verifier, so equality is on candidate
    coverage of truly-similar pairs)."""
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(docs, threshold=0.5, max_df=20).collect()
    }
    sketched = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_dedup_pairs(docs, threshold=0.5).collect()
    }
    missed = set(exact) - set(sketched)
    assert len(missed) <= max(1, len(exact) // 5), (
        f"minhash missed {len(missed)}/{len(exact)} high-sim pairs"
    )
    for pair in set(exact) & set(sketched):
        assert sketched[pair] == pytest.approx(exact[pair])


def test_minhash_no_false_verified_pairs(docs):
    """Verified minhash output must be a subset of the exact pairs at
    the same threshold (the verifier is exact, so no false positives)."""
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in jaccard_pairs(docs, threshold=0.2, max_df=20).collect()
    }
    sketched = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_dedup_pairs(docs, threshold=0.2).collect()
    }
    assert sketched <= exact


def test_simhash_pairs_sane(docs):
    pairs = simhash_near_pairs(docs, max_hamming=10).collect()
    for r in pairs:
        assert 0 <= r["hamming"] <= 10
        assert r["doc_a"] < r["doc_b"]


def test_shingle_table_counts_match_python(spark):
    text = "a b c d e f"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = shingle_table(df).collect()
    got = {r["shingle"] for r in rows}
    toks = text.split()
    want = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    assert got == want
    assert all(r["n_shingles"] == len(want) for r in rows)


def test_brute_force_topk_matches_numpy(spark, emb):
    import numpy as np

    pdf = emb.toPandas()
    vecs = {r.vec_id: np.array(r.embedding, dtype=float) for r in pdf.itertuples()}
    out = brute_force_topk(emb, emb.filter(F.col("vec_id") < 3), k=5).collect()
    by_q: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        q = vecs[qid]
        sims = {
            vid: float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v)))
            for vid, v in vecs.items()
            if vid != qid
        }
        want = sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        got = [(r["neighbor_id"], r["cos_sim"]) for r in rows]
        assert [g[0] for g in got] == [w[0] for w in want]
        for g, w in zip(got, want):
            assert g[1] == pytest.approx(w[1], abs=1e-9)


def test_lsh_recall_vs_brute_force(spark, emb):
    queries = emb.filter(F.col("vec_id") < 8)
    exact = brute_force_topk(emb, queries, k=10).collect()
    approx = lsh_topk(emb, queries, k=10, dim=64, n_planes=6, n_tables=16).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.5, f"LSH mean recall {mean_recall:.2f} too low"


def test_surrogate_ids_equal_global_row_number(spark):
    from pyspark.sql import Window

    from musicflow_spark.operators.ids import opaque_ids, surrogate_ids

    df = spark.range(0, 10_000, 1, 16).select(
        (F.col("id") * 2654435761 % 1_000_003).alias("k"), F.col("id").alias("orig")
    )
    got = {
        r["orig"]: r["surrogate_id"]
        for r in surrogate_ids(df, ["k", "orig"], num_partitions=16).collect()
    }
    want = {
        r["orig"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("k", "orig")).cast("long")
        ).collect()
    }
    assert got == want
    ids = [r["row_id"] for r in opaque_ids(df).collect()]
    assert len(set(ids)) == len(ids)


def test_dedup_clusters_transitive_closure(spark):
    from musicflow_spark.operators.dedup import dedup_clusters

    nodes = spark.createDataFrame([(i,) for i in range(10)], "doc_id bigint")
    # chain 0-1-2-3-4 (multi-hop: needs several propagation rounds),
    # pair 7-8, singletons 5, 6, 9
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (7, 8)],
        "doc_a bigint, doc_b bigint",
    )
    got = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in dedup_clusters(nodes, pairs).collect()}
    assert {d: c for d, (c, _) in got.items()} == {
        0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 5, 6: 6, 7: 7, 8: 7, 9: 9,
    }
    assert {d for d, (_, k) in got.items() if k} == {0, 5, 6, 7, 9}


def test_feature_hash_embedding_matches_explode_groupby(spark):
    from musicflow_spark.operators.dedup import portable_hash60
    from musicflow_spark.operators.similarity import feature_hash_embedding
    from musicflow_spark.operators.textstats import tokens

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha gamma"), (2, "beta beta"), (3, "")],
        "doc_id long, text string",
    )
    dim = 16
    got = {
        r["doc_id"]: r["embedding"]
        for r in feature_hash_embedding(docs, dim=dim).collect()
    }
    # reference formulation: explode + groupBy (the shuffle path)
    cells = (
        docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .select("doc_id", portable_hash60(F.lower("tok")).alias("h"))
        .select(
            "doc_id",
            (F.col("h") % dim).alias("dim"),
            F.when(F.shiftright("h", 4).bitwiseAND(1) == 1, 1.0).otherwise(-1.0).alias("s"),
        )
        .groupBy("doc_id", "dim")
        .agg(F.sum("s").alias("v"))
        .collect()
    )
    want = {d: [0.0] * dim for d in (1, 2, 3)}
    for r in cells:
        want[r["doc_id"]][r["dim"]] = r["v"]
    assert got == want
    assert got[3] == [0.0] * dim  # empty doc -> zero vector, still present


def test_operators_survive_empty_input(spark):
    """Degenerate inputs must produce empty outputs, not crashes —
    partition-empty frames are routine at 100 TB (filter cliffs,
    empty date partitions)."""
    from musicflow_spark.operators.dedup import (
        dedup_clusters,
        exact_dedup,
        jaccard_pairs,
        minhash_dedup_pairs,
        simhash_near_pairs,
    )
    from musicflow_spark.operators.ids import opaque_ids, surrogate_ids
    from musicflow_spark.operators.similarity import feature_hash_embedding

    empty = spark.createDataFrame([], "doc_id bigint, text string")
    assert exact_dedup(empty).count() == 0
    assert jaccard_pairs(empty).count() == 0
    assert minhash_dedup_pairs(empty).count() == 0
    assert simhash_near_pairs(empty).count() == 0
    assert feature_hash_embedding(empty, dim=8).count() == 0
    no_pairs = spark.createDataFrame([], "doc_a bigint, doc_b bigint")
    assert dedup_clusters(empty.select("doc_id"), no_pairs).count() == 0
    # single-node graph: its own keeper
    one = spark.createDataFrame([(7,)], "doc_id bigint")
    got = dedup_clusters(one, no_pairs).collect()
    assert [(r["doc_id"], r["cluster_id"], r["keep"]) for r in got] == [(7, 7, True)]
    assert surrogate_ids(empty.select("doc_id"), ["doc_id"]).count() == 0
    assert opaque_ids(empty).count() == 0


def test_shared_span_stats_known_runs(spark):
    from musicflow_spark.operators.dedup import (
        positional_shingle_table,
        shared_span_stats,
    )

    # doc 2 shares exactly tokens 'c d e f' (run of 4) and 'x y z'
    # (run of 3, below trigram visibility only as ONE gram) with doc 1
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h x y z q"),
            (2, "c d e f m n o p x y z w"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    grams = positional_shingle_table(docs, n=3)
    out = shared_span_stats(pairs, grams, n=3).collect()
    assert len(out) == 1
    r = out[0]
    # 'c d e f' -> grams 'c d e','d e f' (run 2 -> 4 tokens);
    # 'x y z'  -> gram 'x y z' (run 1 -> 3 tokens)
    assert r["max_run_tokens"] == 4
    assert r["n_shared_grams"] == 3


def test_shared_span_stats_repeated_gram_positions(spark):
    from musicflow_spark.operators.dedup import (
        positional_shingle_table,
        shared_span_stats,
    )

    # the SAME trigram occurs twice in each doc: every positional
    # combination is a point, but runs stay per-diagonal
    docs = spark.createDataFrame(
        [(1, "u v w k u v w"), (2, "u v w t u v w")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    out = shared_span_stats(pairs, positional_shingle_table(docs, n=3), n=3).collect()[0]
    # 'u v w' at A-pos {0,4} x B-pos {0,4} -> 4 points; no diagonal
    # chains two of them consecutively
    assert out["n_shared_grams"] == 4
    assert out["max_run_tokens"] == 3


def test_brute_force_vectorized_equals_native(spark):
    """The BLAS mapInArrow tier must reproduce the native-fold tier's
    neighbor sets and ranks; scores agree to 1e-9 (different float64
    summation orders)."""
    from musicflow_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_vectorized,
    )

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    want = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cos_sim"])
        for r in brute_force_topk(emb, queries, k=10).collect()
    }
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cos_sim"])
        for r in brute_force_topk_vectorized(emb, queries, k=10).collect()
    }
    assert set(got) == set(want)
    for key, (nid, sim) in want.items():
        gnid, gsim = got[key]
        assert gnid == nid, (key, nid, gnid)
        assert abs(gsim - sim) < 1e-9


def test_brute_force_vectorized_rejects_empty_queries(spark):
    from musicflow_spark.operators.similarity import brute_force_topk_vectorized

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    with pytest.raises(ValueError, match="empty"):
        brute_force_topk_vectorized(emb, emb.filter(F.lit(False)))


def test_incremental_dedup_is_restriction_of_full_run(docs):
    """minhash_dedup_incremental == minhash_dedup_pairs restricted to
    pairs touching the delta, oriented delta-first — the contract the
    registered oracle states in SQL."""
    from musicflow_spark.operators.dedup import minhash_dedup_incremental

    is_delta = (F.col("doc_id") % 5) == 0
    full = {
        (r["doc_a"], r["doc_b"]): (r["inter_cnt"], round(r["jaccard"], 9))
        for r in minhash_dedup_pairs(docs, threshold=0.2, max_df=20).collect()
    }
    inc = minhash_dedup_incremental(
        docs, is_delta, threshold=0.2, max_df=20
    ).collect()
    got = {}
    for r in inc:
        a, b = r["doc_a"], r["doc_b"]
        assert a % 5 == 0  # doc_a is always a delta doc
        assert r["partner_in_delta"] == (b % 5 == 0)
        if r["partner_in_delta"]:
            assert a < b
        key = (a, b) if a < b else (b, a)
        got[key] = (r["inter_cnt"], round(r["jaccard"], 9))
    want = {
        (a, b): v
        for (a, b), v in full.items()
        if a % 5 == 0 or b % 5 == 0
    }
    assert got == want
    # and the restriction is proper: full-run pairs exist outside it
    assert len(full) > len(want) > 0


def test_incremental_dedup_planted_pairs(spark):
    """Tiny corpus with a known delta-base dup, delta-delta dup, and
    base-base dup: only the delta-touching two surface, oriented
    delta-first, flagged correctly."""
    from musicflow_spark.operators.dedup import minhash_dedup_incremental

    t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    t2 = "one two three four five six seven eight nine ten eleven twelve"
    t3 = "red orange yellow green blue indigo violet cyan magenta white"
    rows = [
        (10, t1),   # delta
        (3, t1),    # base dup of 10  -> (10, 3) pair, partner not delta
        (20, t2),   # delta
        (25, t2),   # delta dup of 20 -> (20, 25), partner in delta
        (7, t3),    # base
        (8, t3),    # base dup of 7   -> must NOT appear
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["doc_a"], r["doc_b"]): r["partner_in_delta"]
        for r in minhash_dedup_incremental(
            df, (F.col("doc_id") % 5) == 0, threshold=0.5, max_df=None
        ).collect()
    }
    assert out == {(10, 3): False, (20, 25): True}


def test_ingest_form_matches_incremental_with_frozen_vocab(docs):
    """minhash_dedup_ingest over PRECOMPUTED per-side shingle sets ==
    minhash_dedup_incremental over the union, when max_df=None (no df
    coupling across docs, so per-side set building is lossless) — the
    O(|delta|) deployment produces the same pairs without re-shingling
    the corpus."""
    from musicflow_spark.operators.dedup import (
        kept_shingle_sets,
        minhash_dedup_incremental,
        minhash_dedup_ingest,
    )

    is_delta = (F.col("doc_id") % 5) == 0
    # hashed=True matches minhash_dedup_incremental's internal sets, so
    # signatures and banding agree bit-for-bit across the two forms
    delta_sets = kept_shingle_sets(
        docs.filter(is_delta), "text", "doc_id", max_df=None, hashed=True
    )
    base_sets = kept_shingle_sets(
        docs.filter(~is_delta), "text", "doc_id", max_df=None, hashed=True
    )
    key = lambda r: (r["doc_a"], r["doc_b"])
    want = {
        key(r): (r["inter_cnt"], round(r["jaccard"], 9), r["partner_in_delta"])
        for r in minhash_dedup_incremental(
            docs, is_delta, threshold=0.2, max_df=None
        ).collect()
    }
    got = {
        key(r): (r["inter_cnt"], round(r["jaccard"], 9), r["partner_in_delta"])
        for r in minhash_dedup_ingest(delta_sets, base_sets, threshold=0.2).collect()
    }
    assert got == want and len(want) > 0


def test_winnow_guarantee_and_density(docs):
    """Winnowing contract: (a) every fingerprint is one of the doc's
    gram hashes at its position; (b) density lands near 2/(w+1); (c)
    two docs sharing a >= w+n-1 token run share a fingerprint."""
    from musicflow_spark.operators.dedup import (
        portable_hash60,
        positional_shingle_table,
        winnow_fingerprints,
    )

    w = 8
    fps = winnow_fingerprints(docs, n=3, w=w)
    grams = positional_shingle_table(docs, n=3).select(
        "doc_id",
        F.col("pos").cast("long").alias("fp_pos"),
        portable_hash60(F.col("gram")).alias("fp_hash"),
    )
    n_fps = fps.count()
    # (a) soundness: fingerprints are a subset of the positional grams
    assert fps.join(grams, ["doc_id", "fp_pos", "fp_hash"], "left_anti").count() == 0
    # (b) density: 2/(w+1) +/- generous slack (repeated grams compress)
    n_grams = grams.count()
    assert 0.5 * 2 / (w + 1) <= n_fps / n_grams <= 2.0 * 2 / (w + 1)


def test_winnow_shared_run_shares_fingerprint(spark):
    from musicflow_spark.operators.dedup import winnow_fingerprints

    run = "alpha beta gamma delta epsilon zeta eta theta iota kappa"  # 10 tokens = w+n-1
    df = spark.createDataFrame(
        [
            (1, "one two three " + run + " four five six"),
            (2, "seven eight " + run + " nine ten eleven twelve"),
            (3, "totally unrelated words only here believe me friend okay"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(df, n=3, w=8).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp_hash"])
    assert by_doc[1] & by_doc[2], "shared 10-token run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])


def test_winnow_short_doc_keeps_global_min(spark):
    from musicflow_spark.operators.dedup import winnow_fingerprints

    # 5 tokens -> 3 grams < w: exactly one fingerprint (the global min)
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    fps = winnow_fingerprints(df, n=3, w=8).collect()
    assert len(fps) == 1
    with pytest.raises(ValueError, match="w >= 1"):
        winnow_fingerprints(df, w=0).count()


def test_hard_negatives_are_subthreshold_and_ranked(spark):
    """doc_hard_negatives: every mined pair sits strictly below the
    near-dup cutoff, per-query ranks are dense descending, and no
    mined pair also appears in the near-dup (>= cutoff) region."""
    from musicflow_spark.queries.textops import (
        NEG_MAX,
        doc_hard_negatives,
        doc_text_knn,
    )

    sf = "/root/testdata/sf0.001"
    negs = doc_hard_negatives(spark, sf).collect()
    assert negs, "fixture must yield hard negatives"
    assert all(r.cos_sim < NEG_MAX for r in negs)
    per_q = {}
    for r in negs:
        per_q.setdefault(r.doc_id, []).append((r.rank, r.cos_sim))
    for pairs in per_q.values():
        pairs.sort()
        assert [p[0] for p in pairs] == list(range(1, len(pairs) + 1))
        sims = [p[1] for p in pairs]
        assert sims == sorted(sims, reverse=True)
    # disjoint from the duplicate region: knn rows at/above the cutoff
    # never reappear as negatives
    dup_pairs = {
        (r.doc_id, r.neighbor_doc)
        for r in doc_text_knn(spark, sf).collect()
        if r.cos_sim >= NEG_MAX
    }
    neg_pairs = {(r.doc_id, r.neg_doc) for r in negs}
    assert not dup_pairs & neg_pairs


def test_paragraph_dedup_first_occurrence_wins(spark):
    from musicflow_spark.operators.dedup import paragraph_dedup

    # seg_words=2 -> doc 1 segments: "a b","c d"; doc 2: "a b","x y";
    # doc 3: "c d","a b","z".  Every repeat of "a b"/"c d" after its
    # first (doc, pos) occurrence must be dropped from the rebuilt text.
    rows = [
        (1, "a b c d"),
        (2, "a b x y"),
        (3, "c d a b z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in paragraph_dedup(df, seg_words=2).collect()
    }
    assert out[1]["n_segs"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["kept_text"] == "a b c d"
    assert out[2]["n_segs"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["kept_text"] == "x y"
    assert out[3]["n_segs"] == 3 and out[3]["n_kept"] == 1
    assert out[3]["kept_text"] == "z"


def test_paragraph_dedup_all_dup_doc_keeps_empty_text(spark):
    from musicflow_spark.operators.dedup import paragraph_dedup

    rows = [(1, "a b"), (2, "a b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in paragraph_dedup(df, seg_words=2).collect()}
    assert out[2]["n_kept"] == 0 and out[2]["kept_text"] == ""
    assert out[1]["n_kept"] == 1 and out[1]["kept_text"] == "a b"


def test_span_scrub_keeps_first_cuts_later(spark):
    from musicflow_spark.operators.dedup import span_scrub

    span = "the quick brown fox jumps over the lazy sleeping dog"  # 10 tokens
    rows = [
        (1, f"intro words here {span} tail one"),
        (2, f"other opening {span} different ending text"),
        (3, "completely unrelated content with no shared spans at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in span_scrub(df, n=3, min_span=8).collect()}
    # first occurrence (doc 1) keeps the span verbatim
    assert span in out[1]["clean_text"]
    assert out[1]["n_removed"] == 0
    # later occurrence loses exactly the span
    assert span not in out[2]["clean_text"]
    assert out[2]["n_removed"] == 10
    assert out[2]["clean_text"] == "other opening different ending text"
    # untouched doc unchanged
    assert out[3]["n_removed"] == 0
    assert out[3]["clean_text"] == rows[2][1]


def test_span_scrub_short_shared_runs_survive(spark):
    from musicflow_spark.operators.dedup import span_scrub

    # 4 shared tokens < min_span=8: incidental overlap is NOT boilerplate
    rows = [
        (1, "alpha beta gamma delta unique one two three"),
        (2, "alpha beta gamma delta other words follow here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in span_scrub(df, n=3, min_span=8).collect()}
    assert out[1]["n_removed"] == 0
    assert out[2]["n_removed"] == 0


def test_span_scrub_no_long_span_appears_twice(spark):
    """The deduplicate-text-datasets guarantee: after scrubbing, no
    >= min_span-token window occurs in two different cleaned
    documents."""
    from musicflow_spark.operators.dedup import span_scrub

    boiler = " ".join(f"b{i}" for i in range(12))
    rows = [
        (i, f"u{i}a u{i}b {boiler} u{i}c u{i}d u{i}e")
        for i in range(6)
    ] + [(6, "no boilerplate here only fresh tokens appear")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    min_span = 8
    cleaned = {
        r["doc_id"]: r["clean_text"].split()
        for r in span_scrub(df, n=3, min_span=min_span).collect()
    }
    windows: dict[tuple, int] = {}
    for d, toks in cleaned.items():
        for i in range(len(toks) - min_span + 1):
            w = tuple(toks[i : i + min_span])
            assert windows.setdefault(w, d) == d, (w, d, windows[w])
    # and the first occurrence did keep the boilerplate
    assert boiler in " ".join(cleaned[0])


def test_span_scrub_fully_scrubbed_doc_keeps_empty_row(spark):
    from musicflow_spark.operators.dedup import span_scrub

    text = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in span_scrub(df, n=3, min_span=8).collect()}
    assert out[1]["clean_text"] == text
    assert out[2]["n_kept"] == 0 and out[2]["clean_text"] == ""
    assert out[2]["n_removed"] == 10


def test_span_scrub_validation(spark):
    from musicflow_spark.operators.dedup import span_scrub

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_span"):
        span_scrub(df, n=3, min_span=2)


def test_suffix_scrub_keeps_first_cuts_later(spark):
    from musicflow_spark.operators.dedup import suffix_span_scrub

    span = " ".join(f"s{i}" for i in range(10))  # 10-token shared span
    rows = [
        (1, f"intro words here {span} tail one"),
        (2, f"other opening {span} different ending text"),
        (3, "completely unrelated content with no shared spans at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in suffix_span_scrub(df, min_span=10).collect()
    }
    assert span in out[1]["clean_text"] and out[1]["n_removed"] == 0
    assert span not in out[2]["clean_text"] and out[2]["n_removed"] == 10
    assert out[2]["clean_text"] == "other opening different ending text"
    assert out[3]["n_removed"] == 0


def test_suffix_scrub_exactness_vs_gram_islands(spark):
    """The no-over-removal guarantee that distinguishes the suffix
    form: doc 2 shares two SEPARATE 5-token runs with docs 1 and 3
    that happen to be adjacent in doc 2 — the gram-island form sees
    one unbroken removable run of >= 8 tokens and cuts it, but no
    single 8-token substring of doc 2 repeats anywhere, so the
    suffix form must keep everything."""
    from musicflow_spark.operators.dedup import span_scrub, suffix_span_scrub

    a = "alpha beta gamma delta epsilon"  # 5 tokens
    b = "zeta eta theta iota kappa"  # 5 tokens
    # docs 1-4 (earlier ids = first occurrences) cover every trigram
    # of doc 9 = a+b, including the two boundary trigrams, but no
    # doc shares an 8-token substring with doc 9
    rows = [
        (1, f"one two {a} three four five"),
        (2, f"six seven {b} eight nine ten"),
        (3, "pad1 delta epsilon zeta pad2 pad3 pad4 pad5"),
        (4, "pad6 epsilon zeta eta pad7 pad8 pad9 pada"),
        (9, f"{a} {b}"),  # 10 tokens, every trigram repeats earlier
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    gram = {r["doc_id"]: r for r in span_scrub(df, n=3, min_span=8).collect()}
    sfx = {
        r["doc_id"]: r
        for r in suffix_span_scrub(df, min_span=8).collect()
    }
    assert gram[9]["n_removed"] == 10  # the island form over-removes
    assert sfx[9]["n_removed"] == 0  # the suffix form is exact
    assert sfx[9]["clean_text"] == f"{a} {b}"


def test_suffix_scrub_within_doc_repeat_counts(spark):
    """Corpus-occurrence rule (Lee et al.): a window repeated twice
    WITHIN one document is cut at its second occurrence even with no
    second document involved (span_scrub's cross-doc gate keeps it)."""
    from musicflow_spark.operators.dedup import suffix_span_scrub

    span = " ".join(f"r{i}" for i in range(6))
    df = spark.createDataFrame(
        [(1, f"{span} mid point {span}"), (2, "unrelated other text here")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in suffix_span_scrub(df, min_span=6).collect()
    }
    assert out[1]["n_removed"] == 6
    assert out[1]["clean_text"] == f"{span} mid point"


def test_suffix_scrub_short_docs_untouched(spark):
    from musicflow_spark.operators.dedup import suffix_span_scrub

    # identical 4-token docs, but min_span=6 > doc length: no windows
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in suffix_span_scrub(df, min_span=6).collect()
    }
    assert out[1]["n_removed"] == 0 and out[2]["n_removed"] == 0
    assert out[2]["clean_text"] == "a b c d"


def test_suffix_scrub_validation(spark):
    from musicflow_spark.operators.dedup import suffix_span_scrub

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_span"):
        suffix_span_scrub(df, min_span=0)


def test_ntile_scaled_equals_native_ntile(spark):
    """Closed-form NTILE over surrogate ids must equal the engine's
    global-window ntile for divisible AND non-divisible row counts
    (the first N mod n buckets carry one extra row)."""
    from pyspark.sql import Window

    from musicflow_spark.operators.ids import ntile_scaled

    for n_rows in (10_000, 9_997, 7):
        df = spark.range(0, n_rows, 1, 8).select(
            (F.col("id") * 2654435761 % 1_000_003).alias("k"),
            F.col("id").alias("orig"),
        )
        got = {
            r["orig"]: r["bucket"]
            for r in ntile_scaled(df, 5, ["k", "orig"]).collect()
        }
        want = {
            r["orig"]: r["nt"]
            for r in df.withColumn(
                "nt", F.ntile(5).over(Window.orderBy("k", "orig"))
            ).collect()
        }
        assert got == want, n_rows


def test_attribution_credit_conserves_and_u_shape(spark):
    """Hand-built path: one purchase with 5 prior touches → first
    gets 4000 + remainder(2000 - 3*666 = 2)=4002, last 4000, middles
    666 each; totals conserve at exactly 10000 bp per conversion."""
    import datetime as dt

    from musicflow_spark.queries.events import (
        ATTR_LOOKBACK_DAYS,
        event_attribution,
    )

    assert ATTR_LOOKBACK_DAYS == 7
    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)
    rows = [(99, t0, 1, "purchase", 0.0, "{}")]
    for i in range(5):
        rows.append((i, t0 - dt.timedelta(hours=5 - i), 1, "click", 0.0, "{}"))
    # a touch outside the 7-day lookback must not be credited
    rows.append((50, t0 - dt.timedelta(days=8), 1, "view", 0.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        out = event_attribution(spark, d).collect()
    by_pos = {(r["channel"], r["position"]): r for r in out}
    assert by_pos[("click", "first")]["credit_bp"] == 4002
    assert by_pos[("click", "last")]["credit_bp"] == 4000
    assert by_pos[("click", "middle")]["credit_bp"] == 3 * 666
    assert ("view", "solo") not in by_pos and ("view", "first") not in by_pos
    assert sum(r["credit_bp"] for r in out) == 10000


def test_prefix_filter_complete_vs_uncapped_index(docs):
    """The prefix-filtered join must return EXACTLY the pairs the
    unpruned (max_df=None) inverted-index join returns at the same
    threshold — completeness AND soundness on the real corpus."""
    from musicflow_spark.operators.dedup import jaccard_pairs, prefix_filter_pairs

    got = {
        (r["doc_a"], r["doc_b"]): r["inter_cnt"]
        for r in prefix_filter_pairs(docs, n=3, t_num=1, t_den=2).collect()
    }
    want = {
        (r["doc_a"], r["doc_b"]): r["inter_cnt"]
        for r in jaccard_pairs(docs, n=3, threshold=0.5, max_df=None).collect()
    }
    assert got == want and len(got) > 0


def test_prefix_filter_skips_boilerplate_hub(spark):
    """A shingle shared by EVERY doc ranks last in the df order and
    must never enter a prefix: candidate generation stays pair-
    bounded where the plain inverted index would build an n² bucket.
    Docs are otherwise disjoint, so the result is empty — but only
    the prefix join proves it without the hot bucket."""
    from musicflow_spark.operators.dedup import prefix_filter_pairs

    # 12 docs: common boilerplate trigram + unique tails
    rows = [
        (i, "common boiler plate " + " ".join(f"u{i}w{j}" for j in range(9)))
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert prefix_filter_pairs(df, n=3, t_num=1, t_den=2).count() == 0


def test_bm25_matches_python_reference(spark):
    """Integer-grid BM25 must agree EXACTLY (scores and ranking) with
    a pure-python implementation of the same quantized formula; the
    query doc must self-retrieve at rank 1 when it owns a distinctive
    repeated term."""
    from musicflow_spark.operators.search import bm25_topk

    texts = {
        0: "zebra zebra stripes roam the savanna plains",
        1: "lions roam the savanna plains at dusk",
        2: "zebra herds cross the river near the plains",
        3: "a field guide to stripes and savanna wildlife",
        4: "dusk settles over the quiet river",
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    queries = [(0, "zebra"), (0, "stripes"), (9, "river"), (9, "dusk")]
    qdf = spark.createDataFrame(queries, "query_id long, term string")

    toks = {d: t.lower().split() for d, t in texts.items()}
    post = {
        (d, w): sum(1 for x in t if x == w) for d, t in toks.items() for w in set(t)
    }
    dfreq = {}
    for (_, w) in post:
        dfreq[w] = dfreq.get(w, 0) + 1
    n, ltot = len(toks), sum(len(t) for t in toks.values())
    want = {}
    for qid, term in queries:
        idf = round(math.log((n - dfreq[term] + 0.5) / (dfreq[term] + 0.5) + 1) * 1e6)
        for d, t in toks.items():
            tf = post.get((d, term), 0)
            if not tf:
                continue
            r_milli = (1000 * len(t) * n) // ltot
            contrib = (idf * 22000 * tf) // (10000 * tf + 3000 + 9 * r_milli)
            k = (qid, d)
            want[k] = (want.get(k, (0, 0))[0] + 1, want.get(k, (0, 0))[1] + contrib)
    rank = {}
    for qid in {q for q, _ in queries}:
        hits = sorted(
            ((s, -d) for (q, d), (_, s) in want.items() if q == qid), reverse=True
        )
        for i, (_, nd) in enumerate(hits[:5], 1):
            rank[(qid, -nd)] = i

    got = bm25_topk(docs, qdf, k=5).collect()
    assert {
        (r["query_id"], r["doc_id"]): (r["n_hit_terms"], r["score_micro"])
        for r in got
    } == want
    assert {(r["query_id"], r["doc_id"]): r["rank"] for r in got} == rank
    assert rank[(0, 0)] == 1  # self-retrieval: doc 0 tops its own query


def test_source_divergence_matches_python_and_gibbs(spark):
    """Exact integer-grid equality with a pure-python KL on a tiny
    corpus; Gibbs' inequality (KL >= 0) must hold up to the documented
    per-term micro-nat rounding slack; a source identical to the
    mixture scores ~0 while a disjoint-vocabulary source scores big."""
    from musicflow_spark.queries.textops import PPL_SCALE, corpus_source_divergence

    rows = [
        (0, "a b a b", "mix", "s_bal"),
        (1, "a a a a", "mix", "s_skew"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    import tempfile, os
    d = tempfile.mkdtemp()
    df.withColumn("n_chars", F.length("text")).select(
        "doc_id", "text", "lang", "source", "n_chars"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r["source"]: r for r in corpus_source_divergence(spark, d).collect()}

    toks = {i: t.split() for i, (_, t, _, _) in zip(range(2), rows)}
    src = {0: "s_bal", 1: "s_skew"}
    c_sw, c_w, c_s = {}, {}, {}
    for i, t in toks.items():
        for w in t:
            c_sw[(src[i], w)] = c_sw.get((src[i], w), 0) + 1
            c_w[w] = c_w.get(w, 0) + 1
            c_s[src[i]] = c_s.get(src[i], 0) + 1
    c = sum(c_w.values())
    want = {}
    for s in set(src.values()):
        ssum = sum(
            cnt * round(math.log((cnt * c) / (c_w[w] * c_s[s])) * PPL_SCALE)
            for (ss, w), cnt in c_sw.items()
            if ss == s
        )
        want[s] = int(ssum // c_s[s]) if ssum >= 0 else -(-ssum // c_s[s])
    assert {s: r["kl_micro"] for s, r in out.items()} == want
    assert all(r["kl_micro"] >= -2 for r in out.values())  # Gibbs + rounding slack
    assert out["s_skew"]["kl_micro"] > out["s_bal"]["kl_micro"] > 0


def test_brand_price_ols_exact_fit_and_numpy_agreement(spark):
    """A perfectly linear group must recover its coefficients exactly
    (slope 3, intercept 200, r2 1); a noisy group must match
    numpy.polyfit to float tolerance."""
    import numpy as np

    import tempfile, os

    from musicflow_spark.queries.relational import brand_price_ols

    lin = [(i, 1, float(i % 7 + 1), (3 * (i % 7 + 1) * 100 + 200) / 100.0) for i in range(40)]
    noisy = [(100 + i, 2, float(i % 9 + 1), ((i % 9 + 1) * 150 + (i * 37) % 50) / 100.0 + 1) for i in range(40)]
    li = spark.createDataFrame(
        [(k, pk, q, p) for k, pk, q, p in lin + noisy],
        "l_orderkey long, l_partkey long, l_quantity double, l_extendedprice double",
    )
    part = spark.createDataFrame([(1, "BrandA"), (2, "BrandB")], "p_partkey long, p_brand string")
    d = tempfile.mkdtemp()
    li.coalesce(1).write.parquet(os.path.join(d, "lineitem.parquet"))
    part.coalesce(1).write.parquet(os.path.join(d, "part.parquet"))
    out = {r["p_brand"]: r for r in brand_price_ols(spark, d).collect()}

    a = out["BrandA"]
    assert (a["slope_cents_per_unit"], a["intercept_cents"], a["r2"]) == (300.0, 200.0, 1.0)

    xs = np.array([q for _, _, q, _ in noisy])
    ys = np.array([round(p * 100) for _, _, _, p in noisy], dtype=float)
    slope, intercept = np.polyfit(xs, ys, 1)
    b = out["BrandB"]
    assert abs(b["slope_cents_per_unit"] - slope) < 1e-4
    assert abs(b["intercept_cents"] - intercept) < 1e-4
    assert 0.9 < b["r2"] < 1.0
