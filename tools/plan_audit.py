"""Physical-plan health audit over every registered query.

For each query in the driver registry, prints the markers that decide
100 TB behavior:

- shuffles: count of hash/range partitioning exchanges (every one is
  a full-data network pass at scale)
- single: Exchange SinglePartition occurrences — ONLY acceptable on
  scalar/near-scalar aggregates (flagged loudly otherwise)
- bcast: broadcast exchanges (dimension sides staying off the wire)
- scans/pushed: parquet scans and how many carry pushed filters
- cartesian: BroadcastNestedLoopJoin / CartesianProduct occurrences —
  acceptable only in the documented exact-baseline queries
- cgfall: whole-stage-codegen BAILOUTS observed while actually
  executing the query (noop sink) — Janino "Code grows beyond 64 KB"
  compile failures and the huge-method JIT fallback both degrade the
  stage to interpreted eval, the exact cost family the Arrow tiers
  exist to kill, and were previously invisible to this audit
  (VERDICT r10 item 1).  Detection: the JVM inherits a redirected
  stderr fd, the WholeStageCodegenExec/CodeGenerator loggers are
  pinned to WARN, and the capture is diffed per query.

Usage: PYTHONPATH=/root/repo python tools/plan_audit.py [sf_dir] [name ...]
       PLAN_AUDIT_NO_EXEC=1 skips execution (static plan flags only).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: queries allowed a cartesian/BNLJ product: the documented exact
#: baselines (oracle anchors), plus broadcast-planes crossJoins that
#: are 1-row frames
CARTESIAN_OK = {
    "knn_bruteforce",          # exact baseline; broadcast side = query set, 8 rows by contract
    "doc_text_knn",            # same exact-rerank shape; broadcast side ≤ 8 query docs
    "embedding_neardup_pairs", # exact all-pairs oracle anchor: n² bounded to the embeddings
                               # table (500 rows at the sf0.01 certification SF; the LSH tier
                               # is the scale path)
    "knn_lsh", "knn_ivf", "embedding_lsh_neardup",  # 1-row planes/centroid-seed broadcasts
    "embedding_semantic_dedup",  # centroid-table broadcast: ≤ n_clusters rows (8 by default)
    "embedding_semdedup_ingest", # same centroid-table broadcast, base-frozen (assignment of
                               # base for the stored flags + of the delta batch)
    "doc_jaccard_pairs", "doc_minhash_dedup",       # 1-row common-shingle broadcast
    "conservation_counts",     # three 1-row scalar aggregates cross-joined
    "doc_tfidf_topk",          # 1-row corpus-count broadcast (idf denominator)
    "doc_perplexity_filter",   # 1-row vocab-size broadcast (the add-1 denominator)
    "doc_kn_perplexity",       # 1-row bigram-type-total broadcast (the KN
                               # continuation denominator T)
    "corpus_pmi_collocations", # 1-row bigram-total broadcast (the PMI numerator)
    "corpus_training_selection", # inherits jaccard's common-shingle + perplexity's
                               # vocab-size 1-row broadcasts (stage composition)
    "doc_split_contamination", # inherits jaccard's 1-row common-shingle broadcast
    "doc_dup_spans",           # inherits jaccard's 1-row common-shingle broadcast
    "doc_containment_pairs",   # inherits jaccard's 1-row common-shingle broadcast
    "incremental_user_rollup", # 1-row cutoff-day broadcast (delta boundary)
    "incremental_value_moments", # same 1-row cutoff-day broadcast
    "dormant_rich_customers",  # 1-row balance-threshold + date-cutoff broadcasts
    "important_parts",         # 1-row global-revenue-threshold broadcast (Q11 shape)
    "hll_mergeable_daily",     # 1-row x 1-row scalar join (merged vs direct sketch)
    "corpus_vocab_topk",       # 1-row total-occurrence broadcast (coverage denominator)
    "doc_rarity_score",        # same 1-row total-occurrence broadcast (rarity numerator)
    "cms_token_counts",        # 1-row token-total + merge-proof scalar broadcasts
    "approx_top_tokens",       # 1-row sketch-map broadcast into the exact top-k
    "quantile_sketch_daily",   # 1-row bounds + ≤5-row quantile-frame broadcasts
    "event_type_quantiles",    # same 1-row bounds broadcast (grouped form)
    "theta_year_overlap",      # 1-row x 1-row scalar join (sketch ests vs exact counts)
    "kll_value_quantiles",     # 3-row quantile-frame broadcast into the rank-gate scan
    "bloom_filtered_revenue",  # 1-row bitmap broadcast (dense array<long>, m_bits/64 words)
    "knn_pq",                  # 1-row codebook broadcast (17 seed vectors) + 8-row
                               # query distance-table broadcast (the ADC scan pairing)
    "knn_ivfpq",               # same 1-row codebook + ≤52-row centroid broadcasts;
                               # the ADC scan itself is a cluster_id equi-join
    "knn_pq_trained",          # same 1-row codebook broadcast (here the trained
                               # per-subspace kmeans literals) + the 8-row query
                               # distance-table broadcast
    "knn_graph_lsh",           # two 1-row plane-matrix broadcasts (the bucketing
                               # constants); the candidate join itself is a plain
                               # shuffle equi-join — that is the point of the query
    "knn_graph_triangles",     # inherits knn_graph_lsh's 1-row plane broadcasts;
                               # the wedge/closing joins are keyed equi-joins
    "knn_link_prediction",     # inherits the same 1-row plane broadcasts; wedge,
                               # degree and anti joins are keyed equi-joins
    "doc_hard_negatives",      # broadcast side = bounded query set (8 docs by the
                               # DOC_KNN_QUERIES contract), same as doc_text_knn
    "customer_merge_upsert",   # 1-row max(custkey) broadcast (ADVICE r05 insert-key
                               # offset derived from the key domain)
    "embedding_kmeans",        # k-row (8) centroid-table broadcast per assignment
                               # pass — the PQ-codebook bounded-broadcast contract
    "knn_mmr",                 # 1-row query-vector broadcast into the relevance
                               # scan (the only data-sized stage; selection runs
                               # on the 40-row pool)
    "part_association_rules",  # 1-row basket-count broadcast (the N in lift)
    "doc_lang_nb_classifier",  # 1-row vocab/doc-count broadcasts + |classes|-row
                               # (5) prior/denominator broadcasts — the scoring
                               # join itself is a word-keyed equi-join
    "knn_sq8",                 # 1-row per-dim min/max grid broadcast + 8-row
                               # quantized-query broadcast (the SQ scan pairing)
    "segment_priority_chi2",   # 1-row N-total broadcast into the 25-cell table
    "nb_classifier_eval",      # inherits doc_lang_nb_classifier's 1-row/5-row
                               # broadcasts (the mart recomputes the predictions)
    "embedding_centroid_classifier",  # |labels|-row centroid broadcast into the
                               # assignment scan (the kmeans/PQ-codebook contract)
    "doc_bm25_search",         # 1-row corpus-stats broadcast (N, avg doc length)
    "corpus_source_divergence", # 1-row corpus-total broadcast (the KL mixture)
    "corpus_dsir_selection",   # 1-row vocab/threshold broadcasts (target LM stats)
    "corpus_temperature_mixture",  # 1-row weight-total + leftover-seat broadcasts
    "knn_ivf_trained",         # inherits kmeans's k-row (8) centroid broadcast
                               # for train/assign/probe; candidate join is keyed
    "orders_psi_drift",        # 1-row slice-totals broadcast into the bin table
    "orders_benford_screen",   # 1-row digit-total broadcast into the 9-cell table
    "embedding_pca_scores_2d", # 1-row moments/eigenvector broadcast into the
                               # projection scan (closed-form 2x2 PCA)
    "knn_pca2_reduced",       # same 1-row projection broadcast + the 8-row
                               # query broadcast (the knn_bruteforce contract)
    "corpus_bpe_merges",       # 1-row per-round winning-pair broadcast into the
                               # vocabulary-sized merge replace
    "corpus_retrieval_mart",   # inherits kmeans's k-row (4) centroid broadcast
                               # (train/assign/probe) + the bounded query-chunk
                               # broadcast (3 query docs by the mart contract)
    "knn_ivf_recall",          # inherits knn_bruteforce's 8-row query broadcast
                               # AND knn_ivf's 1-row centroid-seed broadcast —
                               # both tiers run in one plan, so both documented
                               # bounded cartesians appear (2 per tier)
    "embedding_lsh_recall",    # inherits embedding_neardup_pairs' documented
                               # exact all-pairs baseline AND the LSH tier's
                               # 1-row plane broadcasts, plus three 1-row
                               # count-aggregate cross joins (the eval row)
    "knn_ivf_ingest",          # inherits kmeans's k-row (8) centroid broadcast
                               # for train + both assignment scans
    "knn_beam",                # 1-row plane broadcasts (graph build) + the
                               # ~N/16-row coarse entry-layer broadcast crossed
                               # with the 8-row query set (the HNSW upper-layer
                               # descent); every walk round is a keyed equi-join
    "knn_beam_recall",         # inherits knn_bruteforce's 8-row query broadcast
                               # and knn_beam's plane + entry-layer broadcasts
                               # (both tiers run in one plan)
    "crossmodal_retrieval",    # CM_QUERY_DOCS-row (3) caption-projection
                               # broadcast into the image-feature scan (the
                               # bounded-query-set brute-force anchor)
    "knn_graph_ingest",        # inherits knn_graph_lsh's 1-row plane broadcasts
                               # (three bucketed probes: delta->corpus,
                               # base->base index, base->delta reverse); every
                               # candidate join is a keyed equi-join
    "knn_graph_nndescent",     # inherits knn_graph_lsh's 1-row plane broadcasts;
                               # the wedge/rescore joins are keyed equi-joins
    "knn_opq",                 # inherits knn_pq_trained's bounded broadcasts:
                               # the 1-row trained-codebook fold crossed into
                               # encode + distance-table scans and the 8-row
                               # query distance-table frame into the ADC scan
    "crossmodal_semantic_dedup",  # 1-row exact-moments broadcast (the pca2
                               # centering trick) + the stride-keyed centroid
                               # table (kept/37 rows) crossed into assignment —
                               # the embedding_semantic_dedup contract in the
                               # shared caption-image space
    "corpus_crossmodal_training_mart",  # inherits crossmodal_semantic_dedup's
                               # 1-row moments + stride-sized centroid
                               # broadcasts (the composed stage)
    "knn_hnsw_recall",         # inherits knn_bruteforce's 8-row query broadcast
                               # AND knn_hnsw's bounded apex/plane broadcasts
                               # (both tiers run in one plan — the
                               # knn_beam_recall contract)
    "knn_hnsw_ingest",         # the knn_graph_ingest contract, hierarchical:
                               # 1-row plane broadcasts for the three stored
                               # base-layer graph builds, the apex-sized entry
                               # cross (|delta| x N/64-apex), and the descent's
                               # delta-batch query broadcast — ingest batches
                               # are broadcast-sized by contract (the scored
                               # join is query_id-keyed, so an oversized batch
                               # just drops the hint); base x base never pairs
    "crossmodal_lsh_retrieval",  # 1-row centering-moments + 1-row plane
                               # broadcasts into both bucketing scans; the
                               # candidate join is a (table, bucket) equi-join
                               # with the 3-caption query side broadcast
    "knn_graph_refine_recall", # exact all-pairs anchor (the
                               # embedding_neardup_pairs eval-tier contract) +
                               # the graph tiers' 1-row plane broadcasts +
                               # two 1-row x 1-row recall-count joins
    "corpus_training_batch_mart",  # 1-row w_total/leftover-seat broadcasts
                               # (the corpus_temperature_mixture contract,
                               # re-derived over the survivor slice) +
                               # contamination's inherited 1-row
                               # common-shingle broadcast
}

#: queries allowed SinglePartition exchanges: global scalar aggregates
#: or dimension-sized global windows (documented W1 form)
SINGLE_OK = {
    "conservation_counts",     # three scalar aggregates, 1 row each by construction
    "nation_surrogate_ids",    # W1 global window on the nation dim (25 rows)
    "doc_jaccard_pairs", "doc_minhash_dedup",  # common-shingle collect: ≤ max_df-filtered
                               # shingle vocabulary (≤20 docs/shingle by the df cap)
    "doc_simhash_pairs",       # 1-row global token-idf bounds aggregate
    "top_revenue_orders",  # global top-k limit (10 rows by the LIMIT literal)
    "doc_tfidf_topk",          # scalar corpus count (1 row by construction)
    "doc_perplexity_filter",   # scalar vocab-size aggregate (1 row by construction)
    "doc_kn_perplexity",       # scalar bigram-type-total aggregate (1 row by construction)
    "corpus_pmi_collocations", # scalar bigram total + global top-k LIMIT (50 rows)
    "corpus_training_selection", # inherited scalar collects (common-shingle, vocab size)
    "doc_split_contamination", # scalar common-shingle collect (tiny by construction)
    "doc_dup_spans",           # scalar common-shingle collect (tiny by construction)
    "doc_containment_pairs",   # scalar common-shingle collect (tiny by construction)
    "daily_event_spine",       # scalar min/max bounds (1 row by construction)
    "daily_moving_stats",      # global window on the day-grain aggregate (dozens of rows)
    "order_revenue_range_window",  # same day-grain global window (RANGE frame twin)
    "incremental_user_rollup", # scalar max-day cutoff (1 row by construction)
    "incremental_value_moments", # scalar max-day cutoff (1 row by construction)
    "small_quantity_revenue",  # final global scalar aggregate (1 row by construction)
    "dormant_rich_customers",  # scalar threshold/cutoff aggregates (1 row by construction)
    "promo_revenue_brackets",  # final global scalar aggregate (1 row by construction)
    "important_parts",         # scalar global-revenue total (1 row by construction)
    "hll_mergeable_daily",     # two global scalar aggregates (1 row each by construction)
    "corpus_vocab_topk",       # global top-k limit + cum-window on the k-row survivor frame
    "doc_rarity_score",        # scalar total-occurrence aggregate (1 row by construction)
    "forecast_revenue_delta",  # final global scalar aggregate (1 row by construction)
    "customer_profile",        # global scalar profile aggregate (1 wide row by construction)
    "customer_profile_sketch", # two global scalar profile aggregates (1 wide row each)
    "promo_revenue_share",     # final global scalar aggregate (1 row by construction)
    "top_supplier_revenue",    # global-max scalar broadcast back (1 row by construction)
    "cms_token_counts",        # scalar token-total + merge-proof aggregates (1 row each)
    "embedding_pca_invariants",  # final global invariant aggregate (1 row by construction)
    "daily_value_interpolated", # day-grain global fill windows (dozens of rows; see daily_moving_stats)
    "approx_top_tokens",       # 1-row frequent-items sketch aggregate
    "quantile_sketch_daily",   # scalar bounds aggregate + ≤256-row sketch cumsum window
    "event_type_quantiles",    # scalar bounds aggregate (grouped cumsum partitions by type)
    "log_for_tableau_mart",    # W1 global row_number — the reference's own single-partition
                               # surrogate-id window (log_for_tableau.sql:98), mart-sized by
                               # contract; at fact scale use operators/ids.py::surrogate_ids
    "theta_year_overlap",      # two global sketch/exact aggregates (1 row each by construction)
    "kll_value_quantiles",     # global KLL merge aggregate (1 sketch row by construction)
    "bloom_filtered_revenue",  # 1-row bitmap fold: ≤ m_bits/64 = 16384 word rows in,
                               # exactly 1 map row out by construction
    "knn_pq",                  # 1-row codebook fold (17 seed rows in, 1 array row out)
                               # + the bounded query-set (8 rows) distance-table agg
    "knn_ivfpq",               # same 1-row codebook fold + bounded query-frame aggs
    "customer_merge_upsert",   # scalar max(custkey) aggregate (1 row by construction)
    "part_association_rules",  # scalar basket-count aggregate (1 row by construction)
    "doc_lang_nb_classifier",  # scalar vocab-size + train-doc-count aggregates
                               # (1 row each by construction)
    "knn_sq8",                 # 1-row per-dim stats fold (64 dim rows in, 1 array
                               # row out) — the SQ grid 'training' aggregate
    "part_price_size_skyline", # global running-max window on the distinct-price-
                               # level reduction (cents-grid bounded, orders of
                               # magnitude below part row count)
    "segment_priority_chi2",   # scalar N-total aggregate (1 row by construction)
    "corpus_zipf_fit",         # global top-k LIMIT (200 rows) + rank window and
                               # moment fold on that bounded frame
    "embedding_centroid_classifier",  # |labels|-row centroid collect_list fold
    "nb_classifier_eval",      # inherits the classifier's scalar folds
    "doc_bm25_search",         # 1-row corpus-stats fold (N, avgdl)
    "corpus_source_divergence", # 1-row grand-total fold
    "corpus_dsir_selection",   # 1-row token-weighted-threshold fold
    "corpus_temperature_mixture",  # scalar total/seat folds + the |sources|-row
                               # (20) largest-remainder ranking window
    "knn_ivf_trained",         # kmeans's bounded k-row seed collect/centroid folds
    "orders_psi_drift",        # scalar slice-totals fold (1 row by construction)
    "orders_benford_screen",   # scalar digit-total fold (1 row by construction)
    "embedding_pca_scores_2d", # 1-row global moments aggregate (6 sums, 1 row
                               # by construction) feeding the closed-form axes
    "doc_quality_logreg",      # final 1-row accuracy aggregate (n, n_correct)
                               # by construction; per-round gradients are the
                               # same O(d) scalar shape
    "knn_pca2_reduced",       # inherits pca2's 1-row global moments aggregate
    "embedding_lsh_recall",    # three scalar count aggregates (1 row each by
                               # construction) joined into the one eval row
    "knn_ivf_ingest",          # inherits kmeans's bounded k-row seed collect /
                               # centroid folds
    "corpus_retrieval_mart",   # inherits kmeans's bounded k-row seed collect /
                               # centroid folds (k = 4 by the mart contract)
    "corpus_shard_manifest",   # the two-level prefix sum's base-offset window:
                               # exactly n_shards (8) rows by construction
    "crossmodal_semantic_dedup",  # 1-row exact centering-moments aggregate
                               # (count + 16 integer sums, 1 row by construction)
    "crossmodal_lsh_retrieval",  # 1-row exact centering-moments aggregate
                               # (count + 8 integer sums, 1 row by construction)
    "corpus_crossmodal_training_mart",  # the shard manifest's n_shards-row
                               # two-level-prefix-sum base-offset window
                               # (8 rows by construction — the
                               # corpus_shard_manifest contract), plus the
                               # inherited 1-row dedup moments aggregate
    "knn_graph_refine_recall", # four 1-row recall-count aggregates (exact-anchor
                               # hits vs graph-tier hits, before/after refine —
                               # queries/vectors.py recall block), each 1 row by
                               # construction; pairs with its CARTESIAN_OK entry
    "corpus_training_batch_mart",  # |sources|-row (≤20) largest-remainder
                               # ranking window + scalar w_total/seat folds
                               # (the corpus_temperature_mixture contract) +
                               # the shard manifest's n_shards-row (8)
                               # base-offset window (the corpus_shard_manifest
                               # contract)
}


#: log lines that mean a stage degraded from whole-stage codegen to
#: interpreted eval at runtime
_CODEGEN_FALLBACK = re.compile(
    r"Whole-stage codegen disabled for plan"
    r"|grows beyond 64 KB"
    r"|Found too long generated codes"
)


class _StderrCapture:
    """Redirect THIS PROCESS's fd 2 to a temp file BEFORE the JVM
    launches, so the Spark JVM (which inherits the fd at spawn) writes
    its log4j console output somewhere we can diff per query.  A
    post-hoc redirect cannot work: the child's fd table is fixed at
    fork."""

    def __init__(self) -> None:
        import tempfile

        self.file = tempfile.NamedTemporaryFile(
            mode="w+b", suffix=".stderr", delete=False
        )
        self.saved_fd = os.dup(2)
        os.dup2(self.file.fileno(), 2)
        self.pos = 0

    def new_output(self) -> str:
        os.fsync(self.file.fileno())
        with open(self.file.name, "rb") as f:
            f.seek(self.pos)
            data = f.read()
            self.pos = f.tell()
        return data.decode("utf-8", errors="replace")

    def restore(self) -> None:
        os.dup2(self.saved_fd, 2)
        os.close(self.saved_fd)


def main() -> int:
    do_exec = not os.environ.get("PLAN_AUDIT_NO_EXEC")
    cap = _StderrCapture() if do_exec else None

    from pyspark.sql import SparkSession

    from musicflow_spark.queries.registry import get_queries

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if do_exec:
        # the fallback warnings live at WARN on exactly these loggers;
        # the root stays at ERROR so the capture holds little else
        configurator = spark._jvm.org.apache.logging.log4j.core.config.Configurator
        level = spark._jvm.org.apache.logging.log4j.Level
        for logger in (
            "org.apache.spark.sql.execution.WholeStageCodegenExec",
            "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator",
        ):
            configurator.setLevel(logger, level.INFO)

    bad = 0
    print(f"{'query':28s} {'shuffles':>8s} {'single':>6s} {'bcast':>5s} {'scans':>5s} {'pushed':>6s} {'cartesian':>9s} {'cgfall':>6s}")
    for q in get_queries():
        if only and q.name not in only:
            continue
        if do_exec:
            cap.new_output()  # reset BEFORE construction: eager
            # localCheckpoint queries execute their front end during
            # q.spark() itself, and a bailout there must count
        df = q.spark(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        cgfall = 0
        if do_exec:
            df.write.format("noop").mode("overwrite").save()
            cgfall = len(_CODEGEN_FALLBACK.findall(cap.new_output()))
        shuf = len(re.findall(r"Exchange (?:hash|range)partitioning", plan))
        # Exchange SinglePartition nodes whose child is a
        # partial_bloom_filter_agg are Spark's OWN runtime bloom-filter
        # semi-join injection (1-row sketch merge by construction, the
        # optimizer adds them to large equi-joins) — not a
        # single-partition data stage; don't count them as hazards
        plan_lines = plan.split("\n")
        bloom_singles = sum(
            1
            for i, l in enumerate(plan_lines)
            if "Exchange SinglePartition" in l
            and i + 1 < len(plan_lines)
            and "partial_bloom_filter_agg" in plan_lines[i + 1]
        )
        single = plan.count("Exchange SinglePartition") - bloom_singles
        bcast = plan.count("BroadcastExchange")
        # "FileScan parquet" contains "Scan parquet" — count once
        scans = plan.count("Scan parquet")
        pushed = sum(1 for p in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if p.strip())
        cart = plan.count("BroadcastNestedLoopJoin") + plan.count("CartesianProduct")
        flags = []
        if single and q.name not in SINGLE_OK:
            flags.append("SINGLE-PARTITION!")
            bad += 1
        if cart and q.name not in CARTESIAN_OK:
            flags.append("CARTESIAN!")
            bad += 1
        if cgfall:
            flags.append("CODEGEN-BAILOUT!")
            bad += 1
        print(
            f"{q.name:28s} {shuf:8d} {single:6d} {bcast:5d} {scans:5d} {pushed:6d} {cart:9d} {cgfall:6d}  {' '.join(flags)}"
        )
    if cap is not None:
        cap.restore()
    print("PLAN AUDIT:", "FLAGS RAISED" if bad else "CLEAN")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
