"""Scaling-exponent stress harness: measure t(N x sf0.1) / t(sf0.1).

The local bench at sf0.1 proves speed at one size; this harness
checks the SHAPE of the cost curve — a 100 TB design must scale
near-linearly on replicated data.  It materializes an N-fold scaled
copy of the tables a target query reads, replica-shifting keys and
content so that:

* join fan-out stays constant (every replica's keys are disjoint:
  ``key + i * 10**9``) — a correct plan does N x the work;
* similarity outputs stay linear (each document replica's tokens get
  a per-replica prefix, so shingle/minhash buckets never cross
  replicas; customer-name replicas are tagged with a repeated-digit
  prefix, keeping cross-replica edit distance >= 2 > the join's
  threshold of 1) — a pairwise blow-up would show as t growing ~N^2.

Dimensions (nation/region) are NOT scaled — at 100 TB facts grow and
dimensions don't, and scaling them would turn broadcast sides into
fact-sized frames the real workload never has.

Usage: python tools/scale_stress.py [N] [query ...]
       python tools/scale_stress.py --skew [N] [query ...]
       python tools/scale_stress.py --jitter [N] [graph-ANN query ...]
Writes scaled parquet under /tmp/scale_stress/x{N}/ (rebuilt if
missing), times each query on sf0.1 and on the scaled dir (2 runs
each, best-of), prints one ratio line per query.  A ratio well below
N means sub-linear (broadcast reuse / fixed overhead amortizing);
near N is linear; well above N flags a super-linear stage.

``--skew`` (VERDICT r04 item 5) replaces the benign uniform replicas
with a HOT-SPOT distribution and measures t(skew xN)/t(skew x1), so
both points carry the same skew and the ratio isolates the cost
CURVE under it:

* documents: 10% of docs (across ALL replicas) share one identical
  60-token suffix — one globally hot shingle family.  The safety
  argument under test is the ``max_df`` cap: a df>>20 shingle must be
  dropped from BOTH the jaccard inverted index and the minhash kept-
  shingle sets, or the hot bucket alone costs O((0.1·corpus)²).
* lineitem: 10% of heavy shipments compress into one 32-day window —
  one hot TIME bucket with diverse supplier keys.  The claim under
  test is overlap_join_bucketed's composite (key, bucket) shuffle
  key: bucket-only heat must shard across keys instead of landing in
  a single task.

``--jitter`` (VERDICT r10 item 7) measures the graph-ANN family
(knn_beam / knn_hnsw / knn_hnsw_ingest and the round-12 at-rest pair
knn_hnsw_at_rest / knn_hnsw_at_rest_ingest), excluded from the plain
profile because identical replica vectors merge LSH buckets and
argmax ties: per-replica coordinate sign flips keep every replica's
internal geometry EXACT while decorrelating replicas, and each xN run
uses the queries' documented deployment-geometry knobs (bucket count
tracking corpus size, apex stride scaling) — see JITTER_QUERIES.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

BASE = "/root/testdata/sf0.1"
KEY_STRIDE = 10**9

#: stride for the MEDIA fixture profile (VERDICT r07 item 8): the
#: perceptual fixtures derive group textures from doc_id // 4 with
#: class periods 199*101 = 20099 (phash) and 4001*101 = 404101
#: (audio), sharing the factor 101.  A generic 1e9 stride folds some
#: replicas' class windows onto the base's (2.5e8 mod 20099 lands
#: inside the 1250-group span), so replicated runs would measure
#: fixture collisions, not the banding join.  This stride puts every
#: replica's group range at offset i*2000 inside BOTH periods
#: (g-stride = 3*lcm(20099, 404101) + 2000): ranges [2000i, 2000i+1250)
#: are pairwise disjoint for i <= 9, so near-dup structure is exactly
#: N x base.  Valid for N <= 10 replicas (i = 10 wraps).
MEDIA_DOC_STRIDE = 4 * (3 * 80_416_099 + 2000)  # = 965_001_188
MEDIA_QUERIES = {
    "media_phash_neardup",
    "media_phash_ingest",
    "media_phash_groups",
    "media_audio_neardup",
    "media_audio_features",
    "media_audio_ingest",
    "media_audio_groups",
    "corpus_multimodal_mart",
}

#: per-query table requirements: (scaled fact tables w/ key columns
#: to shift, text/name transforms), dims copied verbatim
SCALED_KEYS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "documents": ["doc_id"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["nation", "region"]

QUERY_TABLES = {
    "doc_minhash_dedup": ["documents"],
    "doc_jaccard_pairs": ["documents"],
    "fuzzy_customer_pairs": ["customer"],
    "snowflake_flatten": ["lineitem", "orders", "customer", "supplier"],
    "user_sessions": ["events"],
    "pricing_summary": ["lineitem"],
    "best_supplier_per_part": ["lineitem", "part", "supplier"],
    "excess_inventory_suppliers": ["lineitem", "part", "supplier"],
    "user_activity_streaks": ["events"],
    "cms_token_counts": ["documents"],
    "daily_value_interpolated": ["events"],
    "quantile_sketch_daily": ["events"],
    "doc_incremental_dedup": ["documents"],
    "doc_winnow_pairs": ["documents"],
    # interval-overlap self-join: replica-shifted l_suppkey keeps the
    # bucket join's key space disjoint, so output is exactly N x base
    "shipment_overlap_pairs": ["lineitem"],
    # map-agg moment passes: replicated vectors are fine (no pairing)
    "embedding_gram_moments": ["embeddings"],
    # closed-form 2-D PCA: one 6-sum moments agg + a map projection
    "embedding_pca_scores_2d": ["embeddings"],
    # bloom build scales with keys, probe with facts; bitmap stays
    # m_bits/64 words regardless of N
    "bloom_filtered_revenue": ["orders", "customer"],
    # one full-outer join on the merge key; replicas' keys disjoint
    "customer_merge_upsert": ["customer", "orders", "supplier"],
    # map + one keyed agg over hosts
    "doc_url_canonical": ["documents"],
    # unicode tier: two chained Arrow map passes (normalize) + JVM
    # fold/features; dedup adds one digest-keyed agg — all linear
    "doc_unicode_normalize": ["documents"],
    "doc_unicode_dedup": ["documents"],
    "doc_unicode_quality": ["documents"],
    "doc_unicode_neardup": ["documents"],
    # fixed codebook (vec_id < 500 caps seeds to the base replica),
    # so encode + ADC scan are O(N) with constant K
    "knn_pq": ["embeddings"],
    # fixed codebook AND fixed coarse quantizer (vec_id < 5000 caps
    # centroids to the base replica): assignment/encode O(N), ADC scan
    # O(N * n_probe / n_clusters), rerank O(1) candidates
    "knn_ivfpq": ["embeddings"],
    # OPQ: rotation + codebooks train via map-combinable moment/kmeans
    # passes (linear per iter); encode + ADC scan are map-only; no
    # pairing stage, so identical replicas are timing-valid here
    "knn_opq": ["embeddings"],
    # replica-prefixed tokens keep shingles disjoint: inverted-index
    # join and per-pair containment are N x base, never cross-replica
    "doc_containment_pairs": ["documents"],
    # vocab grows ~N (disjoint replica prefixes); count tables and the
    # per-occurrence equi-join lattice all shuffle linearly
    "doc_perplexity_filter": ["documents"],
    # near-dup components stay within a replica; star rounds constant
    # (cluster diameter unchanged), per-round work edge-linear
    "doc_star_components": ["documents"],
    # replica-prefixed tokens keep segments disjoint: dup segments
    # stay within a replica, the min(struct) agg + join are N x base
    "doc_paragraph_dedup": ["documents"],
    # prefix buckets never cross replicas (disjoint shingles); under
    # --skew the df-ordered prefix must EXCLUDE the hot suffix
    "doc_allpairs_exact": ["documents"],
    # co-purchase edges live inside one replica's order (orderkey
    # shifted), so the peel graph is N disjoint copies; rounds fixed
    "part_copurchase_kcore": ["lineitem", "part"],
    # assignment O(N·k) with the k-row broadcast; seeds stay the base
    # replica's lowest ids (< stride); update agg bounded by k·dim
    "embedding_kmeans": ["embeddings"],
    # per-user paths replica-disjoint; lookback join + conv_id window
    # both shuffle linearly
    "event_attribution": ["events"],
    # per-customer rollup + three range-partitioned ntile passes
    "customer_rfm_segments": ["orders"],
    # knn_link_prediction / part-of-knn-graph queries are deliberately
    # absent for the same reason as match_cascade_catalog below:
    # replicas carry IDENTICAL vectors, so LSH buckets merge across
    # replicas and the curve would measure the fixture, not the plan.
    # match_cascade_catalog is deliberately absent: its synthetic
    # first-token vocabulary (pk % 250, and 250 divides the replica
    # stride) would make replicas share index buckets — the measured
    # curve would be a fixture artifact, not the operator's shape.
    # ER mart: replica name tags keep cross-replica edit distance >= 2,
    # so blocking/clustering decompose into N disjoint problems; star
    # rounds fixed (component diameter unchanged)
    "customer_entity_mart": ["customer"],
    # corpus selection mart: every stage inherits its component's
    # linear shape (replica-prefixed tokens keep jaccard/cluster
    # buckets and the fingerprint window replica-disjoint; perplexity
    # vocab grows ~N; lang/quality are map-only); flags join back on
    # the replica-shifted doc_id
    "corpus_training_selection": ["documents"],
    # BPE training: the word-type histogram grows ~N (replica
    # prefixes), per-round pair agg + replace are vocab-linear, round
    # count fixed at 12
    "corpus_bpe_merges": ["documents"],
    # BPE apply: one corpus explode + a vocab-sized word-keyed join
    "doc_bpe_encode": ["documents"],
    # logreg GD: per-round map + O(d) scalar gradient agg; 8 fixed
    # rounds regardless of N
    "doc_quality_logreg": ["documents"],
    # AdaBoost: 6 fixed rounds of one map + one O(candidates) scalar
    # agg; winner/renormalizer are plan literals
    "doc_quality_adaboost": ["documents"],
    # packing by trained-tokenizer lengths: encode join (vocab-sized)
    # + one shard-keyed window
    "doc_pack_bpe": ["documents"],
    # preference pairs: one map + one prompt-keyed agg
    "doc_preference_pairs": ["documents"],
    # tokenizer compare: two vocab-sized encode joins + doc_id join
    "doc_tokenizer_compare": ["documents"],
    # k-anonymity: one QI-keyed groupBy
    "customer_kanonymity_audit": ["customer"],
    "media_binary_dedup": ["documents"],
    # media perceptual queries run under the MEDIA profile (see
    # MEDIA_DOC_STRIDE): replica group-texture windows stay disjoint
    # inside both fixture class periods, so the x10 curve measures the
    # banding join, not fixture collisions; 16-bit LSH keys keep
    # accidental candidates ~n^2/65536 (sub-linear term at this size)
    "media_phash_neardup": ["documents"],
    "media_phash_ingest": ["documents"],
    "media_phash_groups": ["documents"],
    "media_audio_neardup": ["documents"],
    "media_audio_features": ["documents"],
    # audio ingest/groups: same delta-probe / star-contraction shapes
    # as the image tier, media stride keeps replica textures disjoint
    "media_audio_ingest": ["documents"],
    "media_audio_groups": ["documents"],
    # video tier: Arrow-batched decode map pass + media_id-keyed agg /
    # filter; no cross-doc joins, so the plain stride is fine (the
    # fixture formula is per-doc and int64-safe at replica key range)
    "media_video_framestats": ["documents"],
    "media_video_scenecuts": ["documents"],
    # multimodal mart: three decode map passes + the image banding
    # pair join (media profile keeps replica textures disjoint) +
    # fixed-round star contraction + doc_id-keyed flag joins
    "corpus_multimodal_mart": ["documents"],
    # cross-modal consistency mart: one text fold + one decode map
    # pass + two doc_id-keyed joins; NO pairing stage, so the plain
    # stride is fine (scores are per-doc scalars)
    "corpus_crossmodal_mart": ["documents"],
    # cross-modal retrieval: image featurization is the only
    # data-sized pass; query projections are a 3-row broadcast, the
    # scan is map + per-query top-k — no pairing, plain stride fine
    "crossmodal_retrieval": ["documents"],
    # retrieval lifecycle mart: chunk/embed map-only, kmeans shuffles
    # k*dim-bounded, assignment a k-row broadcast scan, rerank
    # candidate-bounded; queries stay the base replica's first 3 docs
    "corpus_retrieval_mart": ["documents"],
    # span scrub: gram/doc-keyed joins + bounded interval explode;
    # replica-prefixed tokens keep gram first-occurrence groups and
    # islands replica-disjoint, so removal is exactly N x base
    "doc_span_scrub": ["documents"],
    # suffix dedup: same join/window shape at window size 50 — the
    # suffix table is one row per token position, window-keyed
    # grouping combines map-side; replica prefixes keep 50-token
    # windows replica-disjoint, so removal is exactly N x base
    "doc_suffix_dedup": ["documents"],
    # Kneser-Ney filter: four count tables (bigram/context/
    # continuation) + the per-occurrence scoring equi-join lattice;
    # replica token prefixes grow the vocab ~N, occurrences ~N
    "doc_kn_perplexity": ["documents"],
    # calibration eval: the logreg loop's O(d) scalar collects + one
    # scoring map + a 10-key groupBy
    "doc_quality_calibration": ["documents"],
    # knn_beam / knn_hnsw / knn_graph_nndescent / embedding_coreset
    # are deliberately absent for the knn_link_prediction reason:
    # replicas carry IDENTICAL vectors, so graph buckets/argmax ties
    # merge across replicas and the curve would measure the fixture,
    # not the plan shape (which is the knn_graph_lsh machinery plus
    # bounded per-round work in all of them; knn_hnsw additionally
    # keeps every per-layer walk beam*(1+degree)-bounded).
    # OPQ: moments agg is one linear map-combinable pass (coefficients
    # are a 1-row collect), rotation a map, kmeans/encode/ADC the
    # knn_pq_trained shape — no pairing anywhere
    "knn_opq": ["embeddings"],
    # cross-modal SemDeDup: featurization/projection map passes, the
    # centering moments one linear agg; replica image payloads are
    # IDENTICAL by fixture construction, so cross-replica twins are
    # REAL near-dup pairs the operator must find — within-cluster
    # pair fan-out per doc family is bounded by the replica count,
    # and centroids scale ~N (stride residues shift per replica), so
    # cluster sizes stay ~constant
    "crossmodal_semantic_dedup": ["documents"],
    # shard manifest: seeded hash-order range shuffle + two-level
    # prefix sums (O(partitions) offset collect), pack map — linear
    "corpus_shard_manifest": ["documents"],
    # training-batch capstone: selection ladder (linear stages, see
    # corpus_training_selection) -> split/contamination joins on
    # doc_id/gram keys -> source-keyed mixture aggs (source count
    # bounded) -> the shard-manifest range shuffle; survivor slice
    # checkpointed once, so cost ≈ sum of the proven parts
    "corpus_training_batch_mart": ["documents"],
    # unigram prune training: the corpus-sized histogram shuffle grows
    # ~N; word-type/occ tables stay vocab-bounded ([a-z]+ splits the
    # replica tag off), per-round work vocab-sized, loser a 1-row
    # broadcast, rounds fixed at 8
    "corpus_unigram_vocab": ["documents"],
    # unigram encode: corpus explode + vocab-sized word-keyed join +
    # per-doc agg (the doc_bpe_encode shape; walk state vocab-bounded)
    "doc_unigram_encode": ["documents"],
    # recall eval: both ANN tiers' shapes + a k-bounded-per-query join
    # (queries capped to the base replica by vec_id < 8)
    "knn_ivf_recall": ["embeddings"],
    # IVF ingest: train on base (k*dim-bounded shuffles), two k-row
    # broadcast assignment scans, k-row occupancy report
    "knn_ivf_ingest": ["embeddings"],
    # LSH recall eval: the exact baseline is deliberately quadratic
    # (the oracle anchor), so the eval inherits its n^2 — the LSH
    # side and overlap join stay linear; excluded from x10 (the
    # baseline, not the operator, dominates past certification SF)

    # BFS: the stride is a multiple of 100, so every replica keeps its
    # proportional seed set; co-purchase edges stay within an order's
    # replica; fixed 4 relaxation rounds, edge-linear each
    "part_copurchase_reach": ["lineitem", "part"],
    # NB classifier: replica-prefixed tokens grow the vocab ~N; the
    # (word, class) count table and the word-keyed scoring join all
    # shuffle linearly; classes stay 5, priors/denominators 1-row
    "doc_lang_nb_classifier": ["documents"],
    # baskets live inside one replica's order; item/pair count tables
    # grow ~N; the 1-row N-baskets broadcast is size-constant
    "part_association_rules": ["lineitem"],
    # SQ8: the grid-train aggregate is dim-bounded regardless of N;
    # quantize + integer-L2 scan are map-only O(N x 8 queries)
    "knn_sq8": ["embeddings"],
    # trained IVF: seeds = lowest ids (< stride) cap training to the
    # base replica's k; assignment O(N·k); probed-list rerank O(N/k)
    "knn_ivf_trained": ["embeddings"],
    # at-rest IVF: the trained shape + one partitioned index write
    # (data-sized, the honest cost of materializing) + a probe read
    # whose scan lists only the probed cluster directories
    "knn_ivf_at_rest": ["embeddings"],
    # at-rest maintenance: base index write + delta assignment +
    # dynamic overwrite of ONLY touched partitions + pruned probe;
    # the delta is id-stride-sparse so it stays sparse at every N
    "knn_ivf_at_rest_ingest": ["embeddings"],
    # per-user sequence strings: users replica-disjoint, one keyed
    # shuffle, per-key work bounded by that user's activity
    "user_funnel_sequences": ["events"],
    # time-RANGE frame: keyed shuffle + per-partition sorted sweep
    "user_rolling_event_rate": ["events"],
    # systematic PPS: one range shuffle + per-partition prefix sums;
    # k fixed, so output stays 50 rows at every N
    "doc_weighted_sample": ["documents"],
    # DSIR resampling: one (doc_id, bucket) shuffle; the 1024-bucket
    # LM tables are size-constant re-aggregations + broadcasts; the
    # PPS stage is doc_weighted_sample's shape with k=100 output
    "corpus_dsir_sample": ["documents"],
    # four delta joins, each keyed and linear in its delta replica
    "segment_join_view_ivm": ["orders", "customer"],
}
DEFAULT_QUERIES = list(QUERY_TABLES)


def _replica(df, table: str, i: int, stride: int = KEY_STRIDE, jitter: bool = False):
    out = df
    for k in SCALED_KEYS[table]:
        out = out.withColumn(k, F.col(k) + F.lit(i * stride))
    if table == "embeddings" and jitter and i > 0:
        # per-replica coordinate SIGN FLIPS (VERDICT r10 item 7): an
        # exact within-replica isometry — dot(sx, sy) = Σ s_j² x_j y_j
        # = dot(x, y), so every replica's neighborhood structure is
        # the base's, bit-for-bit — while cross-replica cosines
        # decorrelate to ~N(0, 1/d): SRP buckets, graph argmax ties
        # and LSH candidates no longer merge across replicas the way
        # IDENTICAL replica vectors force them to.  Replica 0 is the
        # identity, so queries (vec_id < 8) and the x1 point are the
        # unmodified base corpus.
        import numpy as np

        rng = np.random.RandomState(997 + i)
        signs = [1.0 if b else -1.0 for b in (rng.random(_emb_dim()) < 0.5)]
        out = out.withColumn(
            "embedding",
            F.zip_with(
                "embedding",
                F.array(*[F.lit(s) for s in signs]),
                lambda x, s: (x * s).cast("float"),
            ),
        )
    if table == "documents":
        # prefix every token with r{i} -> shingles disjoint across
        # replicas: near-dup structure is exactly N copies of sf0.1's
        out = out.withColumn(
            "text", F.regexp_replace("text", r"(^|\s)", f"$1r{i}")
        )
    if table == "customer":
        # repeated-digit tag keeps cross-replica edit distance >= 2
        out = out.withColumn(
            "c_name", F.concat(F.lit(str(i % 10) * 2), F.col("c_name"))
        )
    return out


def _emb_dim() -> int:
    """Embeddings fixture dim, imported from the registered geometry
    (ADVICE r11: a hardcoded 64 here would silently go stale if the
    fixture/LSH dim ever changed — zip_with over mismatched sign
    vectors yields nulls, not an error)."""
    from musicflow_spark.queries.vectors import LSH_DIM

    return LSH_DIM

#: --jitter mode (VERDICT r10 item 7): the graph-ANN family, excluded
#: from the plain profile because identical replica vectors merge
#: buckets/ties (the curve would measure the fixture).  Sign-flip
#: jitter (see _replica) removes the merge while preserving each
#: replica's neighborhood structure EXACTLY, so these get measured
#: xN rows like every other family.  Each query runs through its
#: registered function with the DEPLOYMENT geometry for the corpus
#: size: graph-build bucket counts track N (planes + ceil(log2 N) —
#: an LSH graph build is n²/2^planes pair work per table) and the
#: HNSW apex stride grows Nx (constant apex = the stride analogue of
#: HNSW gaining a level).  x1 runs the registered defaults, so the
#: ratio is t(xN at geometry(N)) / t(x1 at registered geometry) —
#: the cost curve a 100 TB operator actually rides.  N must divide
#: 15_625_000 * n (KEY_STRIDE % (HNSW_MOD2 * n) == 0 keeps replica
#: layer membership congruent with the base's); the default N=10
#: does.
JITTER_QUERIES = [
    "knn_beam",
    "knn_hnsw",
    "knn_hnsw_ingest",
    "knn_hnsw_at_rest",
    "knn_hnsw_at_rest_ingest",
]


def _jitter_fn(name: str, n: int):
    """The registered query function at the xN deployment geometry
    (n=1 == the registered call: every knob at its default)."""
    from musicflow_spark.queries.vectors import (
        HNSW_MOD2,
        HNSW_PLANES1,
        LSH_PLANES,
        knn_beam,
        knn_hnsw,
        knn_hnsw_at_rest,
        knn_hnsw_at_rest_ingest,
        knn_hnsw_ingest,
    )

    extra = max(0, n - 1).bit_length()  # ceil(log2 n)
    if name == "knn_beam":
        return lambda s, d: knn_beam(s, d, graph_planes=LSH_PLANES + extra)
    geo = dict(
        mod2=HNSW_MOD2 * n,
        planes1=HNSW_PLANES1 + extra,
        graph_planes=LSH_PLANES + extra,
    )
    fn = {
        "knn_hnsw": knn_hnsw,
        "knn_hnsw_ingest": knn_hnsw_ingest,
        "knn_hnsw_at_rest": knn_hnsw_at_rest,
        "knn_hnsw_at_rest_ingest": knn_hnsw_at_rest_ingest,
    }[name]
    return lambda s, d: fn(s, d, **geo)


#: --skew mode: queries whose hot-spot behavior the caps must bound,
#: and the tables the hot spot lives in
SKEW_QUERIES = [
    "doc_jaccard_pairs",        # max_df cap on the inverted index
    "doc_minhash_dedup",        # max_df cap before signatures/banding
    "doc_incremental_dedup",    # same cap on the delta-vs-corpus probe
    "shipment_overlap_pairs",   # composite (key, bucket) shuffle key
    "doc_allpairs_exact",       # df-ordered prefixes exclude the hot suffix
]

_HOT_SUFFIX = " ".join(f"zzhot{j}" for j in range(60))


def _skewed(df, table: str):
    """Inject the hot spot AFTER replica-shifting, so the hot content
    is IDENTICAL across replicas (one global hot spot holding ~10% of
    all rows, growing with N — the adversarial case)."""
    if table == "documents":
        return df.withColumn(
            "text",
            F.when(
                F.col("doc_id") % 10 == 0,  # stride is a multiple of 10
                F.concat_ws(" ", F.col("text"), F.lit(_HOT_SUFFIX)),
            ).otherwise(F.col("text")),
        )
    if table == "lineitem":
        # one hot 32-day window; supplier keys stay replica-disjoint,
        # so only the BUCKET component of the join key is hot
        return df.withColumn(
            "l_shipdate",
            F.when(
                F.col("l_orderkey") % 10 == 0,
                F.to_date(F.lit("1995-06-01"))
                + F.make_interval(days=F.pmod(F.col("l_orderkey") / 10, F.lit(32)).cast("int")),
            ).otherwise(F.col("l_shipdate")),
        )
    return df


def build_scaled(
    spark,
    n: int,
    tables: set[str],
    skew: bool = False,
    stride: int = KEY_STRIDE,
    tag: str = "",
    jitter: bool = False,
) -> str:
    if stride == MEDIA_DOC_STRIDE and n > 10:
        raise SystemExit(
            "media profile supports <= 10 replicas (class windows wrap)"
        )
    root = f"/tmp/scale_stress/{'skew_' if skew else ''}{tag}x{n}"
    os.makedirs(root, exist_ok=True)
    for t in sorted(tables):
        dest = f"{root}/{t}.parquet"
        if os.path.exists(dest):
            continue
        base = spark.read.parquet(f"{BASE}/{t}.parquet")

        def one(i: int):
            rep = _replica(base, t, i, stride, jitter=jitter)
            return _skewed(rep, t) if skew else rep

        scaled = one(0)
        for i in range(1, n):
            scaled = scaled.unionByName(one(i))
        tmp = dest + ".__tmp__"
        scaled.repartition(32).write.mode("overwrite").parquet(tmp)
        os.rename(tmp, dest)
    for t in DIMS:
        dest = f"{root}/{t}.parquet"
        src = f"{BASE}/{t}.parquet"
        if not os.path.exists(dest):
            # driver testdata are single parquet files; be robust to
            # directory-style tables too
            if os.path.isdir(src):
                shutil.copytree(src, dest)
            else:
                shutil.copyfile(src, dest)
    return root


def _time(fn, spark, sf_dir: str, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> int:
    args = sys.argv[1:]
    skew = "--skew" in args
    if skew:
        args.remove("--skew")
    jitter = "--jitter" in args
    if jitter:
        args.remove("--jitter")
    if skew and jitter:
        raise SystemExit("--skew and --jitter are separate profiles")
    n = int(args[0]) if args else 10
    names = args[1:] or (
        SKEW_QUERIES if skew else JITTER_QUERIES if jitter else DEFAULT_QUERIES
    )
    if jitter:
        bad = [q for q in names if q not in JITTER_QUERIES]
        if bad:
            raise SystemExit(f"--jitter covers {JITTER_QUERIES}, not {bad}")
        from musicflow_spark.queries.vectors import HNSW_MOD2

        if KEY_STRIDE % (HNSW_MOD2 * n):  # HNSW_MOD2 * n must divide the stride
            raise SystemExit(
                f"jitter profile needs {HNSW_MOD2}*{n} | {KEY_STRIDE}"
            )
    else:
        bad = [q for q in names if q not in QUERY_TABLES]
        if bad:
            raise SystemExit(f"no table map for {bad}; add to QUERY_TABLES")

    from musicflow_spark.queries import get_queries
    from musicflow_spark.session import get_spark

    spark = get_spark("scale_stress", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    fns = {q.name: q.spark for q in get_queries()}

    media_names = [q for q in names if q in MEDIA_QUERIES]
    plain_names = [q for q in names if q not in MEDIA_QUERIES]
    need = set()
    for q in plain_names:
        need |= set(QUERY_TABLES.get(q, ["embeddings"]))
    media_need = set()
    for q in media_names:
        media_need |= set(QUERY_TABLES[q])
    dirs: dict[str, str] = {}
    if plain_names:
        dirs.update(
            dict.fromkeys(
                plain_names,
                build_scaled(
                    spark, n, need, skew=skew, jitter=jitter,
                    tag="jit_" if jitter else "",
                ),
            )
        )
    if media_names:
        # media perceptual fixtures need the class-window-aware stride
        # (MEDIA_DOC_STRIDE) so replicas never fold in texture space
        dirs.update(
            dict.fromkeys(
                media_names,
                build_scaled(spark, n, media_need, stride=MEDIA_DOC_STRIDE, tag="media_"),
            )
        )
    # under --skew the x1 point carries the SAME hot spot, so the
    # ratio measures the curve under skew, not skew-vs-benign
    base_dir = build_scaled(spark, 1, need | media_need, skew=True) if skew else BASE

    mode = "skew " if skew else "jit " if jitter else ""
    label = "t(skew x1)" if skew else "t(sf0.1)"
    print(f"{'query':26s} {label:>10s} {'t(%sx%d)' % (mode, n):>12s} {'ratio':>6s}  verdict")
    worst = 0.0
    for q in names:
        # --jitter: x1 runs the registered call (all geometry knobs at
        # defaults, base data), xN the same function at geometry(N).
        # min-of-3 both points: the unrolled graph walks are
        # plan-compile/JIT heavy, and two runs do not amortize the
        # warmup (measured 78/53/29 s on identical input)
        runs = 3 if jitter else 2
        f1 = _jitter_fn(q, 1) if jitter else fns[q]
        fn_n = _jitter_fn(q, n) if jitter else fns[q]
        t1 = _time(f1, spark, base_dir, runs=runs)
        tn = _time(fn_n, spark, dirs[q], runs=runs)
        r = tn / t1
        worst = max(worst, r)
        verdict = "sub-linear" if r < 0.8 * n else ("~linear" if r <= 1.5 * n else "SUPER-LINEAR!")
        print(f"{q:26s} {t1:10.2f} {tn:12.2f} {r:6.2f}  {verdict}")
    print(f"SCALE STRESS: {'OK' if worst <= 1.5 * n else 'SUPER-LINEAR STAGE FOUND'}")
    return 0 if worst <= 1.5 * n else 1


if __name__ == "__main__":
    sys.exit(main())
