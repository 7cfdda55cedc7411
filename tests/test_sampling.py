"""Sampling/packing operator tests: split determinism and frozen
assignments, quota exactness, packing-stream contiguity, and chunk
reconstruction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from musicflow_spark.operators.sampling import (
    bernoulli_sample,
    chunk_documents,
    global_hash_sample,
    hash_split,
    pack_sequences,
    split_contamination,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"lang{i % 3}", " ".join(f"w{i}_{j}" for j in range(i % 7))) for i in range(200)]
    return spark.createDataFrame(rows, "id long, lang string, text string")


class TestHashSplit:
    def test_partitions_all_rows_roughly_by_weight(self, docs):
        out = hash_split(docs, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
        counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert sum(counts.values()) == 200
        assert set(counts) <= {"train", "val", "test"}
        assert counts["train"] > counts.get("val", 0)
        assert counts["train"] > counts.get("test", 0)

    def test_assignment_frozen_under_growth(self, spark, docs):
        # adding rows must not move existing assignments
        small = docs.filter(F.col("id") < 50)
        w = {"train": 0.8, "val": 0.1, "test": 0.1}
        a = {r["id"]: r["split"] for r in hash_split(small, "id", w).collect()}
        b = {
            r["id"]: r["split"]
            for r in hash_split(docs, "id", w).filter(F.col("id") < 50).collect()
        }
        assert a == b

    def test_salt_redraws(self, docs):
        w = {"a": 0.5, "b": 0.5}
        x = {r["id"]: r["split"] for r in hash_split(docs, "id", w).collect()}
        y = {r["id"]: r["split"] for r in hash_split(docs, "id", w, salt="v2").collect()}
        assert x != y  # some assignment moved under a new salt

    def test_bad_weights_rejected(self, docs):
        with pytest.raises(ValueError):
            hash_split(docs, "id", {"a": 0.5, "b": 0.4})


class TestStratifiedSample:
    def test_exact_quota_per_stratum(self, docs):
        out = stratified_sample(docs, ["lang"], 10, "id")
        counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert counts == {"lang0": 10, "lang1": 10, "lang2": 10}

    def test_small_stratum_returned_whole(self, spark):
        df = spark.createDataFrame(
            [(1, "x"), (2, "x"), (3, "y")], "id long, lang string"
        )
        out = stratified_sample(df, ["lang"], 10, "id")
        assert out.count() == 3

    def test_deterministic_across_repartition(self, docs):
        a = sorted(r["id"] for r in stratified_sample(docs, ["lang"], 5, "id").collect())
        b = sorted(
            r["id"]
            for r in stratified_sample(docs.repartition(13), ["lang"], 5, "id").collect()
        )
        assert a == b


class TestPackSequences:
    def test_offsets_contiguous_per_shard(self, docs):
        with_n = docs.withColumn("n_tokens", F.size(F.split("text", " ")))
        out = pack_sequences(with_n, "n_tokens", "id", budget=16, n_shards=4)
        rows = sorted(
            ((r["shard"], r["id"], r["tok_offset"], r["n_tokens"]) for r in out.collect())
        )
        # within a shard (ordered by id) each offset == previous end
        expected = {}
        for shard, _id, off, n in rows:
            assert off == expected.get(shard, 0)
            expected[shard] = off + n
        assert out.count() == docs.count()

    def test_seq_span_matches_offsets(self, docs):
        with_n = docs.withColumn("n_tokens", F.size(F.split("text", " ")))
        out = pack_sequences(with_n, "n_tokens", "id", budget=16, n_shards=4)
        for r in out.collect():
            assert r["seq_first"] == r["tok_offset"] // 16
            end = r["tok_offset"] + max(r["n_tokens"], 1) - 1
            assert r["seq_last"] == max(end // 16, r["seq_first"])

    def test_bad_budget(self, docs):
        with pytest.raises(ValueError):
            pack_sequences(docs.withColumn("n", F.lit(1)), "n", "id", budget=0)


class TestChunkDocuments:
    def test_reconstruction_covers_text(self, spark):
        df = spark.createDataFrame(
            [(1, "abcdefghijklmnopqrstuvwxyz"), (2, "short"), (3, "")],
            "id long, text string",
        )
        out = chunk_documents(df, "text", "id", chunk_len=10, stride=7)
        by_doc = {}
        for r in out.collect():
            by_doc.setdefault(r["id"], []).append((r["chunk_idx"], r["chunk_text"]))
        # doc 1: starts at 0,7,14,21 — stitching strides reconstructs
        chunks1 = [t for _, t in sorted(by_doc[1])]
        assert chunks1[0] == "abcdefghij"
        # overlap-aware stitch: each chunk contributes its first
        # `stride` chars, the final chunk contributes itself whole
        stitched = "".join(c[:7] for c in chunks1[:-1]) + chunks1[-1]
        assert stitched == "abcdefghijklmnopqrstuvwxyz"
        assert by_doc[2] == [(0, "short")]
        assert by_doc[3] == [(0, "")]

    def test_every_char_covered_and_overlap_consistent(self, spark):
        text = "x" * 1001
        df = spark.createDataFrame([(1, text)], "id long, text string")
        out = chunk_documents(df, "text", "id", chunk_len=200, stride=150).collect()
        spans = sorted((r["chunk_idx"] * 150, r["chunk_idx"] * 150 + r["chunk_n_chars"]) for r in out)
        assert spans[0][0] == 0
        assert spans[-1][1] == 1001
        for (s0, e0), (s1, _) in zip(spans, spans[1:]):
            assert s1 <= e0  # no gaps
        # last chunk still starts inside the text
        assert spans[-1][0] < 1001

    def test_stride_validation(self, spark):
        df = spark.createDataFrame([(1, "abc")], "id long, text string")
        with pytest.raises(ValueError):
            chunk_documents(df, "text", "id", chunk_len=10, stride=0)
        with pytest.raises(ValueError):
            chunk_documents(df, "text", "id", chunk_len=10, stride=11)


class TestBernoulliSample:
    def test_rate_extremes_and_monotonicity(self, docs):
        assert bernoulli_sample(docs, "id", 0.0).count() == 0
        assert bernoulli_sample(docs, "id", 1.0).count() == 200
        # a higher rate keeps a superset (nested-coin property)
        lo = {r["id"] for r in bernoulli_sample(docs, "id", 0.3).collect()}
        hi = {r["id"] for r in bernoulli_sample(docs, "id", 0.7).collect()}
        assert lo <= hi
        assert 0 < len(lo) < len(hi) < 200

    def test_independent_of_split_draw(self, docs):
        # the sample coin and the split coin use different salt
        # spaces: sampling inside the train split must not be biased
        w = {"train": 0.5, "test": 0.5}
        split_train = {
            r["id"] for r in hash_split(docs, "id", w).collect() if r["split"] == "train"
        }
        kept = {r["id"] for r in bernoulli_sample(docs, "id", 0.5).collect()}
        inter = len(split_train & kept) / len(split_train)
        assert 0.35 < inter < 0.65  # ~0.5 if independent; 0 or 1 if correlated

    def test_per_row_rate_column(self, docs):
        kept = bernoulli_sample(
            docs, "id", F.when(F.col("lang") == "lang0", 1.0).otherwise(0.0)
        )
        assert {r["lang"] for r in kept.collect()} == {"lang0"}


class TestGlobalHashSample:
    def test_exactly_k_and_deterministic(self, docs):
        a = [r["id"] for r in global_hash_sample(docs, "id", 17).collect()]
        b = [r["id"] for r in global_hash_sample(docs.repartition(7), "id", 17).collect()]
        assert len(a) == 17
        assert sorted(a) == sorted(b)

    def test_reservoir_property_under_growth(self, spark, docs):
        # the sample of a superset is drawn from the same total order:
        # picks only change by new rows hashing lower
        small_pick = {r["id"] for r in
                      global_hash_sample(docs.filter(F.col("id") < 100), "id", 10).collect()}
        full_pick = {r["id"] for r in global_hash_sample(docs, "id", 10).collect()}
        # every full-corpus pick that is an old row must be in the
        # small pick too (new rows can displace, never reorder)
        assert (full_pick & set(range(100))) <= small_pick


class TestSplitContamination:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        # engineered corpus: ids chosen so the hash split puts 1,3 in
        # different splits than their duplicates would like — we don't
        # control the hash, so instead make EVERY doc either a dup of
        # doc 0 or unique, and assert against the actual split map
        base = "alpha beta gamma delta epsilon zeta eta theta"
        near = "alpha beta gamma delta epsilon zeta eta iota"  # 6/9 shingle overlap
        rows = [(0, base), (1, base), (2, near), (3, "totally different words here now")]
        rows += [(i, f"filler doc {i} " + " ".join(f"t{i}_{j}" for j in range(8))) for i in range(4, 40)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_tiers_and_orientation(self, corpus):
        w = {"train": 0.5, "eval": 0.5}
        out = split_contamination(
            corpus, "doc_id", "text", w, threshold=0.2, max_df=30
        ).collect()
        from musicflow_spark.operators.sampling import hash_split as hs

        splits = {r["doc_id"]: r["split"] for r in hs(corpus, "doc_id", w).collect()}
        for r in out:
            # orientation: eval_id is never in train, train_id always is
            assert splits[r["eval_id"]] != "train"
            assert splits[r["train_id"]] == "train"
            assert r["split"] == splits[r["eval_id"]]
            if r["kind"] == "exact":
                assert r["jaccard"] is None
            else:
                assert r["jaccard"] >= 0.2
        # exact dup pair (0,1) must be reported iff it crosses the boundary
        crosses = (splits[0] == "train") != (splits[1] == "train")
        exact_pairs = {(r["eval_id"], r["train_id"]) for r in out if r["kind"] == "exact"}
        assert (len(exact_pairs) > 0) == crosses
        # no pair is reported by both tiers
        near_pairs = {(r["eval_id"], r["train_id"]) for r in out if r["kind"] == "near"}
        assert not (exact_pairs & near_pairs)

    def test_shared_pairs_frame_is_equivalent(self, corpus):
        # passing a pre-built jaccard_pairs frame (the shared-pairs
        # composition used by corpus_training_batch_mart) must yield
        # the exact same evidence rows as the self-built path
        from musicflow_spark.operators.dedup import jaccard_pairs

        # a 10-member duplicate group: with a 50/50 hash split some
        # member pair is (deterministically) on opposite sides, so the
        # probe emits evidence rows and the comparison is non-vacuous
        spark = corpus.sparkSession
        base = "alpha beta gamma delta epsilon zeta eta theta"
        dup10 = spark.createDataFrame(
            [(100 + i, base) for i in range(10)], "doc_id long, text string"
        )
        cps = corpus.select("doc_id", "text").union(dup10)
        w = {"train": 0.5, "eval": 0.5}
        self_built = split_contamination(
            cps, "doc_id", "text", w, threshold=0.2, max_df=30
        )
        shared = split_contamination(
            cps, "doc_id", "text", w, threshold=0.2, max_df=30,
            pairs=jaccard_pairs(cps, threshold=0.2, max_df=30),
        )
        key = lambda r: (r["eval_id"], r["train_id"], r["kind"])
        a = sorted(map(key, self_built.collect()))
        b = sorted(map(key, shared.collect()))
        assert a == b and len(a) > 0


class TestMixtureInterleave:
    WEIGHTS = {"lang0": 0.5, "lang1": 0.25}  # lang2 -> default 0.1

    def test_prefix_proportionality_exact(self, docs):
        from musicflow_spark.operators.sampling import mixture_interleave

        out = mixture_interleave(
            docs, "lang", self.WEIGHTS, "id", default_weight=0.1
        ).collect()
        w = {"lang0": 0.5, "lang1": 0.25, "lang2": 0.1}
        per_lang_total = {}
        for r in out:
            per_lang_total[r["lang"]] = max(per_lang_total.get(r["lang"], 0), r["mix_rank"])
        # stride scheduling invariant: rows of source s with
        # mix_pos <= P are exactly those with rank <= P * w_s
        import math

        for P in (10.0, 37.5, 100.0, 400.0):
            for lang, wt in w.items():
                got = sum(1 for r in out if r["lang"] == lang and r["mix_pos"] <= P)
                want = min(math.floor(P * wt + 1e-9), per_lang_total[lang])
                assert got == want, (P, lang, got, want)

    def test_deterministic(self, docs):
        from musicflow_spark.operators.sampling import mixture_interleave

        a = sorted(map(tuple, mixture_interleave(docs, "lang", self.WEIGHTS, "id").collect()))
        b = sorted(map(tuple, mixture_interleave(docs, "lang", self.WEIGHTS, "id").collect()))
        assert a == b


def test_mixture_interleave_rejects_nonpositive_weights(spark):
    import pytest as _pytest

    from musicflow_spark.operators.sampling import mixture_interleave

    df = spark.createDataFrame([("a", "s1")], ["id", "src"])
    with _pytest.raises(ValueError, match="weights"):
        mixture_interleave(df, "src", {"s1": 0.0}, "id")
    with _pytest.raises(ValueError, match="weights"):
        mixture_interleave(df, "src", {"s1": -1.0}, "id")
    with _pytest.raises(ValueError, match="weights"):
        mixture_interleave(df, "src", {"s1": 0.5}, "id", default_weight=0.0)


def test_dsir_selection_favors_target_distribution(spark, sf_dir):
    """DSIR importance routing on the real corpus: the English slice
    (the target exemplar set) must score higher per-token importance
    than every other language on average, its mean must be positive,
    and selection must be exactly the avg_imp_micro >= 0 predicate."""
    from pyspark.sql import functions as F

    from musicflow_spark.queries.sampling import corpus_dsir_selection

    out = corpus_dsir_selection(spark, sf_dir)
    rows = out.collect()
    sel = [r["avg_imp_micro"] for r in rows if r["selected"]]
    unsel = [r["avg_imp_micro"] for r in rows if not r["selected"]]
    assert sel and unsel  # the mean threshold splits the corpus
    assert min(sel) > max(unsel)  # routing is a single global cut
    by_lang = {
        r["lang"]: (r["m"], r["rate"])
        for r in out.groupBy("lang")
        .agg(
            F.avg("avg_imp_micro").alias("m"),
            F.avg(F.col("selected").cast("double")).alias("rate"),
        )
        .collect()
    }
    assert all(by_lang["en"][0] > v for k, (v, _) in by_lang.items() if k != "en")
    assert all(by_lang["en"][1] > r for k, (_, r) in by_lang.items() if k != "en")
    # importance sums conserve: every doc with tokens is scored
    n_docs_with_tokens = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.size(F.split(F.trim("text"), r"\s+")) > 0)
        .count()
    )
    assert len(rows) == n_docs_with_tokens


def test_weighted_systematic_sample_exact_and_conserving(spark):
    """The parallel two-phase PPS must equal a pure-python single-pass
    over the same hash order; total pick_count is EXACTLY k; any row
    heavier than one stride is always selected."""
    import hashlib

    from pyspark.sql import functions as F

    from musicflow_spark.operators.sampling import weighted_systematic_sample

    rows = [(i, (i * 13) % 97 + 1) for i in range(500)]
    rows[7] = (7, 5000)  # heavier than one stride -> guaranteed pick
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    k = 20
    out = weighted_systematic_sample(df, "n_chars", k=k).collect()

    def h(i):
        return int(hashlib.md5(f"pps:{i}".encode()).hexdigest()[:15], 16)

    order = sorted(rows, key=lambda r: (h(r[0]), r[0]))
    total = sum(w for _, w in rows)
    want, cum = {}, 0
    for i, w in order:
        prev, cum = cum, cum + w
        pc = (cum * k) // total - (prev * k) // total
        if pc > 0:
            want[i] = (cum, pc)
    assert {r["doc_id"]: (r["cum_w"], r["pick_count"]) for r in out} == want
    assert sum(pc for _, pc in want.values()) == k
    assert 7 in want and want[7][1] >= 1


def test_temperature_mixture_conserves_and_upsamples(spark, sf_dir):
    """Σalloc == K exactly (largest remainder), and tempering lifts
    every below-average source's share above its raw share while the
    ranking of sources by allocation preserves the ranking by size."""
    from musicflow_spark.queries.sampling import (
        TEMP_K,
        corpus_temperature_mixture,
    )

    rows = corpus_temperature_mixture(spark, sf_dir).collect()
    assert sum(r["alloc"] for r in rows) == TEMP_K
    n_total = sum(r["n_docs"] for r in rows)
    for r in rows:
        raw_share = r["n_docs"] / n_total
        alloc_share = r["alloc"] / TEMP_K
        if raw_share < 1 / len(rows):
            assert alloc_share >= raw_share  # rare slices upsampled
        else:
            assert alloc_share <= raw_share + 1 / TEMP_K
    by_size = sorted(rows, key=lambda r: (-r["n_docs"], r["source"]))
    allocs = [r["alloc"] for r in by_size]
    assert all(a >= b - 1 for a, b in zip(allocs, allocs[1:], strict=False))


def test_shard_manifest_is_one_global_permutation(spark, sf_dir):
    """The shard manifest really encodes ONE deterministic global
    shuffle: shards partition the corpus into contiguous hash ranges,
    within-shard order is (draw, key) order, per-shard offsets are
    exact prefix sums, global offsets concatenate shards seamlessly
    (shard k's first doc starts where shard k-1's stream ended), and
    the whole thing is salt-stable / salt-sensitive."""
    from musicflow_spark.operators.dedup import portable_hash60
    from musicflow_spark.operators.sampling import (
        shuffled_shard_manifest,
        token_count,
    )
    from musicflow_spark.queries.sampling import SHUF_BUDGET, SHUF_SHARDS
    from musicflow_spark.queries.sampling import corpus_shard_manifest
    from musicflow_spark.sources.catalog import read_table

    rows = corpus_shard_manifest(spark, sf_dir).collect()
    docs = read_table(spark, sf_dir, "documents")
    assert len(rows) == docs.count()  # every doc appears exactly once
    assert len({r["doc_id"] for r in rows}) == len(rows)

    width = (1 << 60) // SHUF_SHARDS
    draws = {
        r["doc_id"]: r["draw"]
        for r in docs.select(
            "doc_id",
            portable_hash60(
                F.concat(F.lit("shuf:"), F.col("doc_id").cast("string"))
            ).alias("draw"),
        ).collect()
    }
    by_shard: dict[int, list] = {}
    for r in rows:
        assert r["shard_id"] == draws[r["doc_id"]] // width  # fixed ranges
        by_shard.setdefault(r["shard_id"], []).append(r)

    stream_pos = 0
    for sid in sorted(by_shard):
        rs = sorted(by_shard[sid], key=lambda r: r["doc_order"])
        assert [r["doc_order"] for r in rs] == list(range(1, len(rs) + 1))
        # within-shard order IS hash order
        ds = [draws[r["doc_id"]] for r in rs]
        assert ds == sorted(ds)
        off = 0
        for r in rs:
            assert r["tok_offset"] == off  # exact per-shard prefix sum
            # global stream: shard k starts exactly where k-1 ended
            assert r["global_offset"] == stream_pos
            assert r["seq_first"] == r["global_offset"] // SHUF_BUDGET
            last = max(r["global_offset"] + r["n_tokens"] - 1, r["global_offset"])
            assert r["seq_last"] == last // SHUF_BUDGET
            off += r["n_tokens"]
            stream_pos += r["n_tokens"]

    # deterministic under re-run, re-drawn under a new salt
    base = docs.select(
        "doc_id", token_count("text").cast("long").alias("n_tokens")
    )
    a = shuffled_shard_manifest(base, "doc_id", "n_tokens", SHUF_BUDGET)
    b = shuffled_shard_manifest(base, "doc_id", "n_tokens", SHUF_BUDGET)
    key = lambda df: {  # noqa: E731
        r["doc_id"]: (r["shard_id"], r["doc_order"], r["global_offset"])
        for r in df.collect()
    }
    assert key(a) == key(b)
    c = shuffled_shard_manifest(
        base, "doc_id", "n_tokens", SHUF_BUDGET, salt="v2"
    )
    assert key(a) != key(c)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="power of two"):
        shuffled_shard_manifest(base, "doc_id", "n_tokens", 64, n_shards=6)
    with _pytest.raises(ValueError, match="positive"):
        shuffled_shard_manifest(base, "doc_id", "n_tokens", 0)
