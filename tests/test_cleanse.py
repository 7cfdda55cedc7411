"""Cleansing operator tests: PII redaction correctness/counts and
repetition-feature semantics on hand-built documents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from musicflow_spark.operators.cleanse import (
    digit_ratio,
    ngram_strings,
    redact_pii,
    repetition_features,
)


class TestRedactPii:
    @pytest.fixture(scope="class")
    def redacted(self, spark):
        rows = [
            (1, "mail a.b+c@test-host.org now"),
            (2, "call 415-555-0042 or 415-555-9999"),
            (3, "see https://ex.com/a_b/c.html?"),
            (4, "mix: x@y.io https://z.dev 111-222-3333"),
            (5, "clean text, no pii 12345"),
            (6, ""),
        ]
        df = spark.createDataFrame(rows, "id long, text string")
        return {r["id"]: r for r in redact_pii(df, "text").collect()}

    def test_email(self, redacted):
        assert redacted[1]["redacted"] == "mail [EMAIL] now"
        assert redacted[1]["n_email"] == 1

    def test_phone_counts_all(self, redacted):
        assert redacted[2]["redacted"] == "call [PHONE] or [PHONE]"
        assert redacted[2]["n_phone"] == 2

    def test_url_stops_at_invalid_char(self, redacted):
        # trailing '?' is outside the URL class and survives
        assert redacted[3]["redacted"] == "see [URL]?"
        assert redacted[3]["n_url"] == 1

    def test_mixed_kinds(self, redacted):
        r = redacted[4]
        assert r["redacted"] == "mix: [EMAIL] [URL] [PHONE]"
        assert (r["n_email"], r["n_phone"], r["n_url"]) == (1, 1, 1)

    def test_clean_and_empty_untouched(self, redacted):
        assert redacted[5]["redacted"] == "clean text, no pii 12345"
        assert redacted[6]["redacted"] == ""
        assert redacted[5]["n_email"] == redacted[6]["n_phone"] == 0

    def test_partial_phone_not_matched(self, spark):
        df = spark.createDataFrame(
            [(1, "order 123-456-78901 shipped"), (2, "v1.2-345-6789")],
            "id long, text string",
        )
        out = {r["id"]: r for r in redact_pii(df, "text").collect()}
        # 5-digit tail breaks the \b boundary; no match either row
        assert out[1]["n_phone"] == 0 and "[PHONE]" not in out[1]["redacted"]
        assert out[2]["n_phone"] == 0


class TestRepetition:
    def test_ngram_strings_basic(self, spark):
        df = spark.createDataFrame([(1, "A b a B c")], "id long, text string")
        grams = df.select(ngram_strings("text", 2).alias("g")).collect()[0]["g"]
        assert grams == ["a b", "b a", "a b", "b c"]

    def test_short_docs_empty(self, spark):
        df = spark.createDataFrame([(1, "one"), (2, ""), (3, "  ")], "id long, text string")
        for row in df.select(ngram_strings("text", 2).alias("g")).collect():
            assert row["g"] == []

    def test_features_counts(self, spark):
        df = spark.createDataFrame(
            [(1, "a b a b a"), (2, "all distinct tokens here"), (3, "x")],
            "id long, text string",
        )
        out = {r["doc_id"]: r for r in
               repetition_features(df.withColumnRenamed("id", "doc_id"), "doc_id", "text").collect()}
        # doc 1: grams = [a b, b a, a b, b a] -> top 2/4, uniq 2/4
        assert out[1]["n_ngrams"] == 4
        assert out[1]["n_uniq_ngrams"] == 2
        assert out[1]["top_ngram_cnt"] == 2
        assert out[1]["top_ngram_frac"] == pytest.approx(0.5)
        assert out[1]["dup_ngram_frac"] == pytest.approx(0.5)
        # doc 2: 3 distinct bigrams, no repetition
        assert out[2]["n_ngrams"] == 3
        assert out[2]["dup_ngram_frac"] == pytest.approx(0.0)
        # doc 3: too short -> explicit zero row, not a missing row
        assert out[3]["n_ngrams"] == 0
        assert out[3]["top_ngram_frac"] == 0.0

    def test_digit_ratio(self, spark):
        df = spark.createDataFrame([(1, "ab12"), (2, ""), (3, "999")], "id long, t string")
        vals = {r["id"]: r["d"] for r in df.select("id", digit_ratio("t").alias("d")).collect()}
        assert vals[1] == pytest.approx(0.5)
        assert vals[2] == 0.0
        assert vals[3] == pytest.approx(1.0)


class TestTfidfTopk:
    def test_characteristic_term_wins(self, spark):
        from musicflow_spark.operators.textstats import tfidf_topk

        df = spark.createDataFrame(
            [
                (1, "common common unicorn"),
                (2, "common words only"),
                (3, "common words again"),
                (4, ""),
            ],
            "doc_id long, text string",
        )
        out = tfidf_topk(df, "doc_id", "text", k=2)
        rows = {(r["doc_id"], r["rank"]): r for r in out.collect()}
        # 'unicorn' (df=1) beats 'common' (df=3) despite tf 1 vs 2
        assert rows[(1, 1)]["term"] == "unicorn"
        assert rows[(1, 2)]["term"] == "common"
        # all docs get <= k rows; the empty doc gets none
        assert not any(d == 4 for d, _ in rows)
        assert max(r["rank"] for r in out.collect()) <= 2
        # score sanity: tf * ln((N+1)/(df+1))
        import math

        assert rows[(1, 1)]["score"] == pytest.approx(1 * math.log(5 / 2))

    def test_tie_breaks_by_term(self, spark):
        from musicflow_spark.operators.textstats import tfidf_topk

        df = spark.createDataFrame(
            [(1, "zebra apple"), (2, "other stuff")], "doc_id long, text string"
        )
        out = {r["rank"]: r["term"] for r in
               tfidf_topk(df, "doc_id", "text", k=2).filter(F.col("doc_id") == 1).collect()}
        # equal tf and df -> equal score -> alphabetical term order
        assert out == {1: "apple", 2: "zebra"}


class TestPerplexityFilter:
    def test_matches_pure_python_laplace_lm(self, spark, tmp_path):
        import math

        from musicflow_spark.queries.textops import (
            PPL_KEEP_MICRO_NATS,
            PPL_SCALE,
            doc_perplexity_filter,
        )

        texts = {
            1: "the cat sat on the mat",
            2: "the cat sat",
            3: "entirely novel gibberish tokens here",
            4: "x",  # single token: no bigram, must not appear
            # repeated bigrams WITHIN one doc: (a b) x3, (b a) x2 —
            # exercises the doc-grain cnt>1 multiply path of the
            # restructured filter (sum(lp*cnt) == occurrence-sum)
            5: "a b a b a b",
        }
        df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
        df.write.parquet(str(tmp_path / "documents.parquet"))
        got = {
            r["doc_id"]: r
            for r in doc_perplexity_filter(spark, str(tmp_path)).collect()
        }
        # pure-python reference
        toks = {d: t.split() for d, t in texts.items()}
        uni: dict[str, int] = {}
        big: dict[tuple, int] = {}
        for t in toks.values():
            for w in t:
                uni[w] = uni.get(w, 0) + 1
            for a, b in zip(t, t[1:]):
                big[(a, b)] = big.get((a, b), 0) + 1
        v = len(uni)
        for d, t in toks.items():
            bgs = list(zip(t, t[1:]))
            if not bgs:
                assert d not in got
                continue
            lps = [
                round(math.log((big[bg] + 1.0) / (uni[bg[0]] + v)) * PPL_SCALE)
                for bg in bgs
            ]
            s = sum(lps)
            # Spark `div` truncates toward zero; python // floors
            avg = int(s / len(bgs)) if s >= 0 else -((-s) // len(bgs))
            r = got[d]
            assert r["n_bigrams"] == len(bgs)
            assert r["sum_lp_micro"] == s
            assert r["avg_lp_micro"] == avg
            assert r["keep"] == (avg >= PPL_KEEP_MICRO_NATS)

    def test_filter_routes_both_ways_on_fixture(self, spark):
        from musicflow_spark.queries.textops import doc_perplexity_filter

        out = doc_perplexity_filter(spark, "/root/testdata/sf0.001")
        agg = out.groupBy("keep").count().collect()
        counts = {r["keep"]: r["count"] for r in agg}
        assert counts.get(True, 0) > 0 and counts.get(False, 0) > 0
        # every log term is negative -> every sum strictly negative
        assert out.filter(F.col("sum_lp_micro") >= 0).count() == 0


class TestKneserNeyFilter:
    def test_matches_pure_python_kn_lm(self, spark, tmp_path):
        import math

        from musicflow_spark.queries.textops import (
            KN_KEEP_MICRO_NATS,
            PPL_SCALE,
            doc_kn_perplexity,
        )

        texts = {
            1: "the cat sat on the mat",
            2: "the cat sat",
            3: "entirely novel gibberish tokens here",
            4: "x",  # single token: no bigram, must not appear
        }
        df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
        df.write.parquet(str(tmp_path / "documents.parquet"))
        got = {
            r["doc_id"]: r
            for r in doc_kn_perplexity(spark, str(tmp_path)).collect()
        }
        toks = {d: t.split() for d, t in texts.items()}
        big: dict[tuple, int] = {}
        for t in toks.values():
            for a, b in zip(t, t[1:]):
                big[(a, b)] = big.get((a, b), 0) + 1
        ctx: dict[str, int] = {}
        n1f: dict[str, int] = {}
        n1b: dict[str, int] = {}
        for (a, b), c in big.items():
            ctx[a] = ctx.get(a, 0) + c
            n1f[a] = n1f.get(a, 0) + 1
            n1b[b] = n1b.get(b, 0) + 1
        tt = len(big)
        for d, t in toks.items():
            bgs = list(zip(t, t[1:]))
            if not bgs:
                assert d not in got
                continue
            lps = [
                round(
                    math.log(
                        ((4 * big[bg] - 3) * tt + 3 * n1f[bg[0]] * n1b[bg[1]])
                        / (4 * ctx[bg[0]] * tt)
                    )
                    * PPL_SCALE
                )
                for bg in bgs
            ]
            s = sum(lps)
            avg = int(s / len(bgs)) if s >= 0 else -((-s) // len(bgs))
            r = got[d]
            assert r["n_bigrams"] == len(bgs)
            assert r["sum_lp_micro"] == s
            assert r["avg_lp_micro"] == avg
            assert r["keep"] == (avg >= KN_KEEP_MICRO_NATS)

    def test_kn_probabilities_sum_to_one(self, spark):
        """The KN invariant, in exact rational arithmetic: for every
        context w1, sum over OBSERVED w2 of the discounted term plus
        the backoff mass times the FULL continuation distribution
        equals 1 — i.e. sum_seen (c-D)/ctx + D*n1f/ctx * 1 == 1 when
        the continuation distribution itself sums to 1 (it does:
        sum_w2 N1+(.w2)/T == 1 by definition of T)."""
        from fractions import Fraction

        texts = [
            "the cat sat on the mat",
            "the cat sat on a hat",
            "a dog sat",
        ]
        big: dict[tuple, int] = {}
        for t in texts:
            w = t.split()
            for a, b in zip(w, w[1:]):
                big[(a, b)] = big.get((a, b), 0) + 1
        ctx: dict[str, int] = {}
        n1f: dict[str, int] = {}
        n1b: dict[str, int] = {}
        for (a, b), c in big.items():
            ctx[a] = ctx.get(a, 0) + c
            n1f[a] = n1f.get(a, 0) + 1
            n1b[b] = n1b.get(b, 0) + 1
        tt = len(big)
        d = Fraction(3, 4)
        vocab_w2 = set(n1b)
        for w1 in ctx:
            total = Fraction(0)
            for w2 in vocab_w2:
                c = big.get((w1, w2), 0)
                disc = Fraction(max(4 * c - 3, 0), 4 * ctx[w1]) if c else Fraction(0)
                backoff = d * n1f[w1] / ctx[w1] * Fraction(n1b[w2], tt)
                total += disc + backoff
            assert total == 1, (w1, total)


class TestContainmentPairs:
    def test_truncation_has_high_containment_low_jaccard(self, spark):
        from musicflow_spark.operators.dedup import containment_pairs, jaccard_pairs

        long = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
                "lam mu nu xi omicron pi rho sigma tau upsilon")
        short = "alpha beta gamma delta epsilon zeta"  # a strict prefix
        df = spark.createDataFrame(
            [(1, long), (2, short), (3, "wholly unrelated text body here")],
            "doc_id long, text string",
        )
        cont = {(r["doc_a"], r["doc_b"]): r
                for r in containment_pairs(df, threshold=0.6, max_df=None).collect()}
        assert (1, 2) in cont
        r = cont[(1, 2)]
        # every shingle of the prefix is in the long doc
        assert r["cont_b"] == 1.0 and r["cont_a"] < 0.5
        # symmetric jaccard at the same bar misses it
        jac = {(q["doc_a"], q["doc_b"])
               for q in jaccard_pairs(df, threshold=0.6, max_df=None).collect()}
        assert (1, 2) not in jac
        assert not any(3 in p for p in cont)

    def test_agrees_with_python_reference(self, spark):
        from musicflow_spark.operators.dedup import containment_pairs

        texts = {
            1: "a b c d e f g",
            2: "c d e f g h",
            3: "a b c",
            4: "z z z q",
        }
        df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")

        def sh3(t):
            w = t.split()
            return {" ".join(w[i:i + 3]) for i in range(max(len(w) - 2, 1))}

        got = {(r["doc_a"], r["doc_b"]): (r["inter_cnt"], r["cont_a"], r["cont_b"])
               for r in containment_pairs(df, threshold=0.5, max_df=None).collect()}
        expect = {}
        ids = sorted(texts)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                sa, sb = sh3(texts[a]), sh3(texts[b])
                inter = len(sa & sb)
                ca, cb = inter / len(sa), inter / len(sb)
                if inter and max(ca, cb) >= 0.5:
                    expect[(a, b)] = (inter, ca, cb)
        assert got == expect


class TestPmiCollocations:
    def test_matches_pure_python_pmi(self, spark, tmp_path):
        import math

        from musicflow_spark.queries.textops import (
            PPL_SCALE,
            corpus_pmi_collocations,
        )

        # 'san francisco' always co-occurs; 'the the' is common noise
        texts = [
            (i, "san francisco is where the the cat lives in san francisco")
            for i in range(6)
        ]
        df = spark.createDataFrame(texts, "doc_id long, text string")
        df.write.parquet(str(tmp_path / "documents.parquet"))
        got = {(r["w1"], r["w2"]): r for r in
               corpus_pmi_collocations(spark, str(tmp_path)).collect()}
        big: dict[tuple, int] = {}
        for _, t in texts:
            w = t.split()
            for bg in zip(w, w[1:]):
                big[bg] = big.get(bg, 0) + 1
        nn = sum(big.values())
        ca: dict[str, int] = {}
        cb: dict[str, int] = {}
        for (a, b), c in big.items():
            ca[a] = ca.get(a, 0) + c
            cb[b] = cb.get(b, 0) + c
        for bg, c in big.items():
            if c < 5:
                assert bg not in got
                continue
            exp = round(math.log(c * nn / (ca[bg[0]] * cb[bg[1]])) * PPL_SCALE)
            assert got[bg]["pmi_micro"] == exp and got[bg]["c2"] == c
        # the fixed collocation outranks the promiscuous pair
        assert got[("san", "francisco")]["rank"] < got[("the", "the")]["rank"]

    def test_topk_and_floor_on_fixture(self, spark):
        from musicflow_spark.queries.textops import (
            PMI_MIN_COUNT,
            PMI_TOP_K,
            corpus_pmi_collocations,
        )

        out = corpus_pmi_collocations(spark, "/root/testdata/sf0.001").collect()
        assert 0 < len(out) <= PMI_TOP_K
        assert all(r["c2"] >= PMI_MIN_COUNT for r in out)
        ranks = sorted(r["rank"] for r in out)
        assert ranks == list(range(1, len(out) + 1))


class TestTrainingSelection:
    def test_every_reason_fires_on_crafted_corpus(self, spark, tmp_path):
        from musicflow_spark.queries.textops import corpus_training_selection

        base = ("the cat sat on the mat and then the dog sat on the mat "
                "while the bird flew over the quiet green garden today")
        rows = [
            (1, base),                                   # kept
            (2, base + " extra tail words here"),        # near_dup of 1 (shorter loses)
            (3, base),                                   # exact dup of 1
            (4, "le chat le chien le jardin le soir"),   # lang: french markers
            (5, " ".join(["the"] * 13)),                 # quality: uniq_frac 1/13
            # English-marked but every bigram unique -> high perplexity
            (6, " ".join(f"the w{i}" for i in range(20))),
        ]
        full = [(i, t, "en", "test", len(t)) for i, t in rows]
        df = spark.createDataFrame(
            full, "doc_id long, text string, lang string, source string, n_chars long"
        )
        df.write.parquet(str(tmp_path / "documents.parquet"))
        got = {r["doc_id"]: r["reason"]
               for r in corpus_training_selection(spark, str(tmp_path)).collect()}
        assert got[4] == "lang"
        assert got[5] == "quality"
        assert got[6] == "perplexity"
        assert got[3] == "exact_dup"
        # doc 2 is LONGER, so it is canonical; doc 1 drops as near_dup
        assert got[2] == "kept"
        assert got[1] == "near_dup"

    def test_reason_and_keep_consistent_on_fixture(self, spark):
        from musicflow_spark.queries.textops import corpus_training_selection

        out = corpus_training_selection(spark, "/root/testdata/sf0.001")
        assert out.filter((F.col("reason") == "kept") != F.col("keep")).count() == 0
        counts = {r["reason"]: r["count"]
                  for r in out.groupBy("reason").count().collect()}
        assert counts.get("kept", 0) > 0 and len(counts) >= 3
