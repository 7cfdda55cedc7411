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
def _python_logreg(rows, d, n_rounds, lr_den, scale=1_000_000, boundary_gap=None):
    """Pure-python replica of logreg_train_gd's integer arithmetic.

    Rounding must match Spark's F.round on doubles, which is HALF_UP
    (half-away-from-zero) — Python round() is banker's rounding and
    would diverge on an exact .5 micro boundary.  The sigmoid output
    is always positive, so floor(x + 0.5) IS half-up here.

    boundary_gap, if given, is a list the replica appends each
    sigmoid's distance to the nearest .5 micro-unit boundary to —
    the canary input for test_logreg_sigmoid_boundary_canary."""
    import math

    from musicflow_spark.operators.classify import _trunc_div

    w = [0] * d
    n = len(rows)
    for _ in range(n_rounds):
        g = [0] * d
        for r in rows:
            z = sum(w[j] * r[j] for j in range(d)) / scale
            sval = scale / (1.0 + math.exp(-z))
            if boundary_gap is not None:
                boundary_gap.append(abs(sval - math.floor(sval) - 0.5))
            s = int(math.floor(sval + 0.5))
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
    empty = df.filter("x0 > 1")
    with pytest.raises(ValueError, match="empty training frame"):
        logreg_train_gd(empty, ["x0"], "y", 2)


def test_logreg_sigmoid_boundary_canary(spark, sf_dir):
    """ADVICE r07: the sigmoid is the only transcendental in the
    logreg hash replay, and its micro-grid rounding feeds back into
    the integer weight state for 8 rounds — a 1-ulp JVM-vs-DuckDB
    libm difference landing exactly on a .5 micro-unit boundary
    would diverge every subsequent round.  Canary: on the fixture
    corpus doc_quality_logreg trains over, no per-round sigmoid
    value may sit within 1e-9 of a boundary."""
    from pyspark.sql import functions as F

    from musicflow_spark.queries.textops import (
        LOGREG_LR_DEN,
        LOGREG_ROUNDS,
        tokens,
    )
    from musicflow_spark.sources.catalog import read_table

    docs = read_table(spark, sf_dir, "documents")
    tk = tokens("text")
    nt, nu = F.size(tk), F.size(F.array_distinct(tk))

    def clamp(c):
        return F.greatest(F.least(c, F.lit(32)), F.lit(-32))

    rows = [
        tuple(r)
        for r in docs.select(
            F.lit(1),
            clamp((nt / 8).cast("long") - 7),
            clamp(nu.cast("long") - 25),
            clamp((nt % 13).cast("long") - 6),
            (nu >= 25).cast("long"),
        ).collect()
    ]
    gaps: list[float] = []
    _python_logreg(rows, 4, LOGREG_ROUNDS, LOGREG_LR_DEN, boundary_gap=gaps)
    assert gaps, "fixture corpus produced no sigmoid evaluations"
    assert min(gaps) > 1e-9, min(gaps)


# ------------------------------------------------- AdaBoost (stumps)
def _python_adaboost(rows, d, n_rounds, thresholds=(-4, -2, 0, 2, 4)):
    """Pure-python replica of adaboost_train_stumps' exact integer
    arithmetic (rational reweighting + truncated-division
    renormalize; no transcendental to replicate at all)."""
    from musicflow_spark.operators.classify import ADA_TOTAL

    cands = [
        (j, t, p) for j in range(d) for t in thresholds for p in (1, -1)
    ]
    data = [([r[j] for j in range(d)], 2 * r[d] - 1) for r in rows]
    n = len(data)
    w = [ADA_TOTAL // n] * n
    out = []
    for r in range(n_rounds):
        wt = sum(w)
        errs = {
            c: sum(
                wi
                for (x, ypm), wi in zip(data, w)
                if (c[2] if x[c[0]] >= c[1] else -c[2]) != ypm
            )
            for c in cands
        }
        best = min(cands, key=lambda c: (errs[c], c))
        m = errs[best]
        j, t, p = best
        assert 0 < m < wt - m
        out.append((r, j, t, p, m, wt))
        wc = wt - m
        ud = (2 * m * wc) // ADA_TOTAL
        w = [
            (wi * (wc if ((p if x[j] >= t else -p) != ypm) else m)) // ud
            for (x, ypm), wi in zip(data, w)
        ]
    return out


def test_adaboost_matches_python_reference(spark):
    from musicflow_spark.operators.classify import adaboost_train_stumps

    rows = [
        (x1, x2, (x1 * 5 + x2 * 3) % 7 - 3, 1 if (x1 > 2) or (x2 > 3) else 0)
        for x1 in range(-6, 7)
        for x2 in range(-6, 7)
    ]
    df = spark.createDataFrame(rows, "x0 long, x1 long, x2 long, y long")
    got = [
        tuple(r)
        for r in adaboost_train_stumps(df, ["x0", "x1", "x2"], "y", 5)
        .orderBy("round")
        .collect()
    ]
    want = _python_adaboost(rows, 3, 5)
    assert got == want


def test_adaboost_rounds_interact(spark):
    # the winning stump must change across rounds (reweighting works)
    from musicflow_spark.operators.classify import adaboost_train_stumps

    rows = [
        (x1, x2, 0, 1 if (x1 > 0) or (x2 > 2) else 0)
        for x1 in range(-6, 7)
        for x2 in range(-6, 7)
    ]
    df = spark.createDataFrame(rows, "x0 long, x1 long, x2 long, y long")
    out = adaboost_train_stumps(df, ["x0", "x1", "x2"], "y", 3).collect()
    stumps = {(r["feature"], r["threshold"], r["polarity"]) for r in out}
    assert len(stumps) >= 2


def test_adaboost_validation(spark):
    from musicflow_spark.operators.classify import adaboost_train_stumps

    df = spark.createDataFrame([(1, 1)], "x0 long, y long")
    with pytest.raises(ValueError, match="n_rounds"):
        adaboost_train_stumps(df, ["x0"], "y", 0)
    empty = df.filter("x0 > 99")
    with pytest.raises(ValueError, match="empty training frame"):
        adaboost_train_stumps(empty, ["x0"], "y", 2)
    # a perfectly separable frame makes round 0 degenerate (w_mis = 0)
    sep = spark.createDataFrame(
        [(-5, 0), (5, 1), (-4, 0), (4, 1)], "x0 long, y long"
    )
    with pytest.raises(ValueError, match="degenerate stump round"):
        adaboost_train_stumps(sep, ["x0"], "y", 2)
