"""Trained text classification as a pure DataFrame plan.

The reference pipeline has no learned models, but a training-data
engine needs at least one in-engine classifier (fastText-style quality
and language routers are the standard pretraining gate).  This module
implements multinomial naive Bayes — train and apply — as two
aggregations and one equi-join, with every log-probability rounded to
INTEGER micro-nats before summation so the scores are bit-identical
across engines and executor orderings.

Scale shape: the (word, class) count table is one shuffle over train
tokens; class totals and vocabulary size are tiny re-aggregations of
it; scoring joins test-token occurrences to the count table on the
word key (never materializing test x vocab), and the per-(doc, class)
sum is map-side combinable.  Classes ride a broadcast; the only wide
exchange is keyed by word and then by (doc_id, class).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NB_SCALE = 1_000_000  # shared integer micro-nat grid


def naive_bayes_scores(
    train: DataFrame,
    test: DataFrame,
    label_col: str,
    tokens_col: str = "tk",
    id_col: str = "doc_id",
) -> DataFrame:
    """Multinomial naive Bayes with add-1 (Laplace) smoothing.

    ``train`` carries (id, label, token array); ``test`` carries
    (id, token array).  Returns one row per (test id, class) with the
    integer micro-nat score

        score = round(ln(docs_c / docs) * 1e6)
              + sum_w round(ln((C(w,c) + 1) / (C(c) + V)) * 1e6)

    where C(w,c) counts token occurrences of ``w`` in class ``c``'s
    training docs, C(c) the class's total tokens, and V the training
    vocabulary size.  Out-of-vocabulary test tokens contribute the
    smoothed floor ln(1 / (C(c) + V)) — they are NOT dropped, which
    matters: OOV mass is exactly what separates languages.  Each ln()
    is rounded to int64 micro-nats first and the document sum is exact
    integer addition, so scores (and the downstream argmax) cannot
    drift with aggregation order or engine ulps.

    A test doc with an empty token array still scores (prior only):
    the occurrence sum arrives through a left join with a 0 default.
    A class trained ONLY on empty docs still gets a denominator row
    (C(c) = 0 via a left join from the class table — deriving
    denominators from the word-count table would silently drop the
    class's token terms); a fully token-free training corpus takes
    vocabulary size max(V, 1) so the floor stays finite — the one
    degenerate case add-1 smoothing leaves undefined.

    Input contract (ADVICE r06 — asserted below, not just assumed):
    ``test`` ids must be UNIQUE (a duplicated id would double-count
    through the final prior cross join) and ``test`` token arrays
    must be NON-NULL (explode drops a NULL array's rows but the cross
    join would still emit prior-only scores, silently conflating NULL
    with empty — callers must decide, e.g. coalesce to array()).
    Both are cheap metadata-level checks: one aggregate over the test
    frame, no extra shuffle of the data path.
    """
    bad = test.agg(
        (F.count(F.lit(1)) - F.count_distinct(F.col(id_col))).alias("dups"),
        (F.count(F.lit(1)) - F.count(tokens_col)).alias("nulls"),
    ).collect()[0]
    if bad["dups"]:
        raise ValueError(
            f"naive_bayes_scores: {bad['dups']} duplicate test {id_col} values"
            " (scores would double-count through the prior cross join)"
        )
    if bad["nulls"]:
        raise ValueError(
            f"naive_bayes_scores: {bad['nulls']} NULL {tokens_col} arrays in"
            " test (coalesce to array() to score them as empty docs)"
        )
    classes = train.groupBy(F.col(label_col).alias("cls")).agg(
        F.count(F.lit(1)).alias("docs_c")
    )
    occ_train = train.select(
        F.col(label_col).alias("cls"), F.explode(tokens_col).alias("w")
    )
    wc = occ_train.groupBy("cls", "w").agg(F.count(F.lit(1)).alias("c_wc"))
    ctot = wc.groupBy("cls").agg(F.sum("c_wc").alias("c_c"))
    vocab = wc.select("w").distinct().agg(
        F.greatest(F.count(F.lit(1)), F.lit(1)).alias("vsz")
    )
    ndocs = train.agg(F.count(F.lit(1)).alias("docs"))

    prior = (
        classes.crossJoin(F.broadcast(ndocs))
        .select(
            "cls",
            F.round(F.log(F.col("docs_c") / F.col("docs")) * NB_SCALE)
            .cast("long")
            .alias("prior_micro"),
        )
    )
    # Per-class smoothing denominator + the OOV floor term, one row
    # per class (from the CLASS table, not the word counts, so
    # zero-token classes keep their row) — broadcast to the scoring
    # join.
    denom = (
        classes.join(ctot, "cls", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "cls",
            (F.coalesce("c_c", F.lit(0)) + F.col("vsz")).alias("den"),
            F.round(
                F.log(1.0 / (F.coalesce("c_c", F.lit(0)) + F.col("vsz")))
                * NB_SCALE
            )
            .cast("long")
            .alias("oov_micro"),
        )
    )

    occ_test = test.select(id_col, F.explode(tokens_col).alias("w"))
    # Every occurrence scores against every class (|classes| is small
    # and broadcast); seen words look up C(w,c), unseen take the floor.
    scored = (
        occ_test.crossJoin(F.broadcast(denom))
        .join(wc, ["cls", "w"], "left")
        .select(
            id_col,
            "cls",
            F.when(
                F.col("c_wc").isNotNull(),
                F.round(
                    F.log((F.col("c_wc") + F.lit(1.0)) / F.col("den")) * NB_SCALE
                ).cast("long"),
            )
            .otherwise(F.col("oov_micro"))
            .alias("lp"),
        )
    )
    sums = scored.groupBy(id_col, "cls").agg(F.sum("lp").alias("sum_lp"))
    return (
        test.select(id_col)
        .crossJoin(F.broadcast(prior))
        .join(sums, [id_col, "cls"], "left")
        .select(
            id_col,
            "cls",
            (F.col("prior_micro") + F.coalesce(F.col("sum_lp"), F.lit(0))).alias(
                "score_micro"
            ),
        )
    )


def naive_bayes_predict(
    scores: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Argmax over the per-class integer scores with a deterministic
    tiebreak (highest score, then lexicographically smallest class)."""
    w = Window.partitionBy(id_col).orderBy(F.desc("score_micro"), F.asc("cls"))
    return (
        scores.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(id_col, F.col("cls").alias("pred"), "score_micro")
    )
