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
    validate: bool = True,
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
    The check is one EXTRA aggregate-only pass over the test frame
    (no shuffle, but it does execute the frame's lineage once more);
    pass ``validate=False`` on a hot path whose inputs are already
    contract-proven.
    """
    if not validate:
        return _nb_scores_body(train, test, label_col, tokens_col, id_col)
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
    return _nb_scores_body(train, test, label_col, tokens_col, id_col)


def _nb_scores_body(
    train: DataFrame,
    test: DataFrame,
    label_col: str,
    tokens_col: str,
    id_col: str,
) -> DataFrame:
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


# ------------------------------------------- logistic regression (GD)
#: shared integer micro-unit grid for weights and sigmoid outputs
LR_SCALE = 1_000_000


def _trunc_div(a: int, b: int) -> int:
    """Toward-zero integer division — Spark's ``div`` and DuckDB's
    ``//`` semantics (Python's ``//`` floors, which differs on
    negative gradients)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def logreg_train_gd(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    n_rounds: int = 8,
    lr_den: int = 64,
) -> DataFrame:
    """Binary logistic regression trained by FULL-BATCH gradient
    descent on the integer micro-grid — the one iterative
    gradient-trained model of the supervised tier (VERDICT r06 item
    8: NB/Rocchio/OLS are closed-form; a descent loop certifies the
    training shape a quality-classifier pipeline actually runs).

    Exactness contract (the unrolled-round oracle replays all of it):

    - features are INTEGER columns, weights live in micro-units
      (int64, LR_SCALE); the logit ``z = (w . x) / 1e6`` is one
      BIGINT dot product divided once into double — identical on
      both engines;
    - the sigmoid is the only transcendental: its output is rounded
      to the micro grid ``s = round(1e6 / (1 + exp(-z)))`` BEFORE any
      aggregation, the same 1-ulp-tolerant discipline as the
      micro-nat ``ln`` in doc_perplexity_filter / PMI.  UNLIKE the
      ln queries, the rounded value feeds back into the integer
      weight state each round, so a 1-ulp JVM-vs-DuckDB libm
      difference landing exactly on a .5 micro-unit boundary would
      be AMPLIFIED through every subsequent round rather than
      tolerated at the output — callers pinning a hash oracle should
      keep a boundary canary on their fixture corpus (see
      tests/test_classify.py::test_logreg_sigmoid_boundary_canary);
    - the gradient is then EXACT integer arithmetic:
      ``g_j = sum((s_i - y_i*1e6) * x_ij)`` in int64, and the update
      ``w_j -= g_j div (n * lr_den)`` (learning rate 1/lr_den)
      truncates toward zero on both engines;
    - rounds are fixed at ``n_rounds`` — no data-dependent stopping.

    The per-round driver step collects ONE (d+1)-value gradient row
    (the bounded-collect contract of kmeans seeds / MMR: O(d), never
    data) so the logit stays a literal expression under codegen; the
    feature frame is localCheckpointed once and re-scanned per round.

    Scale shape per round: one map stage (logit + sigmoid) + one
    map-side-combinable scalar aggregate over d+2 sums.  At 100 TB:
    |g_j| <= n * 1e6 * max|x| must stay inside int64 — the CALLER is
    responsible for clamping features (doc_quality_logreg clamps to
    |x| <= 32, which holds to ~9e9 rows); an unclamped long feature
    would wrap Spark's non-ANSI long sum silently while the DuckDB
    HUGEINT path errors.  Past the bound, aggregate the gradient as
    DECIMAL(38,0).

    Returns ONE row: n, n_correct (training accuracy of the final
    weights, prediction = z >= 0), and the final micro-unit weights
    w0..w{d-1} in feature_cols order."""
    feats, w = logreg_train_weights(
        df, feature_cols, label_col, n_rounds, lr_den
    )
    d = len(feature_cols)
    z_int = sum(
        (F.col(c) * F.lit(w[j]) for j, c in enumerate(feature_cols)),
        F.lit(0).cast("long"),
    )
    pred = (z_int >= 0).cast("long")
    out = feats.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((pred == F.col("__y__")).cast("long")).alias("n_correct"),
    )
    for j in range(d):
        out = out.withColumn(f"w{j}", F.lit(int(w[j])).cast("long"))
    return out


def logreg_train_weights(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    n_rounds: int = 8,
    lr_den: int = 64,
) -> tuple[DataFrame, list[int]]:
    """:func:`logreg_train_gd`'s training loop alone — returns the
    checkpointed integer feature frame (feature cols + ``__y__``)
    and the final micro-unit weights, for callers that score per-row
    outputs with the trained model (calibration, thresholding)
    instead of the one-row accuracy summary."""
    if n_rounds < 1:
        raise ValueError(f"n_rounds must be >= 1, got {n_rounds}")
    if lr_den < 1:
        raise ValueError(f"lr_den must be >= 1, got {lr_den}")
    feats = df.select(
        *[F.col(c).cast("long").alias(c) for c in feature_cols],
        F.col(label_col).cast("long").alias("__y__"),
    ).localCheckpoint(eager=True)
    d = len(feature_cols)
    w = [0] * d
    for _ in range(n_rounds):
        z_int = sum(
            (F.col(c) * F.lit(w[j]) for j, c in enumerate(feature_cols)),
            F.lit(0).cast("long"),
        )
        zd = z_int.cast("double") / F.lit(float(LR_SCALE))
        s = F.round(F.lit(float(LR_SCALE)) / (F.lit(1.0) + F.exp(-zd)), 0).cast(
            "long"
        )
        err = s - F.col("__y__") * F.lit(LR_SCALE)
        grad = feats.agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(err * F.col(c)).alias(f"g{j}")
                for j, c in enumerate(feature_cols)
            ],
        ).collect()[0]
        n = grad["n"]
        if n == 0:
            # an empty frame would otherwise fail opaquely inside
            # _trunc_div (g_j is NULL); mirror the n_rounds/lr_den
            # validation with a clear contract error instead
            raise ValueError("empty training frame")
        w = [w[j] - _trunc_div(grad[f"g{j}"], n * lr_den) for j in range(d)]
    return feats, w


def logreg_cte_parts(
    feats_sql: str,
    feature_exprs: list[str],
    n_rounds: int = 8,
    lr_den: int = 64,
) -> list[str]:
    """The unrolled training CTE chain of :func:`logreg_oracle_sql`
    up to the final weight row ``w{n_rounds}`` — composable by any
    oracle that scores rows with the trained model (calibration)."""
    d = len(feature_exprs)
    s = LR_SCALE
    zeros = ", ".join(f"CAST(0 AS BIGINT) AS w{j}" for j in range(d))
    ctes = [
        f"feats AS MATERIALIZED ({feats_sql})",
        f"w0 AS MATERIALIZED (SELECT {zeros})",
    ]
    dot = " + ".join(f"w.w{j} * f.{c}" for j, c in enumerate(feature_exprs))
    for k in range(n_rounds):
        ctes.append(f"""s{k} AS MATERIALIZED (
  SELECT f.*, cast(round({s}.0 / (1.0 + exp(-(({dot}) / {s}.0)))) AS bigint) AS sg
  FROM feats f, w{k} w)""")
        gsums = ", ".join(
            f"cast(sum((sg - __y__ * {s}) * {c}) AS bigint) AS g{j}"
            for j, c in enumerate(feature_exprs)
        )
        ctes.append(
            f"g{k} AS MATERIALIZED (SELECT count(*) AS n, {gsums} FROM s{k})"
        )
        wnew = ", ".join(
            f"w.w{j} - g.g{j} // (g.n * {lr_den}) AS w{j}" for j in range(d)
        )
        ctes.append(
            f"w{k + 1} AS MATERIALIZED (SELECT {wnew} FROM w{k} w, g{k} g)"
        )
    return ctes


def logreg_oracle_sql(
    feats_sql: str,
    feature_exprs: list[str],
    n_rounds: int = 8,
    lr_den: int = 64,
) -> str:
    """Unrolled-round DuckDB replay of :func:`logreg_train_gd`:
    ``feats_sql`` must yield the SAME integer feature columns
    (``feature_exprs`` names them) plus ``__y__``; each round k
    materializes the sigmoid frame, the 1-row gradient, and the next
    weight row — the kmeans_oracle_sql pattern."""
    d = len(feature_exprs)
    ctes = logreg_cte_parts(feats_sql, feature_exprs, n_rounds, lr_den)
    final_dot = " + ".join(
        f"w.w{j} * f.{c}" for j, c in enumerate(feature_exprs)
    )
    wcols = ", ".join(f"w.w{j}" for j in range(d))
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT count(*) AS n,
       cast(sum(CASE WHEN (CASE WHEN ({final_dot}) >= 0 THEN 1 ELSE 0 END) = f.__y__
                THEN 1 ELSE 0 END) AS bigint) AS n_correct,
       {wcols}
FROM feats f, w{n_rounds} w
GROUP BY {wcols}
"""
    )


# ----------------------------------------------- AdaBoost (stumps)
#: total integer weight mass the per-round renormalization targets;
#: truncation lets the realized total transiently reach ~2x this, and
#: the int64-headroom argument below budgets for that overshoot
ADA_TOTAL = 10**9


def adaboost_train_stumps(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    n_rounds: int = 6,
    thresholds: tuple[int, ...] = (-4, -2, 0, 2, 4),
) -> DataFrame:
    """Discrete AdaBoost over decision stumps on the integer grid —
    the BOOSTING training loop of the supervised tier (NB/Rocchio/OLS
    are closed-form, logreg certifies gradient descent, kmeans
    certifies Lloyd, BPE/unigram certify merge/prune training; this
    certifies the round-coupled reweighting loop), and the one
    trained loop with NO transcendental anywhere: the classic
    ``alpha = ln((1-e)/e)/2`` weight update is replaced by the exact
    rational equivalent — misclassified weights scale by W_cor,
    correct ones by W_mis, then renormalize to ~ADA_TOTAL by
    truncated division — which preserves AdaBoost's defining
    invariant (after the update, the chosen stump's weighted error is
    exactly 1/2 up to truncation) in pure int64 arithmetic both
    engines replay bit-identically.

    Per round: ONE scalar aggregate computes every stump candidate's
    weighted misclassification mass (|features| x |thresholds| x 2
    conditional sums — the logreg-gradient O(d) collect contract,
    rows never leave the executors); the winner (w_mis asc, then
    feature/threshold/polarity asc) becomes plan literals for the
    weight-update map stage; localCheckpoint flattens lineage.

    int64 headroom: the truncated renormalizer keeps the total only
    APPROXIMATELY at ADA_TOTAL — when U = floor(2*W_mis*W_cor /
    ADA_TOTAL) sits just above an integer multiple of ADA_TOTAL the
    post-round total can transiently reach ~2*ADA_TOTAL — so the
    bound that actually holds is w_i <= total <= 2*ADA_TOTAL (2e9)
    and W_mis, W_cor <= 2*ADA_TOTAL, giving update products
    w_i * W_side <= 4*ADA_TOTAL^2 = 4e18 < 2^63 (~9.2e18); the
    normalizer U = 2 * W_mis * W_cor / ADA_TOTAL stays <= 2e9;
    U >= 2 * (ADA_TOTAL - n) whenever 1 <= W_mis <= W - 1, so
    ``U div ADA_TOTAL >= 1`` and the truncated renormalizer never
    divides by zero.  Degenerate rounds (a stump with zero weighted
    error, or none better than trivial) raise ValueError rather than
    silently emitting an undefined update.

    Returns one row per round: (round, feature, threshold, polarity,
    w_mis, w_total) — all exact int64, no floats at all."""
    if n_rounds < 1:
        raise ValueError(f"n_rounds must be >= 1, got {n_rounds}")
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    d = len(feature_cols)
    cands = [
        (j, t, p)
        for j in range(d)
        for t in thresholds
        for p in (1, -1)
    ]
    n_row = df.count()
    if n_row == 0:
        raise ValueError("empty training frame")
    w0 = ADA_TOTAL // n_row
    if w0 < 1:
        raise ValueError(
            f"training frame too large for ADA_TOTAL grid ({n_row} rows)"
        )
    feats = df.select(
        *[F.col(c).cast("long").alias(f"x{j}") for j, c in enumerate(feature_cols)],
        (F.col(label_col).cast("long") * 2 - 1).alias("ypm"),
        F.lit(w0).cast("long").alias("w"),
    ).localCheckpoint(eager=True)

    def mis(j: int, t: int, p: int):
        h = F.when(F.col(f"x{j}") >= F.lit(t), F.lit(p)).otherwise(F.lit(-p))
        return h != F.col("ypm")

    rounds = []
    for r in range(n_rounds):
        agg = feats.agg(
            F.sum("w").alias("wt"),
            *[
                F.sum(F.when(mis(j, t, p), F.col("w")).otherwise(F.lit(0))).alias(
                    f"m_{i}"
                )
                for i, (j, t, p) in enumerate(cands)
            ],
        ).collect()[0]
        wt = agg["wt"]
        best_i = min(
            range(len(cands)), key=lambda i: (agg[f"m_{i}"], cands[i])
        )
        j, t, p = cands[best_i]
        w_mis = agg[f"m_{best_i}"]
        if w_mis == 0 or w_mis >= wt - w_mis:
            raise ValueError(
                f"degenerate stump round {r}: w_mis={w_mis}, total={wt}"
            )
        w_cor = wt - w_mis
        u_div = (2 * w_mis * w_cor) // ADA_TOTAL
        rounds.append((r, j, t, p, int(w_mis), int(wt)))
        feats = feats.withColumn(
            "w",
            F.expr(
                f"(w * CASE WHEN (CASE WHEN x{j} >= {t} THEN {p} ELSE {-p} END)"
                f" <> ypm THEN {w_cor} ELSE {w_mis} END) div {u_div}"
            ).cast("long"),
        ).localCheckpoint(eager=True)
    spark = df.sparkSession
    return spark.createDataFrame(
        rounds,
        "round int, feature int, threshold int, polarity int, "
        "w_mis long, w_total long",
    )


def adaboost_oracle_sql(
    feats_sql: str,
    feature_exprs: list[str],
    n_rounds: int = 6,
    thresholds: tuple[int, ...] = (-4, -2, 0, 2, 4),
) -> str:
    """Unrolled-round DuckDB replay of :func:`adaboost_train_stumps`:
    ``feats_sql`` must yield the integer feature columns named by
    ``feature_exprs`` plus ``__y__``; each round k materializes the
    candidate-error table (weights x a VALUES candidate grid), the
    1-row winner, and the renormalized weight frame."""
    d = len(feature_exprs)
    cand_rows = ", ".join(
        f"({j}, {t}, {p})"
        for j in range(d)
        for t in thresholds
        for p in (1, -1)
    )
    xsel = ", ".join(f"{c} AS x{j}" for j, c in enumerate(feature_exprs))
    pick = "CASE c.j " + " ".join(f"WHEN {j} THEN x{j}" for j in range(d)) + " END"
    pick_w = (
        "CASE t.j " + " ".join(f"WHEN {j} THEN x{j}" for j in range(d)) + " END"
    )
    ctes = [
        f"afeats AS MATERIALIZED (SELECT {xsel}, __y__ * 2 - 1 AS ypm "
        f"FROM ({feats_sql}))",
        "acand AS MATERIALIZED (SELECT * FROM (VALUES "
        + cand_rows
        + ") AS c(j, t, p))",
        "an AS MATERIALIZED (SELECT count(*) AS n FROM afeats)",
        f"aw0 AS MATERIALIZED (SELECT afeats.*, "
        f"cast({ADA_TOTAL} // an.n AS bigint) AS w FROM afeats, an)",
    ]
    for k in range(n_rounds):
        ctes.append(f"""ae{k} AS MATERIALIZED (
  SELECT c.j AS j, c.t AS t, c.p AS p,
         cast(sum(CASE WHEN (CASE WHEN ({pick}) >= c.t THEN c.p ELSE -c.p END)
                       <> ypm THEN w ELSE 0 END) AS bigint) AS w_mis
  FROM aw{k}, acand c GROUP BY 1, 2, 3)""")
        ctes.append(f"""awt{k} AS MATERIALIZED (
  SELECT cast(sum(w) AS bigint) AS wt FROM aw{k})""")
        ctes.append(f"""at{k} AS MATERIALIZED (
  SELECT {k} AS round, e.j AS j, e.t AS t, e.p AS p, e.w_mis AS w_mis,
         awt{k}.wt AS w_total
  FROM ae{k} e, awt{k}
  ORDER BY e.w_mis, e.j, e.t, e.p LIMIT 1)""")
        ctes.append(f"""aw{k + 1} AS MATERIALIZED (
  SELECT aw.* REPLACE (cast(
    (aw.w * CASE WHEN (CASE WHEN ({pick_w}) >= t.t THEN t.p ELSE -t.p END)
                 <> aw.ypm
            THEN t.w_total - t.w_mis ELSE t.w_mis END)
    // ((2 * t.w_mis * (t.w_total - t.w_mis)) // {ADA_TOTAL})
    AS bigint) AS w)
  FROM aw{k} aw, at{k} t)""")
    union = "\nUNION ALL\n".join(
        f"SELECT round, j AS feature, t AS threshold, p AS polarity, "
        f"w_mis, w_total FROM at{k}"
        for k in range(n_rounds)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + union
