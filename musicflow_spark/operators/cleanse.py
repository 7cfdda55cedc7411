"""Corpus-cleansing operators: PII redaction and repetition-based
quality features — the scrub-and-filter stage that sits between raw
ingestion and training-data selection.

PII redaction is pure regexp_replace chains (JVM-side, codegen, zero
shuffle): patterns are deliberately conservative literal classes (no
backtracking constructs), applied in a fixed order so the output is
deterministic and engine-portable.

Repetition features are the classic Gopher/C4-style signals: a
document dominated by one repeated n-gram is boilerplate.  The
counting shape is explode -> two keyed aggregations with map-side
partial aggregation — linear in corpus size and bounded per-task
memory, unlike per-row array HOFs which go quadratic on a 100k-token
document.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from musicflow_spark.operators.textstats import tokens

#: redaction patterns, applied in insertion order.  Character classes
#: are disjoint enough that order does not change the result (a URL
#: cannot contain '@' or match the phone shape under these classes),
#: but the order is part of the contract anyway.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "url": r"https?://[A-Za-z0-9./_-]+",
}


def redact_pii(
    df: DataFrame,
    text_col: str,
    *,
    out_col: str = "redacted",
    patterns: dict[str, str] = PII_PATTERNS,
) -> DataFrame:
    """Replace every PII match with a ``[KIND]`` token and count the
    matches per kind (``n_<kind>`` columns, counted on the ORIGINAL
    text — counts are independent of redaction order).  One map
    stage; no shuffle, no UDF."""
    out = df
    redacted: Column = F.col(text_col)
    for kind, pat in patterns.items():
        out = out.withColumn(
            f"n_{kind}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))).cast(
                "long"
            ),
        )
        redacted = F.regexp_replace(redacted, pat, f"[{kind.upper()}]")
    return out.withColumn(out_col, redacted)


def erase_keys(
    facts: DataFrame,
    tombstones: DataFrame,
    key: str,
) -> tuple[DataFrame, DataFrame]:
    """Right-to-erasure propagation: drop every fact row belonging to
    a tombstoned key and return ``(kept, audit)`` — the kept frame
    (left-anti join, the one join shape that never widens rows) and a
    per-key audit count of what was erased (the deletion-log evidence
    a compliance pipeline must emit).

    Scale shape: tombstone sets are tiny relative to facts (deleted
    users ≪ all users), so the anti-join broadcasts; the audit is a
    semi-join + keyed count over only the doomed rows.  On a lakehouse
    table the kept frame overwrites via the same tmp-swap as
    compact_table; at 100 TB partition the facts by a key prefix so
    erasure rewrites only affected partitions."""
    t = tombstones.select(key).distinct()
    kept = facts.join(t, key, "left_anti")
    audit = (
        facts.join(t, key, "left_semi")
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_erased"))
    )
    return kept, audit


def digit_ratio(text: Column | str) -> Column:
    """Fraction of characters that are ASCII digits (0.0 for empty)."""
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)
    digits = n - F.length(F.regexp_replace(c, r"[0-9]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(digits / n.cast("double"))


def ngram_strings(text: Column | str, n: int = 2) -> Column:
    """Token n-grams as space-joined strings (non-distinct — the
    repetition signal NEEDS the duplicates), lowercased; documents
    with fewer than n tokens yield an empty array."""
    toks = F.transform(tokens(text), F.lower)
    k = F.size(toks)
    return F.when(k < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), k - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def repetition_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 2,
) -> DataFrame:
    """Gopher-style repetition signals per document:

    - ``n_ngrams``       — total (non-distinct) token n-grams
    - ``n_uniq_ngrams``  — distinct n-grams
    - ``top_ngram_cnt``  — occurrences of the most-repeated n-gram
    - ``top_ngram_frac`` — top_ngram_cnt / n_ngrams (0.0 when none)
    - ``dup_ngram_frac`` — 1 - uniq/total (0.0 when none)

    Shape: explode -> count per (doc, gram) -> per-doc max/sum — both
    aggregations combine map-side, so the shuffle carries one row per
    distinct (doc, gram), then one per doc.  Documents with no n-gram
    (fewer than n tokens) keep a zero row via the final left join —
    at scale that join co-partitions on the id and is dwarfed by the
    explode stage."""
    grams = df.select(
        F.col(id_col), F.explode(ngram_strings(text_col, n)).alias("__g__")
    )
    per_gram = grams.groupBy(id_col, "__g__").agg(F.count(F.lit(1)).alias("__c__"))
    per_doc = per_gram.groupBy(id_col).agg(
        F.sum("__c__").alias("n_ngrams"),
        F.count(F.lit(1)).alias("n_uniq_ngrams"),
        F.max("__c__").alias("top_ngram_cnt"),
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
            F.coalesce("n_uniq_ngrams", F.lit(0)).alias("n_uniq_ngrams"),
            F.coalesce("top_ngram_cnt", F.lit(0)).alias("top_ngram_cnt"),
            F.when(F.col("n_ngrams").isNull(), F.lit(0.0))
            .otherwise(F.col("top_ngram_cnt") / F.col("n_ngrams").cast("double"))
            .alias("top_ngram_frac"),
            F.when(F.col("n_ngrams").isNull(), F.lit(0.0))
            .otherwise(
                1 - F.col("n_uniq_ngrams") / F.col("n_ngrams").cast("double")
            )
            .alias("dup_ngram_frac"),
        )
    )
