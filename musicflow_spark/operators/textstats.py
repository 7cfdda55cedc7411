"""Text-analysis operators for training-data pipelines: tokenization,
quality scoring, language-ID heuristics, document fingerprinting.

All expressions are native (split / higher-order functions / md5), so
they run JVM-side under codegen and scale linearly — the design goal
is a 100 TB documents table where every operator is a single
narrow-dependency map stage (zero shuffles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: tiny per-language marker-word sets for the n-gram/stopword
#: language-ID heuristic.  Deliberately small and deterministic; a
#: production system would load real frequency tables.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "die"),
    "fr": ("le", "et", "les"),
    "es": ("el", "y", "los"),
    "zh": ("de", "shi", "le"),
}

STOPWORDS: tuple[str, ...] = ("the", "a", "and", "of", "to", "in")


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization; empty input -> empty array (split of
    an empty string yields [''], which we filter)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    """Fraction of tokens that are stopwords (0.0 for empty docs)."""
    toks = tokens(text)
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return F.when(n == 0, F.lit(0.0)).otherwise(hits / n.cast("double"))


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are punctuation."""
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)
    stripped = F.length(F.regexp_replace(c, r"[.,!?;:'\"()\[\]{}-]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise((n - stripped) / n.cast("double"))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the standard quality-scoring feature columns.  The
    composite score is a simple monotone blend — the point is the
    feature plumbing, which is what a filtering pipeline tunes."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    avg_tok_len = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double")
        / n_tok
    )
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("n_uniq_tokens", F.size(F.array_distinct(toks)))
        .withColumn("avg_token_len", avg_tok_len)
        .withColumn("stopword_frac", stopword_ratio(text_col))
        .withColumn("punct_frac", punct_ratio(text_col))
        .withColumn(
            "uniq_frac",
            F.when(n_tok == 0, F.lit(0.0)).otherwise(
                F.size(F.array_distinct(toks)) / n_tok.cast("double")
            ),
        )
    )


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Marker-word hit counts per language (lowercased tokens)."""
    toks = F.transform(tokens(text), F.lower)
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column | str) -> Column:
    """Argmax language with deterministic tie-break (alphabetical
    language code wins ties); 'und' when no marker hits at all."""
    scores = lang_scores(text)
    langs = sorted(scores)
    best = scores[langs[0]]
    for lang in langs[1:]:
        best = F.greatest(best, scores[lang])
    out = F.lit("und")
    # walk languages in REVERSE alphabetical order so that when ties
    # occur the alphabetically-first language ends up winning
    for lang in reversed(langs):
        out = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def tfidf_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF —
    keyword extraction for corpus exploration / topic sampling.

    ``score = tf * ln((N + 1) / (df + 1))`` with N a 1-row broadcast
    scalar and df the per-term document frequency.  Shape: explode ->
    tf aggregation on (doc, term) -> df aggregation on term -> join
    back on term -> per-doc top-k window.  Every aggregation combines
    map-side; the (doc, term) and term shuffles are the explode's
    natural keys; the window partitions by doc.  The df table is
    vocabulary-sized — if the vocabulary fits an executor, hint it
    broadcast; here it flows through the term-keyed shuffle join,
    which is the safe default at 100 TB vocabularies.

    Rank ties break by term (then deterministic); documents with no
    tokens yield no rows (nothing to rank)."""
    terms = df.select(
        F.col(id_col), F.explode(F.transform(tokens(text_col), F.lower)).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf") * F.log((F.col("n_docs") + 1) / (F.col("df") + 1)),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "score", "rank")
    )


def normalize_for_fingerprint(text: Column | str) -> Column:
    """Canonical form for exact-dup detection: lowercase, strip
    non-alphanumerics to single spaces, trim."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(c), r"[^a-z0-9]+", " "))


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalize_for_fingerprint(text))
