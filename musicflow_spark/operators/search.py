"""Full-text retrieval: BM25 ranking over an inverted postings index.

The search surface a training-data / RAG pipeline runs next to its
ANN tier (ext beyond the reference — its catalog probe,
``matching/candidates.py``, is a first-token inverted-index lookup;
BM25 is the general-purpose ranked form of the same structure).

Portability contract (the shared integer-grid discipline of
queries/textops.py::doc_perplexity_filter / corpus_pmi_collocations):
with Robertson parameters k1 = 6/5 and b = 3/4 every per-term score

    idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

is evaluated as ONE integer division.  The document-length ratio is
pre-quantized to milli-units, r_milli = (1000*dl*N) div L  (dl, N, L
all exact int64), which makes the denominator

    tf + (6/5)*(1/4 + (3/4)*(r_milli/1000))
      = (10000*tf + 3000 + 9*r_milli) / 10000

and the numerator tf*(11/5) = 22000*tf / 10000, so

    contrib_micro = (idf_micro * 22000 * tf) div (10000*tf + 3000 + 9*r_milli)

where idf_micro = round(ln((N - df + 1/2)/(df + 1/2) + 1) * 1e6) is
the BM25+-floored RSJ idf on the micro-nat grid (one ln() per
DISTINCT df — same documented ulp hazard as the perplexity LM).
Document scores are exact int64 sums of contrib_micro, so the top-k
ordering is bit-replayable by any engine.

Overflow: idf_micro <= ln(2N+1)*1e6 (< 4e7 even at 1e9 docs),
tf <= dl, so the numerator is bounded by 4e7 * 22000 * dl; safe for
documents up to ~1e7 tokens.

Scale shape (100 TB): postings and df are one shuffle each on their
natural keys; N and L are a single 1-row broadcast; query terms are
a broadcast probe into the postings equi-join (the inverted-index
lookup — only postings of queried terms flow into scoring); the
final per-query top-k is a window over query-sized groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from musicflow_spark.operators.textstats import tokens

#: micro-nat grid shared with the PMI / perplexity queries
IDF_SCALE = 1_000_000


def _toks(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.transform(tokens(F.col(text_col)), lambda t: F.lower(t)).alias("tk"),
    )


def postings_index(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, term, tf, dl) postings — the inverted index. One
    explode + one keyed count; dl rides the grouping key so no second
    join against a doc-length table is needed."""
    t = _toks(docs, id_col, text_col)
    return (
        t.select("doc_id", F.size("tk").alias("dl"), F.explode("tk").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Ranked retrieval: for each (query_id, term) row in ``queries``,
    score every document containing >= 1 query term by integer-grid
    BM25 and keep the top ``k`` per query (ties to the lower doc_id).

    Returns (query_id, doc_id, n_hit_terms, score_micro, rank).
    """
    post = postings_index(docs, id_col, text_col)
    dfreq = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    corpus = post.groupBy().agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("tf").alias("l_tot"),
    )
    scored = (
        queries.join(post, "term")
        .join(dfreq, "term")
        .crossJoin(F.broadcast(corpus))
        .withColumn("r_milli", F.expr("(1000 * dl * n_docs) div l_tot"))
        .withColumn(
            "idf_micro",
            F.round(
                F.log(
                    (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                    + F.lit(1.0)
                )
                * IDF_SCALE
            ).cast("long"),
        )
        .withColumn(
            "contrib_micro",
            F.expr("(idf_micro * 22000 * tf) div (10000 * tf + 3000 + 9 * r_milli)"),
        )
        .groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hit_terms"),
            F.sum("contrib_micro").alias("score_micro"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score_micro"), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "n_hit_terms", "score_micro", "rank")
    )


def bm25_oracle_sql(
    table: str,
    queries_cte: str,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB replay of ``bm25_topk``.  ``queries_cte`` must be a
    SELECT producing (query_id, term) — it is inlined as the
    ``qterms`` CTE so query derivation and scoring replay in one
    statement."""
    return rf"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         list_transform(list_filter(string_split_regex(trim({text_col}), '\s+'), x -> x <> ''),
                        x -> lower(x)) AS tk
  FROM {table}),
post AS (
  SELECT doc_id, dl, term, count(*) AS tf
  FROM (SELECT doc_id, len(tk) AS dl, unnest(tk) AS term FROM toks)
  GROUP BY doc_id, dl, term),
dfreq AS (SELECT term, count(*) AS df FROM post GROUP BY term),
corpus AS (SELECT count(DISTINCT doc_id) AS n_docs,
                  CAST(sum(tf) AS BIGINT) AS l_tot FROM post),
qterms AS ({queries_cte}),
occ AS (
  SELECT q.query_id, p.doc_id,
         CAST(round(ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1) * {IDF_SCALE}) AS BIGINT)
           AS idf_micro,
         p.tf,
         (1000 * p.dl * c.n_docs) // l_tot AS r_milli
  FROM qterms q
  JOIN post p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  CROSS JOIN corpus c),
scored AS (
  SELECT query_id, doc_id,
         count(*) AS n_hit_terms,
         CAST(sum((idf_micro * 22000 * tf) // (10000 * tf + 3000 + 9 * r_milli))
              AS BIGINT) AS score_micro
  FROM occ GROUP BY query_id, doc_id)
SELECT query_id, doc_id, n_hit_terms, score_micro, rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY score_micro DESC, doc_id) AS rank
      FROM scored)
WHERE rank <= {k}
"""
