"""Corpus-cleansing queries (ext): PII redaction and repetition-based
quality signals (operators/cleanse.py).

The PII query synthesizes contact-bearing text from the customer table
(emails always, phones on even keys, URLs on keys divisible by 3) so
the redaction counts are deterministic and non-trivial; the oracle
rebuilds the same text and redacts with the same patterns — DuckDB's
RE2 and Spark's Java regex agree on these deliberately backtracking-
free character classes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from musicflow_spark.operators.cleanse import (
    PII_PATTERNS,
    digit_ratio,
    erase_keys,
    redact_pii,
    repetition_features,
)
from musicflow_spark.operators.dedup import portable_hash60
from musicflow_spark.operators.textnorm import INJECT_SQL
from musicflow_spark.queries.portable import pround, pround_sql
from musicflow_spark.queries.registry import Query
from musicflow_spark.sources.catalog import read_table


def _contact_text_spark() -> F.Column:
    key = F.col("c_custkey")
    return F.concat(
        F.col("c_name"),
        F.lit(" contact: user"),
        key.cast("string"),
        F.lit("@example.com"),
        F.when(
            key % 2 == 0,
            F.concat(
                F.lit(" call 415-555-"),
                F.lpad((key % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            key % 3 == 0,
            F.concat(F.lit(" see https://example.com/u/"), key.cast("string")),
        ).otherwise(F.lit("")),
    )


_CONTACT_TEXT_SQL = """c_name || ' contact: user' || cast(c_custkey AS varchar) || '@example.com'
    || CASE WHEN c_custkey % 2 = 0
            THEN ' call 415-555-' || lpad(cast(c_custkey % 10000 AS varchar), 4, '0')
            ELSE '' END
    || CASE WHEN c_custkey % 3 = 0
            THEN ' see https://example.com/u/' || cast(c_custkey AS varchar)
            ELSE '' END"""


def customer_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (ext): regex scrub of emails/phones/URLs with
    per-kind match counts — one codegen map stage, no UDF, no
    shuffle."""
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", _contact_text_spark().alias("contact")
    )
    out = redact_pii(cust, "contact")
    return out.select(
        "c_custkey",
        "n_email",
        "n_phone",
        "n_url",
        F.md5("redacted").alias("redacted_md5"),
        F.length("redacted").cast("long").alias("redacted_len"),
    )


def _pii_oracle_sql() -> str:
    counts = ", ".join(
        f"len(regexp_extract_all(contact, '{pat}')) AS n_{kind}"
        for kind, pat in PII_PATTERNS.items()
    )
    redacted = "contact"
    for kind, pat in PII_PATTERNS.items():
        redacted = f"regexp_replace({redacted}, '{pat}', '[{kind.upper()}]', 'g')"
    return f"""
WITH c AS (SELECT c_custkey, {_CONTACT_TEXT_SQL} AS contact FROM customer)
SELECT c_custkey, {counts},
       md5({redacted}) AS redacted_md5,
       length({redacted}) AS redacted_len
FROM c
"""


def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition/boilerplate signals (ext): per-document bigram
    repetition (Gopher-style top/dup n-gram fractions) + digit
    density.  Explode -> two map-side-combining aggregations; zero
    rows become zero-valued rows via the co-partitioned left join."""
    docs = read_table(spark, sf_dir, "documents")
    rep = repetition_features(docs, "doc_id", "text", n=2)
    digits = docs.select("doc_id", pround(digit_ratio("text"), 6).alias("digit_frac"))
    return rep.join(digits, "doc_id").select(
        "doc_id",
        "n_ngrams",
        "n_uniq_ngrams",
        "top_ngram_cnt",
        pround(F.col("top_ngram_frac"), 6).alias("top_ngram_frac"),
        pround(F.col("dup_ngram_frac"), 6).alias("dup_ngram_frac"),
        "digit_frac",
    )


DOC_REPETITION_STATS_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         list_transform(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> ''),
                        x -> lower(x)) AS t
  FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)), i -> array_to_string(t[i:i+1], ' '))) AS gram
  FROM toks),
pg AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram),
pd AS (
  SELECT doc_id,
         cast(sum(c) AS BIGINT) AS n_ngrams,
         count(*)               AS n_uniq_ngrams,
         max(c)                 AS top_ngram_cnt
  FROM pg GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(pd.n_ngrams, 0)       AS n_ngrams,
       coalesce(pd.n_uniq_ngrams, 0)  AS n_uniq_ngrams,
       coalesce(pd.top_ngram_cnt, 0)  AS top_ngram_cnt,
       {pround_sql("CASE WHEN pd.n_ngrams IS NULL THEN 0.0 ELSE pd.top_ngram_cnt / cast(pd.n_ngrams AS double) END", 6)} AS top_ngram_frac,
       {pround_sql("CASE WHEN pd.n_ngrams IS NULL THEN 0.0 ELSE 1 - pd.n_uniq_ngrams / cast(pd.n_ngrams AS double) END", 6)} AS dup_ngram_frac,
       {pround_sql("CASE WHEN length(d.text) = 0 THEN 0.0 ELSE (length(d.text) - length(regexp_replace(d.text, '[0-9]', '', 'g'))) / cast(length(d.text) AS double) END", 6)} AS digit_frac
FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
"""


# ------------------------------------------------- erasure propagation
def user_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure propagation (ext): a deterministic ~5% of
    users (portable-hash bucket 0 of 20) are tombstoned; their event
    rows are dropped via operators/cleanse.py::erase_keys (left-anti)
    and the per-type audit reports total/kept/erased — the compliance
    evidence a deletion pipeline must produce.  The oracle recomputes
    the same partition with FILTER counts, certifying the anti-join
    path drops exactly the tombstoned rows and nothing else."""
    ev = read_table(spark, sf_dir, "events")
    tomb = (
        ev.select("user_id")
        .distinct()
        .filter(portable_hash60(F.col("user_id").cast("string")) % 20 == 0)
    )
    kept, _audit = erase_keys(ev, tomb, "user_id")
    total = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_total"))
    keptc = kept.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_kept"))
    return total.join(keptc, "event_type", "left").select(
        "event_type",
        "n_total",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        (F.col("n_total") - F.coalesce("n_kept", F.lit(0)))
        .cast("long")
        .alias("n_erased"),
    )


USER_ERASURE_AUDIT_SQL = """
WITH tomb AS (
  SELECT DISTINCT user_id FROM events
  WHERE ('0x' || substr(md5(cast(user_id AS VARCHAR)), 1, 15))::BIGINT % 20 = 0)
SELECT event_type,
       count(*) AS n_total,
       count(*) FILTER (WHERE user_id NOT IN (SELECT user_id FROM tomb)) AS n_kept,
       count(*) FILTER (WHERE user_id IN (SELECT user_id FROM tomb)) AS n_erased
FROM events
GROUP BY event_type
"""


def doc_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization for web-corpus grouping (ext: the dedup
    key every crawl pipeline derives before anything else).  URLs are
    synthesized deterministically from the documents table (mixed-case
    scheme/host, www. prefix, tracking query, fragment — the real-world
    mess), then canonicalized via native ``parse_url`` (JVM-side, no
    UDF): lowercase scheme, lowercase host minus ``www.``, path kept,
    query+fragment dropped.  Grouped per host with language breadth
    and a deterministic example URL; the oracle rebuilds and
    canonicalizes the same URLs with RE2 extracts.  Map-only + one
    keyed aggregation — scales."""
    from musicflow_spark.functions.strings import canonical_url, url_host

    docs = read_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://WWW."),
        F.upper("source"),
        F.lit(".Example.COM/docs/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?utm_source=feed&ref="),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("#sec-"),
        (F.col("doc_id") % 5).cast("string"),
    )
    with_url = docs.select(
        "doc_id", "lang",
        url_host(url).alias("host"),
        canonical_url(url).alias("canon"),
    )
    return with_url.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.min("canon").alias("first_url"),
    )


DOC_URL_CANONICAL_SQL = r"""
WITH u AS (
  SELECT doc_id, lang,
         'HTTPS://WWW.' || upper(source) || '.Example.COM/docs/' || lang || '/'
           || cast(doc_id AS varchar)
           || '?utm_source=feed&ref=' || cast(doc_id % 7 AS varchar)
           || '#sec-' || cast(doc_id % 5 AS varchar) AS url
  FROM documents),
c AS (
  SELECT doc_id, lang,
         regexp_replace(lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)),
                        '^www\.', '') AS host,
         lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) || '://'
           || regexp_replace(lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)),
                             '^www\.', '')
           || regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS canon
  FROM u)
SELECT host, count(*) AS n_docs, count(DISTINCT lang) AS n_langs,
       min(canon) AS first_url
FROM c GROUP BY host
"""


def doc_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode canonicalization tier (ext; VERDICT r10 item 6): NFC /
    NFKC normalization + case fold as the hygiene pass a multilingual
    corpus needs before the ASCII-``\\s`` contract tokenizer.  The
    fixture text is pure ASCII, so the query first manufactures the
    real-world mess with a deterministic replace chain that BOTH
    engines run (combining acute, ﬁ ligature, ANGSTROM SIGN — each a
    different normalization behavior; operators/textnorm.py); the
    Spark side then normalizes in the Arrow map tier
    (``unicodedata``), the oracle with DuckDB's utf8proc-backed
    ``nfc_normalize`` — two independent Unicode implementations
    agreeing codepoint-for-codepoint is the point of the oracle.
    NFKC has no DuckDB twin; on the injected compatibility set it
    equals replace-ligature-then-NFC, which the oracle applies (the
    general form is property-pinned in tests/test_textnorm.py).  The
    fold column stays JVM-side (``F.lower``) inside the
    JVM==utf8proc agreement subset.  Plan: two chained map-only Arrow
    passes, no shuffle, no join — linear at any scale."""
    from musicflow_spark.operators.textnorm import (
        inject_messy_text,
        unicode_normalize,
    )

    docs = read_table(spark, sf_dir, "documents")
    messy = docs.select(
        "doc_id", inject_messy_text("text").alias("messy")
    )
    nfc = unicode_normalize(
        messy, "messy", form="NFC", out_col="text_nfc"
    )
    both = unicode_normalize(
        nfc, "text_nfc", form="NFKC", out_col="text_nfkc"
    )
    return both.select(
        "doc_id",
        F.length("messy").alias("n_raw"),
        F.length("text_nfc").alias("n_nfc"),
        F.length("text_nfkc").alias("n_nfkc"),
        (F.col("messy") == F.col("text_nfc")).alias("was_nfc"),
        F.lower("text_nfc").alias("text_fold"),
        "text_nfc",
        "text_nfkc",
    )


# Derived from the operator's own SQL template so the injection chain
# has exactly one definition (ADVICE r11: three hand-kept copies could
# drift; now _INJECT -> INJECT_SQL -> here).
_MESSY_SQL = INJECT_SQL.format(col="text")


def doc_unicode_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-form exact dedup (ext): the dedup-ladder tier that
    byte-level ``doc_exact_dedup`` cannot reach — the same visible
    text arriving in DIFFERENT Unicode representations.  The fixture
    injects the divergence deterministically: even doc_ids carry
    precomposed U+00E9, odd ones the decomposed ``e`` + U+0301, so
    byte-identical duplicates across the parity split do not exist,
    while NFC collapses both spellings to one canonical key.  Keys
    are md5 of the NFC text (hash-first — the group-by shuffles a
    16-byte digest, never the document body, the same scale contract
    as the minhash tiers); per canonical group the mart reports the
    min-id keeper, member count, and how many BYTE-distinct variants
    the group spans (n_variants > 1 == exactly the duplicates a
    byte-keyed dedup would have missed).  One map pass + one
    digest-keyed aggregation — linear, skew-free (md5 keys)."""
    from musicflow_spark.operators.textnorm import unicode_normalize

    docs = read_table(spark, sf_dir, "documents")
    messy = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.replace(F.col("text"), F.lit("e"), F.lit("\u00E9")),
        )
        .otherwise(
            F.replace(F.col("text"), F.lit("e"), F.lit("e\u0301"))
        )
        .alias("messy"),
    )
    nfc = unicode_normalize(messy, "messy", form="NFC", out_col="text_nfc")
    return (
        nfc.select(
            "doc_id",
            F.md5("text_nfc").alias("canon_key"),
            F.md5("messy").alias("byte_key"),
        )
        .groupBy("canon_key")
        .agg(
            F.min("doc_id").alias("canon_id"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("byte_key").cast("long").alias("n_variants"),
        )
    )


DOC_UNICODE_DEDUP_SQL = """
WITH m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0
              THEN replace(text, 'e', chr(233))
              ELSE replace(text, 'e', 'e' || chr(769)) END AS messy
  FROM documents),
k AS (
  SELECT doc_id,
         md5(nfc_normalize(messy)) AS canon_key,
         md5(messy) AS byte_key
  FROM m)
SELECT canon_key,
       min(doc_id) AS canon_id,
       count(*) AS n_docs,
       count(DISTINCT byte_key) AS n_variants
FROM k GROUP BY canon_key
"""

def doc_unicode_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-text NEAR-dup rung (VERDICT r11 item 2): the
    MinHash/LSH ladder shingles byte tokens, so two near-duplicate
    documents in DIFFERENT Unicode representations never share the
    shingles their 'e'-bearing tokens contribute and can miss banding
    entirely — the same cross-representation failure
    ``doc_unicode_dedup`` proves for exact keys, here at the near-dup
    tier.  Composition: the parity-split representation divergence
    (even doc_ids precomposed U+00E9, odd decomposed e + U+0301) →
    textnorm's Arrow NFC pass → the UNCHANGED minhash_dedup_pairs
    ladder over the canonical column.  NFC collapses both spellings,
    so banding and exact-Jaccard verification see identical token
    streams regardless of arrival form; tests/test_textnorm.py pins a
    cross-representation near-dup pair that raw byte-shingled minhash
    misses and this composition finds.

    Oracle: the injection + ``nfc_normalize`` CTE prefixed onto the
    EXISTING exact-Jaccard CTEs (textops.DOC_JACCARD_PAIRS_SQL,
    composed by ``_unicode_neardup_oracle_sql`` — one definition of
    the jaccard pipeline, not a copy).  Equality with the exact
    result asserts both soundness (the verify stage) and 100% LSH
    recall on this corpus — same bimodal-gap argument as
    ``doc_minhash_dedup``, unchanged by NFC because normalization is
    a per-token bijection here (token multisets map 1:1, Jaccard
    values are preserved exactly).

    Scale: one Arrow map pass (no shuffle) in front of the ladder;
    the ladder's own shape — (band, bucket) equi-join, max_df cap —
    is untouched, so the 100-TB story is doc_minhash_dedup's."""
    from musicflow_spark.operators.dedup import minhash_dedup_pairs
    from musicflow_spark.operators.textnorm import unicode_normalize

    docs = read_table(spark, sf_dir, "documents")
    messy = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.replace(F.col("text"), F.lit("e"), F.lit("\u00E9")),
        )
        .otherwise(
            F.replace(F.col("text"), F.lit("e"), F.lit("e\u0301"))
        )
        .alias("messy"),
    )
    nfc = unicode_normalize(messy, "messy", form="NFC", out_col="text_nfc")
    pairs = minhash_dedup_pairs(
        nfc, text_col="text_nfc", k=32, bands=16, threshold=0.2, max_df=20
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        "inter_cnt",
        pround(F.col("jaccard"), 6).alias("jaccard"),
    )


def _unicode_neardup_oracle_sql() -> str:
    """Prefix the parity injection + nfc_normalize CTEs onto the
    existing exact-Jaccard oracle so the jaccard pipeline has ONE
    SQL definition; only the source relation is rewritten."""
    from musicflow_spark.queries.textops import DOC_JACCARD_PAIRS_SQL

    prefix = """
WITH m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0
              THEN replace(text, 'e', chr(233))
              ELSE replace(text, 'e', 'e' || chr(769)) END AS messy
  FROM documents),
c AS (
  SELECT doc_id, nfc_normalize(messy) AS text FROM m),
toks AS ("""
    # rewrite the source relation FIRST — the prefix itself reads
    # FROM documents, so the other order would rewrite the wrong one
    out = DOC_JACCARD_PAIRS_SQL.replace("FROM documents)", "FROM c)", 1).replace(
        "WITH toks AS (", prefix, 1
    )
    assert "FROM c)" in out and out.count("FROM documents") == 1
    return out


DOC_UNICODE_NORMALIZE_SQL = f"""
WITH m AS (
  SELECT doc_id, {_MESSY_SQL} AS messy FROM documents),
n AS (
  SELECT doc_id, messy,
         nfc_normalize(messy) AS text_nfc,
         nfc_normalize(replace(messy, chr(64257), 'fi')) AS text_nfkc
  FROM m)
SELECT doc_id,
       length(messy) AS n_raw,
       length(text_nfc) AS n_nfc,
       length(text_nfkc) AS n_nfkc,
       messy = text_nfc AS was_nfc,
       lower(text_nfc) AS text_fold,
       text_nfc, text_nfkc
FROM n
"""


def doc_unicode_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality features over CANONICAL text (ext — the real-corpus
    path VERDICT r10 item 6 asked for): the filtering features every
    pre-training pipeline tunes (token/uniq counts, stopword and
    punctuation fractions) computed AFTER the normalize→fold hygiene
    pass instead of on raw bytes.  The injected mess makes the
    difference observable: n_chars_raw counts the decomposed
    codepoints, n_chars_canon the composed ones, so the raw-bytes
    features a naive pipeline computes sit on a different denominator
    than the canonical ones.  Same Arrow NFC tier + JVM fold as
    doc_unicode_normalize; features are the registered
    quality_features expressions applied to the folded column; the
    oracle replays the whole composition (nfc_normalize → lower →
    the doc_quality feature SQL).  Map-only after the normalize pass
    — no shuffle, linear at any scale."""
    from musicflow_spark.operators.textnorm import (
        inject_messy_text,
        unicode_normalize,
    )
    from musicflow_spark.operators.textstats import quality_features

    docs = read_table(spark, sf_dir, "documents")
    messy = docs.select(
        "doc_id", inject_messy_text("text").alias("messy")
    )
    nfc = unicode_normalize(messy, "messy", form="NFC", out_col="text_nfc")
    canon = nfc.select(
        "doc_id",
        F.length("messy").alias("n_chars_raw"),
        F.length("text_nfc").alias("n_chars_canon"),
        F.lower("text_nfc").alias("text"),
    )
    qf = quality_features(canon, "text")
    return qf.select(
        "doc_id",
        "n_chars_raw",
        "n_chars_canon",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_uniq_tokens").cast("long").alias("n_uniq_tokens"),
        pround(F.col("avg_token_len"), 4).alias("avg_token_len"),
        pround(F.col("stopword_frac"), 4).alias("stopword_frac"),
        pround(F.col("punct_frac"), 4).alias("punct_frac"),
        pround(F.col("uniq_frac"), 4).alias("uniq_frac"),
    )


def _unicode_quality_oracle_sql() -> str:
    from musicflow_spark.operators.textstats import STOPWORDS

    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    punct_cls = r"'[.,!?;:''\"()\[\]{}-]'"
    punct_expr = (
        "CASE WHEN length(text) = 0 THEN 0.0 "
        "ELSE (length(text) - length(regexp_replace(text, "
        + punct_cls
        + ", '', 'g'))) / cast(length(text) AS double) END"
    )
    return rf"""
WITH m AS (
  SELECT doc_id, {_MESSY_SQL} AS messy FROM documents),
n AS (
  SELECT doc_id, length(messy) AS n_chars_raw,
         lower(nfc_normalize(messy)) AS text
  FROM m),
toks AS (
  SELECT doc_id, n_chars_raw, text,
         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
  FROM n)
SELECT doc_id,
       n_chars_raw,
       length(text) AS n_chars_canon,
       len(t) AS n_tokens,
       len(list_distinct(t)) AS n_uniq_tokens,
       {pround_sql("CASE WHEN len(t) = 0 THEN 0.0 ELSE list_sum(list_transform(t, x -> length(x))) / cast(len(t) AS double) END", 4)} AS avg_token_len,
       {pround_sql(f"CASE WHEN len(t) = 0 THEN 0.0 ELSE len(list_filter(t, x -> list_contains([{sw}], x))) / cast(len(t) AS double) END", 4)} AS stopword_frac,
       {pround_sql(punct_expr, 4)} AS punct_frac,
       {pround_sql("CASE WHEN len(t) = 0 THEN 0.0 ELSE len(list_distinct(t)) / cast(len(t) AS double) END", 4)} AS uniq_frac
FROM toks
"""


K_ANON = 5


def customer_kanonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (ext: data governance next to PII redaction
    and erasure): group the customer table by its quasi-identifier
    tuple — market segment, nation, account-balance decile bucket —
    and flag every group smaller than k=5: rows in such a group are
    re-identifiable by an adversary who knows only the QI columns,
    the standard release gate for sharing 'anonymized' extracts.  The
    balance bucket shifts to a non-negative grid before the integer
    divide so truncation agrees across engines.  One groupBy shuffle
    on the QI key at any scale; the flag is a per-row expression."""
    cust = read_table(spark, sf_dir, "customer")
    bal_bucket = (
        (F.round(F.col("c_acctbal") * 100).cast("long") + F.lit(100_000))
        / F.lit(100_000)
    ).cast("long")
    return (
        cust.select(
            "c_mktsegment",
            "c_nationkey",
            bal_bucket.alias("bal_bucket"),
        )
        .groupBy("c_mktsegment", "c_nationkey", "bal_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "c_mktsegment",
            "c_nationkey",
            "bal_bucket",
            "n",
            (F.col("n") < K_ANON).alias("is_risky"),
        )
    )


CUSTOMER_KANONYMITY_AUDIT_SQL = f"""
SELECT c_mktsegment, c_nationkey, bal_bucket,
       cast(count(*) AS bigint) AS n,
       count(*) < {K_ANON} AS is_risky
FROM (
  SELECT c_mktsegment, c_nationkey,
         (cast(round(c_acctbal * 100) AS bigint) + 100000) // 100000 AS bal_bucket
  FROM customer)
GROUP BY 1, 2, 3
"""


QUERIES = [
    Query(
        "customer_kanonymity_audit",
        "ext: k-anonymity release gate — QI-tuple group sizes with sub-k risk flags",
        customer_kanonymity_audit,
        CUSTOMER_KANONYMITY_AUDIT_SQL,
    ),
    Query(
        "customer_pii_redact",
        "ext: PII redaction (regex scrub + counts)",
        customer_pii_redact,
        _pii_oracle_sql(),
    ),
    Query(
        "doc_repetition_stats",
        "ext: repetition/boilerplate quality signals",
        doc_repetition_stats,
        DOC_REPETITION_STATS_SQL,
    ),
    Query(
        "user_erasure_audit",
        "ext: right-to-erasure propagation (anti-join + audit)",
        user_erasure_audit,
        USER_ERASURE_AUDIT_SQL,
    ),
    Query(
        "doc_unicode_dedup",
        "ext: canonical-form dedup — NFC keys merge byte-distinct representation variants",
        doc_unicode_dedup,
        DOC_UNICODE_DEDUP_SQL,
    ),
    Query(
        "doc_unicode_neardup",
        "ext: canonical-text near-dup — NFC normalize feeding the minhash LSH ladder",
        doc_unicode_neardup,
        _unicode_neardup_oracle_sql(),
        bench=True,
    ),
    Query(
        "doc_unicode_quality",
        "ext: quality features over canonical (NFC+fold) text — the real-corpus filter path",
        doc_unicode_quality,
        _unicode_quality_oracle_sql(),
    ),
    Query(
        "doc_unicode_normalize",
        "ext: Unicode NFC/NFKC canonicalization + fold (Arrow map tier vs nfc_normalize oracle)",
        doc_unicode_normalize,
        DOC_UNICODE_NORMALIZE_SQL,
    ),
    Query(
        "doc_url_canonical",
        "ext: URL canonicalization (parse_url host/path key, per-host rollup)",
        doc_url_canonical,
        DOC_URL_CANONICAL_SQL,
        bench=True,
    ),
]
