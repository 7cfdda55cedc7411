"""cross_substring_spans (the maximal duplicated-substring ladder):
span exactness, maximality, and the winnowing containment guarantee —
every pair sharing a >= w + n - 1 token run shares a fingerprint, so
the substring pairs (min_span = 20 >= 10) must be a subset of the
fingerprint-sharing pairs (VERDICT r12 item 7's span-overlap check)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

SF_DIR = "/root/testdata/sf0.001"
MIN_SPAN = 20


@pytest.fixture(scope="module")
def spans_and_toks(spark):
    from musicflow_spark.operators.dedup import cross_substring_spans
    from musicflow_spark.sources.catalog import read_table

    docs = read_table(spark, SF_DIR, "documents")
    spans = cross_substring_spans(docs, min_span=MIN_SPAN).collect()
    toks = {
        r["doc_id"]: [t.lower() for t in r["text"].strip().split()]
        for r in docs.select("doc_id", "text").collect()
    }
    return spans, toks


def test_spans_are_exact_and_maximal(spans_and_toks):
    spans, toks = spans_and_toks
    assert spans, "fixture has cross-doc duplicated substrings"
    for r in spans:
        a, b = toks[r["doc_a"]], toks[r["doc_b"]]
        sa, sb, ln = r["a_start"], r["b_start"], r["span_len"]
        assert ln >= MIN_SPAN
        # exact: the reported windows are verbatim-identical
        assert a[sa : sa + ln] == b[sb : sb + ln], (r, a[sa : sa + ln][:5])
        # maximal: extending one token left or right breaks the match
        # (or runs off a document boundary)
        if sa > 0 and sb > 0:
            assert a[sa - 1] != b[sb - 1], r
        if sa + ln < len(a) and sb + ln < len(b):
            assert a[sa + ln] != b[sb + ln], r


def test_substring_pairs_within_winnow_guarantee(spark, spans_and_toks):
    """Winnowing (n=3, w=8) guarantees any shared run of >= 10 tokens
    surfaces a shared fingerprint; every >= 20-token substring pair
    must therefore appear in the fingerprint join."""
    from musicflow_spark.operators.dedup import winnow_fingerprints
    from musicflow_spark.sources.catalog import read_table

    spans, _ = spans_and_toks
    docs = read_table(spark, SF_DIR, "documents")
    fp = winnow_fingerprints(docs, n=3, w=8)
    a = fp.select(F.col("doc_id").alias("doc_a"), "fp_hash")
    b = fp.select(F.col("doc_id").alias("doc_b"), "fp_hash")
    fp_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in a.join(b, "fp_hash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .collect()
    }
    span_pairs = {(r["doc_a"], r["doc_b"]) for r in spans}
    assert span_pairs <= fp_pairs, span_pairs - fp_pairs


def test_min_span_validation(spark):
    from musicflow_spark.operators.dedup import cross_substring_spans
    from musicflow_spark.sources.catalog import read_table

    docs = read_table(spark, SF_DIR, "documents")
    with pytest.raises(ValueError):
        cross_substring_spans(docs, min_span=0)
