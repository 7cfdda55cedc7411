"""Unicode normalization tier (operators/textnorm.py): the
engine-parity contract, property-checked.

The registered query's oracle proves NFC parity only on the injected
character set; THESE tests carry the general claim — Python
``unicodedata`` (the Arrow tier's kernel) agrees with DuckDB's
utf8proc ``nfc_normalize`` over a hypothesis-generated Unicode domain
(combining marks, Hangul, ligatures, singletons), plus the documented
boundaries of the casefold tier (no SQL twin) and the NFKC-via-replace
oracle equivalence the registered query relies on.
"""

from __future__ import annotations

import unicodedata

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from musicflow_spark.operators.textnorm import (
    _INJECT,
    inject_messy_text,
    unicode_normalize,
)

SET = settings(max_examples=200, deadline=None)

# assigned, non-surrogate, non-private-use codepoints per the Python
# build's Unicode tables; Cn excluded so a codepoint newly assigned in
# one engine's (later) Unicode version can't diverge from the other's
# pass-through of what it still treats as unassigned.  U+0000 excluded
# from the ORACLE-parity domain only: DuckDB 1.0's nfc_normalize is
# NUL-terminated-string-unsafe (returns '' whenever NUL and any
# non-ASCII char co-occur — pinned below); the Arrow tier itself
# handles NUL correctly.
uni_text = st.text(
    alphabet=st.characters(
        min_codepoint=1, blacklist_categories=("Cs", "Cn", "Co")
    ),
    min_size=0,
    max_size=80,
)

# the classic normalization stress blocks, force-included alongside the
# broad domain: combining diacritics, Hangul jamo + syllables,
# presentation ligatures, letterlike singletons (ANGSTROM, OHM, KELVIN)
tricky_text = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=0x0300, max_codepoint=0x036F),
        st.characters(min_codepoint=0x1100, max_codepoint=0x1112),
        st.characters(min_codepoint=0x1161, max_codepoint=0x1175),
        st.characters(min_codepoint=0xAC00, max_codepoint=0xAC2F),
        st.characters(min_codepoint=0xFB00, max_codepoint=0xFB06),
        st.sampled_from("K\u212B\u2126\u00C5e\u0301\u00E9 aA"),
    ),
    min_size=0,
    max_size=40,
)

_con = duckdb.connect()


def _duck_nfc(s: str) -> str:
    return _con.execute("select nfc_normalize(?)", [s]).fetchone()[0]


@SET
@given(uni_text)
def test_nfc_matches_duckdb_broad_domain(s):
    assert unicodedata.normalize("NFC", s) == _duck_nfc(s)


@SET
@given(tricky_text)
def test_nfc_matches_duckdb_stress_blocks(s):
    assert unicodedata.normalize("NFC", s) == _duck_nfc(s)


@SET
@given(uni_text)
def test_nfc_casefold_nfc_stable(s):
    # the casefold tier's documented contract: NFC(casefold(NFC(s)))
    # is a fixpoint (rerunning the full normalize+fold pass changes
    # nothing) — the property a dedup key needs
    once = unicodedata.normalize("NFC", unicodedata.normalize("NFC", s).casefold())
    twice = unicodedata.normalize("NFC", once.casefold())
    assert once == twice


def test_duckdb_nul_truncation_is_oracle_side_only():
    # the documented oracle-domain boundary: DuckDB 1.0's
    # nfc_normalize goes through a NUL-terminated utf8proc call and
    # returns '' when NUL co-occurs with any multi-byte char; Python
    # (the Arrow tier's kernel) normalizes correctly.  Real corpus
    # text never carries NUL; the registered query's injected domain
    # cannot produce one.
    s = "\x00é"
    assert _duck_nfc(s) == ""
    assert unicodedata.normalize("NFC", s) == s


def test_nfkc_via_replace_equivalence_on_injected_set():
    # the registered query's oracle computes NFKC as
    # replace(ligature)->nfc_normalize; valid exactly because the
    # injected compatibility set is {U+FB01}, and U+212B's
    # compatibility decomposition coincides with its canonical one
    for base in ["weof fiw", "ee wwo", "", "www", "o w e"]:
        messy = base
        for src, dst in _INJECT:
            messy = messy.replace(src, dst)
        assert unicodedata.normalize("NFKC", messy) == _duck_nfc(
            messy.replace("ﬁ", "fi")
        )


TRICKY_CORPUS = [
    "e\u0301clair",            # decomposed acute -> U+00E9
    "\uFB01le",                # fi ligature: NFC keeps, NFKC -> fi
    "\u212Bngstrom",           # ANGSTROM SIGN -> U+00C5
    "stra\u00DFe",             # sharp s: casefold -> ss
    "\u1E9B\u0323",           # long s with dot above + dot below
    "\u1100\u1161\uAC00",    # jamo pair composes to the syllable
    "\u03A3\u03BF\u03C2 \u03A3",  # greek capital/final sigma
    "plain ascii",
    "",
]


def test_spark_tier_matches_duckdb_and_unicodedata(spark):
    rows = [(i, t) for i, t in enumerate(TRICKY_CORPUS)] + [(99, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    nfc = unicode_normalize(df, "text", form="NFC", out_col="nfc")
    both = unicode_normalize(nfc, "nfc", form="NFKC", out_col="nfkc")
    folded = unicode_normalize(
        both, "nfc", form="NFC", casefold=True, out_col="fold"
    )
    got = {r["doc_id"]: r for r in folded.collect()}
    for i, t in enumerate(TRICKY_CORPUS):
        assert got[i]["nfc"] == _duck_nfc(t)
        assert got[i]["nfc"] == unicodedata.normalize("NFC", t)
        assert got[i]["nfkc"] == unicodedata.normalize("NFKC", t)
        assert got[i]["fold"] == unicodedata.normalize("NFC", t).casefold()
    # NULL text propagates as NULL through every form
    assert got[99]["nfc"] is None and got[99]["nfkc"] is None
    assert got[99]["fold"] is None
    # casefold does what lower cannot: straße -> strasse
    assert got[3]["fold"] == "strasse"


def test_inject_messy_text_matches_oracle_replace_chain(spark):
    df = spark.createDataFrame(
        [(1, "we owe more")], "doc_id long, text string"
    )
    out = df.select(inject_messy_text("text").alias("m")).head()["m"]
    expect = "we owe more"
    for src, dst in _INJECT:
        expect = expect.replace(src, dst)
    assert out == expect
    assert "\u0301" in out and "\uFB01" in out and "\u212B" in out


def test_unknown_form_and_duplicate_out_col_raise(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="form"):
        unicode_normalize(df, "text", form="NFX")
    with pytest.raises(ValueError, match="already present"):
        unicode_normalize(df, "text", out_col="text")


def test_doc_unicode_dedup_conservation_and_merge(spark):
    from musicflow_spark.queries.cleanse import doc_unicode_dedup

    out = doc_unicode_dedup(spark, "/root/testdata/sf0.001").collect()
    n_docs_total = sum(r["n_docs"] for r in out)
    assert n_docs_total == 500  # every doc lands in exactly one group
    assert all(1 <= r["n_variants"] <= r["n_docs"] for r in out)
    # the merge mechanics the query exists for: same visible text in
    # precomposed vs decomposed spelling -> ONE canonical md5 key
    assert "caf\u00E9" != "cafe\u0301"  # byte-distinct spellings
    df = spark.createDataFrame(
        [(1, "café"), (2, "café")], "doc_id long, text string"
    )
    nfc = unicode_normalize(df, "text", form="NFC", out_col="n")
    keys = {r["doc_id"]: r["k"] for r in nfc.selectExpr("doc_id", "md5(n) k").collect()}
    assert keys[1] == keys[2]


def test_unicode_neardup_finds_cross_representation_pair(spark):
    """VERDICT r11 item 2: byte-shingled minhash misses a near-dup
    pair whose two members arrived in different Unicode
    representations; NFC in front of the SAME ladder finds it."""
    from musicflow_spark.operators.dedup import minhash_dedup_pairs

    base = (
        "the red hen feeds her three new chicks near the green "
        "fence while the речь sentence keeps every shingle sharing "
        "the letter e between them"
    )
    # doc 1: precomposed U+00E9 for every 'e'; doc 2: decomposed
    # e+U+0301 — visibly identical, byte-distinct in every token.
    df = spark.createDataFrame(
        [(1, base.replace("e", "é")), (2, base.replace("e", "é"))],
        "doc_id long, text string",
    )
    raw = minhash_dedup_pairs(
        df, k=32, bands=16, threshold=0.2, max_df=20
    ).collect()
    assert raw == []  # every 3-token shingle contains an 'e' token
    nfc = unicode_normalize(df, "text", form="NFC", out_col="text_nfc")
    canon = minhash_dedup_pairs(
        nfc, text_col="text_nfc", k=32, bands=16, threshold=0.2, max_df=20
    ).collect()
    assert len(canon) == 1
    row = canon[0]
    assert (row["doc_a"], row["doc_b"]) == (1, 2)
    assert row["jaccard"] == 1.0  # identical canonical token streams


def test_unicode_neardup_oracle_composition_rewrites_source():
    from musicflow_spark.queries.cleanse import _unicode_neardup_oracle_sql
    from musicflow_spark.queries.textops import DOC_JACCARD_PAIRS_SQL

    sql = _unicode_neardup_oracle_sql()
    # exactly one source read (the injection CTE); the jaccard CTEs
    # read the canonical relation
    assert sql.count("FROM documents") == 1
    assert "nfc_normalize(messy)" in sql
    # the jaccard pipeline is the shared definition, not a copy
    tail = DOC_JACCARD_PAIRS_SQL.split("FROM documents),", 1)[1]
    assert tail in sql
