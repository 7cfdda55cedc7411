"""Unicode text normalization tier (ext; VERDICT r10 item 6).

The repo's contract tokenizer deliberately splits on Java's ASCII
``\\s`` class so every oracle stays bit-identical across engines
(similarity.py:1497).  That is the right call for oracle parity, but a
real multilingual corpus needs canonical-form hygiene FIRST: the same
visible string can arrive as precomposed U+00E9 or as ``e`` + U+0301,
as the ﬁ ligature or as ``fi``, as U+212B ANGSTROM SIGN or U+00C5 —
and every downstream exact-dedup hash, shingle, or group-by key
silently treats them as distinct documents.  This module adds the
NFC/NFKC (+ optional casefold) normalizer those pipelines run before
tokenization.

Engine-parity contract (empirically pinned in tests/test_textnorm.py):

* **NFC**: Python ``unicodedata.normalize('NFC', s)`` is verified
  equal to DuckDB's utf8proc-backed ``nfc_normalize`` over a
  hypothesis-generated Unicode domain (combining marks, Hangul jamo,
  ligatures, singletons like U+212B).  This is the registered-oracle
  form.
* **NFKC**: DuckDB exposes no NFKC function; the registered query
  restricts compatibility characters to an injected set whose NFKC
  expansion is SQL-expressible (``replace`` then ``nfc_normalize``),
  and the general form is pinned Python-vs-``unicodedata`` by
  property test only.
* **casefold**: full Unicode casefold (``str.casefold``) has no SQL
  twin (DuckDB ``lower`` is utf8proc's 1:1 mapping — e.g. ``İ`` stays
  single-codepoint, ``ß`` does not become ``ss``).  Registered
  queries therefore fold JVM-side with ``F.lower`` and keep the
  injected alphabet inside the subset where JVM and utf8proc agree;
  the Python ``casefold=True`` tier is the documented real-corpus
  path, property-pinned against ``str.casefold`` semantics
  (idempotence, NFC-stability) without an oracle twin.

Why ``mapInArrow`` and not an expression: Spark has no native Unicode
normalization expression (collation support normalizes for
COMPARISON, not for output), so the canonical form must be produced
in Python — one Arrow batch pass, no per-row UDF, the same tier shape
as ``feature_hash_embedding_arrow`` (similarity.py:1468).  The pass is
map-only: no shuffle, scales linearly with input splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["unicode_normalize", "inject_messy_text", "INJECT_SQL"]

_FORMS = ("NFC", "NFKC", "NFD", "NFKD")


def unicode_normalize(
    df: DataFrame,
    text_col: str = "text",
    *,
    form: str = "NFC",
    casefold: bool = False,
    out_col: str = "text_norm",
) -> DataFrame:
    """Append ``out_col`` = ``text_col`` normalized to ``form`` (then
    ``str.casefold``-ed when ``casefold=True``); every other column
    passes through untouched, so calls CHAIN without a self-join (the
    registered query derives NFKC after NFC in consecutive map stages
    — normalization forms compose idempotently: NFKC(NFC(s)) ==
    NFKC(s)).

    One ``mapInArrow`` pass; NULL text yields NULL output.  The NFC
    form is oracle-parity with DuckDB ``nfc_normalize`` (see module
    docstring for the exact contract of each form/fold combination).
    """
    from pyspark.sql.types import StringType, StructField, StructType

    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")
    if out_col in df.columns:
        raise ValueError(f"out_col {out_col!r} already present")
    idx = df.columns.index(text_col)
    # a NEW StructType — StructType.add mutates in place, and df.schema
    # is the DataFrame's cached instance
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, StringType())]
    )

    def run(batches):
        import unicodedata as _ud

        import pyarrow as _pa

        for batch in batches:
            texts = batch.column(idx).to_pylist()
            out: list[str | None] = []
            for t in texts:
                if t is None:
                    out.append(None)
                    continue
                n = _ud.normalize(form, t)
                out.append(n.casefold() if casefold else n)
            yield batch.append_column(
                _pa.field(out_col, _pa.string()),
                _pa.array(out, type=_pa.string()),
            )

    return df.mapInArrow(run, out_schema)


#: Deterministic non-ASCII injection for the registered query: the
#: test tables are pure ASCII (TESTDATA.md), so the query manufactures
#: the real-world mess from them with the SAME replace chain on both
#: engines.  Each injected character exercises a different
#: normalization behavior, and every one lowercases identically under
#: JVM ``lower`` and utf8proc ``lower`` (the ``İ``-style full-mapping
#: divergence is deliberately excluded — module docstring):
#:   'e' -> 'e' + U+0301   combining acute; NFC composes to U+00E9
#:   'w' -> U+FB01         ﬁ ligature; NFC keeps it, NFKC -> "fi"
#:   'o' -> U+212B         ANGSTROM SIGN; NFC singleton -> U+00C5
# GUARD (ADVICE r11): the registered oracle models NFKC as
# replace(U+FB01 -> 'fi') then nfc_normalize, equivalent to full NFKC
# ONLY on this exact compatibility set.  Any new _INJECT entry must
# (a) extend the NFKC replace chain in the cleanse.py oracle and
# (b) extend tests/test_textnorm.py::
# test_nfkc_via_replace_equivalence_on_injected_set, or oracle parity
# silently breaks.
_INJECT = (("e", "e\u0301"), ("w", "\uFB01"), ("o", "\u212B"))


def inject_messy_text(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    for src, dst in _INJECT:
        col = F.replace(col, F.lit(src), F.lit(dst))
    return col


INJECT_SQL = (
    "replace(replace(replace({col}, 'e', 'e' || chr(769)), "
    "'w', chr(64257)), 'o', chr(8491))"
)
