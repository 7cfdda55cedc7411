"""BPE merge-training tests: the distributed trainer vs a straight
pure-python BPE reference (the Sennrich et al. greedy algorithm over a
word-frequency histogram), plus the delimiter-representation edge
cases the string-replace merge pass relies on."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from musicflow_spark.operators.textstats import (
    BPE_WORD_RE,
    bpe_train_merges,
    bpe_word_types,
)


def python_bpe(texts: list[str], n_merges: int) -> list[tuple[int, str, str, int]]:
    """Reference trainer: word-type histogram, greedy argmax pair with
    (count desc, lhs asc, rhs asc) tie-break, left-to-right
    non-overlapping merge application."""
    freqs = Counter(
        w for t in texts for w in re.findall(BPE_WORD_RE, t.lower())
    )
    words = {w: list(w) for w in freqs}
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freqs[w]
        if not pairs:
            break
        (lhs, rhs), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, lhs, rhs, cnt))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


CORPUS = [
    "the cat sat on the mat",
    "the cats chatter, the mats scatter!",
    "that hat is the cat hat",
    "statistics that matter: the data that chatters",
    "aaaa aaa aa a",  # overlapping-pair stress: greedy must pick non-overlap
]


def _spark_merges(spark, texts, n):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    rows = bpe_train_merges(df, n).collect()
    return sorted(
        [(r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"]) for r in rows]
    )


def test_matches_python_reference(spark):
    got = _spark_merges(spark, CORPUS, 10)
    want = python_bpe(CORPUS, 10)
    assert got == want
    # learned symbols compose: later merges may consume earlier outputs
    assert any(len(l) > 1 or len(r) > 1 for _, l, r, _ in got[3:])


def test_overlapping_pair_greedy_nonoverlap(spark):
    # 'aaaa' x1: true greedy yields (a,a) count freq*(len-1) summed as
    # ADJACENT occurrences, and applying it leaves aa|aa, never aa|a|a
    got = _spark_merges(spark, ["aaaa"], 2)
    want = python_bpe(["aaaa"], 2)
    assert got == want
    assert got[0][1:3] == ("a", "a")
    assert got[1][1:3] == ("aa", "aa")


def test_word_types_weighting(spark):
    # pair counts weight by word FREQUENCY, not type count
    texts = ["zz zz zz", "zq"]
    got = _spark_merges(spark, texts, 1)
    want = python_bpe(texts, 1)
    assert got == want
    assert got[0][1:] == ("z", "z", 3)  # three zz occurrences, one zq


def test_tiebreak_lexicographic(spark):
    # 'ba' and 'ab' both appear twice -> (a,b) wins on lhs asc
    texts = ["ab ab ba ba"]
    got = _spark_merges(spark, texts, 1)
    assert got[0][1:] == ("a", "b", 2)
    assert got == python_bpe(texts, 1)


def test_word_type_histogram(spark):
    df = spark.createDataFrame(
        [(0, "The the THE cat"), (1, "cat-dog")], "doc_id long, text string"
    )
    rows = {r["word"]: r["freq"] for r in bpe_word_types(df).collect()}
    assert rows == {"the": 3, "cat": 2, "dog": 1}


def test_validation(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train_merges(df, 0)


def python_bpe_piece_counts(texts: list[str], n_merges: int) -> dict[str, int]:
    """Word -> piece count after applying the reference trainer's
    merges (reuses python_bpe's greedy application)."""
    freqs = Counter(
        w for t in texts for w in re.findall(BPE_WORD_RE, t.lower())
    )
    words = {w: list(w) for w in freqs}
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freqs[w]
        if not pairs:
            break
        (lhs, rhs), _ = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return {w: len(s) for w, s in words.items()}


@pytest.mark.slow
def test_fixture_corpus_trains_to_dry_point(spark, sf_dir):
    """Dry-corpus parity: the synthetic fixture has only 31 distinct
    [a-z]+ word types, so its merge capacity is well under 128 — the
    trainer must stop emitting EXACTLY where the pure-python
    reference breaks (every word a single symbol), with identical
    merges up to that point.  Certifies the empty-pair round path
    (the `size >= 3` state guard) the 12-merge oracle never reaches."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").localCheckpoint(
        eager=True
    )
    texts = [r["text"] for r in docs.select("text").collect()]
    n = 128
    want = python_bpe(texts, n)
    got = sorted(
        (r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"])
        for r in bpe_train_merges(docs, n).collect()
    )
    assert got == want
    assert 0 < len(got) < n  # the corpus really does run dry


def _rich_corpus(n_words: int = 300, words_per_doc: int = 40) -> list[str]:
    """Deterministic zipf-ish corpus with a real vocabulary: word w is
    a 5-10 letter md5-derived string (letters a-p), repeated
    ~n_words/(w+1) times — merge capacity in the thousands, so a
    256-merge run never dries out."""
    import hashlib

    words = []
    for w in range(n_words):
        hx = hashlib.md5(f"w{w}".encode()).hexdigest()
        length = 5 + int(hx[0], 16) % 6
        words.append("".join("abcdefghijklmnop"[int(c, 16)] for c in hx[1 : 1 + length]))
    stream = []
    for w, word in enumerate(words):
        stream.extend([word] * max(1, n_words // (w + 1)))
    # deterministic interleave so docs mix frequent and rare words
    stream.sort(key=lambda s: hashlib.md5(s.encode()).hexdigest())
    return [
        " ".join(stream[i : i + words_per_doc])
        for i in range(0, len(stream), words_per_doc)
    ]


@pytest.mark.slow
def test_256_merges_matches_python_reference(spark):
    """Production-shape merge count (VERDICT r08 item 5): the
    checkpointed training loop at 256 merges, bit-equal to the
    pure-python Sennrich reference — merge ranks, pairs, AND counts.
    (The driver's correctness gate stays the 12-merge unrolled
    oracle, corpus_bpe_merges; a 256-round unrolled SQL replay would
    be absurd, so the reference trainer is the certifier at this
    depth.)  The fixture corpus only has 31 word types (see the
    dry-point test above), so depth needs the deterministic rich
    corpus: ~300 md5-derived word types, thousands of merges of
    capacity."""
    texts = _rich_corpus()
    n = 256
    want = python_bpe(texts, n)
    assert len(want) == n  # the rich corpus must not run dry
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).localCheckpoint(eager=True)
    got = sorted(
        (r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"])
        for r in bpe_train_merges(docs, n).collect()
    )
    assert got == want
    # realistic depth: late merges compose earlier outputs into
    # genuine multi-char subword units
    assert any(len(l) + len(r) >= 6 for _, l, r, _ in got[128:])


def test_encode_state_matches_python_reference(spark):
    from musicflow_spark.operators.textstats import bpe_train_state

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    _, state = bpe_train_state(df, 10)
    got = {
        r["word"]: len([x for x in r["s"].split("|") if x])
        for r in state.collect()
    }
    assert got == python_bpe_piece_counts(CORPUS, 10)
    # encoding compresses: every multi-char word has fewer pieces than chars
    assert any(got[w] < len(w) for w in got if len(w) > 1)


# ------------------------------------------------ representation property
from hypothesis import given, settings, strategies as st

_syms = st.text(alphabet="ab", min_size=1, max_size=3)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(_syms, min_size=1, max_size=10),
    _syms,
    _syms,
)
def test_replace_encoding_equals_greedy_merge(seq, lhs, rhs):
    """The '|l.|r.' -> '|lr.' string replace (python str.replace has
    the same leftmost non-overlapping semantics as Spark's F.replace
    and DuckDB's replace) must equal the greedy left-to-right scan
    for ANY symbol sequence and pair — including prefix-sharing
    symbols like ('a', 'ab'), the class that broke the
    leading-delimiter-only encoding."""
    enc = "".join(f"|{x}." for x in seq)
    out = enc.replace(f"|{lhs}.|{rhs}.", f"|{lhs}{rhs}.")
    via_replace = [x[:-1] for x in out.split("|") if x]

    res, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == lhs and seq[i + 1] == rhs:
            res.append(lhs + rhs)
            i += 2
        else:
            res.append(seq[i])
            i += 1
    assert via_replace == res
