"""Unigram-LM prune-training tests: the distributed fixed-round
hard-EM pruner vs a straight pure-python reference (greedy
longest-match segmentation + least-used-piece prune loop), plus the
seed-vocabulary and coverage invariants."""

from __future__ import annotations

import re

import pytest

from musicflow_spark.operators.textstats import (
    BPE_WORD_RE,
    UNI_MAX_PIECE,
    UNI_MAX_WORD,
    unigram_prune_state,
)


def _greedy(word: str, vocab: set[str]) -> list[str]:
    """Greedy longest-match segmentation; single chars always match."""
    out, p = [], 0
    while p < len(word):
        for j in range(min(UNI_MAX_PIECE, len(word) - p), 0, -1):
            if j == 1 or word[p : p + j] in vocab:
                out.append(word[p : p + j])
                p += j
                break
    return out


def python_unigram(texts: list[str], n_prunes: int):
    """Reference pruner mirroring unigram_prune_state: seed vocab =
    initially-used pieces + all single chars; per round prune the
    least-used multi-char piece ((usage asc, piece asc) tie-break)."""
    from collections import Counter

    freqs = Counter(
        w
        for t in texts
        for w in re.findall(BPE_WORD_RE, t.lower())
        if len(w) <= UNI_MAX_WORD
    )
    all_pieces = {
        w[i : i + j]
        for w in freqs
        for i in range(len(w))
        for j in range(1, min(UNI_MAX_PIECE, len(w) - i) + 1)
    }
    singles = {p for p in all_pieces if len(p) == 1}

    def usage(vocab: set[str]) -> Counter:
        u: Counter = Counter()
        for w, f in freqs.items():
            for p in _greedy(w, vocab):
                u[p] += f
        return u

    u0 = usage(all_pieces)
    vocab = singles | {p for p in all_pieces if len(p) >= 2 and u0[p] >= 1}
    losers = []
    for rank in range(n_prunes):
        u = usage(vocab)
        cands = sorted(
            (p for p in vocab if len(p) >= 2), key=lambda p: (u[p], p)
        )
        if not cands:
            break
        loser = cands[0]
        losers.append((rank, loser, u[loser]))
        vocab.discard(loser)
    return losers, vocab


CORPUS = [
    "the cat sat on the mat",
    "the cats chatter the mats scatter",
    "that hat is the cat hat",
    "statistics that matter the data that chatters",
    "small dataset small rows small customers",
]


def test_matches_python_reference(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got_losers, got_vocab = unigram_prune_state(df, 6)
    got = [
        (r["prune_rank"], r["piece"], r["usage"])
        for r in got_losers.orderBy("prune_rank").collect()
    ]
    want_losers, want_vocab = python_unigram(CORPUS, 6)
    assert got == want_losers
    assert {r["piece"] for r in got_vocab.collect()} == want_vocab


def test_prune_rounds_interact(spark):
    # pruning a used piece must re-route walks: usages in later rounds
    # can only be >= the first round's minimum (the cascade evidence),
    # and at least one loser must have usage > 0
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    losers, _ = unigram_prune_state(df, 5)
    rows = sorted(losers.collect(), key=lambda r: r["prune_rank"])
    assert any(r["usage"] > 0 for r in rows)


def test_singles_never_pruned_and_coverage_total(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    losers, vocab = unigram_prune_state(df, 4)
    assert all(len(r["piece"]) >= 2 for r in losers.collect())
    pieces = {r["piece"] for r in vocab.collect()}
    chars = {
        c
        for t in CORPUS
        for w in re.findall(BPE_WORD_RE, t.lower())
        if len(w) <= UNI_MAX_WORD
        for c in w
    }
    assert chars <= pieces  # every character still segmentable


def test_validation(spark):
    df = spark.createDataFrame([("a b",)], "text string")
    with pytest.raises(ValueError, match="n_prunes"):
        unigram_prune_state(df, 0)


def test_piece_counts_match_python_reference(spark):
    # encode state: per-word piece counts under the FINAL pruned
    # vocabulary must equal the reference greedy segmentation's length
    from pyspark.sql import functions as F

    from musicflow_spark.operators.textstats import (
        bpe_word_types,
        unigram_occ_table,
        unigram_piece_counts,
    )

    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    _, vocab = unigram_prune_state(df, 6)
    _, want_vocab = python_unigram(CORPUS, 6)
    types = bpe_word_types(df).filter(F.length("word") <= UNI_MAX_WORD)
    got = {
        r["word"]: r["np"]
        for r in unigram_piece_counts(
            types, unigram_occ_table(types), vocab
        ).collect()
    }
    want = {w: len(_greedy(w, want_vocab)) for w in got}
    assert got == want
    # every trainable word type got a count (coverage is total)
    n_types = types.count()
    assert len(got) == n_types
