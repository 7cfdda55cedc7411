"""Registry invariants: the driver correctness window (first 50
entries) must contain only never-driver-proven queries, and the tier
lists must stay consistent with the registered names — a typo in
either list silently mis-slots queries across rounds."""

from __future__ import annotations

from musicflow_spark.queries.registry import (
    _DRIVER_PROVEN,
    _FILL_STRIDE,
    _NEW_THIS_ROUND,
    _ROUND,
    get_queries,
)

DRIVER_WINDOW = 50


def test_tier_lists_reference_real_queries():
    names = {q.name for q in get_queries()}
    assert set(_DRIVER_PROVEN) <= names, set(_DRIVER_PROVEN) - names
    assert set(_NEW_THIS_ROUND) <= names, set(_NEW_THIS_ROUND) - names
    assert not set(_DRIVER_PROVEN) & set(_NEW_THIS_ROUND)


def test_names_unique_and_window_is_tier0():
    qs = get_queries()
    names = [q.name for q in qs]
    assert len(names) == len(set(names))
    proven, fresh = set(_DRIVER_PROVEN), set(_NEW_THIS_ROUND)
    # EVERY query without a green driver row — tier-0 and tier-1 alike —
    # must sit inside the driver window, or it ships driver-unverified
    # (round-4 postmortem: 8 late additions sat at positions 50–57 for a
    # whole round).  Overfilling the window is a decision to make loudly,
    # not a silent queue.
    nonproven = [n for n in names if n not in proven]
    assert len(nonproven) <= DRIVER_WINDOW, (
        f"{len(nonproven)} never-driver-proven queries exceed the "
        f"{DRIVER_WINDOW}-query driver window; rotate this round's greens "
        "into _DRIVER_PROVEN or drop a query"
    )
    window = set(names[:DRIVER_WINDOW])
    missing = [n for n in nonproven if n not in window]
    assert not missing, missing
    # and tiers are contiguous: tier-0, then tier-1, then proven
    tiers = [2 if n in proven else (1 if n in fresh else 0) for n in names]
    assert tiers == sorted(tiers)


def test_proven_fill_rotates_by_round():
    """VERDICT r07 item 1: the proven tier must enter the registry in
    round-keyed rotated order — offset (_ROUND * _FILL_STRIDE) %
    len(_DRIVER_PROVEN) — so the driver window's proven fill
    re-certifies a different slice each round instead of the same
    module-order prefix forever."""
    names = [q.name for q in get_queries()]
    proven_names = [n for n in names if n in set(_DRIVER_PROVEN)]
    n = len(_DRIVER_PROVEN)
    offset = (_ROUND * _FILL_STRIDE) % n
    expected = [
        _DRIVER_PROVEN[(offset + i) % n] for i in range(n)
    ]
    assert proven_names == expected
    # the fill visible in this round's driver window must NOT be the
    # fixed head of _DRIVER_PROVEN (the pre-rotation failure mode),
    # unless the offset happens to be 0 this round
    if offset:
        n_nonproven = len(names) - n
        fill = proven_names[: DRIVER_WINDOW - n_nonproven]
        assert fill and fill[0] == _DRIVER_PROVEN[offset]
        assert fill[0] != _DRIVER_PROVEN[0]


def test_oracles_present_or_documented_rows_only():
    # every registered query carries a full DuckDB oracle since round 7:
    # the last rows-only row (embedding_pca_scores, d=24 eigendecomp)
    # was retired from the registry in favour of the closed-form
    # embedding_pca_scores_2d twin; the d=24 path stays pytest-certified
    rows_only = {q.name for q in get_queries() if q.oracle is None}
    assert rows_only == set(), rows_only


def test_bench_flags_point_at_registered_queries():
    bench = [q for q in get_queries() if q.bench]
    # BASELINE.md headline set; update together (36 since round 12:
    # doc_unicode_neardup — the canonical-text near-dup rung — joined
    # alongside round 11's corpus_training_batch_mart)
    assert len(bench) == 36
