"""Registry invariants: the driver correctness window (first 50
entries) must contain every never-driver-proven query, and the proven
tail must enter stalest-green-first so the window fill re-certifies
the entries the driver has not confirmed for the longest (VERDICT r12
item 2 — the r01/r02 cohort had sat unchecked for 10 rounds under the
old round-keyed stride rotation)."""

from __future__ import annotations

from musicflow_spark.queries.registry import _green_rounds, get_queries

DRIVER_WINDOW = 50


def test_green_rounds_parse_committed_records():
    green = _green_rounds()
    # the repo carries CORRECTNESS_r01..r12 with 273 distinct greens
    # (a handful of retired names also appear — they must simply not
    # crash the parse); rounds are positive ints
    assert len(green) >= 250
    assert all(isinstance(r, int) and r >= 1 for r in green.values())
    names = {q.name for q in get_queries()}
    # every REGISTERED query is covered by some green row as of r12
    # (the judge's zero-never-proven audit); new queries added this
    # round are the expected exception and must sit in the window
    uncovered = names - set(green)
    window = {q.name for q in get_queries()[:DRIVER_WINDOW]}
    assert uncovered <= window, uncovered - window


def test_names_unique_and_never_proven_inside_window():
    qs = get_queries()
    names = [q.name for q in qs]
    assert len(names) == len(set(names))
    green = _green_rounds()
    # EVERY query without a green driver row must sit inside the
    # driver window, or it ships driver-unverified (round-4
    # postmortem: 8 late additions sat at positions 50–57 for a whole
    # round).  Overfilling the window is a decision to make loudly,
    # not a silent queue.
    nonproven = [n for n in names if n not in green]
    assert len(nonproven) <= DRIVER_WINDOW, (
        f"{len(nonproven)} never-driver-proven queries exceed the "
        f"{DRIVER_WINDOW}-query driver window; split the additions "
        "across rounds or drop a query"
    )
    window = set(names[:DRIVER_WINDOW])
    missing = [n for n in nonproven if n not in window]
    assert not missing, missing
    # tiers are contiguous: never-proven strictly before proven
    tiers = [1 if n in green else 0 for n in names]
    assert tiers == sorted(tiers)


def test_proven_tail_is_stalest_first():
    """The proven tier must be ordered by nondecreasing last-green
    round, so the window fill after tier 0 is exactly the stalest
    cohort and re-certification sweeps the whole registry over
    ~len/50 rounds."""
    green = _green_rounds()
    proven_rounds = [
        green[q.name] for q in get_queries() if q.name in green
    ]
    assert proven_rounds == sorted(proven_rounds)
    # the fill the driver sees this round starts at the global
    # minimum (stalest) green round
    if proven_rounds:
        assert proven_rounds[0] == min(green[n] for n in green
                                       if n in {q.name for q in get_queries()})


def test_oracles_present_or_documented_rows_only():
    # every registered query carries a full DuckDB oracle since round 7:
    # the last rows-only row (embedding_pca_scores, d=24 eigendecomp)
    # was retired from the registry in favour of the closed-form
    # embedding_pca_scores_2d twin; the d=24 path stays pytest-certified
    rows_only = {q.name for q in get_queries() if q.oracle is None}
    assert rows_only == set(), rows_only


def test_bench_flags_point_at_registered_queries():
    bench = [q for q in get_queries() if q.bench]
    # BASELINE.md headline set; update together (38 since round 13:
    # knn_ivf_multiprobe and doc_substring_dedup — the budgeted
    # multi-probe ANN rung and the duplicated-substring ladder —
    # joined alongside round 12's doc_unicode_neardup)
    assert len(bench) == 38
