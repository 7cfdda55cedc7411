"""Mergeable Bloom-filter build / probe — a hand-rolled runtime
filter (semi-join reduction) for joins whose build side is too big to
broadcast but whose KEY SET compresses into a few KiB of bits.

Reference analogue: the reference prunes its big side by probing small
in-memory key sets (pandas ``isin`` over cached ids — the liked-set /
cache membership probes in ``dags/spotify_elt.py``).  At 100 TB the
same pruning must happen WITHOUT shipping the key set row-by-row:
build a fixed-size bitmap once (one shuffle of ``n_keys * n_hashes``
positions, map-side bit_or-combined), broadcast the bitmap
(``m_bits / 8`` bytes regardless of key count), and filter the fact
scan map-only BEFORE its shuffle.  False positives are possible (rate
``~(1 - e^(-kn/m))^k``), false negatives are not — so a downstream
exact join stays correct while its shuffled input shrinks by the
build-side selectivity.  This is Spark's own AQE
``InjectRuntimeFilter`` bloom strategy, expressed as first-class
operators so the pruning is plan-visible, reusable across stages, and
testable.

Representation: the bitmap is a DENSE ``array<long>`` of
``m_bits / 64`` words in ONE row.  Dense beats a sparse
``map<long,long>`` decisively on the probe side: ``element_at`` on an
unsafe map is a LINEAR scan (measured ~200 us/row at 16k entries —
7 probes x 16k comparisons), while dense array indexing is O(1); and
the unrolled probe predicate is plain (non-lambda) expressions, so it
stays inside codegen.  Memory cost of density is capped at
``m_bits / 8`` bytes (128 KiB at m=2^20) regardless of key count.

Scale notes (100 TB):
- build: explode to ``n_hashes`` positions per key, map-side-combined
  ``bit_or`` into at most ``m_bits / 64`` (word, bits) rows, densified
  against a range frame and folded to ONE row executor-side — the
  bitmap never touches the driver.
- probe: ``crossJoin(broadcast(1-row bitmap))`` + ``n_hashes``
  unrolled bit tests at the scan; no shuffle introduced.
- sizing: m_bits = 2^20 holds ~73k keys at ~1% FP with k=7.  Bigger
  build sides: scale m_bits, not the design.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _check_identifier(key_col: str) -> str:
    """Probe predicates interpolate ``key_col`` into raw SQL (same
    contract as qsketch's ``_bin_expr``); reject names that would need
    backtick quoting up front instead of mis-parsing silently."""
    if not _IDENT_RE.match(key_col):
        raise ValueError(
            f"key_col must be a plain SQL identifier, got {key_col!r}"
        )
    return key_col


def _probe_conds(key_col: str, m_bits: int, n_hashes: int) -> str:
    """The unrolled bit-test predicate, prefixed with a bitmap-width
    guard: ``size(__bloom__) == m_bits/64`` must hold or the probe
    positions index a DIFFERENT modulus than the build side used and
    the bit tests silently produce false negatives (breaking the
    no-false-negative contract — the downstream exact verify join then
    loses rows).  The guard RAISES on mismatch (first row evaluated)
    rather than filtering, so a build/probe parameter drift is a loud
    runtime error, never a quietly-wrong result."""
    _check_identifier(key_col)
    guard = (
        f"(CASE WHEN size(__bloom__) != {m_bits // 64} THEN "
        f"cast(raise_error(concat('bloom probe m_bits mismatch: bitmap has ', "
        f"size(__bloom__), ' words, probe expects {m_bits // 64}')) AS boolean) "
        f"ELSE true END)"
    )
    conds = [guard]
    for i in range(n_hashes):
        pos = f"pmod(xxhash64({key_col}, {i}), {m_bits})"
        conds.append(
            f"(element_at(__bloom__, cast(shiftrightunsigned({pos}, 6) AS int) + 1)"
            f" & shiftleft(1L, cast({pos} % 64 AS int))) != 0L"
        )
    return " AND ".join(conds)


def bloom_positions(key: Column, m_bits: int, n_hashes: int) -> Column:
    """``array<long>`` of ``n_hashes`` bit positions in ``[0, m_bits)``
    for one key: ``position_i = pmod(xxhash64(key, i), m_bits)``.
    Hashing the probe index alongside the key yields ``n_hashes``
    independent hash functions from the one xxhash64 primitive."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: F.pmod(F.xxhash64(key, i), F.lit(m_bits)),
    )


def bloom_build(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 20, n_hashes: int = 7
) -> DataFrame:
    """Fold a key column into a ONE-ROW frame with column ``__bloom__:
    array<long>`` — a dense bitmap of ``m_bits / 64`` words.
    Distributed end-to-end: positions shuffle once (map-side-combined
    ``bit_or`` over at most ``m_bits / 64`` distinct words), the sparse
    words densify against a range frame, and the word rows collapse
    into a single sorted array executor-side — the bitmap never passes
    through the driver."""
    n_words = m_bits // 64
    words = (
        keys.select(
            F.explode(
                bloom_positions(F.col(key_col), m_bits, n_hashes)
            ).alias("pos")
        )
        .select(
            F.shiftrightunsigned(F.col("pos"), 6).alias("word_idx"),
            F.expr("shiftleft(1L, cast(pos % 64 AS int))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )
    dense = (
        keys.sparkSession.range(n_words)
        .join(F.broadcast(words), F.col("id") == F.col("word_idx"), "left")
        .select(
            F.col("id").alias("word_idx"),
            F.coalesce("word", F.lit(0).cast("long")).alias("word"),
        )
    )
    return dense.agg(
        F.array_sort(F.collect_list(F.struct("word_idx", "word"))).alias("s")
    ).select(F.transform("s", lambda s: s["word"]).alias("__bloom__"))


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = 1 << 20,
    n_hashes: int = 7,
) -> DataFrame:
    """Keep only rows whose key is *probably* in the built set: every
    one of the ``n_hashes`` positions must have its bit set.  Map-only:
    the 1-row bitmap arrives by broadcast (BroadcastNestedLoopJoin over
    one row, effectively free) and the unrolled bit tests run at the
    scan, BEFORE any shuffle the caller adds downstream.

    ``key_col`` must be a plain SQL identifier (validated — it is
    interpolated into the probe predicate, same contract as qsketch's
    ``_bin_expr``).  ``m_bits``/``n_hashes`` must match the build-side
    parameters; a bitmap-width guard raises at runtime on ``m_bits``
    drift (``n_hashes`` drift is not detectable from the bitmap alone:
    extra probe hashes only ADD false negatives, so keep the two
    parameters paired in one config site as all callers here do).

    NULL keys: xxhash64 skips null inputs, so NULL hashes like a
    distinct constant — a probe-side NULL passes iff the build side
    contained a NULL.  An equi-join never matches NULLs, so the probe
    admits a SUPERSET of the join result on null-bearing keys; keep
    the exact verify join downstream (the intended sandwich), or
    pre-filter nulls when using the probe alone."""
    probed = df.crossJoin(F.broadcast(bloom))
    return probed.filter(
        F.expr(_probe_conds(key_col, m_bits, n_hashes))
    ).drop("__bloom__")


def bloom_word_rows(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    m_bits: int = 1 << 20,
    n_hashes: int = 7,
) -> DataFrame:
    """Per-group position-expanded rows ``(group..., word_idx, mask)``
    ready for a ``bit_or`` aggregation — the mergeable/streaming build
    form.  ``bit_or`` partials are associative, commutative, and
    idempotent, so any micro-batch chunking (or replay) bit_or-merges
    to EXACTLY the batch-built bitmap — the streaming maintenance tier
    needs no state store (see streaming/events.py::
    foreach_batch_sketch_merge with bit_or build/merge aggs)."""
    return df.select(
        *group_cols,
        F.explode(bloom_positions(F.col(key_col), m_bits, n_hashes)).alias("pos"),
    ).select(
        *group_cols,
        F.shiftrightunsigned(F.col("pos"), 6).alias("word_idx"),
        F.expr("shiftleft(1L, cast(pos % 64 AS int))").alias("mask"),
    )


def bloom_from_words(
    words: DataFrame,
    group_cols: list[str],
    m_bits: int = 1 << 20,
    word_col: str = "word",
) -> DataFrame:
    """Fold aggregated ``(group..., word_idx, word)`` rows into
    per-group dense bitmaps ``(group..., __bloom__: array<long>)`` —
    the probe-ready form of the mergeable tier.  Densifies against a
    group x range grid (groups * m_bits/64 rows, executor-side)."""
    n_words = m_bits // 64
    grid = words.select(*group_cols).distinct().crossJoin(
        F.broadcast(
            words.sparkSession.range(n_words).select(
                F.col("id").alias("word_idx")
            )
        )
    )
    dense = grid.join(words, [*group_cols, "word_idx"], "left").select(
        *group_cols,
        "word_idx",
        F.coalesce(word_col, F.lit(0).cast("long")).alias("word"),
    )
    return dense.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list(F.struct("word_idx", "word"))).alias("s")
    ).select(
        *group_cols, F.transform("s", lambda s: s["word"]).alias("__bloom__")
    )


def bloom_probe_grouped(
    df: DataFrame,
    key_col: str,
    blooms: DataFrame,
    group_cols: list[str],
    m_bits: int = 1 << 20,
    n_hashes: int = 7,
) -> DataFrame:
    """Probe rows against their own group's bitmap (e.g. events vs the
    per-day bloom): broadcast the bitmap table, join on the group
    columns, run the same unrolled bit tests.  ``key_col`` must be a
    plain SQL identifier (validated); the same bitmap-width guard as
    ``bloom_probe`` raises on ``m_bits`` drift."""
    probed = df.join(F.broadcast(blooms), group_cols)
    return probed.filter(
        F.expr(_probe_conds(key_col, m_bits, n_hashes))
    ).drop("__bloom__")


def bloom_params(n_keys: int, fp_rate: float = 0.01) -> tuple[int, int]:
    """Classic sizing: (m_bits, n_hashes) for ``n_keys`` at the target
    false-positive rate.  m = -n·ln(p)/ln(2)^2 rounded UP to a power
    of two (pmod stays cheap and the dense word array packs evenly),
    k = round(ln(2)·m/n) clamped to >= 1.  Power-of-two rounding only
    LOWERS the realized FP rate."""
    import math

    if n_keys <= 0:
        raise ValueError("n_keys must be positive")
    if not 0 < fp_rate < 1:
        raise ValueError("fp_rate must be in (0, 1)")
    m_exact = -n_keys * math.log(fp_rate) / (math.log(2) ** 2)
    m_bits = 1 << max(6, math.ceil(math.log2(m_exact)))
    n_hashes = max(1, round(math.log(2) * m_bits / n_keys))
    return m_bits, n_hashes
