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

Scale notes (100 TB):
- build: explode to ``n_hashes`` positions per key, map-side-combined
  ``bit_or`` into at most ``m_bits / 64`` (word, bits) rows, folded to
  ONE row holding a sparse ``map<long,long>``.  The bitmap never
  touches the driver.
- probe: ``crossJoin(broadcast(1-row bitmap))`` + a ``forall`` over
  the k probe positions — whole-stage-codegen map work on the scan
  side; no shuffle introduced.
- sizing: m_bits = 2^20 holds ~73k keys at ~1% FP with k=7; the word
  map caps at 16384 entries (~128 KiB serialized) however many keys
  go in.  Bigger build sides: scale m_bits, not the design.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
    map<long,long>`` — a sparse bitmap keyed by 64-bit word index.
    Distributed end-to-end: positions shuffle once (map-side-combined
    ``bit_or`` over at most ``m_bits / 64`` distinct words), and the
    word rows collapse into a single map row executor-side — the
    bitmap never passes through the driver."""
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
    return words.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word_idx", "word"))
        ).alias("__bloom__")
    )


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = 1 << 20,
    n_hashes: int = 7,
) -> DataFrame:
    """Keep only rows whose key is *probably* in the built set: every
    one of the ``n_hashes`` positions must have its bit set.  A word
    absent from the sparse map means no bit in that word was ever set,
    so ``coalesce(..., 0)`` correctly rejects.  Map-only: the 1-row
    bitmap arrives by broadcast (plan shows BroadcastNestedLoopJoin
    over one row, effectively free) and the filter runs at the scan,
    BEFORE any shuffle the caller adds downstream."""
    probed = df.crossJoin(F.broadcast(bloom)).withColumn(
        "__pos__", bloom_positions(F.col(key_col), m_bits, n_hashes)
    )
    # SQL-level lambda: shiftleft/bitand accept column operands in SQL
    # (the Python DSL's shiftleft wants a literal bit count).
    keep = F.expr(
        "forall(__pos__, p ->"
        " (coalesce(element_at(__bloom__, shiftrightunsigned(p, 6)), 0L)"
        "  & shiftleft(1L, cast(p % 64 AS int))) != 0L)"
    )
    return probed.filter(keep).drop("__bloom__", "__pos__")
