"""Z-order (Morton-interleaved) file layout for multi-column data
skipping.

Complements sources/catalog.py::compact_table: compaction fixes file
COUNT, this fixes file CONTENT.  Sorting a 100 TB table by one column
makes parquet min/max stats selective for that column only; writing it
in Morton order over two or three columns makes row-group stats
selective for ALL of them at once — a predicate on any participating
column prunes most files before a byte is read (the technique behind
Delta/Iceberg OPTIMIZE ZORDER; public space-filling-curve layout
literature).

The key is engine-portable: each column is affinely mapped onto
[0, 2^bits) divide-first in IEEE doubles (exact for spans < 2^53 and
overflow-free for any span — see _scaled), so the registered preview
query's DuckDB oracle recomputes it bit-for-bit, then bits are
interleaved with native shift/and/or expressions.  Everything is Catalyst expressions;
the only driver-side data is the 1-row min/max bounds aggregate.

At scale: repartitionByRange on the key is one range shuffle (the
same cost as any sort-based write), sortWithinPartitions keeps
row-group stats tight inside each file, and the bounds pass is a
scalar aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _scaled(col: str, lo: int, hi: int, bits: int) -> Column:
    """Affine map of a long column onto [0, 2^bits):
    ((x - lo) / span) * (2^bits - 1), evaluated divide-FIRST in
    doubles so no 64-bit product can overflow for wide-span columns
    (epoch-micros spans ~1e15 would wrap a (x-lo)*65535 long
    multiply).  (x - lo) is an exact double for spans < 2^53; the
    divide and multiply are correctly-rounded IEEE ops, so any
    IEEE-conformant engine (the DuckDB oracle included) reproduces
    the result bit-for-bit when it evaluates the SAME operation
    order."""
    span = max(hi - lo, 1)
    top = (1 << bits) - 1
    return ((F.col(col) - F.lit(lo)) / F.lit(float(span))) * F.lit(top)


def morton_key(cols: list[str], bounds: dict[str, tuple[int, int]], bits: int = 16) -> Column:
    """Morton (Z-order) interleave of the scaled columns as a LONG.

    bit j of scaled col i lands at position j * len(cols) + i.  With
    the default 16 bits and <=3 columns the key fits comfortably in
    63 bits.  ``bounds`` maps column -> (min, max) from a prior
    scalar aggregate."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    scaled = [
        F.floor(_scaled(c, *bounds[c], bits)).cast("long") for c in cols
    ]
    key = F.lit(0).cast("long")
    for j in range(bits):
        for i, s in enumerate(scaled):
            bit = F.shiftright(s, j).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, j * n + i))
    return key


def column_bounds(df: DataFrame, cols: list[str]) -> dict[str, tuple[int, int]]:
    """1-row scalar aggregate of (min, max) per key column."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    row = df.agg(*aggs).first()
    for c in cols:
        if row[f"_lo_{c}"] is None:
            raise ValueError(
                f"cannot z-order on {c!r}: no non-null values (empty input?)"
            )
    return {c: (int(row[f"_lo_{c}"]), int(row[f"_hi_{c}"])) for c in cols}


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 16,
) -> dict[str, tuple[int, int]]:
    """Write ``df`` to ``path`` in Z-order over ``cols``: range
    partition on the Morton key (one shuffle, range-balanced files)
    and sort within partitions so row-group min/max stats stay tight.
    The key itself is not persisted.  Returns the bounds used."""
    bounds = column_bounds(df, cols)
    key = morton_key(cols, bounds, bits)
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
    return bounds
