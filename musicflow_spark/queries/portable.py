"""Engine-portable float rounding.

``round(x, n)`` on DOUBLE disagrees between engines when the true
value sits exactly on a half boundary at scale n (e.g. a 4-decimal
price product ending in ...50): Spark rounds the exact binary
expansion via BigDecimal HALF_UP while other engines scale first.
``round(x * 10^n) / 10^n`` sidesteps it: the scaling multiply is the
same IEEE-754 operation everywhere, integer rounding of the scaled
value agrees (both engines round half away from zero), and the final
divide is again deterministic.  Used for every float the oracle
hash-compares.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(col: Column, n: int) -> Column:
    """Portable round-to-n-decimals for DOUBLE columns."""
    scale = float(10**n)
    return F.round(col * scale, 0) / scale


def pround_sql(expr: str, n: int) -> str:
    """The DuckDB-side twin of :func:`pround`."""
    scale = 10**n
    return f"round(({expr}) * {scale}.0) / {scale}.0"
