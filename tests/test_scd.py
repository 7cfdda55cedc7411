"""SCD Type-2 merge + incremental-rollup operator tests
(operators/scd.py).  The registered queries prove one-batch parity
against DuckDB; these cover the multi-batch lifecycle and the edge
rules the oracle scenario can't reach (new-key insert mid-life,
missing-key untouched, closed history immutability)."""

from __future__ import annotations

from pyspark.sql import functions as F

from musicflow_spark.operators.scd import (
    merge_partial_rollups,
    scd2_apply_batches,
    scd2_init,
    scd2_merge,
)

KEY, TRACKED = "k", ["bal", "seg"]


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, bal long, seg string")


def _by_key(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["k"], []).append(
            (r["bal"], r["seg"], r["valid_from"], r["valid_to"])
        )
    by_validity = lambda t: (t[2], t[3] if t[3] is not None else 1 << 60)  # noqa: E731
    return {k: sorted(v, key=by_validity) for k, v in out.items()}


def test_scd2_change_noop_missing_and_insert(spark):
    hist = scd2_init(_snap(spark, [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")]))
    updates = _snap(
        spark,
        [
            (1, 11, "a"),  # changed -> close + reopen
            (2, 20, "b"),  # identical -> no new version
            (4, 40, "d"),  # brand-new key -> insert open
            #  3 absent -> untouched
        ],
    )
    out = _by_key(scd2_merge(hist, updates, KEY, TRACKED, batch_id=1))
    assert out[1] == [(10, "a", 0, 1), (11, "a", 1, None)]
    assert out[2] == [(20, "b", 0, None)]
    assert out[3] == [(30, "c", 0, None)]
    assert out[4] == [(40, "d", 1, None)]


def test_scd2_second_batch_leaves_closed_rows_alone(spark):
    hist = scd2_apply_batches(
        scd2_init(_snap(spark, [(1, 10, "a")])),
        [(1, _snap(spark, [(1, 11, "a")])), (2, _snap(spark, [(1, 12, "z")]))],
        KEY,
        TRACKED,
    )
    assert _by_key(hist)[1] == [
        (10, "a", 0, 1),
        (11, "a", 1, 2),
        (12, "z", 2, None),
    ]
    # exactly one open row per key, intervals abut
    open_rows = hist.filter(F.col("valid_to").isNull())
    assert open_rows.count() == 1


def test_scd2_null_safe_compare(spark):
    hist = scd2_init(_snap(spark, [(1, None, "a"), (2, 20, None)]))
    updates = _snap(spark, [(1, None, "a"), (2, 20, "b")])
    out = _by_key(scd2_merge(hist, updates, KEY, TRACKED, batch_id=1))
    assert out[1] == [(None, "a", 0, None)]  # null == null -> no-op
    assert out[2] == [(20, None, 0, 1), (20, "b", 1, None)]  # null != 'b'


def test_merge_partial_rollups_equals_recompute(spark):
    df = spark.range(1000).select(
        (F.col("id") % 7).alias("g"), (F.col("id") * 3).alias("v")
    )
    parts = [
        df.filter(F.col("id") % 3 == i)
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("v"))
        for i in range(3)
    ]
    merged = {
        r["g"]: (r["n"], r["v"])
        for r in merge_partial_rollups(parts, ["g"]).collect()
    }
    full = {
        r["g"]: (r["n"], r["v"])
        for r in df.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("v"))
        .collect()
    }
    assert merged == full


def _diff_map(rows):
    return {r["k"]: r["diff_status"] for r in rows}


def test_snapshot_diff_classifies_all_four(spark):
    from musicflow_spark.operators.scd import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], ["k", "v"]
    )
    new = spark.createDataFrame(
        [(1, 10), (2, 99), (4, 40)], ["k", "v"]
    )
    out = snapshot_diff(old, new, ["k"], ["v"]).collect()
    assert _diff_map(out) == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        4: "added",
    }
    by_k = {r["k"]: r for r in out}
    assert by_k[3]["new_v"] is None and by_k[3]["old_v"] == 30
    assert by_k[4]["old_v"] is None and by_k[4]["new_v"] == 40


def test_snapshot_diff_null_transition_is_changed(spark):
    """NULL→value and value→NULL must classify as changed (null-safe
    compare), and NULL→NULL as unchanged."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    from musicflow_spark.operators.scd import snapshot_diff

    schema = StructType(
        [StructField("k", IntegerType()), StructField("v", IntegerType())]
    )
    old = spark.createDataFrame([(1, None), (2, 5), (3, None)], schema)
    new = spark.createDataFrame([(1, 7), (2, None), (3, None)], schema)
    out = _diff_map(snapshot_diff(old, new, ["k"], ["v"]).collect())
    assert out == {1: "changed", 2: "changed", 3: "unchanged"}


def test_snapshot_diff_empty_sides(spark):
    from musicflow_spark.operators.scd import snapshot_diff

    frame = spark.createDataFrame([(1, 10)], ["k", "v"])
    empty = frame.filter(F.lit(False))
    assert _diff_map(
        snapshot_diff(frame, empty, ["k"], ["v"]).collect()
    ) == {1: "removed"}
    assert _diff_map(
        snapshot_diff(empty, frame, ["k"], ["v"]).collect()
    ) == {1: "added"}


def test_snapshot_diff_rejects_empty_compare_cols(spark):
    import pytest as _pytest

    from musicflow_spark.operators.scd import snapshot_diff

    frame = spark.createDataFrame([(1, 10)], ["k", "v"])
    with _pytest.raises(ValueError, match="compare_cols"):
        snapshot_diff(frame, frame, ["k"], [])


def test_join_view_ivm_partials_are_disjoint_and_complete(spark):
    """The four delta joins partition the joined row set: their
    n_orders sum equals the direct join count, and the merged view
    equals the direct recompute exactly."""
    from pyspark.sql import functions as F

    from musicflow_spark.queries.warehouse import segment_join_view_ivm
    from musicflow_spark.sources.catalog import read_table

    sf = "/root/testdata/sf0.001"
    got = {
        r["c_mktsegment"]: (r["n_orders"], r["revenue_cents"])
        for r in segment_join_view_ivm(spark, sf).collect()
    }
    orders = read_table(spark, sf, "orders")
    cust = read_table(spark, sf, "customer")
    direct = {
        r["c_mktsegment"]: (r["n"], r["s"])
        for r in orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("s"),
        )
        .collect()
    }
    assert got == direct
