"""MERGE INTO operator semantics (operators/mergeinto.py): all four
branches on a hand-checked fixture, schema/type carriage for unlisted
insert columns, the collision guard, and the one-shuffle plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from musicflow_spark.operators.mergeinto import merge_into


@pytest.fixture(scope="module")
def frames(spark):
    base = spark.createDataFrame(
        [(1, "a", 100), (2, "b", 200), (3, "c", 300), (4, "d", 400)],
        "k int, name string, bal long",
    )
    updates = spark.createDataFrame(
        # k=2: update (+5); k=3: delete (delta too big); k=9: insert
        [(2, 5, None), (3, 9999, None), (9, 50, "new-nine")],
        "k int, delta int, new_name string",
    )
    return base, updates


def _merge(base, updates):
    return merge_into(
        base,
        updates,
        on=["k"],
        update_set={"bal": F.col("bal") + F.col("delta")},
        delete_when=F.col("delta") > 1000,
        insert_set={"name": F.col("new_name"), "bal": F.col("delta").cast("long")},
    )


def test_all_four_branches(frames):
    base, updates = frames
    got = {r.k: (r.name, r.bal) for r in _merge(base, updates).collect()}
    assert got == {
        1: ("a", 100),          # not matched by source: carried
        2: ("b", 205),          # matched-update
        4: ("d", 400),          # not matched by source: carried
        9: ("new-nine", 50),    # not-matched-insert
    }                            # 3 deleted


def test_unlisted_insert_column_is_typed_null(frames):
    base, updates = frames
    out = merge_into(
        base, updates, on=["k"],
        insert_set={"bal": F.col("delta").cast("long")},
    )
    row = {r.k: r for r in out.collect()}[9]
    assert row.name is None and row.bal == 50
    assert dict(out.dtypes)["name"] == "string"


def test_null_delete_condition_does_not_fire(spark):
    """ANSI/Delta MERGE: a NULL `WHEN MATCHED AND cond THEN DELETE`
    condition does not fire — the matched row falls through to update.
    Regression for the 3-valued-logic bug where filter(~(matched &
    NULL)) silently dropped the row."""
    base = spark.createDataFrame(
        [(1, None, 10), (2, "y", 20), (3, "n", 30)], "k int, x string, bal long"
    )
    updates = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "k int, delta int")
    out = merge_into(
        base,
        updates,
        on=["k"],
        update_set={"bal": F.col("bal") + F.col("delta")},
        delete_when=F.col("x") == "y",  # NULL for k=1
    )
    got = {r.k: r.bal for r in out.collect()}
    assert got == {1: 11, 3: 33}  # k=1 updated (NULL cond), k=2 deleted


def test_collision_guard(frames):
    base, _ = frames
    bad = base.select("k", F.col("bal").alias("name"))  # name collides
    with pytest.raises(ValueError, match="name"):
        merge_into(base, bad, on=["k"])


def test_schema_matches_base(frames):
    base, updates = frames
    assert _merge(base, updates).columns == base.columns


def test_single_shuffle_no_cartesian(frames):
    base, updates = frames
    out = _merge(base, updates)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # one full-outer join = one exchange per side; AQE repeats
    # initial+final subtrees in the plan string, hence <= 4
    assert plan.count("Exchange hashpartitioning") <= 4, plan


def test_bucketed_merge_runs_shuffle_free(spark, tmp_path):
    """The docstring's at-scale claim, proven on the plan: base and
    updates both bucketed by the merge key -> merge_into's full-outer
    join reads pre-co-located buckets and plans ZERO shuffle
    exchanges."""
    from musicflow_spark.sources.catalog import read_table, write_table

    sf = "/root/testdata/sf0.001"
    base = read_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("k"), F.col("c_name").alias("name")
    )
    upd = (
        read_table(spark, sf, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).cast("int").alias("n_orders"))
    )
    for name, df in (("mb_base", base), ("mb_upd", upd)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        write_table(df, str(tmp_path / name), bucket_by=(8, ["k"]), table_name=name)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        merged = merge_into(
            spark.table("mb_base"),
            spark.table("mb_upd"),
            on=["k"],
            update_set={"name": F.concat(F.col("name"), F.lit("*"))},
            insert_set={"name": F.lit("new")},
        )
        merged.collect()
        plan = merged._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin FullOuter" in plan or "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
