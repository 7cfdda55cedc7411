"""Association-rule semantics: hand-computed support/confidence/lift
on crafted baskets, directional asymmetry, and lift symmetry."""

from __future__ import annotations

from musicflow_spark.queries.classic import part_association_rules


def test_rules_match_hand_computation(spark, tmp_path):
    # baskets: {1,2} x3, {1,3} x1, {2,3} x1, {1} x1  -> N = 6
    baskets = [
        (100, [1, 2]), (101, [1, 2]), (102, [1, 2]),
        (103, [1, 3]), (104, [2, 3]), (105, [1]),
    ]
    import pyspark.sql.functions as F

    li = spark.createDataFrame(
        [(ok, pk) for ok, items in baskets for pk in items],
        "l_orderkey long, l_partkey long",
    ).withColumn("l_shipdate", F.to_timestamp(F.lit("2024-01-01")))
    d = tmp_path / "sf"
    li.write.parquet(str(d / "lineitem.parquet"))
    got = {
        (r["antecedent"], r["consequent"]): (
            r["c_ab"], r["c_a"], r["c_c"], r["conf_bp"], r["lift_milli"]
        )
        for r in part_association_rules(spark, str(d)).collect()
    }
    # only the pair (1,2) reaches c_ab >= 3; c_1 = 5, c_2 = 4, N = 6
    assert got == {
        (1, 2): (3, 5, 4, (3 * 10000) // 5, (3 * 6 * 1000) // 20),
        (2, 1): (3, 4, 5, (3 * 10000) // 4, (3 * 6 * 1000) // 20),
    }


def test_lift_is_symmetric_confidence_is_not(spark, sf_dir):
    rows = part_association_rules(spark, sf_dir).collect()
    assert rows, "fixture must surface at least one rule"
    by_pair = {(r["antecedent"], r["consequent"]): r for r in rows}
    asym = 0
    for (a, c), r in by_pair.items():
        mirror = by_pair[(c, a)]
        assert r["lift_milli"] == mirror["lift_milli"]
        asym += r["conf_bp"] != mirror["conf_bp"]
    assert asym > 0, "some rule must have direction-dependent confidence"


def test_skyline_equals_bruteforce_dominance(spark, sf_dir):
    """The running-max skyline must equal the quadratic dominance
    definition: keep p iff no q has (price <=, size >=) with one
    strict."""
    from musicflow_spark.queries.relational import part_price_size_skyline
    from musicflow_spark.sources.catalog import read_table

    parts = [
        (r["p_partkey"], int(round(r["p_retailprice"] * 100)), r["p_size"])
        for r in read_table(spark, sf_dir, "part").collect()
    ]
    want = set()
    for pk, pc, sz in parts:
        dominated = any(
            (qc <= pc and qz >= sz and (qc < pc or qz > sz))
            for _, qc, qz in parts
        )
        if not dominated:
            want.add((pk, pc, sz))
    got = {
        (r["p_partkey"], r["price_cents"], r["p_size"])
        for r in part_price_size_skyline(spark, sf_dir).collect()
    }
    assert got == want and got
