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


def test_funnel_regex_counts_nonoverlapping(spark, tmp_path):
    """Crafted history: 'v c p v c c p v p' -> two funnel matches
    (vc+p twice; the trailing vp lacks a click). Order comes from ts
    with event_id tiebreak."""
    import datetime as dt

    types = ["view", "click", "purchase", "view", "click", "click",
             "purchase", "view", "purchase"]
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), 1, t, 0.0, "{}")
        for i, t in enumerate(types)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = tmp_path / "sf"
    ev.write.parquet(str(d / "events.parquet"))
    from musicflow_spark.queries.events import user_funnel_sequences

    [r] = user_funnel_sequences(spark, str(d)).collect()
    assert r["seq_len"] == 9
    assert r["n_funnels"] == 2
    assert r["converted"] is True


def test_chi2_cells_conserve_marginals(spark, sf_dir):
    """Expected counts must re-sum to N (within per-cell rounding) and
    the statistic must match a float recomputation from the observed
    table."""
    from musicflow_spark.queries.warehouse import (
        CHI2_SCALE,
        segment_priority_chi2,
    )

    rows = segment_priority_chi2(spark, sf_dir).collect()
    assert len(rows) == 25
    n = sum(r["observed"] for r in rows)
    exp_total = sum(r["expected_micro"] for r in rows) / CHI2_SCALE
    assert abs(exp_total - n) < 1e-3
    # float recompute of the statistic from the observed cells
    from collections import defaultdict

    rt, ct = defaultdict(int), defaultdict(int)
    for r in rows:
        rt[r["c_mktsegment"]] += r["observed"]
        ct[r["o_orderpriority"]] += r["observed"]
    chi2 = 0.0
    for r in rows:
        e = rt[r["c_mktsegment"]] * ct[r["o_orderpriority"]] / n
        chi2 += (r["observed"] - e) ** 2 / e
    got = sum(r["chi2_cell_micro"] for r in rows) / CHI2_SCALE
    assert abs(got - chi2) < 25 / CHI2_SCALE * 1000  # 25 cells x rounding


def test_mad_outliers_breakdown_resistance(spark, tmp_path):
    """One enormous spike must be flagged without dragging the median
    or MAD (the z-score screen's stddev would explode instead)."""
    import datetime as dt

    vals = [10.0, 11.0, 9.0, 10.5, 10.0, 9.5, 11.5, 10.0, 1_000_000.0]
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), 1, "click", v, "{}")
        for i, v in enumerate(vals)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = tmp_path / "sf"
    ev.write.parquet(str(d / "events.parquet"))
    from musicflow_spark.queries.events import event_value_mad_outliers

    out = event_value_mad_outliers(spark, str(d)).collect()
    assert [r["event_id"] for r in out] == [8]
    # median stays at the bulk (1000 cents) — the spike didn't move it
    assert out[0]["med"] == 1000.0


def test_giant_basket_is_excluded_from_pairing(spark, tmp_path):
    """One pathological 5000-item order must not explode the pair
    join: the basket cap drops it, leaving the small baskets' rules
    untouched."""
    import pyspark.sql.functions as F

    small = [(100 + i, [1, 2]) for i in range(3)]
    rows = [(ok, pk) for ok, items in small for pk in items]
    rows += [(999, pk) for pk in range(10_000, 15_000)]  # the monster
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    d = tmp_path / "sf"
    li.write.parquet(str(d / "lineitem.parquet"))
    got = {
        (r["antecedent"], r["consequent"]): r["c_ab"]
        for r in part_association_rules(spark, str(d)).collect()
    }
    # only the small baskets' pair survives; N excludes the monster
    assert got == {(1, 2): 3, (2, 1): 3}
