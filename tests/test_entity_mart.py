"""Entity-resolution mart: crafted duplicate groups with a known
golden record, and the attribute gate blocking cross-nation merges."""

from __future__ import annotations

from pyspark.sql import functions as F

from musicflow_spark.queries.warehouse import customer_entity_mart


def test_entity_mart_merges_and_survivorship(spark, tmp_path):
    rows = [
        # trio of near-identical names, same nation -> one entity;
        # golden = highest balance (c2), total = sum of cents
        (1, "Customer#000000001", 5, 100.10, "BUILDING"),
        (2, "Customer#000000002", 5, 900.02, "BUILDING"),  # dist(1,2)=1
        (3, "Customer#00000000x", 5, 900.02, "AUTO"),      # ties c2 on cents
        # same-name pair in DIFFERENT nations -> the gate keeps them apart
        (10, "Customer#000000099", 1, 50.0, "AUTO"),
        (11, "Customer#000000099", 2, 60.0, "AUTO"),
        # a singleton
        (20, "Zzz#unique", 5, 10.0, "AUTO"),
    ]
    cust = spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    d = tmp_path / "sf"
    cust.write.parquet(str(d / "customer.parquet"))
    got = {r["cluster_id"]: r for r in customer_entity_mart(spark, str(d)).collect()}

    # only the trio forms a multi-member entity; singletons and the
    # gate-blocked same-name pair are filtered by n_members > 1
    assert set(got) == {1}
    e = got[1]
    assert e["n_members"] == 3
    assert e["total_balance_cents"] == 10010 + 90002 + 90002
    # survivorship: max cents, tie broken to the LOWER custkey (2 < 3)
    assert e["golden_custkey"] == 2
    assert e["golden_name"] == "Customer#000000002"


def test_entity_clusters_partition_the_fixture(spark, sf_dir):
    """Multi-member entities never overlap and every golden record is
    one of its own cluster's members (cluster_id = min member key)."""
    from musicflow_spark.sources.catalog import read_table

    rows = customer_entity_mart(spark, sf_dir).collect()
    assert rows
    n_cust = read_table(spark, sf_dir, "customer").count()
    assert sum(r["n_members"] for r in rows) <= n_cust
    for r in rows:
        assert r["cluster_id"] <= r["golden_custkey"]


def test_checksum_detects_single_row_drift(spark, sf_dir, tmp_path):
    """Replica equality and tamper detection: the checksum of an exact
    copy matches; flipping ONE row's priority flips that status
    group's xor_hash (and only that group)."""
    from musicflow_spark.queries.warehouse import orders_table_checksum
    from musicflow_spark.sources.catalog import read_table

    base = {
        r["o_orderstatus"]: (r["n_rows"], r["xor_hash"], r["sum_hash_mod"])
        for r in orders_table_checksum(spark, sf_dir).collect()
    }
    orders = read_table(spark, sf_dir, "orders")
    copy_dir = tmp_path / "copy"
    orders.repartition(7).write.parquet(str(copy_dir / "orders.parquet"))
    copy = {
        r["o_orderstatus"]: (r["n_rows"], r["xor_hash"], r["sum_hash_mod"])
        for r in orders_table_checksum(spark, str(copy_dir)).collect()
    }
    assert copy == base  # partitioning/order-independent

    first = orders.orderBy("o_orderkey").limit(1).collect()[0]
    tampered = orders.withColumn(
        "o_orderpriority",
        F.when(
            F.col("o_orderkey") == first["o_orderkey"], F.lit("9-TAMPERED")
        ).otherwise(F.col("o_orderpriority")),
    )
    tdir = tmp_path / "tampered"
    tampered.write.parquet(str(tdir / "orders.parquet"))
    t = {
        r["o_orderstatus"]: (r["n_rows"], r["xor_hash"], r["sum_hash_mod"])
        for r in orders_table_checksum(spark, str(tdir)).collect()
    }
    changed = {k for k in base if t.get(k) != base[k]}
    assert changed == {first["o_orderstatus"]}


def test_psi_zero_on_identical_halves_positive_on_shift(spark, tmp_path):
    """Identical expected/actual distributions -> every bin's PSI
    contribution is ~0; a shifted actual distribution -> positive
    total PSI."""
    import datetime as dt

    from musicflow_spark.queries.warehouse import PSI_SCALE, orders_psi_drift

    rows = []
    # identical halves: same price ladder in 1995 (expected) and 1997
    for i in range(400):
        price = 10_000.0 + (i % 10) * 60_000.0
        rows.append((i, 1, "O", price, dt.datetime(1995, 1, 1), "1-URGENT"))
        rows.append((1000 + i, 1, "O", price, dt.datetime(1997, 1, 1), "1-URGENT"))
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    d = tmp_path / "same"
    df.write.parquet(str(d / "orders.parquet"))
    same = orders_psi_drift(spark, str(d)).collect()
    assert sum(abs(r["psi_micro"]) for r in same) <= len(same)  # ~0 + rounding

    # shifted: actual prices moved up two bins
    rows2 = [
        (k, c, s, p + (120_000.0 if ts.year >= 1996 else 0.0), ts, pr)
        for k, c, s, p, ts, pr in rows
    ]
    df2 = spark.createDataFrame(rows2, df.schema)
    d2 = tmp_path / "shift"
    df2.write.parquet(str(d2 / "orders.parquet"))
    shifted = orders_psi_drift(spark, str(d2)).collect()
    assert sum(r["psi_micro"] for r in shifted) / PSI_SCALE > 0.1


def test_benford_shares_and_expected_law(spark, sf_dir):
    """Digits cover a subset of 1..9, shares re-sum to ~100%, and the
    expected column IS Benford's law (monotone decreasing, d=1 at
    ~30.1%)."""
    from musicflow_spark.queries.warehouse import (
        BENFORD_SCALE,
        orders_benford_screen,
    )

    rows = {r["digit"]: r for r in orders_benford_screen(spark, sf_dir).collect()}
    assert set(rows) <= set(range(1, 10))
    assert abs(sum(r["share_bp"] for r in rows.values()) - 10000) <= len(rows)
    exp = [rows[d]["benford_micro"] for d in sorted(rows)]
    assert exp == sorted(exp, reverse=True)
    if 1 in rows:
        assert abs(rows[1]["benford_micro"] / BENFORD_SCALE - 0.30103) < 1e-4
