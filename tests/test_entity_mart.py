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
