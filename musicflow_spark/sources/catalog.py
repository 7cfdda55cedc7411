"""Warehouse catalog: the parquet-at-rest layer that replaces BigQuery.

The reference stores every table in BigQuery datasets and routes them
with a dbt macro (reference: dbt/macros/generate_schema_name.sql:1-14).
Here a catalog is a directory of parquet files; tables register as temp
views so both the DataFrame API and ``spark.sql`` see one namespace.

Scale note: reads are plain ``spark.read.parquet`` so Catalyst keeps
predicate pushdown / column pruning / partition pruning; writers go
through :func:`write_table` which exposes ``partition_by`` and
``bucket_by`` hooks for the 100 TB layout without changing call sites.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

#: the driver-generated synthetic tables (TESTDATA.md)
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one catalog table. Accepts both ``dir/name.parquet`` files
    and ``dir/name/`` parquet directories (partitioned layout).

    Ingest normalization: the events table is written with parquet
    TIMESTAMP(NANOS), which Spark has no native type for.  We read
    nanos as long (legacy conf) and truncate to microseconds at the
    scan — the same truncation DuckDB applies — so downstream
    operators see a plain TimestampType.
    """
    from pyspark.sql import functions as F

    file_path = os.path.join(sf_dir, f"{name}.parquet")
    dir_path = os.path.join(sf_dir, name)
    path = file_path if os.path.exists(file_path) else dir_path
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Register every catalog table as a temp view; returns the frames."""
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = read_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
    table_name: str | None = None,
) -> None:
    """Write a table with the reference's load semantics.

    ``mode='overwrite'`` mirrors BigQuery ``WRITE_TRUNCATE``
    (reference: dags/scripts/youtube_elt.py:336-362), ``'append'``
    mirrors ``WRITE_APPEND``.

    ``bucket_by=(n, cols)`` requires ``table_name`` (bucketing is a
    metastore feature); it pre-co-locates later joins on ``cols`` so
    they run shuffle-free — the 100 TB path for the big fact tables.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        if not table_name:
            raise ValueError("bucket_by requires table_name (saveAsTable)")
        writer.bucketBy(n, *cols).sortBy(*cols).option("path", path).saveAsTable(
            table_name
        )
        return
    writer.parquet(path)


def overwrite_touched_partitions(
    spark: SparkSession,
    staged: DataFrame,
    path: str,
    partition_by: list[str],
    touched: list[tuple],
) -> list[tuple]:
    """Commit a partition-local fold that may DELETE rows: dynamic
    partition overwrite of ``staged``, plus explicit removal of any
    ``touched`` partition that ended up with NO rows.

    Dynamic overwrite only replaces partitions PRESENT in the staged
    frame — a partition whose rows were all deleted contributes no
    rows, so its stale files would silently survive the commit (the
    classic delete-fold hazard; table formats with delete support
    track this in metadata, plain parquet layouts must drop the
    directory).  Removal goes through the Hadoop FileSystem of
    ``path`` so the same code serves local disk and HDFS/object
    stores.

    ``touched`` is the bounded partition-tuple list the fold already
    collected to build its read-back filter; the survivors collect is
    bounded by it.  Returns the list of partitions removed as empty.
    """
    (
        staged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )
    remaining = {
        tuple(int(r[c]) for c in partition_by)
        for r in staged.select(*partition_by).distinct().collect()
    }
    emptied = [t for t in touched if tuple(int(v) for v in t) not in remaining]
    if emptied:
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        for t in emptied:
            subdir = "/".join(
                f"{c}={v}" for c, v in zip(partition_by, t)
            )
            p = jvm.org.apache.hadoop.fs.Path(f"{path}/{subdir}")
            fs = p.getFileSystem(hconf)
            fs.delete(p, True)
    return emptied


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 256 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ~``target_file_bytes`` files —
    small-file management, the maintenance job every incremental sink
    (streaming upsert/rollup, per-batch appends) needs at scale: a
    100 TB table accreting thousands of KB-sized files per day turns
    scan planning and NameNode/listing into the bottleneck long before
    the data itself does.

    File count derives from the ON-DISK byte size (sum of part files,
    so compression is accounted for), the rewrite is a coalesce (no
    shuffle — merges whole files), and the swap is the same tmp-dir
    rename the streaming sinks use.  ``sort_within_by`` optionally
    sorts WITHIN output files (sortWithinPartitions — still no global
    shuffle) so min/max row-group stats become selective for those
    columns.  Returns the output file count."""
    size = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-size // target_file_bytes))
    df = spark.read.parquet(path).coalesce(n_files)
    if sort_within_by:
        df = df.sortWithinPartitions(*sort_within_by)
    tmp = f"{path}.__compact__"
    df.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_files
