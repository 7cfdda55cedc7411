"""Per-batch mechanics of the streaming at-rest index fold
(streaming/events.py::foreach_batch_partitioned_fold): each
micro-batch rewrites ONLY the cluster partitions it touches, and
redelivering the same batch (at-least-once replay) commits the same
table — the two properties the hash-green convergence check
(stream_ivf_at_rest_ingest vs the batch at-rest ingest oracle)
cannot bracket batch-by-batch."""

from __future__ import annotations

import os

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _snapshot(path: str) -> dict:
    out = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                rel = os.path.relpath(p, path)
                out[rel] = (os.path.getsize(p), os.path.getmtime(p))
    return out


def _content(spark, path: str) -> set:
    return {
        (r["cluster_id"], r["vec_id"], tuple(r["embedding"]))
        for r in spark.read.parquet(path).collect()
    }


@pytest.fixture(scope="module")
def folded(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from musicflow_spark.queries.vectors import (
        _ivf_frozen_assign,
        _ivf_train_centroids,
    )
    from musicflow_spark.sources.catalog import read_table, write_table

    path = str(tmp_path_factory.mktemp("ivf_fold")) + "/index"
    emb = read_table(spark, SF_DIR, "embeddings")
    delta_ids = [0, 7]
    base = emb.filter(~F.col("vec_id").isin(delta_ids))
    cent_rows = _ivf_train_centroids(base)
    write_table(
        _ivf_frozen_assign(base, cent_rows), path, partition_by=["cluster_id"]
    )
    batches = [
        _ivf_frozen_assign(
            emb.filter(F.col("vec_id") == i), cent_rows
        ).localCheckpoint(eager=True)
        for i in delta_ids
    ]
    return path, batches


def test_fold_rewrites_only_touched_clusters_per_batch(spark, folded):
    from musicflow_spark.streaming.events import (
        foreach_batch_partitioned_fold,
    )

    path, batches = folded
    sink = foreach_batch_partitioned_fold(path, "cluster_id", ["vec_id"])
    for i, batch in enumerate(batches):
        touched = {
            f"cluster_id={r['cluster_id']}"
            for r in batch.select("cluster_id").distinct().collect()
        }
        before = _snapshot(path)
        before_content = _content(spark, path)
        sink(batch, i)
        after = _snapshot(path)
        changed_dirs = {
            os.path.dirname(k)
            for k in (set(before) ^ set(after))
            | {k for k in before if k in after and before[k] != after[k]}
        }
        # exactly the batch's clusters were rewritten
        assert changed_dirs == touched, (changed_dirs, touched)
        # content = previous content + the batch rows, nothing lost
        batch_rows = {
            (r["cluster_id"], r["vec_id"], tuple(r["embedding"]))
            for r in batch.collect()
        }
        assert _content(spark, path) == before_content | batch_rows


def test_fold_replay_is_idempotent(spark, folded):
    """Redelivering an already-committed batch (the at-least-once
    failure mode) leaves the table content identical — the arriving
    keys REPLACE their stored rows instead of duplicating them."""
    from musicflow_spark.streaming.events import (
        foreach_batch_partitioned_fold,
    )

    path, batches = folded
    sink = foreach_batch_partitioned_fold(path, "cluster_id", ["vec_id"])
    before = _content(spark, path)
    n_before = spark.read.parquet(path).count()
    sink(batches[0], 99)  # replay of a batch already folded in
    assert _content(spark, path) == before
    assert spark.read.parquet(path).count() == n_before


@pytest.mark.slow
def test_multi_column_fold_chunks_keep_lists_whole(spark):
    """The HNSW streaming twin's convergence premise: write-set
    chunks split by src, so (layer, src) adjacency lists never span
    micro-batches (replace-on-key then commutes across batches), and
    the composite-key fold applied chunk-by-chunk equals the one-shot
    batch fold content."""
    import tempfile

    from pyspark.sql import functions as F

    from musicflow_spark.queries.vectors import (
        _hnsw_at_rest_build_and_writeset,
    )
    from musicflow_spark.streaming.events import (
        foreach_batch_partitioned_fold,
    )

    tmp = tempfile.mkdtemp(prefix="mf_hnsw_fold_test_")
    idx = f"{tmp}/index"
    ws = _hnsw_at_rest_build_and_writeset(spark, SF_DIR, idx)
    chunks = [
        ws.filter(F.pmod(F.col("src"), F.lit(3)) == i).localCheckpoint(
            eager=True
        )
        for i in range(3)
    ]
    keysets = [
        {(r["layer"], r["src"]) for r in c.select("layer", "src").distinct().collect()}
        for c in chunks
    ]
    # lists whole per chunk: key sets pairwise disjoint
    for i in range(3):
        for j in range(i + 1, 3):
            assert not (keysets[i] & keysets[j])
    # chunk-by-chunk fold == base-minus-replaced + whole write-set
    base_rows = {
        (r["layer"], r["bucket"], r["src"], r["dst"])
        for r in spark.read.parquet(idx).collect()
    }
    sink = foreach_batch_partitioned_fold(idx, ["layer", "bucket"], ["layer", "src"])
    for i, c in enumerate(chunks):
        sink(c, i)
    got = {
        (r["layer"], r["bucket"], r["src"], r["dst"])
        for r in spark.read.parquet(idx).collect()
    }
    ws_rows = {
        (r["layer"], r["bucket"], r["src"], r["dst"]) for r in ws.collect()
    }
    replaced = {(layer, src) for layer, _b, src, _d in ws_rows}
    expect = {
        t for t in base_rows if (t[0], t[2]) not in replaced
    } | ws_rows
    assert got == expect


@pytest.fixture(scope="module")
def delete_table(spark, tmp_path_factory):
    """A partitioned index with a known layout: cluster sizes chosen
    so one delete batch empties a partition (the explicit-drop path)
    while another only shrinks one."""
    path = str(tmp_path_factory.mktemp("ivf_del")) + "/index"
    rows = [
        (0, 10, [1.0]), (0, 11, [1.0]), (0, 12, [1.0]),
        (1, 20, [2.0]),               # singleton cluster: empties
        (2, 30, [3.0]), (2, 31, [3.0]),
    ]
    df = spark.createDataFrame(
        rows, "cluster_id int, vec_id long, embedding array<double>"
    )
    df.write.mode("overwrite").partitionBy("cluster_id").parquet(path)
    return path


def test_delete_sink_rewrites_shrinks_and_drops(spark, delete_table):
    from pyspark.sql import functions as F  # noqa: F401

    from musicflow_spark.streaming.events import (
        foreach_batch_partitioned_delete,
    )

    path = delete_table
    sink = foreach_batch_partitioned_delete(path, "cluster_id", "vec_id")
    before = _snapshot(path)

    # batch 1: shrink cluster 0 (11 leaves, 10/12 stay)
    sink(spark.createDataFrame([(11,)], "vec_id long"), 1)
    after1 = _snapshot(path)
    changed = {
        os.path.dirname(k)
        for k in (set(before) ^ set(after1))
        | {k for k in before if k in after1 and before[k] != after1[k]}
    }
    assert changed == {"cluster_id=0"}, changed
    got = {
        (r["cluster_id"], r["vec_id"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == {(0, 10), (0, 12), (1, 20), (2, 30), (2, 31)}

    # batch 2: delete the singleton -> partition dir must be DROPPED
    sink(spark.createDataFrame([(20,)], "vec_id long"), 2)
    assert not os.path.exists(os.path.join(path, "cluster_id=1"))
    got = {
        (r["cluster_id"], r["vec_id"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == {(0, 10), (0, 12), (2, 30), (2, 31)}


def test_delete_sink_replay_is_idempotent(spark, delete_table):
    """Redelivering a takedown whose key is already gone finds no
    stored rows, touches no partition, and writes nothing — the
    at-least-once convergence property."""
    from musicflow_spark.streaming.events import (
        foreach_batch_partitioned_delete,
    )

    path = delete_table
    sink = foreach_batch_partitioned_delete(path, "cluster_id", "vec_id")
    before = _snapshot(path)
    sink(spark.createDataFrame([(11,), (20,)], "vec_id long"), 99)
    assert _snapshot(path) == before
