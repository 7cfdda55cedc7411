"""Paginated REST sources and batched enrichment (SURVEY §2.1
S3-S8).

The reference walks every API with a sequential driver loop
(``nextPageToken`` loops, youtube_elt.py:87-123,126-204; offset
pagination, spotify_elt.py:417-424,610-621) and enriches rows with
batched id lookups (durations in comma-joined chunks of 50,
youtube_elt.py:255-280).  Spark shapes:

- **Token pagination** is inherently sequential (each page reveals
  the next token), so the fetch loop stays on the driver and lands in
  a typed DataFrame — the parallelism story is N independent sources
  (playlists, channels) fetched as separate tasks, not one token
  chain.
- **Offset pagination** IS random-access: offsets are known up front,
  so pages fan out across the cluster (parallelize offsets ->
  mapPartitions fetch).  One sequential HTTP client per partition;
  ``n_partitions`` bounds API concurrency.
- **Batched point-lookup enrichment** becomes an Arrow-batched
  mapInPandas stage: ids chunked client-side (the API's batch limit),
  one lookup call per chunk, results merged back columnar.

No HTTP client ships in this environment: every source takes an
injected ``fetch`` callable (tests use fakes; production passes a
requests/google-api wrapper).  The callable must be picklable for the
distributed paths.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def fetch_token_paginated(
    spark: SparkSession,
    fetch_page: Callable[[str | None], tuple[list[dict], str | None]],
    schema: T.StructType | str,
    max_pages: int = 10_000,
) -> DataFrame:
    """S3/S4/S6: driver-side ``nextPageToken`` loop -> typed DataFrame.

    fetch_page(token) returns (rows, next_token); next_token None ends
    the walk (exactly the reference loop shape, youtube_elt.py:99-123).
    ``max_pages`` guards against a server that never terminates."""
    rows: list[dict] = []
    token: str | None = None
    for _ in range(max_pages):
        page, token = fetch_page(token)
        rows.extend(page)
        if token is None:
            break
    else:
        raise RuntimeError(f"pagination did not terminate within {max_pages} pages")
    return spark.createDataFrame(rows, schema)


def fetch_offset_paginated(
    spark: SparkSession,
    fetch_offset: Callable[[int, int], list[dict]],
    schema: T.StructType | str,
    total: int,
    page_size: int = 50,
    n_partitions: int = 4,
) -> DataFrame:
    """S8 at scale: offsets are known up front, so pages fetch IN
    PARALLEL across ``n_partitions`` tasks (each partition runs one
    sequential client — the API-concurrency bound).

    fetch_offset(offset, limit) returns that page's rows."""
    offsets = list(range(0, total, page_size))
    sc = spark.sparkContext

    def run(part: Iterator[int]) -> Iterator[dict]:
        for off in part:
            yield from fetch_offset(off, page_size)

    rdd = sc.parallelize(offsets, min(n_partitions, max(len(offsets), 1)))
    return spark.createDataFrame(rdd.mapPartitions(run), schema)


def batched_enrichment(
    df: DataFrame,
    id_col: str,
    lookup: Callable[[list[Any]], dict[Any, dict]],
    extra_fields: list[T.StructField],
    batch_size: int = 50,
) -> DataFrame:
    """S5: batched point-lookup enrichment — the reference fetches
    durations for comma-joined id chunks of 50 (youtube_elt.py:
    255-280).  Arrow-batched mapInPandas: each pandas batch chunks its
    ids, calls ``lookup(ids) -> {id: {field: value}}`` once per chunk,
    and appends the new columns.  Ids missing from the response get
    nulls (the reference warns and zero-fills; null + downstream
    ``when`` is the relational form)."""
    out_schema = T.StructType(list(df.schema.fields) + list(extra_fields))
    names = [f.name for f in extra_fields]

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            ids = list(pdf[id_col])
            found: dict[Any, dict] = {}
            for i in range(0, len(ids), batch_size):
                found.update(lookup(ids[i : i + batch_size]))
            for name in names:
                pdf[name] = [found.get(v, {}).get(name) for v in ids]
            yield pdf

    return df.mapInPandas(run, out_schema)


def lookup_join_enrichment(
    df: DataFrame, lookup_table: DataFrame, id_col: str
) -> DataFrame:
    """S5's alternative shape: when the lookup set is fetched once as
    a table, enrichment is a broadcast left join — preferred whenever
    the dimension fits the broadcast threshold because it keeps the
    whole stage JVM-side."""
    from pyspark.sql import functions as F

    return df.join(F.broadcast(lookup_table), id_col, "left")
