"""Streaming near-dup detection: incremental MinHash-LSH candidate
pairs over a document stream (beyond-reference extension — the
streaming twin of operators/dedup.py::minhash_lsh_candidates).

An ingest pipeline at 100 TB cannot re-run batch dedup per drop; the
streaming form keeps LSH bucket membership as STATE and emits a
candidate pair the moment a new document collides with anything seen
before (or in the same micro-batch).  Shape:

- signature/banding are the SAME native expressions as batch (hash-
  early shingles, two-level minhash fold) — map-only, streamable;
- state lives per (band, bucket) key via ``applyInPandasWithState``:
  the doc-id list of that bucket.  State size == corpus banding rows,
  the same footprint the batch equi-join shuffles, but amortized;
- output is candidate pairs (doc_a < doc_b, with the band) — exact
  verification joins happen downstream exactly like the batch tier
  (sketch-then-verify is unchanged; only candidate generation is
  incremental).

Deviations from the batch tier, by necessity and documented:
- no ``max_df`` discriminative-shingle filter (document frequencies
  are not known mid-stream); precision is recovered in the verify
  stage, recall is unaffected;
- a pair colliding in several bands is emitted once PER BAND
  (cross-band dedup would be a second stateful stage); consumers
  distinct on (doc_a, doc_b) — cheap relative to verification.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

_PAIRS_OUTPUT = "doc_a bigint, doc_b bigint, band int"
_BUCKET_STATE = "ids array<bigint>"


def minhash_candidates_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 32,
    bands: int = 16,
    n: int = 3,
) -> DataFrame:
    """Streaming MinHash-LSH candidate pairs from a documents stream
    (any streaming DataFrame with ``id_col`` + ``text_col``)."""
    from musicflow_spark.operators.dedup import minhash_table, with_hashed_shingles

    rows_per_band = k // bands
    sets = with_hashed_shingles(docs, text_col, id_col, n).filter(F.size("sh") > 0)
    sig = minhash_table(docs, text_col, id_col, k, n, sets=sets)
    banded = sig.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}),"
                f" b -> struct(b AS band,"
                f" xxhash64(slice(sig, b * {rows_per_band} + 1, {rows_per_band})) AS bucket))"
            )
        ).alias("bb"),
    ).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )

    def fn(key: tuple, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        (seen,) = state.get if state.exists else ([],)
        seen = list(seen)
        band = int(key[0])
        out: list[dict] = []
        for pdf in pdfs:
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                if d in seen:
                    continue  # replayed doc: already paired
                for other in seen:
                    a, b = (d, other) if d < other else (other, d)
                    out.append({"doc_a": a, "doc_b": b, "band": band})
                seen.append(d)
        state.update((seen,))
        if out:
            yield pd.DataFrame(out, columns=["doc_a", "doc_b", "band"])

    return banded.groupBy("band", "bucket").applyInPandasWithState(
        fn, _PAIRS_OUTPUT, _BUCKET_STATE, "append", "NoTimeout"
    )


_REMOVABLE_OUTPUT = "doc_id bigint, pos bigint"
_FIRST_STATE = "first_doc bigint, first_pos bigint"


def suffix_removable_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_span: int = 50,
) -> DataFrame:
    """Streaming EXACT long-substring dedup: the incremental twin of
    ``operators/dedup.py::suffix_span_scrub`` (Lee et al. >= min_span
    repeated-window removal, keep-first).  Emits the REMOVABLE token
    window positions (doc_id, pos) as documents arrive; the per-doc
    island/reassembly tail is a batch pass over the accumulated
    removable table (sketch-then-assemble, the minhash twin's shape).

    Why this operator streams EXACTLY (unlike the cross-document
    span_scrub gate): the suffix rule is corpus-OCCURRENCE count >= 2
    with the global (doc_id, pos)-minimum kept, which is
    prefix-monotone — a window's first occurrence is never removed,
    and every later occurrence is removable the moment it arrives, so
    no verdict ever changes retroactively.  With the replay ordered
    by doc_id (the streaming-twin file contract), arrival order IS
    the global keep-first order and the streamed removable set equals
    the batch operator's — certified by running the BATCH oracle
    against the streamed result.

    State: one (first_doc, first_pos) row per distinct window string.
    The key is the window TEXT so equality to the batch tier is
    exact; a production deployment keys on xxhash64(window) (8-byte
    state keys) and re-verifies candidates downstream, the documented
    scale swap shared with the batch operator."""
    from musicflow_spark.operators.dedup import positional_shingle_table

    sfx = positional_shingle_table(docs, text_col, id_col, min_span)

    def fn(key: tuple, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        rows: list[tuple[int, int]] = []
        for pdf in pdfs:
            rows.extend(
                (int(d), int(p)) for d, p in zip(pdf["doc_id"], pdf["pos"])
            )
        if not rows:
            return
        rows.sort()
        if state.exists:
            removable = rows
        else:
            state.update((rows[0][0], rows[0][1]))
            removable = rows[1:]
        if removable:
            yield pd.DataFrame(
                [{"doc_id": d, "pos": p} for d, p in removable],
                columns=["doc_id", "pos"],
            )

    return sfx.groupBy("gram").applyInPandasWithState(
        fn, _REMOVABLE_OUTPUT, _FIRST_STATE, "append", "NoTimeout"
    )
