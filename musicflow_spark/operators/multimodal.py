"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (beyond-reference extension for training-data pipelines).

Design contract (the part that must be right at 100 TB):

- Media travels as a ``binary`` payload column next to a typed
  metadata struct — never decoded into the row until an operator
  needs pixels/samples, so shuffles move bytes, not Python objects.
- Decode / feature-extract / resize run as Arrow-batched
  ``mapInPandas`` stages with explicit output schemas; batch size is
  bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` and
  payload bytes per partition by ``media_repartition`` (size-aware
  repartition), so executor memory is bounded regardless of payload
  skew.
- Frame sampling is pure JVM (``sequence`` + ``explode``) — the
  expensive per-frame decode fans out AFTER the explode, so it
  parallelizes across the cluster.

``Codec`` is the injection point — production swaps in a
Pillow/ffmpeg-backed codec; this environment uses ``FakeCodec``
(deterministic bytes -> features), the REAL stdlib PNG tier
(operators/pngcodec.py — actual encode/decode, dHash, perceptual
near-dup), the REAL stdlib WAV/PCM16 tier (operators/wavcodec.py —
frame features + energy-fingerprint near-dup), or ``LibraryCodec``
which raises NotImplementedError at call time if its import is
missing.  The Spark-side plumbing (schemas, batching, partitioning,
UDF signatures) is identical across tiers.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from dataclasses import dataclass
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from musicflow_spark.operators.fanout import CODEC_STAGE_DIVISOR, fan_out

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: canonical media-table schema: payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("digest", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


class Codec:
    """Decode boundary. Implementations must be picklable (they ship
    to executors inside the mapInPandas closure)."""

    def features(self, payload: bytes, media_type: str, dim: int) -> list[float]:
        raise NotImplementedError

    def resize(self, payload: bytes, width: int, height: int) -> bytes:
        raise NotImplementedError


@dataclass(frozen=True)
class FakeCodec(Codec):
    """Deterministic stand-in: features are a seeded unit-norm-ish
    projection of the payload digest; resize re-digests with the
    target shape.  Stable across runs/workers — good enough to test
    every piece of Spark plumbing without a codec library."""

    seed: int = 0

    def features(self, payload: bytes, media_type: str, dim: int) -> list[float]:
        out: list[float] = []
        h = hashlib.sha256(f"{self.seed}:{media_type}".encode() + (payload or b""))
        raw = h.digest()
        while len(out) < dim:
            for i in range(0, len(raw), 4):
                if len(out) >= dim:
                    break
                v = int.from_bytes(raw[i : i + 4], "big")
                out.append((v / 2**32) * 2.0 - 1.0)
            raw = hashlib.sha256(raw).digest()
        return out

    def resize(self, payload: bytes, width: int, height: int) -> bytes:
        return hashlib.sha256((payload or b"") + f"{width}x{height}".encode()).digest()


@dataclass(frozen=True)
class LibraryCodec(Codec):
    """The production tier: REAL decode.  Pillow when importable
    (any format PIL reads — lazily imported on the executor), else
    the pure-stdlib PNG decoder (operators/pngcodec.py) for PNG
    payloads.  Both routes share one pixel-feature spec
    (pngcodec.band_features), so the output is decoder-independent —
    asserted by the Pillow-vs-stdlib parity test.  Only a non-PNG
    payload with no library present raises NotImplementedError
    (e.g. JPEG without Pillow: no stdlib JPEG decoder exists)."""

    def _pixels(self, payload: bytes):
        from musicflow_spark.operators import pngcodec

        try:
            import io

            import numpy as np
            import PIL.Image
        except ImportError:
            if payload.startswith(pngcodec.PNG_SIG):
                return pngcodec.decode_png(payload)
            raise NotImplementedError(
                "non-PNG payload and Pillow is not installed; install "
                "Pillow/ffmpeg for JPEG/audio/video decode"
            ) from None
        with PIL.Image.open(io.BytesIO(payload)) as img:
            return np.asarray(img.convert("RGB") if img.mode == "P" else img)

    def features(self, payload: bytes, media_type: str, dim: int) -> list[float]:
        from musicflow_spark.operators.pngcodec import band_features

        return band_features(self._pixels(payload), dim)

    def resize(self, payload: bytes, width: int, height: int) -> bytes:
        from musicflow_spark.operators import pngcodec

        try:
            import io

            import PIL.Image
        except ImportError:
            return pngcodec.PngCodec().resize(payload, width, height)
        with PIL.Image.open(io.BytesIO(payload)) as img:
            out = io.BytesIO()
            img.resize((width, height), PIL.Image.NEAREST).save(out, format="PNG")
            return out.getvalue()


def fake_media_from_documents(docs: DataFrame, media_type: str = "image") -> DataFrame:
    """Build a deterministic media table from the documents fixture:
    payload = utf-8 text bytes, metadata derived from doc stats.  The
    JVM does all of it (no Python) — this is ingest plumbing, not a
    codec."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.encode("text", "UTF-8").cast("binary").alias("payload"),
        F.struct(
            (F.col("n_chars") % 1920 + 1).cast("int").alias("width"),
            (F.col("n_chars") % 1080 + 1).cast("int").alias("height"),
            (F.col("n_chars") * 40).cast("long").alias("duration_ms"),
            F.lit(16_000).alias("sample_rate"),
            F.lit("fake").alias("format"),
        ).alias("meta"),
    )


def media_repartition(media: DataFrame, target_partition_bytes: int = 128 * 1024 * 1024) -> DataFrame:
    """Size-aware repartition: media rows are wildly skewed (a 4 KB
    thumbnail vs a 2 GB video), so partition count comes from total
    payload bytes, not row count.  One extra cheap aggregate; prevents
    OOM batches in every downstream mapInPandas."""
    total = media.agg(F.sum(F.length("payload"))).collect()[0][0] or 0
    n = max(1, int(total // target_partition_bytes) + 1)
    return media.repartition(n, "media_id")


def extract_features(media: DataFrame, codec: Codec, dim: int = 8) -> DataFrame:
    """Arrow-batched decode -> fixed-dim feature vector per media row.

    mapInPandas (not a scalar pandas_udf) so one batch can yield
    nothing for undecodable rows without nulls, and so the codec can
    amortize per-batch setup (model load, ffmpeg handle) across rows.
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, mtype, payload in zip(pdf["media_id"], pdf["media_type"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_bytes": len(data),
                        "digest": hashlib.sha256(data).hexdigest(),
                        "feature": codec.features(data, str(mtype), dim),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.select("media_id", "media_type", "payload").mapInPandas(run, FEATURE_SCHEMA)


def extract_features_arrow(media: DataFrame, codec: Codec, dim: int = 8) -> DataFrame:
    """The ``mapInArrow`` tier of :func:`extract_features` — identical
    output (tested row-for-row), different batch transport.

    Why a second tier: ``mapInPandas`` converts the WHOLE Arrow batch
    to pandas up front, which materializes every binary payload as a
    Python ``bytes`` object (one copy per row) before the codec ever
    runs.  ``mapInArrow`` hands the operator the raw
    ``pyarrow.RecordBatch``: payload bytes stay in Arrow buffers
    (zero-copy views via ``as_py`` only at the codec call), and the
    output assembles straight into Arrow arrays — for multi-MB image/
    video payloads at 100 TB this halves peak batch memory and skips
    the pandas block-manager entirely.  Prefer this tier when payloads
    dominate row size; the pandas tier remains for codecs that want a
    DataFrame API."""
    import pyarrow as pa

    out_type = pa.schema(
        [
            pa.field("media_id", pa.int64(), nullable=False),
            pa.field("n_bytes", pa.int64(), nullable=False),
            pa.field("digest", pa.string(), nullable=False),
            pa.field("feature", pa.list_(pa.float32()), nullable=False),
        ]
    )

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa  # executor-side import

        for batch in batches:
            ids = batch.column(0)
            mtypes = batch.column(1)
            payloads = batch.column(2)
            n_bytes, digests, feats = [], [], []
            for i in range(batch.num_rows):
                p = payloads[i].as_py()
                data = p if p is not None else b""
                n_bytes.append(len(data))
                digests.append(hashlib.sha256(data).hexdigest())
                feats.append(codec.features(data, mtypes[i].as_py(), dim))
            yield pa.RecordBatch.from_arrays(
                [
                    ids.cast(pa.int64()),
                    pa.array(n_bytes, type=pa.int64()),
                    pa.array(digests, type=pa.string()),
                    pa.array(feats, type=pa.list_(pa.float32())),
                ],
                schema=out_type,
            )

    return media.select("media_id", "media_type", "payload").mapInArrow(
        run, FEATURE_SCHEMA
    )


def resize_media(media: DataFrame, codec: Codec, width: int, height: int) -> DataFrame:
    """Payload -> payload transform (image resize / audio resample).
    Output keeps MEDIA_SCHEMA so resize stages compose."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                codec.resize(bytes(p) if p is not None else b"", width, height)
                for p in pdf["payload"]
            ]
            meta = []
            for m in pdf["meta"]:
                d = dict(m) if m is not None else {}
                d["width"], d["height"] = width, height
                meta.append(d)
            pdf["meta"] = meta
            yield pdf

    return media.mapInPandas(run, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video -> one row per sampled frame timestamp.  Pure JVM
    (sequence + explode over metadata duration): the fan-out happens
    BEFORE any decode, so per-frame work downstream is distributed;
    payload is carried by reference alongside each frame row."""
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            "payload",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
            ).alias("frame_ms"),
        )
    )


def decode_frames(frames: DataFrame, codec: Codec, dim: int = 8) -> DataFrame:
    """Per-frame feature extraction on the exploded frame rows: the
    codec sees (payload, frame_ms) per row, batched via Arrow."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_ms", T.LongType(), False),
            T.StructField("feature", T.ArrayType(T.FloatType()), False),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = [
                {
                    "media_id": int(mid),
                    "frame_ms": int(fms),
                    "feature": codec.features(
                        (bytes(p) if p is not None else b"") + int(fms).to_bytes(8, "big"),
                        "video-frame",
                        dim,
                    ),
                }
                for mid, p, fms in zip(pdf["media_id"], pdf["payload"], pdf["frame_ms"])
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return frames.mapInPandas(run, schema)


# ------------------------------------------ perceptual image near-dup
#: deterministic PNG fixture geometry (png_media_from_documents):
#: H x W greyscale, 4 consecutive doc_ids per near-dup group, one
#: +56 single-pixel perturbation at (doc_id % (H*W))
PHASH_H, PHASH_W = 36, 32
PHASH_GROUP = 4
PHASH_BASE_MOD = 199
PHASH_BUMP = 56
# the bumped pixel (max base PHASH_BASE_MOD-1, plus PHASH_BUMP) must fit
# uint8: a silent mod-256 wrap on the Python side would NOT be replayed
# by the SQL oracle and the hash mismatch would surface far from here
assert PHASH_BASE_MOD - 1 + PHASH_BUMP <= 255


def phash_fixture_pixels(doc_id: int) -> "np.ndarray":
    """The deterministic greyscale grid the PNG fixture encodes:
    base(Y, X) = ((g+1)*(idx+1)*(idx+7) + (g%101)*(idx+3)*31) % 199
    with g = doc_id // PHASH_GROUP and idx = Y*W + X (consecutive ids
    share a base image), plus a +56 bump at one doc-specific pixel — so ids in a
    group are NEAR-duplicates (dHash hamming <= 4: at most 2 gradient
    bits per bump) while across groups the quadratic texture
    de-correlates the hash (a linear gradient's dHash depends only on
    wrap phase — low entropy — and made unrelated groups collide).
    Everything is integer arithmetic a SQL oracle replays verbatim."""
    import numpy as np

    g = doc_id // PHASH_GROUP
    idx = (
        np.arange(PHASH_H)[:, None] * PHASH_W + np.arange(PHASH_W)[None, :]
    ).astype(np.int64)
    base = ((g + 1) * (idx + 1) * (idx + 7) + (g % 101) * (idx + 3) * 31) % PHASH_BASE_MOD
    pos = doc_id % (PHASH_H * PHASH_W)
    base[pos // PHASH_W, pos % PHASH_W] += PHASH_BUMP
    return base.astype("uint8")


def png_media_from_documents(docs: DataFrame) -> DataFrame:
    """REAL PNG payloads (stdlib encoder) of the deterministic fixture
    grid, one per document — the decodable twin of
    ``fake_media_from_documents`` for perceptual-hash tests.  Encode
    runs Arrow-batched; downstream consumers must decode the payload
    to see the pixels, so the full codec path is exercised."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from musicflow_spark.operators.pngcodec import encode_png

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "payload": [
                        encode_png(phash_fixture_pixels(int(d)))
                        for d in pdf["doc_id"]
                    ],
                }
            )

    # the encode is Python-per-row on a scan-partitioned frame —
    # spread it before the codec stage (fan_out no-ops at scale)
    return fan_out(docs.select("doc_id"), divisor=CODEC_STAGE_DIVISOR).mapInPandas(run, schema)


def phash_bands_from_docs(
    docs: DataFrame, rows: int | None = None, cols: int | None = None
) -> DataFrame:
    """FUSED tier of ``phash_bands(png_media_from_documents(docs))``:
    encode → decode → dHash run inside ONE mapInPandas kernel, so the
    PNG payload bytes never cross the JVM↔Python boundary at all
    (guide §4.1: you control how many columns cross — here the widest
    column crosses zero times instead of twice).  The codec path is
    UNCHANGED — the kernel calls the same encode_png/decode_png/
    dhash_bands, and tests assert row-identical output against the
    two-stage composition.  Measured: each Python stage costs ~0.3 s
    of fixed boundary overhead per query run at sf0.1 on top of the
    payload serialization, so fusing the pair halves both."""
    rows = PHASH_ROWS if rows is None else rows
    cols = PHASH_COLS if cols is None else cols
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("bands", T.ArrayType(T.IntegerType()), False),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from musicflow_spark.operators.pngcodec import (
            decode_png,
            dhash_bands,
            encode_png,
        )

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "bands": [
                        dhash_bands(
                            decode_png(encode_png(phash_fixture_pixels(int(d)))),
                            rows,
                            cols,
                        )
                        for d in pdf["doc_id"]
                    ],
                }
            )

    return fan_out(docs.select("doc_id"), divisor=CODEC_STAGE_DIVISOR).mapInPandas(run, schema)


def audio_feature_frame_from_docs(docs: DataFrame) -> DataFrame:
    """FUSED tier of ``audio_feature_frame(wav_media_from_documents)``
    — same kernel-fusion rationale and equality contract as
    :func:`phash_bands_from_docs` (WAV payload crosses the boundary
    zero times; codec calls unchanged)."""
    schema = T.StructType(
        [T.StructField("media_id", T.LongType(), False)]
        + [
            T.StructField(c, T.LongType(), False)
            for c in (
                "sample_rate",
                "n_samples",
                "peak_abs",
                "n_clipped",
                "n_zero_cross",
                "energy_sum",
                "frame_e_min",
                "frame_e_max",
            )
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from musicflow_spark.operators.wavcodec import (
            audio_features,
            encode_wav,
            mono_samples,
        )

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                payload = encode_wav(audio_fixture_samples(int(d)), AUDIO_RATE)
                s, rate = mono_samples(payload)
                rows.append(
                    {"media_id": int(d), "sample_rate": rate, **audio_features(s)}
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return fan_out(docs.select("doc_id"), divisor=CODEC_STAGE_DIVISOR).mapInPandas(run, schema)


def audio_energy_bands_from_docs(docs: DataFrame) -> DataFrame:
    """FUSED tier of ``audio_energy_bands(wav_media_from_documents)``
    — same kernel-fusion rationale and equality contract as
    :func:`phash_bands_from_docs`."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("bands", T.ArrayType(T.IntegerType()), False),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from musicflow_spark.operators.wavcodec import (
            encode_wav,
            energy_fingerprint_bands,
            mono_samples,
        )

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "bands": [
                        energy_fingerprint_bands(
                            mono_samples(
                                encode_wav(
                                    audio_fixture_samples(int(d)), AUDIO_RATE
                                )
                            )[0]
                        )
                        for d in pdf["doc_id"]
                    ],
                }
            )

    return fan_out(docs.select("doc_id"), divisor=CODEC_STAGE_DIVISOR).mapInPandas(run, schema)


def video_frame_metrics_from_docs(docs: DataFrame) -> DataFrame:
    """FUSED tier of ``video_frame_metrics(rvid_media_from_documents)``
    — same kernel-fusion rationale and equality contract as
    :func:`phash_bands_from_docs` (RVID container bytes cross the
    boundary zero times; codec calls unchanged)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("f", T.IntegerType(), False),
            T.StructField("px_sum", T.LongType(), False),
            T.StructField("diff_prev", T.LongType(), True),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from musicflow_spark.operators.videocodec import (
            decode_rvid,
            encode_rvid,
            frame_abs_diffs,
            frame_pixel_sums,
        )

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                frames = decode_rvid(encode_rvid(video_fixture_frames(int(d))))
                sums = frame_pixel_sums(frames)
                diffs = frame_abs_diffs(frames)
                for f in range(frames.shape[0]):
                    rows.append(
                        {
                            "media_id": int(d),
                            "f": f,
                            "px_sum": int(sums[f]),
                            "diff_prev": int(diffs[f - 1]) if f > 0 else None,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return fan_out(docs.select("doc_id"), divisor=CODEC_STAGE_DIVISOR).mapInPandas(run, schema)


#: dHash geometry: 16 rows x 8 cols = 128 hash bits as 16 byte bands.
#: Band PAIRS form the 8 LSH keys (two bytes = 16 bits each), so the
#: candidate bucket factor is 65536 rather than the 256 a single byte
#: band gives — the difference between O(n^2/256) and O(n^2/65536)
#: accidental candidates, i.e. the 100x-corpus survival margin.
#: Pigeonhole completeness is unchanged: 8 keys, so any pair with
#: hamming <= 7 (< 8 keys) leaves at least one key byte-identical.
PHASH_ROWS = 16
PHASH_COLS = 8
PHASH_N_KEYS = PHASH_ROWS // 2


def phash_bands(
    media: DataFrame, rows: int = PHASH_ROWS, cols: int = PHASH_COLS
) -> DataFrame:
    """(media_id, bands array<int>): dHash of each DECODED payload as
    per-row byte bands (operators/pngcodec.py::dhash_bands).  This is
    the perceptual twin of the exact-digest pass: decode + hash runs
    once per asset in an Arrow batch; everything after (banding,
    joins, hamming verify) is native JVM."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("bands", T.ArrayType(T.IntegerType()), False),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from musicflow_spark.operators.pngcodec import decode_png, dhash_bands

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "bands": [
                        dhash_bands(decode_png(bytes(p)), rows, cols)
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, schema)


#: LSH key construction shared by the pair/ingest tiers: adjacent
#: byte-band PAIRS packed into 16-bit keys.  Works for any even band
#: count (16 for images, the audio fingerprint reuses it).  The HOF
#: lambda evaluates interpreted, but over size/2 elements per asset —
#: nowhere near the hot path.
_BAND_KEYS = (
    "transform(sequence(0, cast(size(bands) / 2 AS int) - 1),"
    " i -> bands[2*i] * 256 + bands[2*i + 1])"
)


def phash_neardup_pairs(bands: DataFrame, max_hamming: int = 7) -> DataFrame:
    """Hamming-LSH near-dup pairs over dHash bands (the
    simhash_near_pairs machinery on byte bands): candidates share at
    least one 16-bit (key_idx, key_val) bucket — two adjacent byte
    bands packed per key, pigeonhole-complete for hamming < n_keys
    (8) over the 128-bit hash — then exact hamming verifies.  Shape:
    one posexplode + equi-join keyed by (key_idx, key_val) + an id
    join back; no all-pairs stage anywhere.  The 16-bit keys keep
    accidental candidates at O(n^2/65536): at 50k assets that is
    ~3e5 candidate rows where single-byte keys would generate ~4e7 —
    the margin that makes the banding join survive a 100x corpus."""
    # the bands frame sits on TWO chained Python stages (PNG encode +
    # decode/dHash); it is referenced three times below (banding + two
    # join-backs), so pin it once — without this every reference
    # re-runs the whole codec pipeline (review r07)
    bands = bands.localCheckpoint(eager=True)
    keyed = bands.select(
        "media_id", F.posexplode(F.expr(_BAND_KEYS)).alias("band_idx", "band_val")
    )
    a = keyed.select(
        F.col("media_id").alias("id_a"), "band_idx", "band_val"
    )
    b = keyed.select(
        F.col("media_id").alias("id_b"), "band_idx", "band_val"
    )
    cand = (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    ham = F.aggregate(
        F.zip_with("ba", "bb", lambda p, q: F.bit_count(p.bitwiseXOR(q))),
        F.lit(0),
        lambda acc, h: acc + h,
    )
    return (
        cand.join(bands.select(F.col("media_id").alias("id_a"), F.col("bands").alias("ba")), "id_a")
        .join(bands.select(F.col("media_id").alias("id_b"), F.col("bands").alias("bb")), "id_b")
        .select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def phash_neardup_ingest(
    bands: DataFrame, is_delta, max_hamming: int = 7
) -> DataFrame:
    """Daily-ingest perceptual near-dup: pairs TOUCHING the delta
    found without the base x base pairing a full re-run pays — the
    image-side sibling of operators/dedup.py::minhash_dedup_ingest.
    ``bands`` is a phash_bands output; ``is_delta`` a boolean Column
    marking today's batch (base band tables persist bucketed on
    (band_idx, band_val) at scale, so the probe is shuffle-free).

    Shape: only DELTA band rows drive the candidate join (base rows
    are probe targets), so per-ingest cost is O(|delta| x bucket
    width); delta x delta pairs canonicalize id_a < id_b, delta x
    base pairs orient delta-first.  Output adds ``partner_in_delta``
    so downstream keep/suppress policy can distinguish new-vs-new
    from new-vs-corpus."""
    # same three-reference shape as phash_neardup_pairs: pin the
    # codec output once (review r07)
    bands = bands.localCheckpoint(eager=True)
    flagged = bands.withColumn("is_delta", is_delta)
    keyed = flagged.select(
        "media_id",
        "is_delta",
        F.posexplode(F.expr(_BAND_KEYS)).alias("band_idx", "band_val"),
    )
    d = keyed.filter(F.col("is_delta")).select(
        F.col("media_id").alias("id_a"), "band_idx", "band_val"
    )
    c = keyed.select(
        F.col("media_id").alias("id_b"),
        "band_idx",
        "band_val",
        F.col("is_delta").alias("partner_in_delta"),
    )
    cand = (
        d.join(c, ["band_idx", "band_val"])
        .filter(
            F.when(
                F.col("partner_in_delta"), F.col("id_a") < F.col("id_b")
            ).otherwise(F.col("id_a") != F.col("id_b"))
        )
        .select("id_a", "id_b", "partner_in_delta")
        .distinct()
    )
    ham = F.aggregate(
        F.zip_with("ba", "bb", lambda p, q: F.bit_count(p.bitwiseXOR(q))),
        F.lit(0),
        lambda acc, h: acc + h,
    )
    return (
        cand.join(
            bands.select(F.col("media_id").alias("id_a"), F.col("bands").alias("ba")),
            "id_a",
        )
        .join(
            bands.select(F.col("media_id").alias("id_b"), F.col("bands").alias("bb")),
            "id_b",
        )
        .select("id_a", "id_b", ham.alias("hamming"), "partner_in_delta")
        .filter(F.col("hamming") <= max_hamming)
    )


# ------------------------------------------ audio tier (WAV/PCM16)
#: deterministic PCM fixture (wav_media_from_documents): 2304-sample
#: mono clip per document, 4 consecutive doc_ids per near-dup group,
#: one +777 single-sample perturbation at (doc_id % 2304)
AUDIO_GROUP = 4
AUDIO_N_SAMPLES = 2304  # 16 bands x 9 frames x 16 samples
AUDIO_BASE_MOD = 4001   # prime; values centered to [-2000, 2000]
AUDIO_HALF = 2000
AUDIO_BUMP = 777
AUDIO_RATE = 8000
# the bumped sample (max base +2000, plus AUDIO_BUMP) must fit int16:
# a silent wrap on the Python side would not be replayed by the SQL
# oracle (same guard as the PHASH constants above)
assert AUDIO_HALF + AUDIO_BUMP <= 32767
# energy_fingerprint_bands' nearest-sampling of the frame envelope
# onto the (AUDIO_ROWS, AUDIO_COLS+1) grid is an IDENTITY only when
# the envelope length equals the grid length (2304/16 = 144 = 16*9);
# the audio oracle hard-codes that identity (f//9, f%9), so a change
# to any of these constants must fail loudly here rather than
# silently desyncing operator and oracle (ADVICE r8)
from musicflow_spark.operators.wavcodec import (  # noqa: E402
    AUDIO_COLS,
    AUDIO_FRAME_LEN,
    AUDIO_ROWS,
)

assert AUDIO_N_SAMPLES // AUDIO_FRAME_LEN == AUDIO_ROWS * (AUDIO_COLS + 1)


def audio_fixture_samples(doc_id: int) -> "np.ndarray":
    """The deterministic PCM16 signal the WAV fixture encodes:
    s(i) = ((g+1)*(i+1)*(i+3) + (g%101)*(i+5)*17) % 4001 - 2000
    with g = doc_id // AUDIO_GROUP (consecutive ids share a base
    clip), plus a +777 bump at one doc-specific sample — so ids in a
    group are NEAR-duplicates (energy-fingerprint hamming <= 4: at
    most 2 bits per perturbed frame) while across groups the
    quadratic texture de-correlates the envelope (class period
    4001 x 101 = 404101 groups).  Everything is integer arithmetic a
    SQL oracle replays verbatim."""
    import numpy as np

    g = doc_id // AUDIO_GROUP
    i = np.arange(AUDIO_N_SAMPLES, dtype=np.int64)
    s = ((g + 1) * (i + 1) * (i + 3) + (g % 101) * (i + 5) * 17) % AUDIO_BASE_MOD - AUDIO_HALF
    s[doc_id % AUDIO_N_SAMPLES] += AUDIO_BUMP
    return s.astype(np.int16)


def wav_media_from_documents(docs: DataFrame) -> DataFrame:
    """REAL WAV payloads (stdlib PCM16 encoder) of the deterministic
    fixture signal, one per document — the audio twin of
    ``png_media_from_documents``.  Encode runs Arrow-batched;
    downstream consumers must decode the payload to see the samples,
    so the full codec path is exercised."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from musicflow_spark.operators.wavcodec import encode_wav

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "payload": [
                        encode_wav(audio_fixture_samples(int(d)), AUDIO_RATE)
                        for d in pdf["doc_id"]
                    ],
                }
            )

    return fan_out(docs.select("doc_id"), divisor=CODEC_STAGE_DIVISOR).mapInPandas(run, schema)


def audio_feature_frame(media: DataFrame) -> DataFrame:
    """(media_id, sample_rate, n_samples, peak_abs, n_clipped,
    n_zero_cross, energy_sum, frame_e_min, frame_e_max): decode each
    WAV payload in an Arrow batch and compute the integer feature
    report (operators/wavcodec.py::audio_features).  One map pass at
    any scale; every output is exact int64 arithmetic."""
    schema = T.StructType(
        [T.StructField("media_id", T.LongType(), False)]
        + [
            T.StructField(c, T.LongType(), False)
            for c in (
                "sample_rate",
                "n_samples",
                "peak_abs",
                "n_clipped",
                "n_zero_cross",
                "energy_sum",
                "frame_e_min",
                "frame_e_max",
            )
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from musicflow_spark.operators.wavcodec import audio_features, mono_samples

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                s, rate = mono_samples(bytes(payload))
                rows.append(
                    {"media_id": int(mid), "sample_rate": rate, **audio_features(s)}
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return media.select("media_id", "payload").mapInPandas(run, schema)


def audio_energy_bands(media: DataFrame) -> DataFrame:
    """(media_id, bands array<int>): energy-envelope fingerprint of
    each DECODED WAV payload as 16 byte bands
    (operators/wavcodec.py::energy_fingerprint_bands) — the same band
    algebra as the image dHash, so ``phash_neardup_pairs`` /
    ``phash_neardup_ingest`` consume the output unchanged (16-bit
    keys, pigeonhole-complete hamming <= 7)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("bands", T.ArrayType(T.IntegerType()), False),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from musicflow_spark.operators.wavcodec import (
            energy_fingerprint_bands,
            mono_samples,
        )

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "bands": [
                        energy_fingerprint_bands(mono_samples(bytes(p))[0])
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, schema)


# ------------------------------------------- VIDEO modality fixtures
#: deterministic raw-video fixture: 12 frames of the 8x8 quadratic
#: texture keyed by scene id 2*doc_id + (frame >= cut), with a HARD
#: SCENE CUT at frame 3 + doc_id % 7 — within a scene, consecutive
#: frames shift the texture by +1 (tiny temporal gradient); across
#: the cut the scene id changes and the quadratic texture
#: de-correlates, so adjacent-frame absolute difference separates
#: cleanly (measured over doc_ids 0..599: within-scene <= 458,
#: cross-scene >= 3479 — tests/test_video.py pins the margin)
VIDEO_N_FRAMES = 12
VIDEO_H = 8
VIDEO_W = 8
VIDEO_BASE_MOD = 199
VIDEO_CUT_MIN = 3
VIDEO_CUT_SPAN = 7
#: adjacent-frame |diff| above this is a detected scene cut
VIDEO_CUT_THRESH = 1500
# max pixel value must fit uint8 (the PHASH/AUDIO constants guard):
# a silent Python-side wrap would not be replayed by the SQL oracle
assert VIDEO_BASE_MOD - 1 <= 255
# every cut frame must have a predecessor and exist
assert VIDEO_CUT_MIN >= 1
assert VIDEO_CUT_MIN + VIDEO_CUT_SPAN - 1 < VIDEO_N_FRAMES


def video_fixture_frames(doc_id: int) -> "np.ndarray":
    """The deterministic frame stack the RVID fixture encodes:
    pix(f, idx) = ((g+1)*(idx+1)*(idx+7) + (g%101)*(idx+3)*31 + f)
    % 199 with scene id g = 2*doc_id + (f >= cut) and
    cut = 3 + doc_id % 7.  Everything is integer arithmetic a SQL
    oracle replays verbatim (queries/multimodal.py::_video_cte)."""
    import numpy as np

    cut = VIDEO_CUT_MIN + doc_id % VIDEO_CUT_SPAN
    idx = np.arange(VIDEO_H * VIDEO_W, dtype=np.int64)
    frames = np.empty((VIDEO_N_FRAMES, VIDEO_H * VIDEO_W), dtype=np.int64)
    for f in range(VIDEO_N_FRAMES):
        g = 2 * doc_id + (1 if f >= cut else 0)
        frames[f] = (
            (g + 1) * (idx + 1) * (idx + 7) + (g % 101) * (idx + 3) * 31 + f
        ) % VIDEO_BASE_MOD
    return frames.reshape(VIDEO_N_FRAMES, VIDEO_H, VIDEO_W).astype("uint8")


def rvid_media_from_documents(docs: DataFrame) -> DataFrame:
    """REAL RVID container payloads (operators/videocodec.py) of the
    deterministic fixture frames, one video per document — the video
    twin of ``png_media_from_documents`` / ``wav_media_from_documents``.
    Encode runs Arrow-batched; downstream consumers must decode the
    container to see the frames, so the full codec path is
    exercised."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from musicflow_spark.operators.videocodec import encode_rvid

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "payload": [
                        encode_rvid(video_fixture_frames(int(d)))
                        for d in pdf["doc_id"]
                    ],
                }
            )

    return fan_out(docs.select("doc_id"), divisor=CODEC_STAGE_DIVISOR).mapInPandas(run, schema)


def video_frame_metrics(media: DataFrame) -> DataFrame:
    """(media_id, f, px_sum, diff_prev): decode each RVID payload in
    an Arrow batch and emit ONE ROW PER FRAME with its total
    brightness and the adjacent-frame absolute difference
    (NULL for frame 0) — the frame-sample/explode primitive every
    temporal video operator (scene cuts, frame subsampling, per-frame
    stats) aggregates from.  One map pass at any scale: per-video
    work is frame-count-bounded, output is frames-per-video rows, and
    every value is exact int64 arithmetic."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("f", T.IntegerType(), False),
            T.StructField("px_sum", T.LongType(), False),
            T.StructField("diff_prev", T.LongType(), True),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from musicflow_spark.operators.videocodec import (
            decode_rvid,
            frame_abs_diffs,
            frame_pixel_sums,
        )

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames = decode_rvid(bytes(payload))
                sums = frame_pixel_sums(frames)
                diffs = frame_abs_diffs(frames)
                for f in range(frames.shape[0]):
                    rows.append(
                        {
                            "media_id": int(mid),
                            "f": f,
                            "px_sum": int(sums[f]),
                            "diff_prev": int(diffs[f - 1]) if f > 0 else None,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return media.select("media_id", "payload").mapInPandas(run, schema)
