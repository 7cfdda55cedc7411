"""Video modality tests: RVID container round-trip, fixture margin
pinning, frame metrics vs numpy, and scene-cut detection against the
planted cuts."""

from __future__ import annotations

import numpy as np
import pytest

from musicflow_spark.operators.multimodal import (
    VIDEO_CUT_MIN,
    VIDEO_CUT_SPAN,
    VIDEO_CUT_THRESH,
    VIDEO_H,
    VIDEO_N_FRAMES,
    VIDEO_W,
    rvid_media_from_documents,
    video_fixture_frames,
    video_frame_metrics,
)
from musicflow_spark.operators.videocodec import (
    decode_rvid,
    encode_rvid,
    frame_abs_diffs,
    frame_pixel_sums,
)


def test_codec_roundtrip():
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, size=(5, 4, 6), dtype=np.uint8)
    assert (decode_rvid(encode_rvid(frames)) == frames).all()


def test_codec_validation():
    frames = np.zeros((2, 3, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="bad magic"):
        decode_rvid(b"XXXX" + encode_rvid(frames)[4:])
    with pytest.raises(ValueError, match="pixel bytes"):
        decode_rvid(encode_rvid(frames)[:-1])
    with pytest.raises(ValueError, match="uint8"):
        encode_rvid(frames.astype(np.int64))
    with pytest.raises(ValueError, match="shape"):
        encode_rvid(frames[0])


def test_fixture_margin_pinned():
    # the scene-cut threshold must sit strictly between the largest
    # within-scene diff and the smallest cross-scene diff, with room
    # on both sides — if the fixture constants change and squeeze the
    # margin, fail here rather than with a far-away hash mismatch
    wmax, cmin = 0, 1 << 60
    for d in range(600):
        diffs = frame_abs_diffs(video_fixture_frames(d))
        cut = VIDEO_CUT_MIN + d % VIDEO_CUT_SPAN
        for f in range(1, VIDEO_N_FRAMES):
            if f == cut:
                cmin = min(cmin, int(diffs[f - 1]))
            else:
                wmax = max(wmax, int(diffs[f - 1]))
    assert wmax * 2 < VIDEO_CUT_THRESH < cmin // 2, (wmax, cmin)


def test_frame_metrics_match_numpy(spark):
    docs = spark.createDataFrame([(d,) for d in range(12)], "doc_id long")
    rows = video_frame_metrics(rvid_media_from_documents(docs)).collect()
    assert len(rows) == 12 * VIDEO_N_FRAMES
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["media_id"], []).append(r)
    for d, rs in by_doc.items():
        rs.sort(key=lambda r: r["f"])
        frames = video_fixture_frames(d)
        sums = frame_pixel_sums(frames)
        diffs = frame_abs_diffs(frames)
        assert [r["px_sum"] for r in rs] == [int(s) for s in sums]
        assert rs[0]["diff_prev"] is None
        assert [r["diff_prev"] for r in rs[1:]] == [int(x) for x in diffs]
        assert frames.shape == (VIDEO_N_FRAMES, VIDEO_H, VIDEO_W)


def test_scenecuts_detect_exactly_planted_cuts(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame([(d,) for d in range(40)], "doc_id long")
    m = video_frame_metrics(rvid_media_from_documents(docs))
    cuts = {
        r["media_id"]: r["f"]
        for r in m.filter(F.col("diff_prev") > VIDEO_CUT_THRESH).collect()
    }
    assert cuts == {d: VIDEO_CUT_MIN + d % VIDEO_CUT_SPAN for d in range(40)}
