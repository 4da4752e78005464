"""Multimodal binary-column plumbing (sparkcrawl/multimodal.py): real Spark
schema/batching/column handling with the deterministic fake decoder; the
real-codec path is an explicit NotImplementedError stub."""

import pytest
from pyspark.sql import functions as F

from sparkcrawl.multimodal import (
    FEATURE_DIM,
    fake_decode,
    frame_sample_plan,
    process_media,
    real_decode,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        ("m0", b"\x89PNG" + bytes(range(200)), "image", "png"),
        ("m1", b"RIFFxxxx" + bytes(100), "audio", "wav"),
        ("m2", b"\x00\x00ftyp" + bytes(300), "video", "mp4"),
        ("m3", b"", "image", "png"),          # corrupt: empty payload
        ("m4", None, "image", "jpeg"),        # corrupt: null payload
    ]
    return spark.createDataFrame(
        rows, "media_id string, payload binary, media_type string, media_format string"
    )


def test_decode_metadata_and_errors(media_df):
    out = process_media(media_df).collect()
    by_id = {r["media_id"]: r["media"] for r in out}
    img = by_id["m0"]
    assert img["media_type"] == "image" and img["decode_error"] is None
    assert img["width"] > 0 and img["height"] > 0 and img["duration_ms"] is None
    assert len(img["feature"]) == FEATURE_DIM
    assert abs(sum(img["feature"]) - 1.0) < 1e-5
    aud = by_id["m1"]
    assert aud["duration_ms"] > 0 and aud["width"] is None
    vid = by_id["m2"]
    assert vid["duration_ms"] > 0 and vid["width"] > 0
    # corrupt rows: error recorded, job not failed
    assert by_id["m3"]["decode_error"] is not None
    assert by_id["m4"]["decode_error"] is not None
    assert by_id["m3"]["n_bytes"] == 0


def test_payload_pruned_and_deterministic(media_df):
    out = process_media(media_df)
    assert "payload" not in out.columns  # F6 discipline: blobs never flow on
    kept = process_media(media_df, keep_payload=True)
    assert "payload" in kept.columns
    # determinism: same bytes → same feature, independent of partitioning
    a = {r["media_id"]: r["media"]["feature"]
         for r in process_media(media_df.repartition(5)).collect()}
    b = {r["media_id"]: r["media"]["feature"] for r in out.collect()}
    assert a == b


def test_frame_sample_plan(media_df):
    dec = process_media(media_df)
    frames = frame_sample_plan(dec, every_ms=1000)
    rows = frames.collect()
    assert rows, "video row should fan out to ≥1 frame"
    assert all(r["media"]["media_type"] == "video" for r in rows)
    dur = rows[0]["media"]["duration_ms"]
    assert len(rows) == dur // 1000 + 1
    assert [r["frame_ts_ms"] for r in rows] == list(range(0, dur + 1, 1000))


def test_real_decoder_is_explicit_stub(media_df):
    with pytest.raises(Exception) as ei:
        process_media(media_df.limit(1), decode_fn=real_decode).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )
