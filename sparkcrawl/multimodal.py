"""Multimodal (image/audio/video) column plumbing over opaque binary data.

Training-data pipelines carry media as opaque ``binary`` columns with typed
metadata and run decode / feature-extract / resize / frame-sample as
Arrow-batched Python over ``mapInPandas`` — the same shape this module
implements. The sandbox has no image/audio codecs, so the *decode kernel* is
pluggable: the default is a deterministic fake decoder (stable pure function
of the bytes) and a clearly-marked ``NotImplementedError`` path documents
where a real libjpeg/ffmpeg-backed kernel drops in. Everything Spark-side —
schema, batch iteration, column pruning, partition balancing — is real and
tested.

Design rules for the 100 TB case:
- media bytes are NEVER shuffled: ``process_media`` only adds derived
  columns via ``mapInPandas`` over the source partitioning (rebalance BEFORE
  calling it if files are skewed)
- the output drops the payload column by default (`keep_payload=False`) so
  downstream stages never scan the blobs (F6 column-pruning discipline)
- batches stream through ``mapInPandas`` — a partition never materializes
  as one pandas DataFrame, so payload size per executor is bounded by the
  Arrow batch size, not the partition size
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("media_format", T.StringType()),  # jpeg|png|wav|mp4|...
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),       # null for audio
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),  # null for still images
        T.StructField("feature", T.ArrayType(T.FloatType())),  # 16-dim embedding
        T.StructField("decode_error", T.StringType()),
    ]
)

FEATURE_DIM = 16


def fake_decode(payload: bytes, media_type: str) -> dict:
    """Deterministic stand-in for a real decoder (no codecs in sandbox).

    Derives stable pseudo-metadata + a 16-dim feature vector from the bytes
    via numpy — the same signature a libjpeg/soundfile/ffmpeg kernel would
    have. Swap via the ``decode_fn`` argument of :func:`process_media`."""
    if not payload:
        raise ValueError("empty payload")
    arr = np.frombuffer(payload, dtype=np.uint8)
    h = int(arr[:64].sum()) + len(arr)
    # deterministic 16-dim "embedding": byte-histogram folded to FEATURE_DIM
    hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM).astype(np.float32)
    feat = hist / max(float(hist.sum()), 1.0)
    if media_type == "image":
        return {"width": 16 + h % 1024, "height": 16 + (h // 7) % 1024,
                "duration_ms": None, "feature": feat}
    if media_type in ("audio", "video"):
        return {"width": (16 + h % 1024) if media_type == "video" else None,
                "height": (16 + (h // 7) % 1024) if media_type == "video" else None,
                "duration_ms": 100 + h % 600_000, "feature": feat}
    raise ValueError(f"unknown media_type {media_type!r}")


def real_decode(payload: bytes, media_type: str) -> dict:
    """Where a production decoder plugs in. Kept as an explicit stub: the
    sandbox image has no PIL/libjpeg/ffmpeg/soundfile (SURVEY.md §0.1)."""
    raise NotImplementedError(
        "real media decoding requires codec libraries not present in this "
        "environment; pass decode_fn=fake_decode or provide your own kernel"
    )


def process_media(
    df: DataFrame,
    payload_col: str = "payload",
    type_col: str = "media_type",
    format_col: str = "media_format",
    decode_fn: Callable[[bytes, str], dict] = fake_decode,
    keep_payload: bool = False,
) -> DataFrame:
    """Decode/feature-extract a binary media column via ``mapInPandas``.

    Returns the input columns (minus the payload unless ``keep_payload``)
    plus a ``media`` struct column (MEDIA_META_SCHEMA). Decode failures land
    in ``media.decode_error`` instead of failing the job — at corpus scale a
    corrupt blob must never kill a pipeline."""
    in_fields = [f for f in df.schema.fields
                 if keep_payload or f.name != payload_col]
    out_schema = T.StructType(in_fields + [T.StructField("media", MEDIA_META_SCHEMA)])
    keep_names = [f.name for f in in_fields]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = []
            for payload, mtype, mformat in zip(
                pdf[payload_col], pdf[type_col], pdf[format_col]
            ):
                base = {
                    "media_type": mtype, "media_format": mformat,
                    "n_bytes": len(payload) if payload is not None else 0,
                    "width": None, "height": None, "duration_ms": None,
                    "feature": None, "decode_error": None,
                }
                try:
                    if payload is None:
                        raise ValueError("null payload")
                    base.update(decode_fn(bytes(payload), mtype))
                except NotImplementedError:
                    raise  # configuration error — surface it loudly
                except Exception as e:  # corrupt blob → row-level error
                    base["decode_error"] = f"{type(e).__name__}: {e}"
                if base["feature"] is not None:
                    base["feature"] = [float(x) for x in base["feature"]]
                metas.append(base)
            out = pdf[keep_names].copy()
            out["media"] = metas
            yield out

    return df.mapInPandas(batches, out_schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp, derived from decoded duration — the per-frame pixel decode is
    the pluggable kernel above. Demonstrates the explode-based fan-out shape
    (row per frame) used by real frame pipelines."""
    return (
        df.filter(
            (F.col("media.media_type") == "video")
            # decode failures (duration null / decode_error set) are excluded
            # from the sampling plan — they must not emit a phantom ts-0 frame
            & F.col("media.decode_error").isNull()
            & F.col("media.duration_ms").isNotNull()
        )
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("media.duration_ms"), F.lit(every_ms)
                )
            ),
        )
    )
