"""Partitioned bloom-filter sidecar for the URL-seen set (SURVEY.md §2.3 D2).

Replaces the reference's in-RAM fingerprint set (scrapy/dupefilters.py::
RFPDupeFilter) at the 10^10-URL design point: the exact ``seen`` table no
longer fits one process, so each url_hash bucket carries a serialized bloom
blob in the ``seen_filter`` table. Per round:

- PROBE: new link candidates are checked against the broadcast blobs inside
  a vectorized pandas UDF (numpy batch probe — no per-row Python). Rows the
  filter rejects are *definitely new* (no false negatives, property-tested
  in tests/test_bloom.py) and skip the exact membership check entirely; only
  the ~dup + FPP fraction consults the exact ``seen`` table.
- BUILD/MERGE: blobs for freshly enqueued keys are built per-bucket with
  ``applyInPandas`` (grouped, vectorized), then OR-merged with the previous
  sidecar driver-side (blobs are tiny and mergeable by construction) and
  committed as a new snapshot alongside ``seen``.

Correctness never depends on the filter: the exact anti-join/left-join vs
``seen`` remains authoritative for every row the filter flags as maybe-seen.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkcrawl.bloom import BloomFilter

SIDECAR_SCHEMA_DDL = "bucket int, filter binary"

_SIDECAR_PA_SCHEMA = pa.schema(
    [pa.field("bucket", pa.int32()), pa.field("filter", pa.binary())]
)


def build_bucket_blobs(df: DataFrame, m_bits: int, k: int) -> DataFrame:
    """(bucket, url_hash) rows → one bloom blob per bucket (grouped-map UDF;
    the build is distributed so a round's fresh keys never collect to the
    driver)."""

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        bf = BloomFilter(m_bits, k)
        bf.add_many(pdf["url_hash"].to_numpy(dtype=np.int64))
        return pd.DataFrame(
            {"bucket": [int(pdf["bucket"].iloc[0])], "filter": [bf.to_bytes()]}
        )

    return (
        df.select("bucket", "url_hash")
        .groupBy("bucket")
        .applyInPandas(_build, SIDECAR_SCHEMA_DDL)
    )


def merged_sidecar(
    old: dict[int, bytes] | None, new_rows: list[tuple[int, bytes]]
) -> dict[int, bytes]:
    """OR-merge new per-bucket blobs into the previous sidecar (driver-side;
    blobs are KiB-scale). Deterministic: OR is commutative/associative."""
    out = dict(old or {})
    for bucket, blob in new_rows:
        if bucket in out:
            merged = BloomFilter.from_bytes(out[bucket]).merge(
                BloomFilter.from_bytes(blob)
            )
            out[bucket] = merged.to_bytes()
        else:
            out[bucket] = blob
    return out


def sidecar_to_arrow(blobs: dict[int, bytes]) -> pa.Table:
    buckets = sorted(blobs)
    return pa.table(
        {
            "bucket": pa.array(buckets, pa.int32()),
            "filter": pa.array([blobs[b] for b in buckets], pa.binary()),
        }
    )


def sidecar_from_arrow(tab: pa.Table) -> dict[int, bytes]:
    return dict(
        zip(tab.column("bucket").to_pylist(), tab.column("filter").to_pylist())
    )


def make_probe_udf(spark: SparkSession, blobs: dict[int, bytes]):
    """Broadcast the sidecar and return ``(probe_udf, broadcast_handle)``.
    The probe is a vectorized (bucket, url_hash) → maybe_seen pandas UDF. A
    bucket with no blob yet ⇒ nothing of it was ever enqueued ⇒ definitely
    unseen. The caller owns the broadcast handle and must ``destroy()`` it
    once the probing stage has materialized — otherwise stale per-round
    sidecar blobs accumulate on driver and executors for the life of the
    crawl (ADVICE r1)."""
    bc = spark.sparkContext.broadcast(blobs)

    @F.pandas_udf("boolean")
    def probe(bucket: pd.Series, url_hash: pd.Series) -> pd.Series:
        blobmap = bc.value
        b_arr = bucket.to_numpy(dtype=np.int64)
        h_arr = url_hash.to_numpy(dtype=np.int64)
        out = np.zeros(len(b_arr), dtype=bool)
        for b in np.unique(b_arr):
            blob = blobmap.get(int(b))
            if blob is None:
                continue
            mask = b_arr == b
            out[mask] = BloomFilter.from_bytes(blob).contains_many(h_arr[mask])
        return pd.Series(out)

    return probe, bc
