"""Partitioned bloom-filter sidecar for the URL-seen set (SURVEY.md §2.3 D2).

Replaces the reference's in-RAM fingerprint set (scrapy/dupefilters.py::
RFPDupeFilter) at the 10^10-URL design point: the exact ``seen`` table no
longer fits one process, so each url_hash bucket carries a serialized bloom
blob in the ``seen_filter`` table — a normal bucket-keyed Spark table, never
collected to the driver and never broadcast whole (VERDICT r2 #1: at
~10 bits/key the full sidecar is ~12.5 GB; only per-bucket blobs may ever
move). Per round:

- PROBE (:func:`probe_partitioned`): candidate rows cogroup with the sidecar
  on ``bucket`` — each task receives one bucket's candidates plus that ONE
  bucket's blob and runs a vectorized numpy batch probe. Blob bytes move
  exactly once per bucket, executor-to-executor via the cogroup exchange.
  Rows the filter rejects are *definitely new* (no false negatives,
  property-tested in tests/test_bloom.py) and skip the exact membership
  check entirely; only the ~dup + FPP fraction consults the exact ``seen``
  table.
- BUILD/MERGE (:func:`merge_bucket_blobs`): freshly enqueued keys cogroup
  with the previous sidecar on ``bucket``; each task hashes its bucket's
  fresh keys into the bucket's old blob (OR-merge — commutative/associative,
  so the result is deterministic under any partitioning) and emits the new
  blob row. Untouched buckets pass their blob through unchanged. The merged
  table commits as a new snapshot alongside ``seen``; the driver handles
  only manifest ids.

Correctness never depends on the filter: the exact anti-join/left-join vs
``seen`` remains authoritative for every row the filter flags as maybe-seen.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from sparkcrawl.bloom import BloomFilter
from sparkcrawl.cuckoo import MAGIC as _CUCKOO_MAGIC
from sparkcrawl.cuckoo import CuckooFilter, capacity_for_bits

SIDECAR_SCHEMA_DDL = "bucket int, filter binary"


def load_filter(blob: bytes):
    """Deserialize a sidecar blob by magic — bloom (``SBF1``) and cuckoo
    (``SCK1``) blobs coexist in one sidecar table, so a store created under
    one ``seen_filter_kind`` keeps probing correctly after the config flips
    (new buckets get the new kind; old blobs stay readable)."""
    if blob[:4] == _CUCKOO_MAGIC:
        return CuckooFilter.from_bytes(blob)
    return BloomFilter.from_bytes(blob)


def new_filter(kind: str, m_bits: int, k: int):
    """Empty filter for a fresh bucket. Both kinds size off the same
    ``m_bits`` memory budget (config.bloom_bits_per_bucket); ``k`` is
    bloom-only. Cuckoo buys in-place deletion (seen-TTL maintenance without
    a full sidecar rebuild) at the same no-false-negative contract."""
    if kind == "cuckoo":
        return CuckooFilter(capacity_for_bits(m_bits))
    if kind == "bloom":
        return BloomFilter(m_bits, k)
    raise ValueError(f"unknown seen_filter_kind: {kind!r}")

SIDECAR_SPARK_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType()),
        T.StructField("filter", T.BinaryType()),
    ]
)


def empty_sidecar(spark) -> DataFrame:
    return spark.createDataFrame([], SIDECAR_SPARK_SCHEMA)


def probe_partitioned(
    cands: DataFrame, sidecar: DataFrame, out_schema: T.StructType
) -> DataFrame:
    """Bucket-partitioned bloom probe: returns ``cands`` plus a ``_maybe``
    boolean column. A bucket with no blob yet ⇒ nothing of it was ever
    enqueued ⇒ definitely unseen (``_maybe`` false). ``cands`` must carry
    ``bucket`` and ``url_hash``; ``out_schema`` is ``cands.schema`` plus the
    ``_maybe`` field (grouped-map schemas are declared, not inferred)."""

    def _probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if right.empty or left.empty:
            return left.assign(_maybe=np.zeros(len(left), dtype=bool))
        bf = load_filter(bytes(right["filter"].iloc[0]))
        return left.assign(
            _maybe=bf.contains_many(left["url_hash"].to_numpy(dtype=np.int64))
        )

    return (
        cands.groupBy("bucket")
        .cogroup(sidecar.groupBy("bucket"))
        .applyInPandas(_probe, out_schema)
    )


def merge_bucket_blobs(
    fresh_keys: DataFrame, sidecar: DataFrame, m_bits: int, k: int,
    kind: str = "bloom",
) -> DataFrame:
    """(bucket, url_hash) fresh rows ⊕ previous sidecar → the next sidecar.
    Buckets with fresh keys merge them into their old blob (or a new empty
    one of ``kind``); buckets without fresh keys pass their blob through.
    Fully distributed — one task per bucket, nothing through the driver.
    Fresh keys are sorted before insertion: bloom OR is order-independent,
    but cuckoo kick chains are not, and sidecar blobs are committed bytes
    that deterministic resume must reproduce regardless of cogroup arrival
    order."""

    def _merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty and right.empty:  # cogroup never emits this, be safe
            return pd.DataFrame({"bucket": pd.array([], dtype="int32"),
                                 "filter": []})
        bucket = int((left if not left.empty else right)["bucket"].iloc[0])
        if right.empty:
            bf = new_filter(kind, m_bits, k)
        else:
            bf = load_filter(bytes(right["filter"].iloc[0]))
        if not left.empty:
            keys = np.unique(left["url_hash"].to_numpy(dtype=np.int64))
            bf.add_many(keys)
        return pd.DataFrame({"bucket": [bucket], "filter": [bf.to_bytes()]})

    return (
        fresh_keys.select("bucket", "url_hash")
        .groupBy("bucket")
        .cogroup(sidecar.groupBy("bucket"))
        .applyInPandas(_merge, SIDECAR_SCHEMA_DDL)
    )


def delete_bucket_keys(
    expired_keys: DataFrame, sidecar: DataFrame
) -> DataFrame:
    """(bucket, url_hash) expired rows ⊖ sidecar → the next sidecar, via
    in-place cuckoo deletion (the maintenance path bloom blobs cannot take —
    callers rebuild those instead; see rounds.forget_seen). Same cogroup
    shape as :func:`merge_bucket_blobs`: one task per bucket, blob bytes
    move once. Keys are uniqued+sorted for blob determinism; deleting a key
    absent from the blob is a no-op (delete_many returns found-flags, which
    maintenance ignores — the exact seen table is authoritative)."""

    def _delete(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if right.empty:  # no blob for this bucket — nothing to subtract
            return pd.DataFrame({"bucket": pd.array([], dtype="int32"),
                                 "filter": []})
        bucket = int(right["bucket"].iloc[0])
        blob = bytes(right["filter"].iloc[0])
        if left.empty:
            return pd.DataFrame({"bucket": [bucket], "filter": [blob]})
        cf = load_filter(blob)
        if not isinstance(cf, CuckooFilter):
            raise TypeError(
                "delete_bucket_keys requires cuckoo blobs; bloom sidecars "
                "must rebuild (bloom bits are shared across keys)"
            )
        cf.delete_many(np.unique(left["url_hash"].to_numpy(dtype=np.int64)))
        return pd.DataFrame({"bucket": [bucket], "filter": [cf.to_bytes()]})

    return (
        expired_keys.select("bucket", "url_hash")
        .groupBy("bucket")
        .cogroup(sidecar.groupBy("bucket"))
        .applyInPandas(_delete, SIDECAR_SCHEMA_DDL)
    )
