"""ANN index artifacts as SnapStore tables (VERDICT r4 #2 / #8).

The battery's build-once indexes (IVF centroids, PQ codebook+codes, media
feature histograms) used to live as bare parquet dirs under ``/dev/shm``
gated by a ``_SUCCESS``-file check — no commit protocol, a
check-then-overwrite race between concurrent builders, and a stranded dir
every time the source corpus regenerated (the identity hash keyed the PATH,
so a new mtime meant a new dir and the old one leaked forever).

This module gives the index artifacts the same verbs the crawl tables get
from :class:`sparkcrawl.snapstore.SnapStore`:

- **one store** rooted at ``$SPARKCRAWL_INDEX_STORE`` (default a stable
  scratch root), shared by every index family;
- **table per (family, source path)** — ``pq_ab12cd34ef56/codes`` etc., the
  12-hex key hashing the *path only*, never mtime/size;
- **identity in the snapshot meta** — mtime/size/params ride in the commit's
  ``meta["ident"]``. A regenerated corpus therefore OVERWRITES the same
  table (atomic manifest rename = commit point) instead of minting a new
  dir, and :meth:`SnapStore.expire_snapshots` reclaims the superseded data
  dirs right after the commit — nothing strands;
- **benign concurrent builds** — builds are deterministic functions of the
  source, each attempt writes its own uuid data dir, and the last manifest
  rename wins with content identical to the loser's. A reader only probes
  once `ensure_index` sees every table's latest meta carry the live ident,
  so a half-committed multi-table build (crash between codebook and codes)
  reads as "not built" and is redone, never served.

In the crawl deployment these tables would sit in the same Iceberg catalog
as the frontier/seen/pages tables — an index build is just another
committed table write (SURVEY.md §4.2's drop-in seam).
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from collections.abc import Callable

from pyspark.sql import SparkSession

from sparkcrawl.snapstore import SnapStore

# (family, abs source path, params) -> {logical name: store table name};
# process-local fast path only — the durable gate is the snapshot meta.
_MEMO: dict[tuple[str, str, str], dict[str, str]] = {}


def store_root() -> str:
    env = os.environ.get("SPARKCRAWL_INDEX_STORE")
    if env:
        return env
    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    return os.path.join(base, "sparkcrawl_index_store")


def index_store() -> SnapStore:
    return SnapStore(store_root())


def source_ident(src_path: str, params: str) -> str:
    """Identity of an index artifact: source file identity + build geometry.
    Retuning params must never reuse an index built under the old geometry
    (the BENCH-corpus cache-key lesson, VERDICT r3 #2)."""
    src = os.path.abspath(src_path)
    return f"{params}:{src}:{os.path.getmtime(src)}:{os.path.getsize(src)}"


def ensure_index(
    spark: SparkSession,
    family: str,
    src_path: str,
    params: str,
    logical_tables: list[str],
    build: Callable[[SnapStore, dict[str, str], str], None],
) -> dict[str, str]:
    """Return {logical: store table} for a built, current index — building
    (or rebuilding after source/params change) if needed.

    ``build(store, tables, ident)`` must commit EVERY table in ``tables``
    via ``store.overwrite(name, df, meta={"ident": ident})``. Reuse requires
    every table's latest snapshot to carry the live ident, so partial builds
    are redone, and expire_snapshots(keep_last=1) runs after a rebuild so a
    regenerated source strands no data dirs.
    """
    src = os.path.abspath(src_path)
    memo_key = (family, src, params)
    got = _MEMO.get(memo_key)
    if got is not None:
        return got
    key = hashlib.md5(f"{family}:{src}".encode()).hexdigest()[:12]
    tables = {lt: f"{family}_{key}_{lt}" for lt in logical_tables}
    ident = source_ident(src, params)
    store = index_store()
    live = all(
        store.snapshot_meta(t).get("ident") == ident for t in tables.values()
    )
    if not live:
        build(store, tables, ident)
        for t in tables.values():
            store.expire_snapshots(t, keep_last=1)
    _MEMO[memo_key] = tables
    return tables


def reset_memo() -> None:
    """Drop the process-local memo (tests that mutate source files)."""
    _MEMO.clear()
