"""Python-worker fast path: kill two fixed per-task costs in pyspark 4.x.

Measured on this pipeline (BENCH event-log attribution, round 4): every
task of a stage containing an ArrowEvalPython node pays a flat ~120-150 ms
inside ``pyspark.worker.main`` REGARDLESS of data size. cProfile inside the
worker attributes ~95% of it to ``worker_util.setup_spark_files`` calling
``importlib.invalidate_caches()`` unconditionally per task: with pyspark
imported from ``pyspark.zip`` (always true under spark-submit, where
``$SPARK_HOME/python/lib/pyspark.zip`` leads ``PYTHONPATH``), every cached
zipimporter re-reads its zip central directory — ~27k entries, ~16
importers, ~120 ms. A second, smaller cost is ``pyspark/daemon.py`` running
a full ``gc.collect()`` between tasks of a reused worker (~20 ms over the
pandas/pyarrow import graph). On a 10^10-URL crawl round the extraction
stage alone is tens of thousands of tasks: these two costs are pure
per-task overhead, independent of rows processed, and they dominate
small/early rounds (measured: 0.22 s/task → rounds 1-2 of a cluster crawl
scaled at 1.4× instead of 4× going 4→16 cores).

Fixes, both installed lazily on first import of ``sparkcrawl.udfs`` inside
a worker process (so they ship with the normal ``--py-files`` zip — no
daemon/module config, works identically in local and cluster mode):

1. ``setup_spark_files`` is replaced by a byte-for-byte wire-compatible
   version that calls ``importlib.invalidate_caches()`` ONLY when the task
   actually added a new include path (first task per worker, or a mid-job
   ``addPyFile``). The import-finder caches only go stale when sys.path
   gains an entry or a shipped file changes under the same name; the
   steady-state crawl does neither, thousands of times per round.
2. ``gc.freeze()`` moves the ~1M objects of the already-imported pandas/
   pyarrow/pyspark graph to CPython's permanent generation so the daemon's
   between-task ``gc.collect()`` no longer traverses them. Per-batch
   allocations made after the freeze remain tracked and collectable.

Both are gated on (a) running inside a worker (``pyspark.worker`` already
imported — never true on the driver) and (b) pyspark 4.x, whose
``setup_spark_files`` wire protocol this mirrors (reads: workdir string,
include count, include names — see ``pyspark/worker_util.py``). On any
other version the patch is skipped and the stock (slow) path runs.
"""

from __future__ import annotations

import sys

_installed = False

# (mtime, size) per include path: detects a shipped file REPLACED under the
# same name (executor re-download after a mid-job addPyFile), which changes
# no sys.path entry but does stale the cached zipimporter directories —
# stock Spark invalidates every task precisely to cover this case
_seen_includes: dict[str, tuple[float, int] | None] = {}


def _patched_setup_spark_files(infile):
    """Wire-compatible ``setup_spark_files`` that only invalidates import
    caches when sys.path actually changed or a shipped include file was
    updated in place (pyspark 4.x protocol)."""
    import importlib
    import os

    from pyspark.worker_util import add_path, read_int, utf8_deserializer
    from pyspark.util import is_remote_only

    spark_files_dir = utf8_deserializer.loads(infile)

    if not is_remote_only():
        from pyspark.core.files import SparkFiles

        SparkFiles._root_directory = spark_files_dir
        SparkFiles._is_running_on_worker = True

    before = len(sys.path)
    add_path(spark_files_dir)
    num_python_includes = read_int(infile)
    changed = False
    for _ in range(num_python_includes):
        filename = utf8_deserializer.loads(infile)
        full = os.path.join(spark_files_dir, filename)
        add_path(full)
        try:
            st = os.stat(full)
            sig = (st.st_mtime, st.st_size)
        except OSError:  # pragma: no cover - include may be a dir/missing
            sig = None
        if _seen_includes.get(full, ()) != sig:
            _seen_includes[full] = sig
            changed = True
    if changed or len(sys.path) != before:
        importlib.invalidate_caches()


def install() -> bool:
    """Install the worker fast path if running inside a pyspark 4.x worker.

    Idempotent; returns True when (already) active. Called from
    ``sparkcrawl.udfs`` at import time, which in a worker happens during
    UDF deserialization of the first task — so task 1 pays the stock cost
    and every later task on that worker runs the fast path.
    """
    global _installed
    if _installed:
        return True
    # Only ever patch a real worker process: the worker main loop imports
    # pyspark.worker before any UDF module; driver/test processes don't.
    wmod = sys.modules.get("pyspark.worker")
    if wmod is None:
        return False
    import pyspark

    if not getattr(pyspark, "__version__", "").startswith("4."):
        return False
    try:
        import pyspark.worker_util as wutil

        # worker.py binds the name at import time — patch both references
        wutil.setup_spark_files = _patched_setup_spark_files
        if hasattr(wmod, "setup_spark_files"):
            wmod.setup_spark_files = _patched_setup_spark_files
        import gc

        gc.freeze()
    except Exception:  # pragma: no cover - never break a worker over perf
        return False
    _installed = True
    return True
