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

# why install() declined, for the loud fallback (VERDICT r4 #6: a silent
# revert on a future pyspark must not masquerade as a perf regression —
# the skip is WARNed once per worker process and surfaced in the bench
# JSON as worker_fastpath=false via probe()). "not-a-worker" is the normal
# driver/test-process outcome and is never warned about.
_skip_reason: str | None = None
_warned = False


def _warn_once(reason: str) -> None:
    global _warned
    if _warned:
        return
    _warned = True
    print(
        "WARN sparkcrawl.workerperf: worker fast path DISABLED "
        f"({reason}) — the ~0.2 s/task import-cache invalidation cost "
        "returns; bench JSON will report worker_fastpath=false",
        file=sys.stderr,
        flush=True,
    )

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
    global _installed, _skip_reason
    if _installed:
        return True
    # Only ever patch a real worker process: the worker main loop imports
    # pyspark.worker before any UDF module; driver/test processes don't.
    wmod = sys.modules.get("pyspark.worker")
    if wmod is None:
        _skip_reason = "not-a-worker"
        return False
    import pyspark

    ver = getattr(pyspark, "__version__", "")
    if not ver.startswith("4."):
        # version gate: the patched reader mirrors the 4.x wire protocol;
        # on 5.x it must fail LOUDLY, not silently revert to the slow path
        _skip_reason = f"pyspark {ver or 'unknown'} outside the 4.x gate"
        _warn_once(_skip_reason)
        return False
    try:
        import pyspark.worker_util as wutil

        # worker.py binds the name at import time — patch both references
        wutil.setup_spark_files = _patched_setup_spark_files
        if hasattr(wmod, "setup_spark_files"):
            wmod.setup_spark_files = _patched_setup_spark_files
        import gc

        gc.freeze()
    except Exception as exc:  # pragma: no cover - never break a worker
        _skip_reason = f"patch failed: {exc!r}"
        _warn_once(_skip_reason)
        return False
    _installed = True
    _skip_reason = None
    return True


def probe(spark) -> bool:
    """Driver-side check that the fast path is ACTIVE inside worker
    processes — runs a tiny Arrow-batched UDF job (the same code path
    production tasks take: the package __init__ installs on worker import)
    and returns whether every probed worker reports the patch installed.
    bench.py publishes this as ``worker_fastpath`` so a gate-skip on a
    future pyspark shows up in the bench artifact, not as an unattributed
    perf regression."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    def _fastpath_on(x):
        from sparkcrawl import workerperf as wp

        return pd.Series([wp._installed] * len(x))

    # real annotation objects (the module's `from __future__ import
    # annotations` would stringify inline hints past pandas_udf inference)
    _fastpath_on.__annotations__ = {"x": pd.Series, "return": pd.Series}
    udf = F.pandas_udf(_fastpath_on, T.BooleanType())
    rows = (
        spark.range(8)
        .repartition(2)
        .select(udf("id").alias("ok"))
        .collect()
    )
    return bool(rows) and all(r.ok for r in rows)
