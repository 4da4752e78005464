"""workerperf: worker-only gating + wire-compatibility of the patched
setup_spark_files (sparkcrawl/workerperf.py).

The patch replaces pyspark's per-task ``setup_spark_files`` with a
byte-for-byte protocol twin that skips ``importlib.invalidate_caches()``
when no new sys.path entry appeared. These tests drive the replacement
against a crafted wire stream and compare consumed bytes and sys.path
effects with the stock implementation.
"""

from __future__ import annotations

import io
import struct
import sys

import pytest

from sparkcrawl import workerperf


def _wire(workdir: str, includes: list[str]) -> bytes:
    """Serialize the setup_spark_files input the way the JVM does:
    UTF8Deserializer strings are length-prefixed (int32 BE), includes are
    preceded by an int32 count (pyspark/worker_util.py protocol)."""
    out = io.BytesIO()

    def put_str(s: str) -> None:
        b = s.encode("utf-8")
        out.write(struct.pack(">i", len(b)))
        out.write(b)

    put_str(workdir)
    out.write(struct.pack(">i", len(includes)))
    for inc in includes:
        put_str(inc)
    return out.getvalue()


def test_install_refuses_outside_worker(monkeypatch):
    # pyspark.worker must be absent from sys.modules in a driver/test
    # process; install() must then refuse and change nothing.
    monkeypatch.delitem(sys.modules, "pyspark.worker", raising=False)
    monkeypatch.setattr(workerperf, "_installed", False)
    assert workerperf.install() is False


def test_patched_reader_consumes_same_bytes_and_adds_paths(monkeypatch, tmp_path):
    import importlib

    calls = {"n": 0}
    monkeypatch.setattr(importlib, "invalidate_caches",
                        lambda: calls.__setitem__("n", calls["n"] + 1))
    workdir = str(tmp_path / "files")
    wire = _wire(workdir, ["a.zip", "b.zip"])
    stream = io.BytesIO(wire)

    saved_path = list(sys.path)
    try:
        workerperf._patched_setup_spark_files(stream)
        # whole message consumed, nothing beyond it
        assert stream.read() == b""
        # workdir + both includes on sys.path exactly once
        assert workdir in sys.path
        assert str(tmp_path / "files" / "a.zip") in sys.path
        assert str(tmp_path / "files" / "b.zip") in sys.path
        # paths were new -> caches invalidated once
        assert calls["n"] == 1

        # second task with the identical includes: no new paths -> skip
        workerperf._patched_setup_spark_files(io.BytesIO(wire))
        assert calls["n"] == 1
    finally:
        sys.path[:] = saved_path


def test_patched_matches_stock_semantics(monkeypatch, tmp_path):
    """The stock pyspark implementation and the patched one must leave
    sys.path identical and consume identical bytes for the same wire."""
    pytest.importorskip("pyspark.worker_util")
    from pyspark import worker_util

    wire = _wire(str(tmp_path / "wd"), ["only.zip"])

    saved_path = list(sys.path)
    try:
        s1 = io.BytesIO(wire)
        worker_util.setup_spark_files(s1)
        stock_path = list(sys.path)
        stock_left = s1.read()
    finally:
        sys.path[:] = saved_path

    saved_path = list(sys.path)
    try:
        s2 = io.BytesIO(wire)
        workerperf._patched_setup_spark_files(s2)
        patched_path = list(sys.path)
        patched_left = s2.read()
    finally:
        sys.path[:] = saved_path

    assert stock_path == patched_path
    assert stock_left == patched_left == b""


def test_patched_invalidates_when_include_replaced_in_place(
        monkeypatch, tmp_path):
    """A mid-job addPyFile that replaces a same-named archive changes no
    sys.path entry, but the cached zipimporter directory is stale — the
    patched reader must invalidate on the (mtime, size) change exactly as
    stock Spark's per-task invalidation would."""
    import importlib
    import os

    calls = {"n": 0}
    monkeypatch.setattr(importlib, "invalidate_caches",
                        lambda: calls.__setitem__("n", calls["n"] + 1))
    workdir = tmp_path / "files"
    workdir.mkdir()
    inc = workdir / "job.zip"
    inc.write_bytes(b"v1-bytes")
    wire = _wire(str(workdir), ["job.zip"])

    saved_path = list(sys.path)
    try:
        workerperf._patched_setup_spark_files(io.BytesIO(wire))
        assert calls["n"] == 1
        # steady state: same file, no invalidation
        workerperf._patched_setup_spark_files(io.BytesIO(wire))
        assert calls["n"] == 1
        # replaced under the same name (different size + mtime)
        inc.write_bytes(b"v2-bytes-longer")
        os.utime(inc, (1e9, 1e9))
        workerperf._patched_setup_spark_files(io.BytesIO(wire))
        assert calls["n"] == 2
    finally:
        sys.path[:] = saved_path


def test_version_gate_skip_is_loud(monkeypatch, capsys):
    """VERDICT r4 #6: a version-gate skip (e.g. pyspark 5.x) must WARN once
    per worker process and record a skip reason — never silently revert to
    the slow path."""
    import pyspark

    monkeypatch.setitem(sys.modules, "pyspark.worker",
                        type(sys)("pyspark.worker"))
    monkeypatch.setattr(workerperf, "_installed", False)
    monkeypatch.setattr(workerperf, "_warned", False)
    monkeypatch.setattr(workerperf, "_skip_reason", None)
    monkeypatch.setattr(pyspark, "__version__", "5.0.0")
    assert workerperf.install() is False
    assert workerperf.install() is False  # second call: no duplicate WARN
    err = capsys.readouterr().err
    assert err.count("worker fast path DISABLED") == 1, err
    assert "5.0.0" in err and "worker_fastpath=false" in err
    assert "5.0.0" in (workerperf._skip_reason or "")


def test_not_a_worker_skip_is_silent(monkeypatch, capsys):
    """Driver/test processes skip quietly — 'not-a-worker' is the normal
    outcome there, not a degradation worth a WARN."""
    monkeypatch.delitem(sys.modules, "pyspark.worker", raising=False)
    monkeypatch.setattr(workerperf, "_installed", False)
    monkeypatch.setattr(workerperf, "_warned", False)
    monkeypatch.setattr(workerperf, "_skip_reason", None)
    assert workerperf.install() is False
    assert capsys.readouterr().err == ""
    assert workerperf._skip_reason == "not-a-worker"


def test_probe_reports_fastpath_active_in_real_workers(spark):
    """End-to-end state flag: on this pyspark (4.x) the probe job must see
    the patch installed inside actual worker processes — the same boolean
    bench.py publishes as worker_fastpath."""
    assert workerperf.probe(spark) is True
