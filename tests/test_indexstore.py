"""Index-store contract (VERDICT r4 #2/#8): ANN index artifacts get the
same commit semantics as the crawl tables — atomic overwrite commits keyed
by source identity, rebuild on source/params change with superseded data
dirs reclaimed, partial multi-table builds never served, and interleaved
concurrent builders converging to one consistent index."""

import glob
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkcrawl import indexstore  # noqa: E402
from sparkcrawl.indexstore import ensure_index, index_store  # noqa: E402


@pytest.fixture
def iroot(tmp_path, monkeypatch):
    root = str(tmp_path / "istore")
    monkeypatch.setenv("SPARKCRAWL_INDEX_STORE", root)
    indexstore.reset_memo()
    yield root
    indexstore.reset_memo()


@pytest.fixture
def src(tmp_path):
    p = str(tmp_path / "src.parquet")
    pq.write_table(pa.table({"x": [1, 2, 3]}), p)
    return p


def _mk_builder(spark, calls, rows):
    def build(store, tables, ident):
        calls.append(dict(tables))
        a = store.overwrite(tables["a"],
                            spark.range(rows).withColumnRenamed("id", "v"),
                            meta={"ident": ident})
        assert a >= 1
        store.overwrite(tables["b"],
                        spark.range(rows * 2).withColumnRenamed("id", "v"),
                        meta={"ident": ident})
    return build


def _data_dirs(root):
    return sorted(glob.glob(os.path.join(root, "*", "data", "*")))


def test_build_once_then_reuse(spark, iroot, src):
    calls = []
    b = _mk_builder(spark, calls, 5)
    t1 = ensure_index(spark, "fam", src, "p1", ["a", "b"], b)
    assert len(calls) == 1
    indexstore.reset_memo()  # durable gate, not the process memo
    t2 = ensure_index(spark, "fam", src, "p1", ["a", "b"], b)
    assert t1 == t2 and len(calls) == 1
    assert index_store().read(spark, t1["a"]).count() == 5


def test_source_change_rebuilds_same_table_and_strands_nothing(
        spark, iroot, src):
    calls = []
    b = _mk_builder(spark, calls, 5)
    t1 = ensure_index(spark, "fam", src, "p1", ["a", "b"], b)
    dirs_before = _data_dirs(iroot)
    # regenerate the source (same path, new mtime/size) — the old /dev/shm
    # scheme minted a NEW scratch dir here and leaked the old one forever
    pq.write_table(pa.table({"x": [9, 8, 7, 6]}), src)
    os.utime(src, (1, 1))
    indexstore.reset_memo()
    t2 = ensure_index(spark, "fam", src, "p1", ["a", "b"], b)
    assert t2 == t1, "regenerated source must overwrite the SAME tables"
    assert len(calls) == 2
    # superseded data dirs reclaimed: still exactly one live dir per table
    dirs_after = _data_dirs(iroot)
    assert len(dirs_after) == len(dirs_before) == 2
    assert set(dirs_after) != set(dirs_before)


def test_params_change_is_a_distinct_index(spark, iroot, src):
    calls = []
    b = _mk_builder(spark, calls, 5)
    ensure_index(spark, "fam", src, "p1", ["a", "b"], b)
    indexstore.reset_memo()
    ensure_index(spark, "fam", src, "p2", ["a", "b"], b)
    assert len(calls) == 2  # retuned geometry never reuses the old build


def test_partial_build_reads_as_not_built(spark, iroot, src):
    """Crash between the codebook and codes commits: the gate requires
    EVERY table's latest meta to carry the live ident, so a half-committed
    index is redone, never served."""
    calls = []

    def crashing(store, tables, ident):
        calls.append(1)
        store.overwrite(tables["a"], spark.range(3), meta={"ident": ident})
        if len(calls) == 1:
            raise RuntimeError("simulated crash before table b")
        store.overwrite(tables["b"], spark.range(6), meta={"ident": ident})

    with pytest.raises(RuntimeError):
        ensure_index(spark, "fam", src, "p1", ["a", "b"], crashing)
    indexstore.reset_memo()
    t = ensure_index(spark, "fam", src, "p1", ["a", "b"], crashing)
    assert len(calls) == 2
    assert index_store().read(spark, t["b"]).count() == 6


def test_interleaved_builders_converge(spark, iroot, src):
    """Two builders interleaving (A commits table a, B runs its full build,
    A commits table b): builds are deterministic functions of the source,
    every attempt writes its own uuid data dir, last manifest rename wins —
    the surviving index is consistent and correct."""
    store = index_store()

    def build_a(st, tables, ident):
        st.overwrite(tables["a"], spark.range(5), meta={"ident": ident})
        # B preempts A here and completes its whole build
        st.overwrite(tables["a"], spark.range(5), meta={"ident": ident})
        st.overwrite(tables["b"], spark.range(10), meta={"ident": ident})
        # A resumes and commits its own b
        st.overwrite(tables["b"], spark.range(10), meta={"ident": ident})

    t = ensure_index(spark, "fam", src, "p1", ["a", "b"], build_a)
    assert store.read(spark, t["a"]).count() == 5
    assert store.read(spark, t["b"]).count() == 10
    indexstore.reset_memo()
    # a third caller sees a live, current index — no rebuild
    calls = []
    ensure_index(spark, "fam", src, "p1", ["a", "b"],
                 _mk_builder(spark, calls, 99))
    assert not calls
    # expiry after the interleave left exactly one live dir per table
    for tbl in t.values():
        assert len(store.snapshots(tbl)) == 1


def test_ident_covers_params_path_mtime_size(src):
    i1 = indexstore.source_ident(src, "p1")
    assert "p1:" in i1 and os.path.abspath(src) in i1
    os.utime(src, (2, 2))
    assert indexstore.source_ident(src, "p1") != i1
