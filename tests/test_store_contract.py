"""Store verb contract (SURVEY.md §0.1): the behaviors rounds.py depends on,
as an explicit suite any store implementation must pass. Runs against the
Parquet+JSON SnapStore here; runs against IcebergSnapStore when an Iceberg
catalog is configured (SPARKCRAWL_ICEBERG_CATALOG — never in this sandbox,
where the adapter raises IcebergUnavailable by design)."""

import os

import pytest

from sparkcrawl.snapstore import SnapStore


@pytest.fixture()
def store(tmp_path):
    return SnapStore(str(tmp_path / "store"))


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def test_append_chains_and_overwrite_supersedes(spark, store):
    s1 = store.append("t", _df(spark, [(1, "a")]))
    s2 = store.append("t", _df(spark, [(2, "b")]))
    assert store.read(spark, "t", s1).count() == 1
    assert store.read(spark, "t", s2).count() == 2  # append = old + new
    s3 = store.overwrite("t", _df(spark, [(9, "z")]))
    assert store.read(spark, "t", s3).count() == 1  # overwrite supersedes
    # time travel still sees every earlier snapshot unchanged
    assert store.read(spark, "t", s2).count() == 2
    assert store.snapshots("t") == [s1, s2, s3]


def test_parent_pin_orphans_uncommitted_appends(spark, store):
    """rounds.py's crash-safety contract: an append chained from an explicit
    parent must NOT include rows from snapshots after that parent (a crashed
    round attempt's orphans)."""
    s1 = store.append("t", _df(spark, [(1, "a")]))
    store.append("t", _df(spark, [(66, "junk")]))  # crashed attempt's orphan
    s3 = store.append("t", _df(spark, [(2, "b")]), parent=s1)
    got = {r["k"] for r in store.read(spark, "t", s3).collect()}
    assert got == {1, 2}  # junk orphaned


def test_parent_none_starts_fresh_chain(spark, store):
    store.append("t", _df(spark, [(66, "junk")]))  # crashed init attempt
    s2 = store.append("t", _df(spark, [(1, "a")]), parent=None)
    got = {r["k"] for r in store.read(spark, "t", s2).collect()}
    assert got == {1}


def test_round_manifest_is_multi_table_commit_point(spark, store):
    sa = store.append("a", _df(spark, [(1, "x")]))
    sb = store.append("b", _df(spark, [(2, "y")]))
    store.commit_round(0, {"a": sa, "b": sb}, meta={"n": 1})
    # later uncommitted snapshots must be invisible at the round boundary
    store.append("a", _df(spark, [(3, "z")]))
    man = store.round_manifest(0)
    assert man["tables"] == {"a": sa, "b": sb}
    assert store.read_at_round(spark, "a", 0).count() == 1
    assert store.committed_rounds() == [0]


def test_empty_dataframe_snapshot_roundtrip(spark, store):
    s1 = store.overwrite("t", _df(spark, []))
    df = store.read(spark, "t", s1)
    assert df.count() == 0
    assert set(df.columns) == {"k", "v"}


def test_local_commit_interops_with_spark_read(spark, store):
    import pyarrow as pa
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("k", T.IntegerType()),
                           T.StructField("v", T.StringType())])
    tab = pa.table({"k": pa.array([1], pa.int32()),
                    "v": pa.array(["a"], pa.string())})
    s1 = store.append_local("t", tab, schema)
    assert store.read(spark, "t", s1).count() == 1
    assert store.read_local("t", s1).num_rows == 1


def test_iceberg_adapter_seam(spark):
    """In this sandbox the adapter must refuse loudly; with a configured
    catalog (env SPARKCRAWL_ICEBERG_CATALOG) it must pass the same verbs."""
    from sparkcrawl.iceberg import IcebergSnapStore, IcebergUnavailable

    catalog = os.environ.get("SPARKCRAWL_ICEBERG_CATALOG")
    if not catalog:
        with pytest.raises(IcebergUnavailable):
            IcebergSnapStore(spark, "nosuch_catalog", "crawl", "/tmp/rounds")
        pytest.skip("no Iceberg catalog in sandbox — adapter refusal verified")
    store = IcebergSnapStore(spark, catalog, "crawl_test", "/tmp/rounds")
    s1 = store.append("t_contract", _df(spark, [(1, "a")]))
    s2 = store.append("t_contract", _df(spark, [(2, "b")]))
    assert store.read(spark, "t_contract", s1).count() == 1
    assert store.read(spark, "t_contract", s2).count() == 2
    # parent=None starts a fresh chain (ADVICE r2): prior rows must vanish
    s3 = store.append("t_contract", _df(spark, [(9, "z")]), parent=None)
    got = {r["k"] for r in store.read(spark, "t_contract", s3).collect()}
    assert got == {9}
