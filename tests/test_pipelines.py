"""Item-pipeline chain (E5): per-stage drop counters, deterministic dedupe,
equivalence to a straightforward driver-side reference, and fusion with the
feed-export sink."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkcrawl.pipelines import (
    Dedupe,
    DropIf,
    Transform,
    apply_pipelines,
    validate_fields,
)

ROWS = [
    # (round, url, canon, text, n_links, price)
    (0, "http://h0/a", "http://h0/a", "keep me", 3, 10.0),
    (0, "http://h0/b", "http://h0/b", "", 1, 5.0),        # empty text -> drop
    (1, "http://h0/a?x=1", "http://h0/a", "dup of a", 2, 7.0),  # dup canon
    (1, "http://h1/c", "http://h1/c", None, 4, 2.0),      # null text -> drop
    (1, "http://h1/d", "http://h1/d", "short", 0, None),  # null price
    (2, "http://h1/e", "http://h1/e", "fine too", 9, 1.0),
]
COLS = ["round", "url", "canon", "text", "n_links", "price"]


@pytest.fixture(scope="module")
def items(spark):
    return spark.createDataFrame(ROWS, COLS)


def test_chain_counters_and_reference_semantics(items):
    res = apply_pipelines(items, [
        validate_fields(["text"]),
        DropIf("price IS NULL", name="need_price"),
        Transform({"price": "round(price * 2, 2)"}),
        Dedupe(keys=["canon"], order=["round", "url"]),
    ])
    got = {r.url: r for r in res.df.collect()}
    stats = res.stats()
    assert stats == {
        "items_in": 6,
        "validate_dropped": 2,    # empty-text + null-text rows
        "need_price_dropped": 1,  # the null-price row
        "dedupe_dropped": 1,      # canon of /a seen twice
        "items_out": 2,
    }
    # exact reference computation, driver-side
    ref = [r for r in ROWS if r[3]]                      # text non-empty
    ref = [r for r in ref if r[5] is not None]           # price present
    best: dict[str, tuple] = {}
    for r in ref:                                        # min (round, url) per canon
        k = r[2]
        if k not in best or (r[0], r[1]) < (best[k][0], best[k][1]):
            best[k] = r
    assert set(got) == {r[1] for r in best.values()}
    for r in best.values():
        assert got[r[1]].price == round(r[5] * 2, 2)


def test_dedupe_is_deterministic_under_partitioning(items):
    outs = []
    for parts in (1, 7):
        res = apply_pipelines(items.repartition(parts),
                              [Dedupe(keys=["canon"], order=["round", "url"])])
        outs.append(sorted((r.canon, r.url) for r in res.df.collect()))
    assert outs[0] == outs[1]
    # survivor is the min-(round,url) row, not an arbitrary one
    surv = dict(outs[0])
    assert surv["http://h0/a"] == "http://h0/a"


def test_duplicate_stage_names_get_unique_counters(items):
    res = apply_pipelines(items, [
        DropIf("n_links = 0"), DropIf("n_links > 8"),
    ])
    res.df.count()
    s = res.stats()
    assert s["drop_if_dropped"] == 1 and s["drop_if2_dropped"] == 1
    assert s["items_out"] == 4


def test_transform_only_chain_keeps_all(items):
    res = apply_pipelines(items, [Transform({"url_len": "length(url)"})])
    rows = res.df.collect()
    assert len(rows) == len(ROWS)
    assert all(r.url_len == len(r.url) for r in rows)
    assert res.stats() == {"items_in": 6, "items_out": 6}


def test_export_fuses_pipeline_chain(spark, tmp_path):
    """items -> pipelines -> feed export as one job (the Scrapy flow)."""
    from sparkcrawl.export import export_extracted
    from sparkcrawl.snapstore import SnapStore

    store = SnapStore(str(tmp_path / "store"))
    df = spark.createDataFrame(ROWS, COLS)
    store.append("extracted", df)
    n = export_extracted(
        spark, store, str(tmp_path / "feed"), fmt="jsonl",
        stages=[validate_fields(["text"]), Dedupe(["canon"])])
    back = spark.read.json(str(tmp_path / "feed"))
    assert n == back.count() == 3


def test_dropif_null_predicate_keeps_item(items):
    """DropIf drops rows MATCHING the predicate; a NULL predicate value
    (price < 0 with price NULL) does not match, so the item survives —
    Scrapy's DropItem only fires when the condition actually holds."""
    res = apply_pipelines(items, [DropIf("price < 0", name="neg_price")])
    out = res.df.collect()
    assert len(out) == len(ROWS)  # nothing matches, incl. the NULL-price row
    assert {r["url"] for r in out} == {r[1] for r in ROWS}
    assert res.stats()["neg_price_dropped"] == 0
