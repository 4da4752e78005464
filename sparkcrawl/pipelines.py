"""Item pipelines (E5, SURVEY.md §2.6) — the Scrapy item-processing chain
rebuilt as composable declarative DataFrame stages.

Scrapy runs every scraped item through an ordered pipeline chain
([scrapy: scrapy/pipelines/__init__.py::ItemPipelineManager] — pinned-spec
cite, SURVEY.md §0); each component transforms the item, or raises
``DropItem`` to discard it, and the stats collector records
``item_dropped_count``. The canonical public examples (docs' PricePipeline,
DuplicatesPipeline) are: field validation, value transformation, and a
seen-key dedupe.

Spark-first re-expression: a stage is NOT a per-item callback (a Python
``process_item`` would put every item through the interpreter — the slow
path). Each stage contributes a declarative fragment to ONE logical plan:

- ``DropIf``  — ``filter`` on a SQL predicate (DropItem analogue);
- ``Transform`` — ``withColumn`` over SQL expressions (value munging);
- ``Dedupe``  — deterministic keep-one ``groupBy(keys).agg(min_by(...))``
  (the DuplicatesPipeline seen-set, as one map-side-combinable shuffle —
  the same O4 shape the crawl's within-batch dedup uses).

Catalyst fuses the whole chain with the downstream feed-export write, so a
five-stage pipeline costs one pass over the items (plus one shuffle per
Dedupe). Per-stage drop counts come from ``Observation`` rows counted at
stage boundaries — no extra jobs, mirroring the A1 metrics pattern
(rounds.py). At 100 TB nothing here collects, nothing is per-row Python.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


@dataclass(frozen=True)
class DropIf:
    """Discard items matching ``predicate`` (SQL expr) — the DropItem path.

    ``ValidateFields(required=[...])`` in Scrapy examples is the special
    case ``DropIf("col IS NULL OR col = ''")``; use :func:`validate_fields`
    for that spelling."""

    predicate: str
    name: str = "drop_if"


@dataclass(frozen=True)
class Transform:
    """Set/overwrite columns from SQL expressions (PricePipeline analogue:
    ``Transform({"price": "round(price * 1.15, 2)"})``)."""

    exprs: dict[str, str]
    name: str = "transform"


@dataclass(frozen=True)
class Dedupe:
    """Keep exactly one row per ``keys``; survivor = the row minimizing
    ``order`` columns (deterministic at any partitioning/arrival order —
    an unordered ``dropDuplicates`` would be run-dependent)."""

    keys: Sequence[str]
    order: Sequence[str] = field(default_factory=lambda: ("round", "url"))
    name: str = "dedupe"


Stage = DropIf | Transform | Dedupe


def validate_fields(required: Sequence[str], name: str = "validate") -> DropIf:
    """Drop items whose required field is NULL or an empty string. (For an
    empty-ARRAY requirement spell the stage explicitly:
    ``DropIf("size(links) = 0")`` — SQL can't branch on column type.)"""
    preds = [f"({c} IS NULL OR CAST({c} AS STRING) = '')" for c in required]
    return DropIf(" OR ".join(preds), name=name)


class PipelineResult:
    """Processed items plus per-stage drop counters (available after the
    returned DataFrame has been materialized by an action)."""

    def __init__(self, df: DataFrame,
                 marks: list[tuple[str, Observation]], n_in: Observation):
        self.df = df
        self._marks = marks
        self._n_in = n_in

    def stats(self) -> dict[str, int]:
        """Scrapy-style counters: items_in, items_out, <stage>_dropped.
        Call after an action on ``df`` (write/collect/count)."""
        out: dict[str, int] = {"items_in": int(self._n_in.get["n"])}
        prev = out["items_in"]
        for name, obs in self._marks:
            n = int(obs.get["n"])
            out[f"{name}_dropped"] = prev - n
            prev = n
        out["items_out"] = prev
        return out


def apply_pipelines(df: DataFrame, stages: Sequence[Stage]) -> PipelineResult:
    """Compose ``stages`` into one logical plan over ``df`` (no action)."""
    n_in = Observation()
    df = df.observe(n_in, F.count(F.lit(1)).alias("n"))
    marks: list[tuple[str, Observation]] = []
    seen_names: set[str] = set()
    for st in stages:
        name = st.name
        i = 2
        while name in seen_names:  # unique counter names per chain
            name = f"{st.name}{i}"
            i += 1
        seen_names.add(name)
        if isinstance(st, Transform):
            for col, expr in st.exprs.items():
                df = df.withColumn(col, F.expr(expr))
            continue  # transforms never drop; no counter boundary
        if isinstance(st, DropIf):
            # drop only rows where the predicate is TRUE: a NULL predicate
            # (e.g. "price < 0" with price NULL) does NOT match, so the item
            # must survive — bare ~expr turns NULL into NULL and filter()
            # would silently discard it
            df = df.filter(~F.coalesce(F.expr(st.predicate), F.lit(False)))
        elif isinstance(st, Dedupe):
            others = [c for c in df.columns if c not in st.keys]
            packed = df.groupBy(*st.keys).agg(
                F.min_by(F.struct(*others), F.struct(*st.order)).alias("_s"))
            df = packed.select(*st.keys, *[F.col(f"_s.{c}") for c in others])
        else:  # pragma: no cover - exhaustive over Stage
            raise TypeError(f"unknown stage {st!r}")
        obs = Observation()
        df = df.observe(obs, F.count(F.lit(1)).alias("n"))
        marks.append((name, obs))
    return PipelineResult(df, marks, n_in)
