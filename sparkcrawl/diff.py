"""Snapshot diff between two committed round boundaries.

The ops question every long crawl asks ("what did round N actually add?
did the seen set shrink after forget_seen? which frontier rows vanished?")
answered from the store's own round manifests — the time-travel facility
JOBDIR-style resume already relies on (snapstore.read_at_round). Spelled
as two key-only LEFT ANTI joins, so at the 10^10-row design point the diff
is a pair of shuffle-on-key jobs over the key columns alone (never the
payload columns, never a driver-side collect of either snapshot).

CLI:
    python -m sparkcrawl.diff STORE TABLE [--from-round A] [--to-round B]
           [--key canon,depth] [--sample 10]

Defaults: the last two committed rounds; key = the first of
(canon, url, fp, url_hash) present in the table's schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sparkcrawl.snapstore import SnapStore

_DEFAULT_KEYS = ("canon", "url", "fp", "url_hash")


def infer_key(df: DataFrame, requested: list[str] | None) -> list[str]:
    if requested:
        missing = [c for c in requested if c not in df.columns]
        if missing:
            raise SystemExit(
                f"key column(s) {missing} not in table schema {df.columns}")
        return requested
    for c in _DEFAULT_KEYS:
        if c in df.columns:
            return [c]
    raise SystemExit(
        f"no default key column in {df.columns}; pass --key explicitly")


def diff_table(
    spark: SparkSession,
    store: SnapStore,
    table: str,
    round_from: int,
    round_to: int,
    key: list[str] | None = None,
) -> tuple[DataFrame, DataFrame, list[str]]:
    """(added, removed, key_cols): KEYS present only in the later / only in
    the earlier snapshot — set semantics (distinct), so a key repeated in
    one snapshot still counts and prints once. Key-only projections so the
    anti-joins shuffle nothing but the keys."""
    try:
        before = store.read_at_round(spark, table, round_from)
        after = store.read_at_round(spark, table, round_to)
    except FileNotFoundError:
        raise SystemExit(
            f"no manifest for round {round_from} or {round_to}; "
            f"committed rounds: {store.committed_rounds()}") from None
    except KeyError:
        raise SystemExit(
            f"table {table!r} is not part of both round manifests "
            f"{round_from} and {round_to}") from None
    key_cols = infer_key(after, key)
    b = before.select(*key_cols).distinct()
    a = after.select(*key_cols).distinct()
    return (
        a.join(b, key_cols, "left_anti"),
        b.join(a, key_cols, "left_anti"),
        key_cols,
    )


def main() -> None:
    import argparse

    from sparkcrawl.session import get_spark

    ap = argparse.ArgumentParser(
        description="diff a store table between two committed rounds")
    ap.add_argument("store_dir")
    ap.add_argument("table")
    ap.add_argument("--from-round", type=int, default=None)
    ap.add_argument("--to-round", type=int, default=None)
    ap.add_argument("--key", default=None,
                    help="comma-separated key columns (default: inferred)")
    ap.add_argument("--sample", type=int, default=10)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    store = SnapStore(args.store_dir)
    rounds = store.committed_rounds()
    if len(rounds) < 2 and (args.from_round is None or args.to_round is None):
        raise SystemExit(f"need two committed rounds, store has {rounds}")
    r_to = args.to_round if args.to_round is not None else rounds[-1]
    if r_to not in rounds:
        raise SystemExit(
            f"round {r_to} is not committed; committed rounds: {rounds}")
    if args.from_round is not None:
        r_from = args.from_round
    else:
        pos = rounds.index(r_to)
        if pos == 0:
            raise SystemExit(
                f"round {r_to} is the earliest committed round ({rounds}); "
                "pass --from-round explicitly")
        r_from = rounds[pos - 1]
    key = args.key.split(",") if args.key else None

    spark = get_spark(cores=args.cores)
    try:
        added, removed, key_cols = diff_table(
            spark, store, args.table, r_from, r_to, key)
        # persist before count: count + sample would otherwise each rerun
        # the full anti-join shuffle
        added, removed = added.persist(), removed.persist()
        n_add, n_rm = added.count(), removed.count()
        print(f"{args.table} round {r_from} -> {r_to} "
              f"(key={','.join(key_cols)}): +{n_add} -{n_rm}")
        for tag, df, n in (("+", added, n_add), ("-", removed, n_rm)):
            if n:
                for row in df.limit(args.sample).collect():
                    print(f"  {tag} " + ", ".join(str(v) for v in row))
                if n > args.sample:
                    print(f"  {tag} ... ({n - args.sample} more)")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
