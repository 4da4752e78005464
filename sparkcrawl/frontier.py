"""Frontier schemas + relational crawl operators (SURVEY.md §2.3–§2.4).

All operators here are pure DataFrame transformations — no actions, no
collect. The frontier table holds QUEUED rows only (the live priority
queue); terminal states stream to the append-only ``frontier_log``. At the
10^10-URL design point this keeps per-round IO proportional to the live
queue + new links, never to all URLs ever seen.

Replaces (reference): scheduler priority queues (scrapy/pqueues.py::
ScrapyPriorityQueue), per-host Downloader slots (scrapy/core/downloader/
__init__.py::Downloader), RFPDupeFilter (scrapy/dupefilters.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparkcrawl.config import CrawlConfig
from sparkcrawl.udfs import canonicalize_udf, host_udf

# Module defaults for the layout knobs; per-deploy values live on
# CrawlConfig (n_buckets / salt_n) and are threaded through rounds.py —
# the sidecar-sizing math in config.py assumes they scale with the corpus.
N_BUCKETS = 32   # url_hash bucket count for seen/pages layout
SALT_N = 16      # salt fan-out for the hot-host budget window (P5)

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("canon", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("host", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("priority", T.IntegerType()),
        T.StructField("seq", T.LongType()),
        T.StructField("discovered_round", T.IntegerType()),
        T.StructField("parent_url", T.StringType()),
        T.StructField("retries", T.IntegerType()),
        T.StructField("redirects", T.IntegerType()),
        # Request.meta analogue ([scrapy: scrapy/http/request/__init__.py::
        # Request.meta]): arbitrary user payload, JSON-serialized (Scrapy
        # meta is arbitrary-typed, so a JSON string is the faithful column
        # shape — and it crosses the Arrow probe stage and parquet without
        # map-type round-trip hazards). Set at seed time; preserved by
        # redirect/retry descendants (request.replace semantics); discovered
        # links start fresh (null) exactly as a new Request() would.
        T.StructField("meta", T.StringType()),
    ]
)

FRONTIER_COLS = [f.name for f in FRONTIER_SCHEMA.fields]


def with_bucket(
    df: DataFrame, col: str = "url_hash", n_buckets: int = N_BUCKETS
) -> DataFrame:
    return df.withColumn("bucket", F.pmod(F.col(col), F.lit(n_buckets)).cast("int"))


def canonicalized(df: DataFrame, url_col: str = "url") -> DataFrame:
    """url → canon, url_hash, host (one UDF projection; everything else native)."""
    return (
        df.withColumn("canon", canonicalize_udf(F.col(url_col)))
        .withColumn("url_hash", F.xxhash64(F.col("canon")))
        .withColumn("host", host_udf(F.col("canon")))
    )


def seeds_to_frontier(seeds: DataFrame) -> DataFrame:
    """Seed rows → frontier schema (depth 0, seq = xxhash64(canon), dedup by
    canon keeping min seq — FIXTURES.md §4; seeds are dont_filter)."""
    meta = (
        F.col("meta").cast("string")
        if "meta" in seeds.columns
        else F.lit(None).cast("string")
    )
    df = (
        canonicalized(seeds)
        .withColumn("depth", F.lit(0).cast("int"))
        .withColumn("priority", F.col("priority").cast("int"))
        .withColumn("seq", F.xxhash64(F.col("canon")))
        .withColumn("discovered_round", F.lit(0).cast("int"))
        .withColumn("parent_url", F.lit(None).cast("string"))
        .withColumn("retries", F.lit(0).cast("int"))
        .withColumn("redirects", F.lit(0).cast("int"))
        .withColumn("meta", meta)
    )
    w = Window.partitionBy("canon").orderBy("seq")
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*FRONTIER_COLS)
    )


def label_candidates(cand: DataFrame, cfg: CrawlConfig, salt: bool = True) -> DataFrame:
    """Single-pass robots + budget labeling → ``verdict`` column.

    Per-host top-k is a two-phase salted window (P3+P5) when ``salt``: phase
    1 ranks within (host, salt) so one hot host fans across SALT_N tasks and
    is capped to SALT_N×cap rows before the exact per-host rank in phase 2.
    With ``salt=False`` (small frontiers, where a second exchange costs more
    than skew ever could) the exact phase-2 window runs alone — the verdict
    for every row is identical either way; only the physical plan differs.
    All windows run over ALL candidate rows with no branch/union (so the
    robots-UDF lineage is computed exactly once): ordering by the eligibility
    flag DESC first means eligible rows sort ahead of ineligible ones, so a
    row_number over the whole partition equals the rank among eligible rows
    for every eligible row — ineligible rows' ranks are simply unused.

    Requires columns: ``allowed`` (bool, null ⇒ robots still pending) and
    ``cap`` (per-host budget). Verdicts: robots_deferred / robots_denied /
    budget_deferred / pass.
    """
    order = [F.col("priority").desc(), F.col("seq").asc()]
    if salt:
        salted = cand.withColumn(
            "_salt", F.pmod(F.col("url_hash"), F.lit(cfg.salt_n)).cast("int")
        )
        w1 = Window.partitionBy("host", "_salt").orderBy(
            F.col("allowed").desc_nulls_last(), *order
        )
        p1 = salted.withColumn("_rn1", F.row_number().over(w1)).withColumn(
            "_surv",
            F.coalesce(F.col("allowed"), F.lit(False)) & (F.col("_rn1") <= F.col("cap")),
        )
    else:
        p1 = cand.withColumn(
            "_surv", F.coalesce(F.col("allowed"), F.lit(False))
        )
    w2 = Window.partitionBy("host").orderBy(F.col("_surv").desc(), *order)
    out = (
        p1.withColumn("host_rank", F.row_number().over(w2))
        .withColumn(
            "verdict",
            F.when(F.col("allowed").isNull(), "robots_deferred")
            .when(~F.col("allowed"), "robots_denied")
            .when(~F.col("_surv") | (F.col("host_rank") > F.col("cap")), "budget_deferred")
            .otherwise("pass"),
        )
    )
    return out.drop("_salt", "_rn1", "_surv") if salt else out.drop("_surv")


def host_ok_col(cfg: CrawlConfig, host_col: str = "host"):
    """F1 offsite check as a native boolean Column (CrawlConfig.host_allowed
    twin) — shared by link discovery and redirect following."""
    if cfg.allowed_domains is None:
        return F.lit(True)
    conds = [
        (F.col(host_col) == d) | F.col(host_col).endswith("." + d)
        for d in cfg.allowed_domains
    ]
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out


def f4_filter_cols(cfg: CrawlConfig, canon_col: str = "canon"):
    """F4 allow/deny regex + deny_extensions as native boolean Columns over
    the canonical url — the same regexes the oracle applies in
    CrawlConfig.link_filter_reason (Java∩Python regex subset, pinned there).
    All JVM-side; no UDF. Returns ``(ext_bad, regex_bad)``; parity with the
    python kernel is property-tested in tests/test_f4.py."""
    ext_re = cfg.ext_deny_regex()
    if ext_re is None:
        ext_bad = F.lit(False)
    else:
        path = F.regexp_extract(F.col(canon_col), CrawlConfig.PATH_RE, 1)
        ext_bad = F.lower(path).rlike(ext_re)
    regex_bad = F.lit(False)
    if cfg.allow_patterns is not None:
        allow_ok = F.lit(False)
        for p in cfg.allow_patterns:
            allow_ok = allow_ok | F.col(canon_col).rlike(p)
        regex_bad = regex_bad | ~allow_ok
    for p in cfg.deny_patterns:
        regex_bad = regex_bad | F.col(canon_col).rlike(p)
    return ext_bad, regex_bad


def links_to_candidates(fetched: DataFrame, cfg: CrawlConfig, round_n: int) -> DataFrame:
    """Exploded links of fetched pages → frontier-schema candidate rows with
    a ``drop_reason`` column (null = viable). One UDF projection (canon/host),
    all filters native (F1–F4, SURVEY.md §2.2)."""
    lk = (
        fetched.select(
            F.col("url").alias("parent_url"),
            F.col("priority").alias("parent_priority"),
            F.col("seq").alias("parent_seq"),
            F.col("depth").alias("parent_depth"),
            F.explode_outer("links").alias("link"),
        )
        .filter(F.col("link").isNotNull())
        .select(
            "parent_url", "parent_priority", "parent_seq", "parent_depth",
            F.col("link.url").alias("url"),
            F.col("link.nofollow").alias("nofollow"),
        )
    )
    lk = canonicalized(lk)
    depth = F.col("parent_depth") + F.lit(1)
    host_ok = host_ok_col(cfg)
    ext_bad, regex_bad = f4_filter_cols(cfg)
    drop = (
        F.when(F.col("nofollow") & F.lit(cfg.respect_nofollow), "NOFOLLOW")
        .when(depth > cfg.depth_limit, "DEPTH")
        .when(
            (F.length("url") > cfg.url_length_limit)
            | ~F.col("url").rlike("^https?://"),
            "URL_GUARD",
        )
        .when(ext_bad, "EXT")
        .when(regex_bad, "REGEX")
        .when(~host_ok, "OFFSITE")
        .otherwise(F.lit(None))
    )
    return (
        lk.withColumn("drop_reason", drop)
        .withColumn("depth", depth.cast("int"))
        .withColumn(
            "priority",
            (F.col("parent_priority") - depth * F.lit(cfg.depth_priority)).cast("int"),
        )
        .withColumn(
            "seq",
            F.xxhash64(
                F.concat_ws("\x00", F.col("parent_seq").cast("string"), F.col("canon"))
            ),
        )
        .withColumn("discovered_round", F.lit(round_n).cast("int"))
        .withColumn("retries", F.lit(0).cast("int"))
        .withColumn("redirects", F.lit(0).cast("int"))
        .withColumn("meta", F.lit(None).cast("string"))
    )


def redirects_to_candidates(
    redir: DataFrame, cfg: CrawlConfig, round_n: int
) -> DataFrame:
    """Followed 3xx responses → frontier-schema candidate rows with a
    ``drop_reason`` column (RedirectMiddleware semantics, pinned in
    CrawlConfig). Input rows carry the source frontier columns plus
    ``page_url``/``location``. Depth is UNCHANGED (redirects replace the
    request, they do not descend), priority += redirect_priority_adjust,
    redirects+1, retries carried; only URL_GUARD → OFFSITE apply (pinned
    order); batch dedup + seen dedup apply downstream like any candidate."""
    from sparkcrawl.udfs import resolve_redirect_udf

    rs = redir.select(
        F.col("url").alias("parent_url"),
        "depth",
        "retries",
        "meta",  # request.replace preserves meta across the redirect
        (F.col("priority") + F.lit(cfg.redirect_priority_adjust))
        .cast("int")
        .alias("priority"),
        (F.col("redirects") + 1).cast("int").alias("redirects"),
        F.col("seq").alias("parent_seq"),
        resolve_redirect_udf("page_url", "location").alias("url"),
    )
    rs = canonicalized(rs)
    drop = (
        F.when(
            (F.length("url") > cfg.url_length_limit)
            | ~F.col("url").rlike("^https?://"),
            "URL_GUARD",
        )
        .when(~host_ok_col(cfg), "OFFSITE")
        .otherwise(F.lit(None))
    )
    return (
        rs.withColumn("drop_reason", drop)
        .withColumn(
            "seq",
            F.xxhash64(
                F.concat_ws(
                    "\x00",
                    F.col("parent_seq").cast("string"),
                    F.lit("R"),
                    F.col("canon"),
                )
            ),
        )
        .withColumn("discovered_round", F.lit(round_n).cast("int"))
    )


def sitemaps_to_candidates(
    robots_rows: DataFrame, cfg: CrawlConfig, round_n: int
) -> DataFrame:
    """`Sitemap:` directives of freshly fetched robots.txt bodies →
    frontier-schema candidate rows with a ``drop_reason`` column (SitemapSpider
    robots.txt handling; pinned semantics in CrawlConfig). Input rows carry
    ``host``/``body``. Depth 0, priority = sitemap_priority, seq =
    seq_for_sitemap(src_host, canon) — the advertising host in the hash keeps
    min-seq batch dedup deterministic across hosts sharing a sitemap url.
    Like redirect targets, only URL_GUARD → OFFSITE apply (pinned order);
    batch + seen dedup apply downstream like any candidate."""
    sm = (
        robots_rows.filter(F.col("body").isNotNull())
        .select(
            F.col("host").alias("src_host"),
            F.explode(
                F.regexp_extract_all(
                    "body", F.lit(CrawlConfig.SITEMAP_LINE_RE), F.lit(1)
                )
            ).alias("url"),
        )
    )
    sm = canonicalized(sm)
    drop = (
        F.when(
            (F.length("url") > cfg.url_length_limit)
            | ~F.col("url").rlike("^https?://"),
            "URL_GUARD",
        )
        .when(~host_ok_col(cfg), "OFFSITE")
        .otherwise(F.lit(None))
    )
    return (
        sm.withColumn("drop_reason", drop)
        .withColumn("depth", F.lit(0).cast("int"))
        .withColumn("priority", F.lit(cfg.sitemap_priority).cast("int"))
        .withColumn(
            "seq",
            F.xxhash64(
                F.concat_ws("\x00", F.lit("S"), F.col("src_host"), F.col("canon"))
            ),
        )
        .withColumn("discovered_round", F.lit(round_n).cast("int"))
        .withColumn(
            "parent_url",
            F.concat(F.lit("http://"), F.col("src_host"), F.lit("/robots.txt")),
        )
        .withColumn("retries", F.lit(0).cast("int"))
        .withColumn("redirects", F.lit(0).cast("int"))
        .withColumn("meta", F.lit(None).cast("string"))
        .drop("src_host")
    )


def dedup_batch(cands: DataFrame) -> DataFrame:
    """Within-batch dedup: per canonical url keep the min-seq row (order-free
    deterministic rule, D2/O4). Exact — partitions by the canonical string,
    not its 64-bit hash, so hash collisions cannot merge distinct urls."""
    w = Window.partitionBy("canon").orderBy("seq")
    return (
        cands.withColumn("_rn", F.row_number().over(w))
        .withColumn("dup_in_batch", F.col("_rn") > 1)
        .drop("_rn")
    )


def anti_join_seen(cands: DataFrame, seen: DataFrame) -> DataFrame:
    """Exact dedup vs the seen set: anti-join on (bucket, url_hash, canon).
    url_hash drives the shuffle/bucketing; canon equality kills 64-bit hash
    collisions (exact set semantics, D2); the ``bucket`` partition column
    enables partition pruning of the seen table at scale."""
    seen_keys = seen.select("bucket", "url_hash", "canon")
    return with_bucket(cands).join(
        seen_keys, on=["bucket", "url_hash", "canon"], how="left_anti"
    )
