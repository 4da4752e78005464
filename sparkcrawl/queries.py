"""Driver-harness query battery (SURVEY.md §5.2.4, FIXTURES.md §2).

Every SQL-expressible operator family from SURVEY.md §2 plus the
training-data-pipeline ops (dedup family, similarity search, text analysis)
gets a (spark_fn, oracle_sql) pair. Design rules that make the driver's
order-insensitive value-hash comparison deterministic:

- shared ANSI SQL text between Spark and DuckDB wherever dialects agree
  (one string, zero drift); dialect-split only where needed (noted)
- money/double aggregations use the integer-cents pattern
  ``SUM(CAST(ROUND(x*100) AS BIGINT))/100.0`` — bit-exact on both engines
  (double sums are order-dependent; integer sums are not)
- float vector math is written as the identical sequential fold on both
  engines (index-based products, left-to-right sum), then rounded
- every computed column is aliased identically on both sides
- portable 60-bit token hash ``TOKHASH(x) = int(md5(x)[:15], 16)``:
  Spark ``conv(substr(md5(x),1,15),16,10)``, DuckDB ``('0x'||…)::BIGINT``
  — the same trick that makes MinHash/SimHash SQL-checkable
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# ---------------------------------------------------------------------------
# dialect helpers
# ---------------------------------------------------------------------------

def _tokhash(engine: str, x: str) -> str:
    if engine == "spark":
        return f"cast(conv(substr(md5({x}),1,15),16,10) as bigint)"
    return f"('0x'||substr(md5({x}),1,15))::BIGINT"


def _micros(engine: str, x: str) -> str:
    # parquet µs timestamps surface as TIMESTAMP_NTZ in Spark 4; cast to TZ
    # (session TZ pinned UTC) matches DuckDB's naive epoch_us exactly
    if engine == "spark":
        return f"unix_micros(CAST({x} AS TIMESTAMP))"
    return f"epoch_us({x})"


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


# ---------------------------------------------------------------------------
# shared-SQL query definitions: name → SQL builder(engine) -> str
# engine ∈ {"spark", "duckdb"}; identical output schema required
# ---------------------------------------------------------------------------

def _q_seen_antijoin(engine: str) -> str:
    # D2 dedup-against-seen as an anti-join (NOT EXISTS) over events
    return """
      SELECT e.user_id AS user_id, COUNT(*) AS n_events
      FROM events e
      WHERE NOT EXISTS (
        SELECT 1 FROM events p
        WHERE p.event_type = 'purchase' AND p.user_id = e.user_id)
      GROUP BY e.user_id
    """


def _q_perhost_topk(engine: str) -> str:
    # P3 per-host budget window as per-user top-k (priority DESC, seq ASC)
    return """
      SELECT user_id, event_id, value, rk FROM (
        SELECT user_id, event_id, value,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY user_id ORDER BY value DESC, event_id ASC
               ) AS INT) AS rk
        FROM events) t
      WHERE rk <= 3
    """


def _q_priority_order(engine: str) -> str:
    # P1/O1 priority-queue pop order with deterministic tie-break
    return """
      SELECT o_orderkey, o_orderpriority, o_totalprice
      FROM orders
      ORDER BY o_orderpriority ASC, o_orderdate ASC, o_orderkey ASC
      LIMIT 100
    """


def _q_depth_histogram(engine: str) -> str:
    # A2 depth histogram analogue
    return """
      SELECT l_linenumber AS depth, COUNT(*) AS n
      FROM lineitem GROUP BY l_linenumber
    """


def _q_status_counts(engine: str) -> str:
    # A1 counter stats with exact integer-cents sums
    return """
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / CAST(100.0 AS DOUBLE) AS sum_value
      FROM events GROUP BY event_type
    """


def _q_broadcast_join(engine: str) -> str:
    # S5/R-style small-dim broadcast join
    return """
      SELECT r.r_name AS region_name, COUNT(*) AS n_nations
      FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name
    """


def _q_json_extract(engine: str) -> str:
    if engine == "spark":
        k = "CAST(get_json_object(props, '$.k') AS INT)"
    else:
        k = "CAST(json_extract_string(props, '$.k') AS INT)"
    return f"""
      SELECT {k} AS k, COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / CAST(100.0 AS DOUBLE) AS sum_value
      FROM events GROUP BY 1
    """


def _q_window_hourly(engine: str) -> str:
    # tumbling event-time window aggregation (§2.10 analytics surface)
    return """
      SELECT date_trunc('hour', ts) AS hour, event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / CAST(100.0 AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2
    """


def _q_sessionize(engine: str) -> str:
    us = _micros(engine, "ts")
    prev = _micros(engine, "prev_ts")
    return f"""
      SELECT user_id, CAST(SUM(new_sess) + 1 AS INT) AS n_sessions
      FROM (
        SELECT user_id,
               CASE WHEN prev_ts IS NULL THEN 0
                    WHEN {us} - {prev} > 1800000000 THEN 1 ELSE 0 END AS new_sess
        FROM (
          SELECT user_id, ts,
                 LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
          FROM events) a
      ) b GROUP BY user_id
    """


def _q_union_distinct(engine: str) -> str:
    # O5 union across rounds analogue
    return """
      SELECT user_id FROM events WHERE event_type = 'click'
      UNION
      SELECT user_id FROM events WHERE event_type = 'view'
    """


def _q_intersect_users(engine: str) -> str:
    # O6 semi-join / intersect diagnostics
    return """
      SELECT user_id FROM events WHERE event_type = 'error'
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'click'
    """


def _q_tpch_q1(engine: str) -> str:
    return """
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / CAST(100.0 AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / CAST(100.0 AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS DOUBLE)
               / CAST(100.0 AS DOUBLE) AS sum_disc_price,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
    """


def _q_tpch_q3(engine: str) -> str:
    return """
      SELECT o.o_orderkey, o.o_orderdate,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT)) AS DOUBLE)
               / CAST(100.0 AS DOUBLE) AS revenue
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l.l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
      GROUP BY o.o_orderkey, o.o_orderdate
      ORDER BY revenue DESC, o_orderkey ASC
      LIMIT 10
    """


def _q_tpch_q5(engine: str) -> str:
    return """
      SELECT n.n_name AS nation_name,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT)) AS DOUBLE)
               / CAST(100.0 AS DOUBLE) AS revenue
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
      GROUP BY n.n_name
    """


def _q_dedup_exact(engine: str) -> str:
    # exact (hash-groupBy) dedup: content hash → representative + dup count
    return """
      SELECT md5(text) AS content_hash,
             MIN(doc_id) AS representative,
             COUNT(*) AS n_dups
      FROM documents GROUP BY md5(text)
    """


def _q_token_stats(engine: str) -> str:
    # token counting: whitespace tokens + BPE-ish regex tokens
    if engine == "spark":
        ws = "size(split(text, ' '))"
        bpe = "size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))"
    else:
        ws = "len(string_split(text, ' '))"
        bpe = "len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))"
    return f"""
      SELECT doc_id, CAST({ws} AS INT) AS ws_tokens, CAST({bpe} AS INT) AS bpe_tokens
      FROM documents
    """


def _q_langid(engine: str) -> str:
    # language-ID heuristic: English stopword ratio over whitespace tokens
    if engine == "spark":
        toks = "split(text, ' ')"
        nstop = "size(filter(" + toks + ", t -> t IN ('the','a','of','and','in')))"
        ntok = f"size({toks})"
    else:
        toks = "string_split(text, ' ')"
        nstop = "len(list_filter(" + toks + ", t -> t IN ('the','a','of','and','in')))"
        ntok = f"len({toks})"
    return f"""
      SELECT doc_id,
             ROUND(CAST({nstop} AS DOUBLE) / CAST({ntok} AS DOUBLE), 6) AS stopword_ratio,
             CASE WHEN CAST({nstop} AS DOUBLE) / CAST({ntok} AS DOUBLE) > 0.05
                  THEN 'en' ELSE 'other' END AS pred_lang
      FROM documents
    """


def _q_quality_score(engine: str) -> str:
    # quality scoring: length/token features + rational score (no libm calls
    # → bit-exact across engines)
    ntok = (
        "size(split(text, ' '))" if engine == "spark" else "len(string_split(text, ' '))"
    )
    return f"""
      SELECT doc_id,
             CAST({ntok} AS INT) AS n_tokens,
             CAST(length(text) AS INT) AS n_chars_measured,
             ROUND(CAST({ntok} AS DOUBLE) / (CAST({ntok} AS DOUBLE) + 50.0), 6) AS quality
      FROM documents
    """


def _q_doc_fingerprint(engine: str) -> str:
    # document fingerprinting: hash of the 8 smallest distinct tokens
    if engine == "spark":
        expr = (
            "md5(array_join(slice(array_sort(array_distinct(split(text,' '))),1,8),' '))"
        )
    else:
        expr = "md5(array_to_string(list_sort(list_distinct(string_split(text,' ')))[1:8],' '))"
    return f"SELECT doc_id, {expr} AS fp FROM documents"


def _shingles(engine: str) -> str:
    """Word-3-gram shingle array from text (1-based element access on both)."""
    if engine == "spark":
        return (
            "transform(sequence(1, size(split(text,' ')) - 2), "
            "i -> concat_ws(' ', element_at(split(text,' '), i), "
            "element_at(split(text,' '), i+1), element_at(split(text,' '), i+2)))"
        )
    return (
        "list_transform(generate_series(1, len(string_split(text,' ')) - 2), "
        "i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] "
        "|| ' ' || string_split(text,' ')[i+2])"
    )


_N_MINHASH = 8


def _q_minhash_signatures(engine: str) -> str:
    # MinHash over word-3-gram shingles, 8 portable hash functions
    sh = _shingles(engine)
    cols = []
    for i in range(_N_MINHASH):
        h = _tokhash(engine, f"'{i}:' || s")
        if engine == "spark":
            cols.append(f"array_min(transform(shingles, s -> {h})) AS sig{i}")
        else:
            cols.append(f"list_aggregate(list_transform(shingles, s -> {h}), 'min') AS sig{i}")
    # identical ≥3-token guard on both engines (a <3-token doc would make
    # Spark's sequence() descend instead of producing an empty shingle list)
    return f"""
      SELECT doc_id, {', '.join(cols)}
      FROM (SELECT doc_id, {sh} AS shingles FROM documents
            WHERE length(text) - length(replace(text, ' ', '')) >= 2) t
    """


def _q_minhash_lsh_pairs(engine: str) -> str:
    # LSH banding (2 bands × 4 rows) over the signatures → candidate pairs
    sig = _q_minhash_signatures(engine)
    return f"""
      WITH sigs AS ({sig}),
      banded AS (
        SELECT doc_id,
               md5(CAST(sig0 AS STRING)||','||CAST(sig1 AS STRING)||','||
                   CAST(sig2 AS STRING)||','||CAST(sig3 AS STRING)) AS b0,
               md5(CAST(sig4 AS STRING)||','||CAST(sig5 AS STRING)||','||
                   CAST(sig6 AS STRING)||','||CAST(sig7 AS STRING)) AS b1
        FROM sigs)
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a JOIN banded b
        ON (a.b0 = b.b0 OR a.b1 = b.b1) AND a.doc_id < b.doc_id
    """


def _q_simhash(engine: str) -> str:
    # 16-bit SimHash from distinct-token hashes (bit-majority)
    tok = "split(text, ' ')" if engine == "spark" else "string_split(text, ' ')"
    dedup = f"array_distinct({tok})" if engine == "spark" else f"list_distinct({tok})"
    h = _tokhash(engine, "t")
    if engine == "spark":
        explode = f"SELECT doc_id, explode({dedup}) AS t FROM documents"
        bit = lambda b: f"shiftright(h, {b}) & 1"
    else:
        explode = f"SELECT doc_id, unnest({dedup}) AS t FROM documents"
        bit = lambda b: f"(h >> {b}) & 1"
    sums = ", ".join(
        f"SUM(CASE WHEN ({bit(b)}) = 1 THEN 1 ELSE -1 END) AS s{b}" for b in range(16)
    )
    assemble = " + ".join(f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(16))
    return f"""
      WITH toks AS ({explode}),
      hashed AS (SELECT doc_id, {h} AS h FROM toks),
      bits AS (SELECT doc_id, {sums} FROM hashed GROUP BY doc_id)
      SELECT doc_id, CAST({assemble} AS BIGINT) AS simhash FROM bits
    """


def _q_ngram_jaccard(engine: str) -> str:
    # n-gram (unigram-set) Jaccard near-dup over same-(lang,source) blocks
    if engine == "spark":
        toks = "array_distinct(split(text, ' '))"
        inter = "size(array_intersect(a.toks, b.toks))"
        uni = "size(array_union(a.toks, b.toks))"
    else:
        toks = "list_distinct(string_split(text, ' '))"
        inter = "len(list_intersect(a.toks, b.toks))"
        uni = "len(list_distinct(list_concat(a.toks, b.toks)))"
    return f"""
      WITH d AS (SELECT doc_id, lang, source, {toks} AS toks FROM documents)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             ROUND(CAST({inter} AS DOUBLE) / CAST({uni} AS DOUBLE), 6) AS jaccard
      FROM d a JOIN d b
        ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
      WHERE CAST({inter} AS DOUBLE) / CAST({uni} AS DOUBLE) >= 0.6
    """


def _cosine(engine: str, a: str, b: str) -> str:
    """Bit-exact cosine: index-based double products, sequential sum, shared
    formula shape on both engines (64-dim vectors)."""
    if engine == "spark":
        dot = (
            f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        na = (
            f"aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
            "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        nb = (
            f"aggregate(transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
            "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    else:
        dot = (
            f"list_aggregate(list_transform(generate_series(1, 64), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), 'sum')"
        )
        na = (
            f"list_aggregate(list_transform(generate_series(1, 64), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)), 'sum')"
        )
        nb = (
            f"list_aggregate(list_transform(generate_series(1, 64), "
            f"i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), 'sum')"
        )
    return f"({dot}) / (sqrt({na}) * sqrt({nb}))"


def _q_ann_bruteforce(engine: str) -> str:
    # brute-force cosine top-k vs the vec_id=0 query vector (similarity search
    # baseline; the IVF variant below is the scale path)
    cos = _cosine(engine, "e.embedding", "q.embedding")
    return f"""
      WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
      SELECT vec_id, cos, rk FROM (
        SELECT e.vec_id AS vec_id,
               ROUND({cos}, 6) AS cos,
               CAST(ROW_NUMBER() OVER (ORDER BY ROUND({cos}, 6) DESC, e.vec_id ASC) AS INT) AS rk
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> 0) t
      WHERE rk <= 10
    """


def _q_ann_ivf(engine: str) -> str:
    # IVF-style ANN: probe only the query's coarse cell (label = centroid id)
    cos = _cosine(engine, "e.embedding", "q.embedding")
    return f"""
      WITH q AS (SELECT embedding, label FROM embeddings WHERE vec_id = 0)
      SELECT vec_id, cos, rk FROM (
        SELECT e.vec_id AS vec_id,
               ROUND({cos}, 6) AS cos,
               CAST(ROW_NUMBER() OVER (ORDER BY ROUND({cos}, 6) DESC, e.vec_id ASC) AS INT) AS rk
        FROM embeddings e JOIN q ON e.label = q.label
        WHERE e.vec_id <> 0) t
      WHERE rk <= 10
    """


def _q_embed_neardup(engine: str) -> str:
    # embedding-cosine near-duplicate detection: label-blocked self-join
    # (IVF-style blocking keeps the candidate set linear in cluster size —
    # the 100 TB path replaces the block key with LSH bucket ids)
    cos = _cosine(engine, "a.embedding", "b.embedding")
    return f"""
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             ROUND({cos}, 6) AS cos
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE ROUND({cos}, 6) >= 0.30
    """


def _q_embed_norms(engine: str) -> str:
    # array ops: L2 norm per vector, averaged per label (integer-millis exact)
    if engine == "spark":
        ss = (
            "aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
            "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    else:
        ss = (
            "list_aggregate(list_transform(generate_series(1, 64), "
            "i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), 'sum')"
        )
    return f"""
      SELECT label,
             COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(sqrt({ss}) * 1000) AS BIGINT)) AS DOUBLE) / CAST(1000.0 AS DOUBLE) AS sum_norm
      FROM embeddings GROUP BY label
    """


def _q_event_pivot(engine: str) -> str:
    # pivot-style conditional aggregation per user
    cases = ", ".join(
        f"SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS n_{t}"
        for t in ("click", "view", "purchase", "error", "signup")
    )
    return f"SELECT user_id, {cases} FROM events GROUP BY user_id"


def _q_multimodal_bytes(engine: str) -> str:
    # multimodal plumbing: byte-size accounting of an opaque payload column
    nb = "octet_length(text)" if engine == "spark" else "strlen(text)"
    return f"""
      SELECT lang, COUNT(*) AS n_docs, SUM(CAST({nb} AS BIGINT)) AS total_bytes
      FROM documents GROUP BY lang
    """


def _q_canonicalize(engine: str) -> str:
    """Crawl-kernel canonicalization: Spark runs the real pandas UDF over a
    constructed messy URL; DuckDB states the expected canonical form directly
    (string algebra — the pinned canon of this constrained input)."""
    if engine == "spark":
        return None  # handled by a DataFrame fn (UDF), see below
    return """
      SELECT doc_id,
             'http://ex.com/docs/' || source || '?Id=' || CAST(doc_id AS STRING)
               || '&a=1&b=2' AS canon_url
      FROM documents
    """


_SHARED_QUERIES: dict[str, Callable[[str], str | None]] = {
    "seen_antijoin": _q_seen_antijoin,
    "perhost_topk": _q_perhost_topk,
    "priority_order": _q_priority_order,
    "depth_histogram": _q_depth_histogram,
    "status_counts": _q_status_counts,
    "broadcast_join": _q_broadcast_join,
    "json_extract": _q_json_extract,
    "window_hourly": _q_window_hourly,
    "sessionize": _q_sessionize,
    "union_distinct": _q_union_distinct,
    "intersect_users": _q_intersect_users,
    "tpch_q1": _q_tpch_q1,
    "tpch_q3": _q_tpch_q3,
    "tpch_q5": _q_tpch_q5,
    "dedup_exact": _q_dedup_exact,
    "token_stats": _q_token_stats,
    "langid": _q_langid,
    "quality_score": _q_quality_score,
    "doc_fingerprint": _q_doc_fingerprint,
    "minhash_signatures": _q_minhash_signatures,
    "minhash_lsh_pairs": _q_minhash_lsh_pairs,
    "simhash": _q_simhash,
    "ngram_jaccard": _q_ngram_jaccard,
    "ann_bruteforce": _q_ann_bruteforce,
    "ann_ivf": _q_ann_ivf,
    "embed_neardup": _q_embed_neardup,
    "embed_norms": _q_embed_norms,
    "event_pivot": _q_event_pivot,
    "multimodal_bytes": _q_multimodal_bytes,
}


def _make_sql_query(builder: Callable[[str], str]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(builder("spark"))

    return run


def _canonicalize_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from sparkcrawl.udfs import canonicalize_udf

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    raw = F.concat(
        F.lit("HTTP://Ex.com:80/docs/"), F.col("source"),
        F.lit("?b=2&a=1&Id="), F.col("doc_id").cast("string"), F.lit("#frag"),
    )
    return docs.select("doc_id", canonicalize_udf(raw).alias("canon_url"))


def _approx_users_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A6 approximate distinct — non-SQL-exact (HLL), rows-only driver check
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.agg(F.approx_count_distinct("user_id").alias("approx_users"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, builder in _SHARED_QUERIES.items():
        out[name] = _make_sql_query(builder)
    out["canonicalize"] = _canonicalize_spark
    out["approx_users"] = _approx_users_spark
    return out


def oracle_sql() -> dict[str, str]:
    out = {name: builder("duckdb") for name, builder in _SHARED_QUERIES.items()}
    out["canonicalize"] = _q_canonicalize("duckdb")
    # approx_users: HLL estimate — intentionally no oracle (rows-only check)
    return out
