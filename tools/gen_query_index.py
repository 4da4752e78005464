"""Generate QUERIES.md: one row per battery entry — driver-window position,
oracle coverage, implementation kind (shared SQL vs DataFrame twin), and the
first docstring sentence. Run after adding/reordering entries:

    python tools/gen_query_index.py > QUERIES.md
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkcrawl.queries import (  # noqa: E402
    _DF_TWINS,
    _SHARED_QUERIES,
    oracle_sql,
    queries,
)


# one-liners for entries whose implementation carries comments rather than
# a docstring (shared-SQL builders and twins documented in-line)
DESC = {
    "seen_antijoin": "users with views but no high-value purchase (NOT EXISTS anti-join; pushed predicate)",
    "perhost_topk": "per-host top-k by priority (the P3 budget window shape)",
    "priority_order": "deterministic global priority order with rank (O1)",
    "status_counts": "events per type (scan + groupBy count, map-side combine)",
    "broadcast_join": "fact-to-tiny-dim join (broadcast hash join, no fact shuffle)",
    "json_extract": "JSON field extraction + filter over event payloads",
    "quality_score": "heuristic doc quality: length/punct/stopword ratios (one text pass)",
    "length_percentiles": "exact length percentiles per language stratum",
    "boilerplate_ngrams": "5-gram doc-frequency boilerplate detection (split-once shingle explode)",
    "contamination": "benchmark n-gram decontamination (semi-join of doc shingles vs probe set)",
    "tfidf_top_terms": "tf-idf top terms with rational idf (integer fixed point)",
    "pack_sequences": "greedy sequence packing into fixed token budgets (hash-deterministic)",
    "lm_perplexity": "CCNet-style unigram-LM perplexity score (two-pass, micro-nat fixed point)",
    "dsir_weights": "DSIR importance weights: hashed-ngram likelihood ratio vs target",
    "host_quality": "per-host reputation aggregate joined back as a doc filter",
    "filter_funnel": "pipeline retention funnel across quality/dedup stages",
    "pagerank": "5-iteration PageRank over the synthetic link graph (edges built once)",
    "paragraph_dedup": "paragraph-level exact dedup (hash-groupBy at paragraph granularity)",
    "minhash_lsh_pairs": "MinHash-LSH candidate pairs (banded sketch, ONE band equi-join)",
    "simhash": "16-bit SimHash near-dup buckets (bit-majority over token hashes)",
    "ngram_jaccard": "banded-candidate n-gram Jaccard near-dup (exact verify on candidates only)",
    "embed_neardup": "SRP-LSH embedding near-dup (8x4-bit hyperplane sketch + exact cosine verify)",
    "embed_norms": "embedding L2 norms (vectorized aggregate over array column)",
    "event_pivot": "per-user event-type pivot (groupBy + conditional aggregation)",
    "multimodal_bytes": "per-media-type byte totals over binary payload metadata",
    "link_filter": "F4 allow/deny regex + deny_extensions over candidate links (native rlike)",
    "rolling_avg": "per-user rolling average over an ordered event window",
    "canonicalize": "URL canonicalization kernel parity over the documents table",
    "approx_users": "HLL approx_count_distinct (rows-only check by design)",
    "minhash_signatures": "8-fn MinHash signatures over 3-gram shingles",
    "ann_ivf": "IVF single-probe ANN (coarse cell prune + exact cosine)",
    "window_hourly": "tumbling hourly window aggregation over event time",
    "sessionize": "gap-based sessionization (lag window + cumulative session ids)",
    "token_stats": "token counts: whitespace + BPE-ish regex (one text pass)",
    "langid": "n-gram-heuristic language ID over documents",
    "doc_fingerprint": "rolling-hash document fingerprints",
    "top_terms": "corpus top-k terms with deterministic tie-break (map-side combine)",
    "ann_bruteforce": "exact cosine top-k (the O(n) recall baseline, 1-row broadcast side)",
    "stratified_sample": "hash-mod stratified sample (shuffle-free, cluster-size-invariant)",
    "dedup_exact": "exact content-hash dedup (hash-partitioned groupBy)",
    "repetition_ratio": "Gopher repetition signal (repeated-line/ngram ratios per doc)",
    "gopher_rules": "Gopher composite quality rules: 5 signals + keep/drop verdict (one map-only text pass)",
    "bpe_merges": "distributed BPE tokenizer training: first 12 merge rules (one corpus shuffle, vocab-sized iterations)",
    "depth_histogram": "crawl-depth histogram (groupBy count)",
    "union_distinct": "union of two event slices + distinct",
    "intersect_users": "INTERSECT of two user sets",
}
for _i in (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18,
           19, 20, 21, 22):
    DESC[f"tpch_q{_i}"] = f"TPC-H Q{_i} over the relational testdata tables"


def first_sentence(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(doc.split())
    for stop in (". ", " — ", " ("):
        i = text.find(stop)
        if 0 < i < 180:
            return text[: i + (1 if stop == ". " else 0)]
    return text[:180]


def main() -> None:
    q = queries()
    o = oracle_sql()
    print("# Query battery index (generated by tools/gen_query_index.py)")
    print()
    print(f"{len(q)} entries; the driver's CORRECTNESS gate checks the "
          "first 50 (window column). `twin` = hand-built DataFrame plan "
          "(persisted index / cached sketch / streaming gate); `sql` = the "
          "shared dialect-parameterized SQL runs on both engines.")
    print()
    print("| # | entry | window | oracle | kind | what |")
    print("| --- | --- | --- | --- | --- | --- |")
    for i, name in enumerate(q):
        kind = "twin" if name in _DF_TWINS else "sql"
        doc = None
        if name in _DF_TWINS:
            doc = _DF_TWINS[name].__doc__
        if not doc and name in _SHARED_QUERIES:
            doc = _SHARED_QUERIES[name].__doc__
        what = first_sentence(doc) or DESC.get(name, "")
        win = "yes" if i < 50 else "overflow"
        orc = "yes" if name in o else "rows-only"
        print(f"| {i} | `{name}` | {win} | {orc} | {kind} | {what} |")


if __name__ == "__main__":
    main()
