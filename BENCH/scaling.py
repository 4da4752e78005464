"""Two-parallelism scaling evidence (BASELINE.json:2,14).

The north rule's N → 4N *executor-cluster* criterion cannot use a real
cluster in this sandbox; per the driver instruction it is evidenced by
running the SAME crawl job at local[8] and local[32] on the SAME input and
reporting throughput at both plus efficiency = (thr_32 / thr_8) / 4.

Each parallelism level runs in a fresh subprocess (own JVM) so no executor
state leaks between measurements. Throughput is computed from the pipeline's
own metrics (scheduled+deduped per round / round wall), excluding Spark
startup and corpus generation, per BASELINE.md.

SUPERSEDED as the headline scaling evidence by BENCH/cluster.py (a real
standalone cluster with separate worker JVMs); kept as the lighter
single-JVM variant. Writes BENCH/SCALING_LOCAL.md — cluster.py owns
BENCH/BASELINE.md.

Usage:  python BENCH/scaling.py [--hosts 600 --pph 500 --rounds 8]
Writes: BENCH/SCALING_LOCAL.md + BENCH/scaling_result.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, shutil, sys, tempfile
sys.path.insert(0, {repo!r})
from sparkcrawl.session import get_spark
from sparkcrawl.config import CrawlConfig
from sparkcrawl.crawl import run_crawl

cores = int(sys.argv[1]); corpus = sys.argv[2]
base = "/dev/shm" if os.path.isdir("/dev/shm") else None
spark = get_spark(cores=cores, app=f"scaling-{{cores}}")
try:
    cfg = CrawlConfig(round_size={round_size}, max_rounds={rounds},
                      depth_limit=50, max_per_round_default=2000)
    # two identical crawls per JVM; the SECOND is the measurement: a
    # production crawl at this scale runs for hours on warm executors, so
    # JIT/codegen compilation and Python-worker allocator growth are
    # startup transients, not throughput. Run 1 reports as warmup.
    results = []
    for run in (1, 2):
        store = tempfile.mkdtemp(prefix=f"scaling_store_{{cores}}_{{run}}_", dir=base)
        summaries = run_crawl(spark, corpus, store, cfg, verbose=True)
        sched = sum(s.get("scheduled", 0) for s in summaries)
        dedup = sum(s.get("dedup_dropped", 0) for s in summaries)
        wall = sum(s["wall_ms"] for s in summaries) / 1000.0
        results.append({{
            "cores": cores, "rounds": len(summaries), "scheduled": sched,
            "dedup_dropped": dedup, "wall_sec": round(wall, 2),
            "throughput": round((sched + dedup) / wall, 1),
            "round_walls_ms": [s["wall_ms"] for s in summaries],
        }})
        shutil.rmtree(store, ignore_errors=True)
finally:
    spark.stop()
print("WARMUP " + json.dumps(results[0]))
print("RESULT " + json.dumps(results[1]))
"""


def run_level(cores: int, corpus: str, round_size: int, rounds: int) -> dict:
    script = CHILD.format(repo=REPO, round_size=round_size, rounds=rounds)
    env = dict(os.environ, SPARKCRAWL_DRIVER_MEM="24g")
    cmd = [sys.executable, "-c", script, str(cores), corpus]
    # pin the whole process tree (JVM task threads AND python UDF workers) to
    # exactly `cores` CPUs — local[N] caps task slots but not machine CPU, so
    # without affinity the low level borrows idle cores for its python
    # workers and the comparison stops being N vs 4N resources (a real
    # cluster enforces this with executor cgroups)
    import shutil as _sh

    if _sh.which("taskset") and cores <= (os.cpu_count() or cores):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(
        cmd, capture_output=True, text=True, env=env, timeout=3600,
    )
    warm = result = None
    for line in out.stdout.splitlines():
        if line.startswith("WARMUP "):
            warm = json.loads(line[len("WARMUP "):])
        elif line.startswith("RESULT "):
            result = json.loads(line[len("RESULT "):])
    if result is not None:
        result["warmup"] = warm
        return result
    sys.stderr.write(out.stdout[-3000:] + "\n" + out.stderr[-3000:])
    raise RuntimeError(f"no RESULT from local[{cores}] run")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=800)
    ap.add_argument("--pph", type=int, default=500)
    ap.add_argument("--round-size", type=int, default=500_000)
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--budget", type=int, default=2000)
    ap.add_argument("--levels", type=int, nargs=2, default=[8, 32])
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from sparkcrawl import synth
    from sparkcrawl.synth import generate

    # Common-Crawl-ish page weight (~9 KB html, ~40 links); corpus + spark
    # scratch live on tmpfs — the sandbox VM disk has bursty writeback
    # latency that would pollute the scaling signal (real clusters use NVMe).
    # Dir keyed on synth.FORMAT_VERSION (VERDICT r3 #2) so synth-semantics
    # changes never silently reuse/regenerate a same-named corpus.
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    corpus = (f"{base}/sparkcrawl_scaling_corpus_{synth.FORMAT_VERSION}"
              f"_{args.hosts}x{args.pph}")
    marker = os.path.join(corpus, "_DONE")
    if not os.path.exists(marker):
        print(f"generating corpus {args.hosts}x{args.pph} ...", flush=True)
        info = generate(
            corpus, seed=42, n_hosts=args.hosts, pages_per_host=args.pph,
            n_seeds=args.hosts, max_per_round=args.budget,
            n_links=(30, 50), n_paras=(60, 120), procs=min(16, os.cpu_count() or 8),
        )
        print(info, flush=True)
        open(marker, "w").write("ok")

    lo_cores, hi_cores = args.levels
    results = {}
    for cores in (hi_cores, lo_cores):  # hot cache order identical for both
        print(f"running local[{cores}] ...", flush=True)
        results[cores] = run_level(cores, corpus, args.round_size, args.rounds)
        print(results[cores], flush=True)

    thr_lo = results[lo_cores]["throughput"]
    thr_hi = results[hi_cores]["throughput"]
    factor = hi_cores / lo_cores
    eff = round((thr_hi / thr_lo) / factor, 3)
    doc = {
        "levels": results,
        "core_factor": factor,
        "efficiency": eff,
        "bar": 0.8,
        "passes": eff >= 0.8,
    }
    with open(os.path.join(REPO, "BENCH", "scaling_result.json"), "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps(doc))

    md = f"""# BENCH/SCALING_LOCAL.md — single-JVM local[N] scaling variant
(superseded by the standalone-cluster evidence in BENCH/BASELINE.md)

## Scaling efficiency (N → 4N parallelism, BASELINE.json:2,14)

Same crawl job, same input corpus ({args.hosts} hosts × {args.pph} pages,
Common-Crawl-ish pages ~9 KB, every host seeded, budget
{args.budget}/host/round, round_size={args.round_size}). One JVM per level,
pinned with taskset to exactly its core count (local[N] caps task slots but
not machine CPU — python UDF workers would otherwise borrow idle cores and
skew the comparison); two identical crawls per JVM with the SECOND measured
(warm JIT + warm python workers — the steady state of a long-running crawl;
warmup run reported alongside). Corpus + spark scratch on tmpfs. Throughput =
(URLs scheduled + dedup-dropped) / Σ round wall, from the pipeline's own
metrics table (Spark startup + corpus generation excluded).

| level | rounds | scheduled | dedup_dropped | wall (s) | throughput (urls/s) |
| --- | --- | --- | --- | --- | --- |
| local[{lo_cores}] | {results[lo_cores]['rounds']} | {results[lo_cores]['scheduled']} | {results[lo_cores]['dedup_dropped']} | {results[lo_cores]['wall_sec']} | {thr_lo} |
| local[{hi_cores}] | {results[hi_cores]['rounds']} | {results[hi_cores]['scheduled']} | {results[hi_cores]['dedup_dropped']} | {results[hi_cores]['wall_sec']} | {thr_hi} |

**Efficiency = (thr_{hi_cores} / thr_{lo_cores}) / {factor:.0f} = {eff}**
(bar ≥ 0.8 → {"PASS" if eff >= 0.8 else "MISS"})

Sandbox note: single-JVM local mode — the {factor:.0f}× parallelism step is
the sanctioned stand-in for N → 4N executors (driver instruction;
SURVEY.md §4.3). Shuffles are in-process, so this measures task-parallel
scaling of the same physical plan, not network shuffle scaling.
"""
    with open(os.path.join(REPO, "BENCH", "SCALING_LOCAL.md"), "w") as f:
        f.write(md)
    print("wrote BENCH/SCALING_LOCAL.md")


if __name__ == "__main__":
    main()
