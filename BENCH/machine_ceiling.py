"""Machine scaling ceiling for the dominant kernel (context for the N→4N bar).

The crawl's hottest stage is pure-Python page extraction inside Arrow UDF
workers. This microbench runs the SAME extraction kernel over the SAME
corpus pages with plain multiprocessing — no Spark, no JVM, no shuffles —
at N and 4N taskset-pinned processes. Whatever efficiency THIS loses going
N→4N is the sandbox machine's ceiling (shared memory bandwidth / SMT /
hypervisor), not engine overhead: a real 4N-node cluster multiplies those
resources by 4, a single box does not. BENCH/BASELINE.md cites the result
next to the Spark-measured efficiency so the two factors are separable.

Usage:  python BENCH/machine_ceiling.py [--corpus DIR] [--levels 8 32]
Writes: BENCH/machine_ceiling.json
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_PAGES: list[tuple[bytes, str]] = []


def _init(pages):
    global _PAGES
    _PAGES = pages


def _work(args):
    reps, offset = args
    from sparkcrawl.extract import extract_page

    n = len(_PAGES)
    t0 = time.monotonic()
    done = 0
    for k in range(reps):
        html, url = _PAGES[(offset + k) % n]
        extract_page(html, url)
        done += 1
    return done, time.monotonic() - t0


def load_pages(corpus: str, sample: int) -> list[tuple[bytes, str]]:
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(corpus, "pages.parquet"), columns=["url", "html"]
    )
    urls = t["url"].to_pylist()[:sample]
    htmls = t["html"].to_pylist()[:sample]
    return list(zip(htmls, urls))


def run_level(procs: int, pages, reps_per_proc: int) -> dict:
    # pin the whole pool to exactly `procs` CPUs, mirroring the cluster
    # bench's worker pinning, so N procs cannot borrow idle cores
    os.sched_setaffinity(0, set(range(procs)))
    try:
        with mp.Pool(procs, initializer=_init, initargs=(pages,)) as pool:
            t0 = time.monotonic()
            res = pool.map(
                _work, [(reps_per_proc, i * 37) for i in range(procs)]
            )
            wall = time.monotonic() - t0
    finally:
        os.sched_setaffinity(0, set(range(os.cpu_count() or procs)))
    total = sum(d for d, _ in res)
    return {
        "procs": procs,
        "pages": total,
        "wall_sec": round(wall, 2),
        "throughput": round(total / wall, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--corpus",
        default="/dev/shm/sparkcrawl_scaling_corpus_800x500p250",
        help="corpus dir whose pages.parquet feeds the kernel",
    )
    ap.add_argument("--sample", type=int, default=2000)
    ap.add_argument("--reps", type=int, default=1500,
                    help="pages extracted per process")
    ap.add_argument("--levels", type=int, nargs=2, default=[8, 32])
    args = ap.parse_args()

    pages = load_pages(args.corpus, args.sample)
    lo, hi = args.levels
    results = {}
    for procs in (hi, lo):  # same order as the cluster bench
        results[procs] = run_level(procs, pages, args.reps)
        print(results[procs], flush=True)
    factor = hi / lo
    eff = round(
        (results[hi]["throughput"] / results[lo]["throughput"]) / factor, 3
    )
    exp = {
        "levels": {str(k): v for k, v in results.items()},
        "core_factor": factor,
        "machine_ceiling_efficiency": eff,
    }
    path = os.path.join(REPO, "BENCH", "machine_ceiling.json")
    doc = {}
    if os.path.exists(path):
        with open(path) as f:
            doc = json.load(f)
    if "experiments" not in doc:
        doc = {
            "kernel": "sparkcrawl.extract.extract_page (pure python, no Spark)",
            "corpus": args.corpus,
            "experiments": {},
        }
    doc["experiments"][f"{lo}v{hi}"] = exp
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
