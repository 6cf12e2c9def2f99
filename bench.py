"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric is documents/sec of the flagship end-to-end extraction
(words -> lines -> blocks -> boundaries -> body text), reported as total
wall seconds in "value" plus per-query seconds. The html-tokenizer
pipeline additionally runs on SPARK_GRAFT_BENCH_DOCS synthetic pages
(default 8000; set 0 to skip it).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "flagship_body_text",
    "c6_blocks",
    "a7_spacing_rules",
    "o1_classify",
    "h5_boundaries",
    "d1_exact_dedup",
    "d2_minhash_bands",
    "s1_cosine_topk",
    "e1_events_hourly",
    "a18_token_counts",
]


def main() -> None:
    from pdf_plumber_util_spark.session import get_spark

    import __spark_entry__ as entry

    # host-health evidence: this sandbox throttles its CPU budget in
    # multi-minute windows (BASELINE.md), so every recorded bench carries
    # the capacity probe (healthy ~300 M+, throttled ~160-250 M) — a low
    # probe explains a slow run without touching the timings themselves
    try:
        from tools.scaling_bench import cpu_capacity

        capacity_m = round(cpu_capacity(), 1)
    except Exception:
        capacity_m = None

    spark = get_spark(app_name="bench", cores=CPUS, shuffle_partitions=CPUS)
    qmap = entry.queries()

    # JVM/codegen warm-up on the smallest sf (excluded from timings)
    qmap["flagship_body_text"](spark, "/root/testdata/sf0.001").count()

    # html-tokenizer end-to-end extraction on synthetic Common-Crawl-style
    # pages (the north-rule workload: html -> words -> lines -> blocks ->
    # boundaries -> body text); one warm-up pass then one timed pass
    from pdf_plumber_util_spark.plans.extract import extract_documents
    from pdf_plumber_util_spark.sources.pages import synth_pages

    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "8000"))
    n_extracted, extract_sec = 0, 0.0
    if n_pages > 0:
        pages = synth_pages(spark, n_pages, partitions=CPUS * 4).persist()
        pages.count()
        extract_documents(pages.limit(256)).count()
        t0 = time.time()
        n_extracted = extract_documents(pages).count()
        extract_sec = time.time() - t0
        pages.unpersist()

    timings: dict[str, float] = {}
    total = 0.0
    n_docs = 0
    for name in BENCH_QUERIES:
        t0 = time.time()
        df = qmap[name](spark, SF_DIR)
        n = df.count()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt
        if name == "flagship_body_text":
            n_docs = n

    flag_sec = timings["flagship_body_text"]
    result = {
        "metric": "flagship_docs_per_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "cpus": CPUS,
        "flagship_docs": n_docs,
        "flagship_docs_per_sec": round(n_docs / flag_sec, 2) if flag_sec else None,
        "html_extract_docs": n_extracted,
        "html_extract_sec": round(extract_sec, 3),
        "html_extract_docs_per_sec": (
            round(n_extracted / extract_sec, 2) if extract_sec else None
        ),
        "host_capacity_M": capacity_m,
    }
    from pdf_plumber_util_spark.contract import clear_shared_lines

    clear_shared_lines()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
