"""Two-cluster-size scaling evidence (BASELINE.md protocol).

No real multi-node cluster exists in this sandbox, so the north-rule's
N -> 4N executor criterion is evidenced by running the SAME job on the
SAME input at local[N] and local[4N]:

  1. Generate a seeded synthetic pages table once (parquet).
  2. Run the flagship extraction at local[N] and local[4N], >=R reps each,
     fresh JVM per run, first run per level discarded (JIT warm-up happens
     inside each run via a small pre-pass).
  3. scaling_efficiency = (throughput_4N / throughput_N) / 4.

Usage: python tools/scaling_bench.py [n_docs] [N] [reps]
Writes results JSON to stdout and appends the evidence table to
BASELINE.md when run with --record.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pdf_plumber_util_spark.session import get_spark
from pdf_plumber_util_spark.plans.extract import extract_documents

cores = {cores}
spark = get_spark(app_name="scale", cores=cores, shuffle_partitions=cores)
pages = spark.read.parquet({pages_dir!r})
# JIT warm-up on a slice (excluded from the timed window)
extract_documents(pages.limit(64)).count()
t0 = time.time()
n = extract_documents(pages).count()
dt = time.time() - t0
print(json.dumps({{"cores": cores, "docs": n, "sec": dt}}))
"""


def generate_pages(n_docs: int, out_dir: str) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pdf_plumber_util_spark.session import get_spark
    from pdf_plumber_util_spark.sources.pages import synth_pages

    spark = get_spark(app_name="gen", cores=16, shuffle_partitions=16)
    synth_pages(spark, n_docs, partitions=64).write.mode("overwrite").parquet(out_dir)
    spark.stop()


def run_once(repo: str, pages_dir: str, cores: int) -> dict:
    code = RUNNER.format(repo=repo, cores=cores, pages_dir=pages_dir)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not line:
        raise RuntimeError(f"run failed (cores={cores}):\n{out.stderr[-2000:]}")
    return json.loads(line[-1])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    high = low * 4
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    pages_dir = os.path.join(tempfile.gettempdir(), f"scale_pages_{n_docs}")
    if not os.path.exists(os.path.join(pages_dir, "_SUCCESS")):
        generate_pages(n_docs, pages_dir)

    # interleave levels so page-cache warming / thermal drift can't bias
    # one level; one discarded warm-up pair first
    results = {low: [], high: []}
    for cores in (low, high):
        r = run_once(repo, pages_dir, cores)
        print(json.dumps({"warmup": r}), file=sys.stderr)
    for _ in range(reps):
        for cores in (low, high):
            r = run_once(repo, pages_dir, cores)
            results[cores].append(r)
            print(json.dumps(r), file=sys.stderr)

    med = {c: statistics.median(x["sec"] for x in results[c]) for c in results}
    docs = results[low][0]["docs"]
    thr = {c: docs / med[c] for c in med}
    eff = (thr[high] / thr[low]) / (high / low)
    summary = {
        "n_docs": docs,
        "low_cores": low,
        "high_cores": high,
        "median_sec": {str(c): round(med[c], 2) for c in med},
        "docs_per_sec": {str(c): round(thr[c], 2) for c in thr},
        "scaling_efficiency": round(eff, 3),
        "runs": {str(c): [round(x["sec"], 2) for x in results[c]] for c in results},
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
