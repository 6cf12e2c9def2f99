"""SparkSession factory tuned for the extraction workload.

Local-mode defaults mirror what we'd set cluster-side: AQE on (runtime
skew-join + coalesce), Arrow for all pandas-UDF traffic, shuffle partitions
proportional to cores. At 100 TB the same knobs move to spark-submit conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pdf_plumber_util_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # one shuffle partition per core locally; cluster-side this scales
        # with executor count (set via spark-submit) and AQE coalesces.
        shuffle_partitions = cores
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # the engine's pipelines hash-partition the word stream by url and
        # rely on every downstream join keyed (url, ...) reusing that
        # partitioning; the default (true) forces a full-join-key
        # re-shuffle of BOTH sides even when both are url-co-partitioned
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    # Pin the initial heap to the max and pre-touch it: Spark only passes
    # -Xmx, so the heap otherwise grows from a small initial size under
    # G1's adaptive ergonomics for the first minutes of a job — measured
    # as a 1.3-1.4x inflated first pass whose length scales with
    # allocation rate (worse at higher parallelism). At cluster scale the
    # same flags go on executor JVMs. Committing the full heap up front
    # can fail on small hosts (CI runners/laptops), so it auto-disables
    # unless MemAvailable comfortably covers the heap; SPARK_GRAFT_PRETOUCH
    # =1/0 forces it either way. Like every config here, it only takes
    # effect for the JVM-creating call — getOrCreate() reusing a live
    # session ignores it.
    if _pretouch_ok(os.environ.get("SPARK_DRIVER_MEM", "8g")):
        builder = builder.config(
            "spark.driver.extraJavaOptions",
            "-Xms" + os.environ.get("SPARK_DRIVER_MEM", "8g")
            + " -XX:+AlwaysPreTouch",
        )
    return builder.getOrCreate()


def _pretouch_ok(heap: str) -> bool:
    forced = os.environ.get("SPARK_GRAFT_PRETOUCH")
    if forced is not None:
        return forced != "0"
    mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}.get(heap[-1].lower())
    heap_bytes = int(heap[:-1]) * mult if mult else int(heap)
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemAvailable:"):
                    avail = int(line.split()[1]) * 1024
                    # 1.25x margin: the JVM needs metaspace/stacks too
                    return avail > heap_bytes * 1.25
    except OSError:
        pass
    return False
