"""SparkSession factory with the engine's recommended scale-oriented config.

Tested on ``local[N]``; the same config is what we'd submit to a real cluster
via ``spark-submit --py-files`` (see bench/submit_scaling.sh): AQE on (runtime
re-planning + skew-join splitting), Arrow on (the parse UDF is Arrow-batched),
shuffle partitions sized to the parallelism level.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "lumbermill-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or "local[%d]" % cpus
    if shuffle_partitions is None:
        # one shuffle partition per core at local scale; on a real cluster this
        # would be ~2-3x total executor cores (AQE coalesces the excess)
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else str(cpus)
        shuffle_partitions = cpus if n == "*" else max(int(n), 1)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch 10k (Spark default) measured FASTER than 64k at sf1/
        # local[32] (13.7 s vs 15.3 s): smaller batches overlap the JVM→
        # Python→JVM pipeline better and stay in cache
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # shuffle codec stays lz4: zstd looked −12% at 32 cores UNPINNED, but
        # under honest core pinning it is ±0% at 32 and −6% at 8 — the
        # "win" was zstd borrowing idle cores. (Revisit on a real cluster
        # where shuffle bytes cross a network, not a local disk.)
        .config("spark.sql.session.timeZone", "UTC")
        # the reference's parsers are permissive (bad int → error value or 0,
        # never an exception); non-ANSI cast-null-on-failure matches that
        .config("spark.sql.ansi.enabled", "false")
        # Local-mode sizing: ~8 MB input splits keep task count ≈ 8-10× cores
        # at our bench scales, which both smooths straggler waves and keeps
        # the Arrow JVM↔Python pipeline of the parse UDF fully overlapped
        # (measured: 0.45 → 0.88 scaling efficiency at 8→32 cores). On a real
        # cluster with 10^12 rows use 128m — the same multiple-of-total-cores
        # rule, different absolute size.
        .config("spark.sql.files.maxPartitionBytes", "8m")
        # Force the sort-based shuffle writer. With ≤200 reduce partitions
        # (any local run) Spark picks BypassMergeSortShuffleWriter, which
        # opens one file PER REDUCE PARTITION per map task and then
        # merge-copies them — 640 map tasks × 128 partitions at sf10 turned
        # a 6.9 GB routing shuffle into 82k small files + a second full copy
        # (measured: 309 s → 74 s wall at sf10/local[32] with the sort
        # writer). A real cluster runs thousands of reduce partitions, where
        # the sort writer is what executes anyway — this pin makes local
        # behavior match cluster behavior instead of an accident of scale.
        .config("spark.shuffle.sort.bypassMergeThreshold", "1")
        .config("spark.driver.memory", os.environ.get("LUMBERMILL_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
