"""Per-partition lineage ledger + resumable runs.

The reference's graceful shutdown flushes in-flight channels so no accepted
point is lost (main.go:100-116, http.go:67-97). The batch equivalent demanded
by the north_rule is: record, per SOURCE FILE, rows-in and rows-out-per-class,
and commit that ledger only after the chunk's sink writes succeed — a restart
then skips every source file already present in the ledger and reprocesses
only the remainder (all sink writes within a chunk are append-once, so the
unit of exactly-once is the chunk).

Ledger layout (parquet, appended per committed chunk):
  run_id, chunk_id, source_file, msg_class, rows
plus a per-chunk `_chunk_<id>.done` marker written strictly AFTER the sink
appends for that chunk succeed.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LEDGER_DIR = "lineage_ledger"


def ledger_path(out_dir: str) -> str:
    return os.path.join(out_dir, LEDGER_DIR)


def lineage_counts(classified: DataFrame) -> DataFrame:
    """rows per (source file, msg_class) — the rows-in/rows-out metrics frame.

    Expects a ``source_file`` column captured at scan time (the parquet
    ``_metadata.file_path`` virtual column is only resolvable directly on the
    scan relation, so pipeline.run attaches it when reading)."""
    if "source_file" not in classified.columns:
        classified = classified.withColumn("source_file", F.input_file_name())
    return classified.groupBy("source_file", "msg_class").agg(F.count("*").alias("rows"))


def completed_files(spark: SparkSession, out_dir: str) -> set[str]:
    led = ledger_path(out_dir)
    if not os.path.isdir(led) or not any(f.endswith(".parquet") for f in os.listdir(led)):
        return set()
    df = spark.read.parquet(led)
    done_chunks = {
        f[len("_chunk_") : -len(".done")]
        for f in os.listdir(led)
        if f.startswith("_chunk_") and f.endswith(".done")
    }
    rows = df.select("source_file", "chunk_id").distinct().collect()
    return {r["source_file"] for r in rows if r["chunk_id"] in done_chunks}


def commit_chunk(
    spark: SparkSession,
    out_dir: str,
    run_id: str,
    chunk_id: str,
    lineage_df: DataFrame,
) -> None:
    led = ledger_path(out_dir)
    (
        lineage_df.withColumn("run_id", F.lit(run_id))
        .withColumn("chunk_id", F.lit(chunk_id))
        .coalesce(1)
        .write.mode("append")
        .parquet(led)
    )
    marker = os.path.join(led, "_chunk_%s.done" % chunk_id)
    with open(marker, "w") as fh:
        json.dump({"run_id": run_id, "chunk_id": chunk_id, "committed_at": time.time()}, fh)
