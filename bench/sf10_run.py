"""sf10 (200M turns, ~22 GB parquet in 40 part files) demonstration: the
"would it hold at 10×" evidence run. Exercises exactly the machinery a
100 TB deployment leans on:

  * directory-of-part-files input (the chunked datagen layout),
  * chunked processing (chunk_files) — each chunk is an independent
    exactly-once unit with its own lineage commit,
  * resume as a no-op after completion (the restart-after-crash path),
  * the noop (compute-only) throughput headline at local[32].

Usage:  spark-submit --master local[32] --py-files lumbermill_spark.zip \
            bench/sf10_run.py [noop|full|resume]
Prints one JSON line per phase.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    phases = sys.argv[1:] or ["noop", "full", "resume"]
    out_dir = os.environ.get("LUMBERMILL_SF10_OUT", "/tmp/lm_sf10_out")

    from pyspark.sql import SparkSession

    from lumbermill_spark import datagen, pipeline

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    tpath = datagen.ensure_transcripts(10.0)
    n_files = len([f for f in os.listdir(tpath) if f.endswith(".parquet")])

    if "noop" in phases:
        cfg = pipeline.PipelineConfig(sink_format="noop", write_metrics=False)
        r = pipeline.run(spark, tpath, out_dir, cfg)  # warm (JIT, workers)
        t0 = time.time()
        r = pipeline.run(spark, tpath, out_dir, cfg)
        sec = round(time.time() - t0, 2)
        print(json.dumps({
            "phase": "noop", "sec": sec, "rows_in": r.rows_in,
            "turns_per_sec": round(r.rows_in / sec, 1), "files": n_files,
        }))

    if "full" in phases:
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
        cfg = pipeline.PipelineConfig(chunk_files=8)
        t0 = time.time()
        r = pipeline.run(spark, tpath, out_dir, cfg)
        sec = round(time.time() - t0, 2)
        print(json.dumps({
            "phase": "full_parquet", "sec": sec, "rows_in": r.rows_in,
            "chunks": r.chunks, "sink_rows": r.sink_rows,
            "turns_per_sec": round(r.rows_in / sec, 1), "timings": r.timings,
        }))

    if "resume" in phases:
        cfg = pipeline.PipelineConfig(chunk_files=8)
        t0 = time.time()
        r = pipeline.run(spark, tpath, out_dir, cfg, resume=True)
        print(json.dumps({
            "phase": "resume_noop", "sec": round(time.time() - t0, 2),
            "chunks_reprocessed": r.chunks, "rows_in": r.rows_in,
        }))
        assert r.chunks == 0 and r.rows_in == 0, "resume must skip completed chunks"


if __name__ == "__main__":
    main()
