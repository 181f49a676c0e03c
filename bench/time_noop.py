"""Focused headline timer: N runs of the noop pipeline at one SF for one or
more parsers. Usage: python bench/time_noop.py [sf] [runs] [parser,parser,...]
Prints one JSON line {parser: [raw..]}. Used for clean-window A/B work; the
official artifact remains bench.py."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    parsers = (sys.argv[3] if len(sys.argv) > 3 else "pandas").split(",")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    from lumbermill_spark import datagen, pipeline, session

    tpath = datagen.ensure_transcripts(sf)
    spark = session.get_spark("lm-time-noop", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def run(parser):
        cfg = pipeline.PipelineConfig(parser=parser, sink_format="noop", write_metrics=False)
        pipeline.run(spark, tpath, "/tmp/lm_time_noop", cfg)

    out: dict[str, list[float]] = {p: [] for p in parsers}
    run(parsers[0])  # warmup
    # interleave parsers across rounds so host drift hits all configs equally
    for _ in range(runs):
        for p in parsers:
            t0 = time.time()
            run(p)
            out[p].append(round(time.time() - t0, 3))
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
