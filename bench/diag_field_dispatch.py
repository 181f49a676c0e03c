"""Diagnostic: does PER-FIELD adversarial dispatch (struct of
when(adv, qa_field).otherwise(fast_field_col)) let Catalyst prune the parse
work down to the consumed fields, vs the shipped per-STRUCT dispatch?

Times two consumers over both shapes:
  full  — checksum agg over every field (the fan-out's cost model)
  two   — parse_error + source only (the pipeline summary's cost model)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    from lumbermill_spark import classify, datagen, parse, session
    from lumbermill_spark import schemas as S

    tpath = datagen.ensure_transcripts(sf)
    spark = session.get_spark("lm-diag-fd", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    df = classify.classify(spark.read.parquet(tpath))

    FIELDS = [
        "status", "service", "error_code", "dyno_ecode", "source",
        "memory_cache", "memory_pgpgin", "memory_pgpgout", "memory_rss",
        "memory_swap", "memory_total", "load_avg_1m", "load_avg_5m",
        "load_avg_15m", "parse_error",
    ]

    def shape_a():
        return parse.with_parsed(df, "native_fast")

    def shape_b():
        ffp = parse._native_fast_struct(F.col("msg_class"), F.col("text"))
        qa = parse._native_struct(F.col("msg_class"), F.col("text"), qa=True)
        base = df.withColumn("_adv", parse._adv(F.col("text")))
        for name in FIELDS:
            base = base.withColumn("_f_" + name, ffp[name])
        p = F.struct(
            *[
                F.when(F.col("_adv"), qa[name]).otherwise(F.col("_f_" + name)).alias(name)
                for name in FIELDS
            ]
        )
        return base.withColumn("p", p).drop("_adv", *["_f_" + n for n in FIELDS])

    def full(pdf):
        p = pdf.select("p.*")
        p.agg(
            F.sum("status"), F.sum("service"), F.sum(F.length("error_code")),
            F.sum("dyno_ecode"), F.sum(F.length("source")),
            F.sum("memory_cache"), F.sum("memory_pgpgin"), F.sum("memory_pgpgout"),
            F.sum("memory_rss"), F.sum("memory_swap"), F.sum("memory_total"),
            F.sum("load_avg_1m"), F.sum("load_avg_5m"), F.sum("load_avg_15m"),
            F.sum(F.col("parse_error").cast("int")),
        ).collect()

    def two(pdf):
        pdf.groupBy(
            "msg_class",
            F.col("p.parse_error").alias("perr"),
            (F.col("p.source") == "").alias("src_empty"),
        ).count().collect()

    variants = {
        "a_full": lambda: full(shape_a()),
        "b_full": lambda: full(shape_b()),
        "a_two": lambda: two(shape_a()),
        "b_two": lambda: two(shape_b()),
    }
    out = {k: [] for k in variants}
    variants["a_full"]()  # warmup
    for _ in range(runs):
        for k, fn in variants.items():
            t0 = time.time()
            fn()
            out[k].append(round(time.time() - t0, 3))
    med = {k: sorted(v)[len(v) // 2] for k, v in out.items()}
    print(json.dumps({"medians": med, "runs": out}))

    # sanity: identical results on the two shapes
    ca = shape_a().select("p.*").agg(*[F.sum(F.hash(c)).alias(c) for c in FIELDS]).collect()[0]
    cb = shape_b().select("p.*").agg(*[F.sum(F.hash(c)).alias(c) for c in FIELDS]).collect()[0]
    print("checksums_equal", ca == cb)
    spark.stop()


if __name__ == "__main__":
    main()
