"""Diagnostic: where does native/native_fast parse-stage time go on the
escape-carrying corpus? Times the ISOLATED parse stage (classify → parse →
checksum agg, no routing/sinks) for ablation variants:

  fast        — with_parsed_native_fast as shipped
  fast_noqa   — _adv forced False (adversarial rows WRONGLY take fast path;
                diagnostic only — isolates the QA-branch java-regex cost)
  fast_noesc  — _odd_quotes_expr without the escape-aware strip branch
                (diagnostic only — isolates the contains('\\')+regexp branch)
  native      — parse_fields_native as shipped
  native_noqa — top-level dispatch forced to the fast family

Interleaved rounds, medians printed as one JSON line.
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
    spark = session.get_spark("lm-diag-parse", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    df = classify.classify(spark.read.parquet(tpath))

    def force(pdf):
        # checksum agg touches every struct field so nothing prunes away
        p = pdf.select("p.*")
        p.agg(
            F.sum("status"), F.sum("service"), F.sum(F.length("error_code")),
            F.sum("dyno_ecode"), F.sum(F.length("source")),
            F.sum("memory_cache"), F.sum("memory_pgpgin"), F.sum("memory_pgpgout"),
            F.sum("memory_rss"), F.sum("memory_swap"), F.sum("memory_total"),
            F.sum("load_avg_1m"), F.sum("load_avg_5m"), F.sum("load_avg_15m"),
            F.sum(F.col("parse_error").cast("int")),
        ).collect()

    def fast():
        force(parse.with_parsed(df, "native_fast"))

    def fast_noqa():
        ffp = parse._native_fast_struct(F.col("msg_class"), F.col("text"))
        opaque_false = F.length(F.col("text")) < F.lit(0)
        p = F.when(F.lit(False), F.col("_ffp")).when(opaque_false, F.col("_ffp")).otherwise(F.col("_ffp"))
        force(df.withColumn("_ffp", ffp).withColumn("p", p).drop("_ffp"))

    def fast_noesc():
        # monkeypatch the odd-quotes expr to the pre-escape-aware parity
        orig = parse._odd_quotes_expr
        try:
            def plain(text):
                return (F.length(text) - F.length(F.replace(text, F.lit('"'), F.lit("")))) % 2 == 1
            parse._odd_quotes_expr = plain
            force(parse.with_parsed(df, "native_fast"))
        finally:
            parse._odd_quotes_expr = orig

    def native():
        force(parse.with_parsed(df, "native"))

    def native_noqa():
        p = parse._native_struct(F.col("msg_class"), F.col("text"), qa=False)
        force(df.withColumn("p", p))

    variants = {
        "fast": fast,
        "fast_noqa": fast_noqa,
        "fast_noesc": fast_noesc,
        "native": native,
        "native_noqa": native_noqa,
    }
    out = {k: [] for k in variants}
    fast()  # warmup
    for _ in range(runs):
        for k, fn in variants.items():
            t0 = time.time()
            fn()
            out[k].append(round(time.time() - t0, 3))
    med = {k: sorted(v)[len(v) // 2] for k, v in out.items()}
    spark.stop()
    print(json.dumps({"medians": med, "runs": out}))


if __name__ == "__main__":
    main()
