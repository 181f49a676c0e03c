"""Stage decomposition probes for round-6 optimization (guide §1): times
individual sub-stages of the heavy conversation operators at a given sf.
Not part of the bench contract.

Usage: python tools/probe_r6.py <sf> <probe> [probe ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    sf = float(sys.argv[1])
    probes = sys.argv[2:]

    from pyspark.sql import functions as F

    from lumbermill_spark import datagen, session
    from lumbermill_spark.extras import convcorpus, dedup, textstats

    spark = session.get_spark("probe-r6", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    tpath = datagen.ensure_transcripts(sf)
    df = spark.read.parquet(tpath)

    def noop(d):
        d.write.format("noop").mode("overwrite").save()

    def timed(name, fn):
        t0 = time.time()
        fn()
        print(f"{name}: {time.time() - t0:.2f}s", flush=True)

    rendered = None

    def get_rendered():
        nonlocal rendered
        if rendered is None:
            rendered = (
                convcorpus.render_conversations(df)
                .select(F.col("conv_id").alias("doc_id"), F.col("rendered").alias("text"))
                .persist()
            )
            t0 = time.time()
            n = rendered.count()
            print(f"render+persist: {time.time() - t0:.2f}s ({n} convs)", flush=True)
        return rendered

    for p in probes:
        if p == "render":
            spark.sparkContext.setJobDescription("probe: render alone")
            timed("render_noop", lambda: noop(convcorpus.render_conversations(df)))
        elif p == "aug":
            spark.sparkContext.setJobDescription("probe: augmented_conversations")
            timed("aug_noop", lambda: noop(convcorpus.augmented_conversations(df)))
        elif p == "prepare_parts":
            r = get_rendered()
            spark.sparkContext.setJobDescription("probe: corpus_prepare on cached render")
            timed("prepare_on_cached", lambda: noop(textstats.corpus_prepare(r)))
            spark.sparkContext.setJobDescription("probe: with_repetition on cached render")
            timed("repetition_on_cached", lambda: noop(textstats.with_repetition(r)))
            spark.sparkContext.setJobDescription("probe: with_quality on cached render")
            timed("quality_on_cached", lambda: noop(textstats.with_quality(r)))
            spark.sparkContext.setJobDescription("probe: with_langid on cached render")
            timed("langid_on_cached", lambda: noop(textstats.with_langid(r)))
            spark.sparkContext.setJobDescription("probe: corpus_curate on cached render")
            timed("curate_on_cached", lambda: noop(textstats.corpus_curate(r)))
        elif p == "neardup_parts":
            spark.sparkContext.setJobDescription("probe: aug persist count")
            aug = convcorpus.augmented_conversations(df).persist()
            timed("aug_persist_count", lambda: aug.count())
            spark.sparkContext.setJobDescription("probe: minhash sigs persist count")
            sigs = dedup.minhash_signatures(aug).persist()
            timed("sigs_persist_count", lambda: sigs.count())
            spark.sparkContext.setJobDescription("probe: bands+join+verify on cached sigs")

            def rest():
                banded = dedup._minhash_bands(sigs)
                cand = (
                    banded.alias("a")
                    .join(banded.alias("b"), on=["band_idx", "band_key"])
                    .filter(F.col("a.doc_id") < F.col("b.doc_id"))
                    .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
                    .dropDuplicates(["doc_a", "doc_b"])
                )
                sg = sigs.select("doc_id", "sig")
                est_pairs = (
                    cand.join(sg.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sig", "sig_a"), "doc_a")
                    .join(sg.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sig", "sig_b"), "doc_b")
                    .withColumn(
                        "est",
                        F.expr(
                            "size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))"
                            f" / cast({dedup.MINHASH_PERMS} as double)"
                        ),
                    )
                    .filter(F.col("est") >= dedup.MINHASH_ESTIMATE_CUTOFF)
                    .select("doc_a", "doc_b")
                )
                sh = sigs.select("doc_id", "shingles")
                pairs = est_pairs.join(
                    sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("shingles", "sh_a"), "doc_a"
                ).join(
                    sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("shingles", "sh_b"), "doc_b"
                )
                res = (
                    pairs.withColumn("sim", F.round(dedup.jaccard_expr(F.col("sh_a"), F.col("sh_b")), 6))
                    .filter(F.col("sim") >= dedup.MINHASH_VERIFY_THRESHOLD)
                    .select("doc_a", "doc_b", "sim")
                )
                noop(res)

            timed("bands_join_verify", rest)
            sigs.unpersist()
            aug.unpersist()
        elif p == "shingle_stage":
            aug = convcorpus.augmented_conversations(df).persist()
            timed("aug_persist_count", lambda: aug.count())
            d = dedup._widen(aug.select("doc_id", "text")).withColumn(
                "shingles", F.expr(dedup.SHINGLES_EXPR)
            )
            spark.sparkContext.setJobDescription("probe: shingles only")
            timed("shingles_only", lambda: noop(d.select("doc_id", F.size("shingles").alias("ns"))))
            spark.sparkContext.setJobDescription("probe: shingles+md5 xs")
            timed("shingles_md5_xs", lambda: noop(
                d.withColumn("xs", F.expr(dedup._SHINGLE_X)).select("doc_id", F.size("xs").alias("nx"))
            ))
            spark.sparkContext.setJobDescription("probe: full sigs (xs + arrow perm-min)")
            timed("full_sigs", lambda: noop(dedup.minhash_signatures(aug)))
            aug.unpersist()
        else:
            print(f"unknown probe {p}")
    spark.stop()


if __name__ == "__main__":
    main()
