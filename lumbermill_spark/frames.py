"""Raw logplex-frame replay: the lpx framing layer as DataFrame ops.

The reference iterates length-prefixed syslog frames, splitting six
space-delimited header fields + body (lpx/reader.go:43-116), with two
batch-stateful behaviors the columnar rebuild must reproduce:

  * token override: a frame whose Name starts with ``t.`` overrides the drain
    token for itself and ALL SUBSEQUENT frames of the batch (drain.go:103-105)
    → a running ``last(..., ignorenulls)`` over a (batch_id, line_no) window;
  * 2-format timestamp parse with drop+count on double failure
    (drain.go:118-127) → coalesce(try_to_timestamp × 2), null → counted.

Used by the frames-fixture tests and the ``lm_frames_replay`` query; the main
pipeline takes the pre-split transcripts table (input_hint) and skips framing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HEADER_RX = r"^(\d+) (<\d+>\d) (\S+) (\S+) (\S+) (\S+) (\S+) (.*)$"

TIME_FMT_US = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"  # 2006-01-02T15:04:05.000000+00:00
TIME_FMT_S = "yyyy-MM-dd'T'HH:mm:ssXXX"  # 2006-01-02T15:04:05+00:00


def split_frames(frames: DataFrame) -> DataFrame:
    g = lambda i: F.regexp_extract(F.col("frame"), HEADER_RX, i)  # noqa: E731
    return frames.select(
        "batch_id",
        "line_no",
        "drain_token",
        g(3).alias("time_str"),
        g(4).alias("hostname"),
        g(5).alias("name"),
        g(6).alias("procid"),
        g(8).alias("body"),
    )


def resolve_tokens(split: DataFrame) -> DataFrame:
    """drain.go:87 + 103-105: header token, overridden by the latest
    t.-prefixed Name at or before each line within the batch."""
    w = (
        Window.partitionBy("batch_id")
        .orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    override = F.last(
        F.when(F.col("name").startswith("t."), F.col("name")), ignorenulls=True
    ).over(w)
    return split.withColumn("token", F.coalesce(override, F.col("drain_token")))


def parse_times(df: DataFrame) -> DataFrame:
    ts = F.coalesce(
        F.try_to_timestamp(F.col("time_str"), F.lit(TIME_FMT_US)),
        F.try_to_timestamp(F.col("time_str"), F.lit(TIME_FMT_S)),
    )
    return df.withColumn("ts", ts)


def frames_to_transcript_shape(frames: DataFrame) -> DataFrame:
    """frames → the transcripts column contract, so the whole downstream
    pipeline (classify/parse/route/aggregate) is reused verbatim. Rows with
    unparseable times keep ts NULL (classified time_parse_error upstream of
    the standard tree, matching drain.go precedence: token check and
    unknown-user check come first)."""
    out = parse_times(resolve_tokens(split_frames(frames)))
    return out.select(
        F.col("token").alias("conv_id"),
        F.col("line_no").alias("turn_idx"),
        F.col("name").alias("role"),
        F.col("body").alias("text"),
        F.col("procid").alias("tool"),
        F.col("ts"),
    )


def replay_class_counts(frames: DataFrame) -> DataFrame:
    """Classification counts over a frame replay, with the time_parse_error
    class injected at its exact precedence slot (drain.go:108-127: after the
    token/name checks, before procid dispatch)."""
    from . import classify as C

    df = frames_to_transcript_shape(frames)
    base = C.msg_class_expr(F.col("role"), F.col("tool"), F.col("text"), F.col("token"))
    token = C.effective_token(F.col("role"), F.col("conv_id"))
    df = df.withColumn("token", token)
    cls = (
        F.when(F.col("token").isNull() | (F.col("token") == ""), "token_missing")
        .when(~((F.col("role") == "heroku") | F.col("role").startswith("t.")), "unknown_user")
        .when(F.col("ts").isNull(), "time_parse_error")
        .otherwise(base)
    )
    by_class = df.withColumn("counter", cls).groupBy("counter").agg(F.count("*").alias("n"))
    # batch + total-line counters (drain.go:89 batchCounter, drain.go:276 linesCounter)
    totals = frames.agg(
        F.countDistinct("batch_id").alias("batches"), F.count("*").alias("lines")
    ).select(
        F.explode(
            F.create_map(
                F.lit("batches"), F.col("batches"), F.lit("lines"), F.col("lines")
            )
        ).alias("counter", "n")
    )
    return by_class.unionByName(totals)
