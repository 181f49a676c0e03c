"""Count-min sketch operators — the bounded-state frequency summary a
10^12-token stream actually ships: CMS_DEPTH x CMS_WIDTH counters replace a
vocabulary-sized exact count table, merge by cell-wise addition (map-side
combinable, streaming-friendly), and answer point queries with a one-sided
(over-estimating) guarantee of eps = e / CMS_WIDTH of the stream mass
(Cormode & Muthukrishnan 2005).

Cross-engine contract: the hash family is md5('cms<row>:' || token) — the
same 32-bit-prefix construction every other string-keyed operator here uses
— so DuckDB replays the sketch CELL FOR CELL and the driver's value-exact
gate covers build, lookup, and ranking. Everything is native Catalyst
expressions; the sketch itself is CMS_DEPTH*CMS_WIDTH rows (bounded, far
below broadcast range) regardless of corpus size."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 1024
CMS_TOPK = 20


def _bucket(tok, row: int):
    """Row-`row`'s bucket for a token: 32-bit md5 prefix of the salted
    token, mod CMS_WIDTH."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(f"cms{row}:"), tok)), 1, 8), 16, 10)
    return (h.cast("bigint") % CMS_WIDTH).cast("int")


def _tokens(df: DataFrame, text_col: str) -> DataFrame:
    t = F.trim(F.lower(F.col(text_col)))
    words = F.when(t == "", F.array().cast("array<string>")).otherwise(F.split(t, r"\s+"))
    return df.select(F.explode(words).alias("token"))


def cms_build(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Build the sketch: (row, bucket, cnt) — CMS_DEPTH rows per token
    occurrence, folded by a map-side-combined aggregate. The output is at
    most CMS_DEPTH*CMS_WIDTH rows; at cluster scale each executor combines
    its partition's counts locally and the shuffle moves only cells."""
    toks = _tokens(df, text_col)
    rows = F.explode(
        F.array(
            *[
                F.struct(F.lit(r).alias("row"), _bucket(F.col("token"), r).alias("bucket"))
                for r in range(CMS_DEPTH)
            ]
        )
    ).alias("rb")
    return (
        toks.select(rows)
        .select("rb.row", "rb.bucket")
        .groupBy("row", "bucket")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def cms_topk(df: DataFrame, k: int = CMS_TOPK, text_col: str = "text") -> DataFrame:
    """Heavy hitters THROUGH the sketch: estimate every distinct token's
    count as min over rows of its cell, rank by (est DESC, token ASC), keep
    the top k, and report the exact count next to the estimate (est >=
    exact always; equality when the token's cells are collision-free).

    Scale shape: the sketch broadcasts (<= DEPTH*WIDTH rows); the distinct-
    token table probes it with an equality join per row and folds min —
    the exact-count column shares the same distinct-token aggregate, so the
    whole query is two bounded aggregates plus a broadcast probe."""
    toks = _tokens(df, text_col)
    exact = toks.groupBy("token").agg(F.count("*").cast("bigint").alias("exact_cnt"))
    sk = cms_build(df, text_col)
    probes = exact.select(
        "token",
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(r).alias("row"), _bucket(F.col("token"), r).alias("bucket"))
                    for r in range(CMS_DEPTH)
                ]
            )
        ).alias("rb"),
    ).select("token", "exact_cnt", "rb.row", "rb.bucket")
    est = (
        probes.join(F.broadcast(sk), ["row", "bucket"])
        .groupBy("token", "exact_cnt")
        .agg(F.min("cnt").cast("bigint").alias("est_cnt"))
    )
    ranked = est.select(
        "token",
        "est_cnt",
        "exact_cnt",
        (F.col("est_cnt") > F.col("exact_cnt")).alias("overestimated"),
    ).orderBy(F.col("est_cnt").desc(), "token").limit(k)
    # the rank window runs on the k already-selected rows — k is a constant,
    # so the single partition under it is k rows, never corpus-sized
    return ranked.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.col("est_cnt").desc(), "token"))
    )
