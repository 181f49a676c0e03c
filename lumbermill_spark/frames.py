"""Raw logplex-frame replay: the lpx framing layer as DataFrame ops.

Two entry points into the same downstream:

  * ``scan_frames`` — TRUE length-prefixed byte scanning of raw drain bodies
    (lpx/reader.go:43-116 semantics: ``<len> <privalversion> <time>
    <hostname> <name> <procid> <msgid> <payload>`` where <len> counts every
    byte after ``"<len> "`` including the payload's trailing newline, and
    payloads may contain embedded newlines/spaces). This is per-batch
    imperative logic — the one place mapInPandas is genuinely required.
  * ``split_frames`` — regex header split for inputs already delivered
    one-frame-per-row (the fixture form).

Batch-stateful behaviors the columnar rebuild reproduces either way:

  * token override: a frame whose Name starts with ``t.`` overrides the drain
    token for itself and ALL SUBSEQUENT frames of the batch (drain.go:103-105)
    → a running ``last(..., ignorenulls)`` over a (batch_id, line_no) window;
  * 2-format timestamp parse with drop+count on double failure
    (drain.go:118-127) → coalesce(try_to_timestamp × 2), null → counted.

Used by the frames-fixture tests and the ``lm_frames_replay`` /
``lm_frames_scan`` queries; the main pipeline takes the pre-split transcripts
table (input_hint) and skips framing.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

HEADER_RX = r"^(\d+) (<\d+>\d) (\S+) (\S+) (\S+) (\S+) (\S+) (.*)$"

TIME_FMT_US = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"  # 2006-01-02T15:04:05.000000+00:00
TIME_FMT_S = "yyyy-MM-dd'T'HH:mm:ssXXX"  # 2006-01-02T15:04:05+00:00


_GO_INT_RX = re.compile(rb"[+-]?[0-9]+")


def scan_stream(buf: bytes) -> tuple[list[tuple], bool]:
    """Byte-accurate lpx scan of one drain body. Returns (frames, truncated).

    Ports lpx/reader.go:43-116 semantics exactly: the length field is parsed
    (strconv.ParseInt grammar: optional sign + digits, nothing else), six
    space-delimited header fields are consumed (each decrementing the
    remaining byte budget by the bytes read INCLUDING the delimiter, trailing
    spaces trimmed from the value), and the payload is the remaining budget
    read as raw bytes — embedded newlines and spaces pass through.

    Error taxonomy = lpx.Reader.Err() exactly (pinned by the fuzz in
    tests/test_frames.py against an independent byte-level port):
      * body ends while reading the LENGTH or a HEADER field (no delimiter
        before EOF) → plain io.EOF, which Err() maps to nil — a CLEAN stop,
        truncated=False, the complete prefix kept (any partial field bytes
        are discarded, reader.go:108-113);
      * non-integer length → strconv error → truncated=True;
      * body ends inside the PAYLOAD (io.ReadFull short) →
        io.ErrUnexpectedEOF → truncated=True;
      * declared length SHORTER than the header (budget goes negative) →
        frame emitted with nil payload, scan continues, NO error
        (reader.go:71-83)."""
    out: list[tuple] = []
    i, n = 0, len(buf)
    while i < n:
        j = buf.find(b" ", i)
        if j < 0:
            return out, False  # EOF during the length field: Err() == nil
        if not _GO_INT_RX.fullmatch(buf[i:j]):
            return out, True  # ParseInt failure is a real error
        rem = int(buf[i:j])
        if not (-(2**63) <= rem < 2**63):
            return out, True  # strconv.ParseInt(.., 10, 64) ErrRange
        i = j + 1
        fields = []
        for _ in range(6):
            j = buf.find(b" ", i)
            if j < 0:
                return out, False  # EOF mid-header: Err() == nil
            rem -= j + 1 - i
            fields.append(buf[i:j].rstrip(b" ").decode("utf-8", "replace"))
            i = j + 1
        if rem < 0:
            out.append((*fields, ""))
            continue
        if i + rem > n:
            return out, True  # short payload: io.ErrUnexpectedEOF
        payload = buf[i : i + rem]
        i += rem
        # transcript text is newline-stripped: the declared length counts
        # the frame-terminating \n as the payload's last byte
        if payload.endswith(b"\n"):
            payload = payload[:-1]
        out.append((*fields, payload.decode("utf-8", "replace")))
    return out, False


_SCANNED_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.StringType()),
        T.StructField("line_no", T.IntegerType()),
        T.StructField("drain_token", T.StringType()),
        T.StructField("time_str", T.StringType()),
        T.StructField("hostname", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("procid", T.StringType()),
        T.StructField("body", T.StringType()),
        T.StructField("truncated", T.BooleanType()),
    ]
)


def scan_frames(raw: DataFrame) -> DataFrame:
    """raw (batch_id, drain_token, body: binary|string) → one row per frame,
    same columns as split_frames plus `truncated` (frame-error flag for the
    whole batch, lpx Err()). Each drain body is independent, so the scan
    parallelizes per input row — no cross-partition state."""

    def scan(batches):
        for pdf in batches:
            rows = {k.name: [] for k in _SCANNED_SCHEMA.fields}
            for bid, tok, body in zip(pdf["batch_id"], pdf["drain_token"], pdf["body"]):
                if isinstance(body, str):
                    body = body.encode("utf-8")
                frames_, trunc = scan_stream(bytes(body))
                for ln, f in enumerate(frames_):
                    _priv, time_str, hostname, name, procid, _msgid, payload = f
                    rows["batch_id"].append(bid)
                    rows["line_no"].append(ln)
                    rows["drain_token"].append(tok)
                    rows["time_str"].append(time_str)
                    rows["hostname"].append(hostname)
                    rows["name"].append(name)
                    rows["procid"].append(procid)
                    rows["body"].append(payload)
                    rows["truncated"].append(trunc)
            yield pd.DataFrame(rows)

    return raw.select("batch_id", "drain_token", "body").mapInPandas(
        scan, schema=_SCANNED_SCHEMA
    )


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


def frames_to_transcript_shape(split: DataFrame) -> DataFrame:
    """split/scanned frames → the transcripts column contract, so the whole
    downstream pipeline (classify/parse/route/aggregate) is reused verbatim.
    Rows with unparseable times keep ts NULL (classified time_parse_error
    upstream of the standard tree, matching drain.go precedence: token check
    and unknown-user check come first)."""
    out = parse_times(resolve_tokens(split))
    return out.select(
        F.col("token").alias("conv_id"),
        F.col("line_no").alias("turn_idx"),
        F.col("name").alias("role"),
        F.col("body").alias("text"),
        F.col("procid").alias("tool"),
        F.col("ts"),
    )


def replay_class_counts(split: DataFrame) -> DataFrame:
    """Classification counts over a frame replay (input: split or scanned
    frames), with the time_parse_error class injected at its exact precedence
    slot (drain.go:108-127: after the token/name checks, before procid
    dispatch)."""
    from . import classify as C

    df = frames_to_transcript_shape(split)
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
    totals = split.agg(
        F.countDistinct("batch_id").alias("batches"), F.count("*").alias("lines")
    ).select(
        F.explode(
            F.create_map(
                F.lit("batches"), F.col("batches"), F.lit("lines"), F.col("lines")
            )
        ).alias("counter", "n")
    )
    return by_class.unionByName(totals)
