"""Frame-replay tests: lpx header split, stateful token override, 2-format
time parse with drop+count (drain.go:87-127, lpx/reader.go)."""

import pyarrow as pa

from lumbermill_spark import frames


def _frames_df(spark, rows):
    tbl = pa.table(
        {
            "batch_id": pa.array([r[0] for r in rows], type=pa.string()),
            "line_no": pa.array([r[1] for r in rows], type=pa.int32()),
            "drain_token": pa.array([r[2] for r in rows], type=pa.string()),
            "frame": pa.array([r[3] for r in rows], type=pa.string()),
        }
    )
    return spark.createDataFrame(tbl.to_pandas())


def _frame(time, name, procid, body):
    syslog = f"<158>1 {time} host {name} {procid} - {body}"
    return f"{len(syslog) + 1} {syslog}"


BODY = "at=info method=GET path=/ host=h request_id=r dyno=web.1 connect=1ms service=2ms status=200 bytes=10"


def test_token_override_applies_to_subsequent_lines(spark):
    rows = [
        ("b1", 0, "t.header", _frame("2025-01-01T00:00:00+00:00", "heroku", "router", BODY)),
        ("b1", 1, "t.header", _frame("2025-01-01T00:00:01+00:00", "t.override", "router", BODY)),
        ("b1", 2, "t.header", _frame("2025-01-01T00:00:02+00:00", "heroku", "router", BODY)),
    ]
    out = frames.resolve_tokens(frames.split_frames(_frames_df(spark, rows)))
    toks = {r["line_no"]: r["token"] for r in out.collect()}
    assert toks == {0: "t.header", 1: "t.override", 2: "t.override"}


def test_two_time_formats_and_invalid(spark):
    rows = [
        ("b1", 0, "t.h", _frame("2025-01-01T00:00:00.123456+00:00", "heroku", "router", BODY)),
        ("b1", 1, "t.h", _frame("2025-01-01T00:00:01+00:00", "heroku", "router", BODY)),
        ("b1", 2, "t.h", _frame("not-a-time", "heroku", "router", BODY)),
    ]
    out = frames.parse_times(frames.split_frames(_frames_df(spark, rows))).collect()
    by_line = {r["line_no"]: r["ts"] for r in out}
    assert by_line[0] is not None and by_line[0].microsecond == 123456
    assert by_line[1] is not None and by_line[2] is None


def test_replay_counts_time_parse_error_precedence(spark):
    rows = [
        # invalid time but unknown-user name → unknown_user wins (drain.go order)
        ("b1", 0, "t.h", _frame("not-a-time", "someapp", "router", BODY)),
        # invalid time on the heroku path → time_parse_error
        ("b1", 1, "t.h", _frame("not-a-time", "heroku", "router", BODY)),
        ("b1", 2, "t.h", _frame("2025-01-01T00:00:02+00:00", "heroku", "router", BODY)),
    ]
    counts = {r["counter"]: r["n"] for r in frames.replay_class_counts(_frames_df(spark, rows)).collect()}
    assert counts == {
        "unknown_user": 1,
        "time_parse_error": 1,
        "router": 1,
        "batches": 1,
        "lines": 3,
    }
