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
    counts = {
        r["counter"]: r["n"]
        for r in frames.replay_class_counts(
            frames.split_frames(_frames_df(spark, rows))
        ).collect()
    }
    assert counts == {
        "unknown_user": 1,
        "time_parse_error": 1,
        "router": 1,
        "batches": 1,
        "lines": 3,
    }


# ---------------------------------------------------------------------------
# true length-prefixed byte scanning (lpx/reader.go:43-116)
# ---------------------------------------------------------------------------


def _stream_frame(time, name, procid, body):
    """Real lpx wire form: <len> counts header-fields+payload incl. the
    frame-terminating newline."""
    syslog = f"<158>1 {time} host {name} {procid} - {body}"
    return f"{len(syslog) + 1} {syslog}\n"


def test_scan_stream_golden_multiline_payload():
    # payloads with embedded newlines and spaces — regex line-splitting
    # CANNOT frame these; only octet counting can (lpx/reader.go:70-80)
    multi = "line one\nline two with  spaces\nline three"
    stream = (
        _stream_frame("2025-01-01T00:00:00+00:00", "heroku", "router", BODY)
        + _stream_frame("2025-01-01T00:00:01+00:00", "t.abc", "web.1", multi)
        + _stream_frame("2025-01-01T00:00:02+00:00", "heroku", "router", BODY)
    )
    out, truncated = frames.scan_stream(stream.encode())
    assert not truncated and len(out) == 3
    assert [f[3] for f in out] == ["heroku", "t.abc", "heroku"]  # name field
    assert out[1][6] == multi  # payload byte-exact, newlines intact
    assert out[0][6] == BODY and out[0][4] == "router"


def test_scan_stream_truncated_body():
    good = _stream_frame("2025-01-01T00:00:00+00:00", "heroku", "router", BODY)
    out, truncated = frames.scan_stream((good + "999 <158>1 partial").encode())
    assert truncated and len(out) == 1  # complete prefix kept


def test_scan_stream_negative_budget_emits_empty_and_continues():
    """reader.go lets the byte budget go negative when the declared length is
    shorter than the header: frame emitted with nil payload, NO error, scan
    continues (round-3 advice — truncated is reserved for real mid-frame
    EOF)."""
    good = _stream_frame("2025-01-01T00:00:01+00:00", "heroku", "router", BODY)
    # declared length 2 < header byte count → budget goes negative
    short = "2 <158>1 2025-01-01T00:00:00+00:00 host heroku router - "
    out, truncated = frames.scan_stream((short + good).encode())
    assert not truncated and len(out) == 2
    assert out[0][6] == "" and out[0][3] == "heroku"  # nil payload, header kept
    assert out[1][6] == BODY  # scan resumed cleanly on the next frame


def test_scan_equals_split_on_fixture(spark):
    """The byte scanner over concatenated bodies must reproduce the regex
    split over one-frame-per-row exactly (same fixture rows)."""
    from lumbermill_spark import datagen

    split = frames.split_frames(
        spark.read.parquet(datagen.ensure_frames(0.001))
    ).collect()
    scanned = (
        frames.scan_frames(spark.read.parquet(datagen.ensure_raw_bodies(0.001)))
        .drop("truncated", "hostname")
        .collect()
    )
    tup = lambda r: (  # noqa: E731
        r["batch_id"], r["line_no"], r["drain_token"],
        r["time_str"], r["name"], r["procid"], r["body"],
    )
    s1 = sorted(tup(r) for r in split)
    s2 = sorted(tup(r) for r in scanned)
    assert s1 == s2
    assert len(s1) > 50
