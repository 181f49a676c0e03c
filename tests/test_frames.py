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
    # body ends mid-PAYLOAD (headers complete, declared length unsatisfied):
    # io.ReadFull → io.ErrUnexpectedEOF → truncated, complete prefix kept
    out, truncated = frames.scan_stream(
        (good + "999 <158>1 2025-01-01T00:00:01+00:00 host heroku router - parti").encode()
    )
    assert truncated and len(out) == 1


def test_scan_stream_eof_mid_header_is_clean():
    """Body ends while reading a HEADER field (no delimiter before EOF):
    lpx ReadBytes returns io.EOF, which Reader.Err() maps to nil — a clean
    stop, NOT a truncation error; the partial field bytes are discarded
    (reader.go:99-113)."""
    good = _stream_frame("2025-01-01T00:00:00+00:00", "heroku", "router", BODY)
    out, truncated = frames.scan_stream((good + "999 <158>1 partial").encode())
    assert not truncated and len(out) == 1


def test_scan_stream_garbage_length_is_error():
    """A length field that strconv.ParseInt rejects is a REAL scan error
    (Err() non-nil), unlike plain EOF."""
    good = _stream_frame("2025-01-01T00:00:00+00:00", "heroku", "router", BODY)
    out, truncated = frames.scan_stream((good + "12xy <158>1 rest here x y z ").encode())
    assert truncated and len(out) == 1


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


# ---------------------------------------------------------------------------
# property fuzz: scan_stream vs an INDEPENDENT byte-level port of
# lpx/reader.go (round-3 verdict, next #8). The golden below is written
# ReadBytes-style (field = read-through-delimiter, budget -= len(g)) so the
# two implementations share no structure beyond the wire contract.
# ---------------------------------------------------------------------------

import re as _re

from hypothesis import given, settings, strategies as st


def _gold_scan(buf: bytes):
    frames_ = []
    pos = 0

    def read_field():
        nonlocal pos
        j = buf.find(b" ", pos)
        if j < 0:
            raise EOFError
        g = buf[pos : j + 1]  # INCLUDES the delimiter, like ReadBytes(' ')
        pos = j + 1
        return g

    while pos < len(buf):
        try:
            g = read_field()
        except EOFError:
            return frames_, False  # io.EOF during length → Err() nil
        ls = g[:-1].rstrip(b" ")
        if not _re.fullmatch(rb"[+-]?[0-9]+", ls):
            return frames_, True  # strconv.ParseInt failure
        budget = int(ls)
        if not (-(2**63) <= budget < 2**63):
            return frames_, True  # ParseInt(.., 10, 64) ErrRange
        vals = []
        try:
            for _ in range(6):
                g = read_field()
                budget -= len(g)
                vals.append(g.rstrip(b" ").decode("utf-8", "replace"))
        except EOFError:
            return frames_, False  # io.EOF mid-header → Err() nil
        if budget > 0:
            if pos + budget > len(buf):
                return frames_, True  # io.ReadFull short → ErrUnexpectedEOF
            payload = buf[pos : pos + budget]
            pos += budget
            if payload.endswith(b"\n"):
                payload = payload[:-1]
            frames_.append((*vals, payload.decode("utf-8", "replace")))
        else:
            frames_.append((*vals, ""))
    return frames_, False


_field = st.text(
    alphabet=st.characters(blacklist_characters=" \x00", codec="utf-8"),
    min_size=1,
    max_size=12,
)
_payload = st.text(
    alphabet=st.characters(codec="utf-8", blacklist_characters="\x00"),
    max_size=40,
)  # embedded newlines/spaces/unicode all in


@st.composite
def _frame_bytes(draw):
    priv = draw(st.sampled_from(["<158>1", "<13>1", "<0>9"]))
    time = draw(st.sampled_from(["2025-01-01T00:00:00+00:00", "2025-01-01T00:00:00.123456+00:00", "notatime"]))
    host, name, procid, msgid = (draw(_field) for _ in range(4))
    body = draw(_payload)
    syslog = f"{priv} {time} {host} {name} {procid} {msgid} {body}".encode()
    declared = len(syslog) - len(f"{priv} ".encode()) + 1  # +1: trailing \n
    kind = draw(st.sampled_from(["valid", "valid", "valid", "neg_budget", "too_long", "garbage_len"]))
    if kind == "valid":
        length = declared
    elif kind == "neg_budget":
        # includes int64-range overflow values: Go ParseInt errors (ErrRange)
        # where Python int() happily succeeds
        length = draw(st.sampled_from([-3, -1, 0, 2, 5, -(2**63) - 1, 2**63, 10**25]))
    elif kind == "too_long":
        length = declared + draw(st.integers(min_value=1, max_value=50))
    else:
        return b"1x2 " + syslog + b"\n"
    head = f"{len(syslog) + 1} ".encode() if kind == "valid" else f"{length} ".encode()
    return head + syslog + b"\n"


@st.composite
def _body(draw):
    parts = draw(st.lists(_frame_bytes(), min_size=0, max_size=5))
    buf = b"".join(parts)
    if draw(st.booleans()) and buf:
        # raw truncation at an arbitrary byte — mid-length, mid-header or
        # mid-payload depending on where it lands
        buf = buf[: draw(st.integers(min_value=0, max_value=len(buf) - 1))]
    if draw(st.booleans()):
        buf += draw(st.binary(max_size=6).filter(lambda b: b"\x00" not in b))
    return buf


@settings(max_examples=300, deadline=None, derandomize=True)
@given(_body())
def test_scan_stream_fuzz_matches_reader_port(buf):
    got = frames.scan_stream(buf)
    want = _gold_scan(buf)
    assert got == want, buf
