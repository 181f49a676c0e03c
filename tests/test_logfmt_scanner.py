"""Golden scanner tests lifted from the reference corpus
(logfmt/decode_test.go:22-43): quoted values, bare keys, empty values,
escapes, garbage handling, unterminated strings."""

import pytest

from lumbermill_spark.oracle import LogfmtError, scan_logfmt


def test_golden_pairs():
    # decode_test.go golden line: a=foo b=10ms c=cat E="123" d foo= emp=
    pairs = scan_logfmt('a=foo b=10ms c=cat E="123" d foo= emp=')
    assert pairs == [
        ("a", "foo"),
        ("b", "10ms"),
        ("c", "cat"),
        ("E", "123"),
        ("d", None),
        ("foo", None),
        ("emp", None),
    ]


def test_quoted_escapes():
    assert scan_logfmt(r'msg="hello \"world\"" x=1') == [("msg", 'hello "world"'), ("x", "1")]
    assert scan_logfmt(r'm="a\nb"') == [("m", "a\nb")]


def test_garbage_skipped():
    # leading/trailing garbage bytes are skipped silently (EBNF: { garbage, pair })
    assert scan_logfmt("  a=1   b=2  ") == [("a", "1"), ("b", "2")]


def test_unterminated_raises():
    with pytest.raises(LogfmtError):
        scan_logfmt('a=1 desc="oops')


def test_equal_then_quote_midline():
    assert scan_logfmt('k="v" tail=x') == [("k", "v"), ("tail", "x")]


def test_bare_key_eof_and_empty_value_eof():
    assert scan_logfmt("solo") == [("solo", None)]
    assert scan_logfmt("k=") == [("k", None)]
