"""Golden equality: the distributed engine (both parser variants) must agree
row-for-row and count-for-count with the pure-Python oracle implementing
drain.go's exact branch logic (SURVEY §5 layers 1+3+4)."""

import pytest

from lumbermill_spark import classify, oracle, parse
from tests.conftest import make_transcripts_df
from tests.fixtures import tiny_rows


def _spark_outputs(spark, parser):
    df = make_transcripts_df(spark, tiny_rows())
    parsed = parse.with_parsed(classify.classify(df), parser=parser)
    sinks = {name: sorted(tuple(r) for r in b(parsed).collect()) for name, b in parse.SINK_BUILDERS.items()}
    counts = {r["msg_class"]: r["count"] for r in parsed.groupBy("msg_class").count().collect()}
    counts["logfmt_parse_error"] = parsed.filter("p.parse_error").count()
    return sinks, counts


def _oracle_outputs():
    rows = [
        {"conv_id": c, "turn_idx": i, "role": r, "text": x, "tool": tl, "time_us": t}
        for (c, i, r, x, tl, t) in tiny_rows()
    ]
    sinks, counters = oracle.process_rows(rows)
    return {k: sorted(map(tuple, v)) for k, v in sinks.items()}, counters


@pytest.mark.parametrize("parser", ["pandas", "native", "native_fast"])
def test_sinks_match_oracle(spark, parser):
    got_sinks, got_counts = _spark_outputs(spark, parser)
    exp_sinks, exp_counters = _oracle_outputs()
    for name in exp_sinks:
        assert got_sinks[name] == exp_sinks[name], f"sink {name} mismatch ({parser})"
    # class counts (oracle counter names == msg_class values)
    for cls in ("router", "router_error", "router_blank", "dyno_error", "dyno_mem",
                "dyno_load", "unknown_heroku", "unknown_user", "token_missing"):
        assert got_counts.get(cls, 0) == exp_counters.get(cls, 0), f"count {cls} ({parser})"
    assert got_counts["logfmt_parse_error"] == exp_counters.get("logfmt_parse_error", 0)


@pytest.mark.parametrize("parser", ["pandas", "native"])
def test_mega_fallback_suffix_keys(spark, parser):
    """A suffix-matched key with a non-canonical prefix must MISS the literal
    canonical-tail fast path (schemas.MEGA_MEM) and fall back to the
    suffix-match per-key patterns — outside native_fast's declared grammar,
    so only the two full-suffix-match parsers are pinned here."""
    from tests import fixtures as FX

    df = make_transcripts_df(spark, [(FX.C3, 0, "heroku", FX.MEM_ODD_PREFIX, "web.11", FX.T0)])
    parsed = parse.with_parsed(classify.classify(df), parser=parser)
    (row,) = parse.sink_dyno_mem(parsed).collect()
    assert (row["source"], row["memory_total"], row["memory_rss"]) == ("web.11", 33.0, 11.0)


def test_specific_policies(spark):
    """Spot-check the asymmetric error policies directly (FIXTURES.md §2)."""
    from tests import fixtures as FX

    df = make_transcripts_df(spark, tiny_rows())
    parsed = parse.with_parsed(classify.classify(df), parser="pandas")

    router = [(r["token"], r["status"], r["service"]) for r in parse.sink_router(parsed).collect()]
    # bad status / empty service / unterminated quote rows are GONE:
    # C1 keeps ROUTER_OK, ROUTER_NO_MS, and the two all-zero rows = 4 rows
    assert sum(1 for (t, _, _) in router if t == FX.C1) == 4
    # missing-int line kept with zeros; cross mem-on-router line kept with zeros
    assert sum(1 for (t, s, sv) in router if (s, sv) == (0, 0) and t == FX.C1) == 2
    # override row keyed by the OVERRIDING token, twice (one with null conv_id)
    assert sum(1 for (t, s, sv) in router if t == FX.OVR) == 2

    # adversarial quoted spans: extraction is quote-aware
    assert (FX.C3, 200, 5) in router  # quoted "status=999" ignored
    assert (FX.C3, 201, 2) in router  # bare 'connect' inside quotes ≠ present

    ev = {(r["token"], r["code"]) for r in parse.sink_events_router(parsed).collect()}
    assert (FX.C1, "H12") in ev and (FX.C1, "H99") in ev  # empty-ints row KEPT
    assert (FX.C3, "H13") in ev  # out-of-quote code wins over quoted code=H99

    mem = {r["source"]: r for r in parse.sink_dyno_mem(parsed).collect()}
    assert set(mem) == {"web.2", "worker.7", "web.8"}  # no-source row silently dropped
    assert mem["web.8"]["memory_total"] == 64.0  # quoted source=web.99 ignored
    m = mem["web.2"]
    assert (m["memory_total"], m["memory_rss"], m["memory_cache"], m["memory_swap"]) == (372.51, 127.25, 0.0, 0.01)
    assert (m["memory_pgpgin"], m["memory_pgpgout"]) == (147395, 315153)
    assert m["dyno_type"] == "web"
    p = mem["worker.7"]  # partial: absent keys → 0
    assert (p["memory_total"], p["memory_rss"], p["memory_pgpgin"]) == (12.5, 0.0, 0)

    dyno_ev = [(r["token"], r["code"], r["message"], r["what"], r["dyno_type"]) for r in parse.sink_events_dyno(parsed).collect()]
    assert dyno_ev == [(FX.C2, 14, FX.DYNO_ERROR, "web.14", "web")]  # R9/Rxx dropped; raw text preserved

    load = {r["token"]: r for r in parse.sink_dyno_load(parsed).collect()}
    assert load[FX.C2]["load_avg_1m"] in (1.75, 0.1)  # two load rows for C2 (one via self-token role)
    assert parse.sink_dyno_load(parsed).count() == 2
