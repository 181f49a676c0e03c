"""Field extraction: ONE vectorized pandas/Arrow UDF (default) or a pure
native-expression variant, producing a single wide ``p`` struct so the whole
input is parsed in one pass and the five sinks are cheap filters+projections
over one cached DataFrame — the Spark analog of the reference's fused
scan→parse→classify loop (drain.go:96-274).

Semantics replicated per class (the asymmetric error policies of SURVEY §7.4):

  router       connect/service (ms-suffixed), status, bytes ints; ANY
               present-but-unparseable int ⇒ whole row dropped + counted
               (router_msg.go:58-81 → drain.go:164-168)
  router_error code string kept; int parse errors swallowed to 0, row kept
               (router_msg.go:126-141)
  dyno_error   code = Atoi(text[7:9]) — exactly two bytes after "Error R";
               failure ⇒ row dropped + counted (dyno_msg.go:30-39)
  dyno_mem     float MB / int pages values, suffix-matched keys, errors
               swallowed to 0 (dyno_msg.go:52-72); empty source ⇒ row silently
               dropped downstream (drain.go:201)
  dyno_load    float values, errors swallowed (dyno_msg.go:82-96); empty
               source ⇒ dropped (drain.go:232)

An unterminated quoted string makes the Go scanner return
ErrUnterminatedString (logfmt/scanner.go:115-119) ⇒ row dropped for every
logfmt-parsed class; we detect it as an odd count of '"' bytes (exact for
lines without escaped quotes; the datagen produces none — divergence for
pathological escapes is documented in tests/test_parse_golden.py).

Approximation note: the regexes anchor keys at whitespace/line-start, so a
``key=`` sequence embedded inside a *quoted value that itself contains
whitespace* would be misattributed; the reference scanner tokenizes quotes
first. None of the reference's producers emit such lines.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from . import schemas as S

# ---------------------------------------------------------------------------
# pandas-UDF parser (compiled-regex, Arrow-batched; the north_star default)
# ---------------------------------------------------------------------------

_RX_ROUTER_INT = {k: re.compile(p) for k, p in S.ROUTER_INT_KEYS.items()}
_RX_ROUTER_PRESENT = {k: re.compile(p) for k, p in S.PAT_ROUTER_PRESENT.items()}
_RX_CODE = re.compile(S.PAT_CODE)
_RX_SOURCE = re.compile(S.PAT_SOURCE)
_RX_MEM_FLOAT = {k: re.compile(p) for k, p in S.MEM_FLOAT_KEYS.items()}
_RX_MEM_INT = {k: re.compile(p) for k, p in S.MEM_INT_KEYS.items()}
_RX_LOAD = {k: re.compile(p) for k, p in S.LOAD_KEYS.items()}
_RX_DYNO_ECODE = re.compile(r"^(\d\d|[+-]\d)$")


def _extract_str(t: pd.Series, rx: re.Pattern) -> pd.Series:
    g = t.str.extract(rx)
    return g[0].fillna(g[1]).fillna("") if g.shape[1] >= 2 else g[0].fillna("")


@pandas_udf(S.PARSED_STRUCT)
def parse_fields_udf(msg_class: pd.Series, text: pd.Series) -> pd.DataFrame:
    n = len(text)
    out = pd.DataFrame(
        {
            "status": np.zeros(n, dtype=np.int32),
            "service": np.zeros(n, dtype=np.int32),
            "error_code": np.full(n, "", dtype=object),
            "dyno_ecode": np.zeros(n, dtype=np.int32),
            "source": np.full(n, "", dtype=object),
            "memory_cache": np.zeros(n),
            "memory_pgpgin": np.zeros(n, dtype=np.int32),
            "memory_pgpgout": np.zeros(n, dtype=np.int32),
            "memory_rss": np.zeros(n),
            "memory_swap": np.zeros(n),
            "memory_total": np.zeros(n),
            "load_avg_1m": np.zeros(n),
            "load_avg_5m": np.zeros(n),
            "load_avg_15m": np.zeros(n),
            "parse_error": np.zeros(n, dtype=bool),
        }
    )
    text = text.fillna("")
    cls = msg_class

    # odd '"' count ⇒ unterminated string ⇒ scanner error for logfmt classes
    logfmt_cls = cls.isin([S.CLS_ROUTER, S.CLS_ROUTER_ERROR, S.CLS_DYNO_MEM, S.CLS_DYNO_LOAD])
    if logfmt_cls.any():
        odd = (text[logfmt_cls].str.count('"') % 2).astype(bool)
        out.loc[logfmt_cls, "parse_error"] = odd.to_numpy()

    m = (cls == S.CLS_ROUTER).to_numpy()
    if m.any():
        t = text[m]
        err = out.loc[m, "parse_error"].to_numpy()
        for key in ("connect", "service", "status", "bytes"):
            present = t.str.contains(_RX_ROUTER_PRESENT[key]).to_numpy()
            v = pd.to_numeric(t.str.extract(_RX_ROUTER_INT[key])[0], errors="coerce")
            err |= present & v.isna().to_numpy()
            if key in ("status", "service"):
                out.loc[m, key] = v.fillna(0).astype(np.int32).to_numpy()
        out.loc[m, "parse_error"] = err

    m = (cls == S.CLS_ROUTER_ERROR).to_numpy()
    if m.any():
        out.loc[m, "error_code"] = _extract_str(text[m], _RX_CODE).to_numpy()

    m = (cls == S.CLS_DYNO_ERROR).to_numpy()
    if m.any():
        code2 = text[m].str.slice(7, 9)
        ok = code2.str.fullmatch(_RX_DYNO_ECODE).fillna(False)
        out.loc[m, "dyno_ecode"] = (
            pd.to_numeric(code2.where(ok), errors="coerce").fillna(0).astype(np.int32).to_numpy()
        )
        out.loc[m, "parse_error"] = (~ok).to_numpy()

    m = (cls == S.CLS_DYNO_MEM).to_numpy()
    if m.any():
        t = text[m]
        out.loc[m, "source"] = _extract_str(t, _RX_SOURCE).to_numpy()
        for key, rx in _RX_MEM_FLOAT.items():
            out.loc[m, key] = (
                pd.to_numeric(t.str.extract(rx)[0], errors="coerce").fillna(0.0).to_numpy()
            )
        for key, rx in _RX_MEM_INT.items():
            out.loc[m, key] = (
                pd.to_numeric(t.str.extract(rx)[0], errors="coerce").fillna(0).astype(np.int32).to_numpy()
            )

    m = (cls == S.CLS_DYNO_LOAD).to_numpy()
    if m.any():
        t = text[m]
        out.loc[m, "source"] = _extract_str(t, _RX_SOURCE).to_numpy()
        for key, rx in _RX_LOAD.items():
            out.loc[m, key] = (
                pd.to_numeric(t.str.extract(rx)[0], errors="coerce").fillna(0.0).to_numpy()
            )

    # restore exact dtypes (loc-assignment can upcast)
    for c in ("status", "service", "dyno_ecode", "memory_pgpgin", "memory_pgpgout"):
        out[c] = out[c].astype(np.int32)
    out["parse_error"] = out["parse_error"].astype(bool)
    return out


# ---------------------------------------------------------------------------
# native-expression parser (pure Catalyst/codegen; used for benchmarking the
# "stay JVM-side" alternative — same semantics, same shared regexes)
# ---------------------------------------------------------------------------


def _nat_int(text: Column, pat: str, present_pat: str) -> tuple[Column, Column]:
    raw = F.regexp_extract(text, pat, 1)
    v = F.when(raw != "", raw.cast("int"))
    bad = text.rlike(present_pat) & v.isNull()
    return F.coalesce(v, F.lit(0)), bad


def _nat_str(text: Column, pat: str) -> Column:
    g1 = F.regexp_extract(text, pat, 1)
    g2 = F.regexp_extract(text, pat, 2)
    return F.when(g1 != "", g1).otherwise(g2)


def _nat_float(text: Column, pat: str) -> Column:
    raw = F.regexp_extract(text, pat, 1)
    return F.coalesce(F.when(raw != "", raw.cast("double")), F.lit(0.0))


def parse_fields_native(msg_class: Column, text: Column) -> Column:
    odd_quotes = (F.length(text) - F.length(F.regexp_replace(text, '"', ""))) % 2 == 1
    is_router = msg_class == S.CLS_ROUTER

    router_bad = F.lit(False)
    ints = {}
    for key in ("connect", "service", "status", "bytes"):
        v, bad = _nat_int(text, S.ROUTER_INT_KEYS[key], S.PAT_ROUTER_PRESENT[key])
        ints[key] = v
        router_bad = router_bad | bad

    code2 = F.substring(text, len(S.SENTINEL_DYNO_ERROR) + 1, 2)
    ecode_ok = code2.rlike(r"^(\d\d|[+-]\d)$")

    is_mem = msg_class == S.CLS_DYNO_MEM
    is_load = msg_class == S.CLS_DYNO_LOAD
    is_rerr = msg_class == S.CLS_ROUTER_ERROR
    is_derr = msg_class == S.CLS_DYNO_ERROR
    logfmt_cls = is_router | is_rerr | is_mem | is_load

    return F.struct(
        F.when(is_router, ints["status"]).otherwise(F.lit(0)).cast("int").alias("status"),
        F.when(is_router, ints["service"]).otherwise(F.lit(0)).cast("int").alias("service"),
        F.when(is_rerr, _nat_str(text, S.PAT_CODE)).otherwise(F.lit("")).alias("error_code"),
        F.when(is_derr & ecode_ok, code2.cast("int")).otherwise(F.lit(0)).cast("int").alias("dyno_ecode"),
        F.when(is_mem | is_load, _nat_str(text, S.PAT_SOURCE)).otherwise(F.lit("")).alias("source"),
        F.when(is_mem, _nat_float(text, S.MEM_FLOAT_KEYS["memory_cache"])).otherwise(F.lit(0.0)).alias("memory_cache"),
        F.when(is_mem, _nat_int(text, S.MEM_INT_KEYS["memory_pgpgin"], "x^")[0]).otherwise(F.lit(0)).cast("int").alias("memory_pgpgin"),
        F.when(is_mem, _nat_int(text, S.MEM_INT_KEYS["memory_pgpgout"], "x^")[0]).otherwise(F.lit(0)).cast("int").alias("memory_pgpgout"),
        F.when(is_mem, _nat_float(text, S.MEM_FLOAT_KEYS["memory_rss"])).otherwise(F.lit(0.0)).alias("memory_rss"),
        F.when(is_mem, _nat_float(text, S.MEM_FLOAT_KEYS["memory_swap"])).otherwise(F.lit(0.0)).alias("memory_swap"),
        F.when(is_mem, _nat_float(text, S.MEM_FLOAT_KEYS["memory_total"])).otherwise(F.lit(0.0)).alias("memory_total"),
        F.when(is_load, _nat_float(text, S.LOAD_KEYS["load_avg_1m"])).otherwise(F.lit(0.0)).alias("load_avg_1m"),
        F.when(is_load, _nat_float(text, S.LOAD_KEYS["load_avg_5m"])).otherwise(F.lit(0.0)).alias("load_avg_5m"),
        F.when(is_load, _nat_float(text, S.LOAD_KEYS["load_avg_15m"])).otherwise(F.lit(0.0)).alias("load_avg_15m"),
        (
            (logfmt_cls & odd_quotes)
            | (is_router & router_bad)
            | (is_derr & ~ecode_ok)
        ).alias("parse_error"),
    )


def with_parsed(df: DataFrame, parser: str = "pandas") -> DataFrame:
    """classified df → + ``p`` struct column (one parse pass, both variants)."""
    if parser == "pandas":
        p = parse_fields_udf(F.col("msg_class"), F.col("text"))
    elif parser == "native":
        p = parse_fields_native(F.col("msg_class"), F.col("text"))
    else:
        raise ValueError("parser must be 'pandas' or 'native'")
    return df.withColumn("p", p)


# ---------------------------------------------------------------------------
# sink projections (points.go:16-25 column order; token carried as a column)
# ---------------------------------------------------------------------------


def _dyno_type(c: Column) -> Column:
    # dynoType(): split on '.' take head (drain.go:49-54)
    return F.split(c, r"\.")[0]


def sink_router(parsed: DataFrame) -> DataFrame:
    """drain.go:161-170: kept rows only (any bad int drops the row)."""
    return parsed.filter((F.col("msg_class") == S.CLS_ROUTER) & ~F.col("p.parse_error")).select(
        F.col("token"),
        F.col("time"),
        F.col("p.status").alias("status"),
        F.col("p.service").alias("service"),
    )


def sink_events_router(parsed: DataFrame) -> DataFrame:
    """drain.go:137-153."""
    return parsed.filter((F.col("msg_class") == S.CLS_ROUTER_ERROR) & ~F.col("p.parse_error")).select(
        F.col("token"), F.col("time"), F.col("p.error_code").alias("code")
    )


def sink_dyno_mem(parsed: DataFrame) -> DataFrame:
    """drain.go:191-219; empty source silently dropped (drain.go:201)."""
    return parsed.filter(
        (F.col("msg_class") == S.CLS_DYNO_MEM) & ~F.col("p.parse_error") & (F.col("p.source") != "")
    ).select(
        F.col("token"),
        F.col("time"),
        F.col("p.source").alias("source"),
        F.col("p.memory_cache").alias("memory_cache"),
        F.col("p.memory_pgpgin").alias("memory_pgpgin"),
        F.col("p.memory_pgpgout").alias("memory_pgpgout"),
        F.col("p.memory_rss").alias("memory_rss"),
        F.col("p.memory_swap").alias("memory_swap"),
        F.col("p.memory_total").alias("memory_total"),
        _dyno_type(F.col("p.source")).alias("dyno_type"),
    )


def sink_dyno_load(parsed: DataFrame) -> DataFrame:
    """drain.go:222-240; empty source silently dropped (drain.go:232)."""
    return parsed.filter(
        (F.col("msg_class") == S.CLS_DYNO_LOAD) & ~F.col("p.parse_error") & (F.col("p.source") != "")
    ).select(
        F.col("token"),
        F.col("time"),
        F.col("p.source").alias("source"),
        F.col("p.load_avg_1m").alias("load_avg_1m"),
        F.col("p.load_avg_5m").alias("load_avg_5m"),
        F.col("p.load_avg_15m").alias("load_avg_15m"),
        _dyno_type(F.col("p.source")).alias("dyno_type"),
    )


def sink_events_dyno(parsed: DataFrame) -> DataFrame:
    """drain.go:177-188: what=Procid, type literal "R", message = raw line
    (the per-turn text-equality contract rides on ``message``)."""
    return parsed.filter((F.col("msg_class") == S.CLS_DYNO_ERROR) & ~F.col("p.parse_error")).select(
        F.col("token"),
        F.col("time"),
        F.col("tool").alias("what"),
        F.lit("R").alias("type"),
        F.col("p.dyno_ecode").alias("code"),
        F.col("text").alias("message"),
        _dyno_type(F.col("tool")).alias("dyno_type"),
    )


SINK_BUILDERS = {
    S.SINK_ROUTER: sink_router,
    S.SINK_EVENTS_ROUTER: sink_events_router,
    S.SINK_DYNO_MEM: sink_dyno_mem,
    S.SINK_DYNO_LOAD: sink_dyno_load,
    S.SINK_EVENTS_DYNO: sink_events_dyno,
}
