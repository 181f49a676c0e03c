"""DuckDB oracle SQL builders.

For every core pipeline query there is an independent ANSI-SQL implementation
of the same drain.go semantics, built from the SAME regex constants as the
Spark parsers (schemas.py) — the driver runs both sides at sf0.01 and
hash-compares values, so these strings ARE the correctness contract.

The transcripts/frames/dims tables are our own deterministic synthetic parquet
(datagen.py), addressed with read_parquet() by absolute path (DuckDB has no
registered view for them; the ten driver views cover only the TPC-H-ish
tables).
"""

from __future__ import annotations

from . import schemas as S

# DuckDB and Spark/Java regex dialects agree on the RE2-compatible subset we
# use; \d and (?:...) are identical. Patterns are injected verbatim.


def _sql_quote(pat: str) -> str:
    return "'" + pat.replace("'", "''") + "'"


# Quote-aware dispatch, mirroring the Spark parsers exactly (schemas.py):
# adversarial rows (a quoted span containing whitespace/'=') use the
# quote-parity-prefixed pattern, everything else the fast pattern.
_ADV_SQL = "regexp_matches(text, %s)" % _sql_quote(S.ADVERSARIAL_RX)


def _qa_dispatch(render, pat: str) -> str:
    return "CASE WHEN %s THEN %s ELSE %s END" % (
        _ADV_SQL,
        render(S.quote_aware(pat)),
        render(pat),
    )


def _int_field(pat: str) -> str:
    return _qa_dispatch(
        lambda p: "CAST(coalesce(nullif(regexp_extract(text, %s, 1), ''), '0') AS INT)"
        % _sql_quote(p),
        pat,
    )


def _float_field(pat: str) -> str:
    return _qa_dispatch(
        lambda p: "CAST(coalesce(nullif(regexp_extract(text, %s, 1), ''), '0') AS DOUBLE)"
        % _sql_quote(p),
        pat,
    )


def _decode_escapes_sql(expr: str) -> str:
    """Sentinel-chained unquote, the same chain as parse._decode_escapes_expr
    (schemas.ESCAPE_CHAIN: `\\\\` → U+0001, then each known single-char
    escape, then invalid pairs decode literally, then sentinel → `\\`)."""
    for frm, to in S.ESCAPE_CHAIN:
        expr = "replace(%s, %s, %s)" % (expr, _sql_quote(frm), _sql_quote(to))
    expr = "regexp_replace(%s, %s, '\\1', 'g')" % (expr, _sql_quote(S.UNQUOTE_RX))
    return "replace(%s, %s, %s)" % (
        expr,
        _sql_quote(S.ESCAPE_SENTINEL),
        _sql_quote("\\"),
    )


def _str_field(pat: str, pat_qa: str | None = None) -> str:
    """Quoted-or-bare string field with the QA branch escape-aware: the
    adversarial pattern's quoted group runs over `\\.`-or-plain units
    (schemas.pat_str_esc) and its value is escape-decoded with the full
    single-char table (_decode_escapes_sql) — quoted branch only, mirroring
    scanner.go/unquote.go. Safe rows keep the plain pattern, no decode (they
    cannot contain an in-span backslash)."""

    def render(p, unquote=False):
        g1 = "regexp_extract(text, %s, 1)" % _sql_quote(p)
        g2 = "regexp_extract(text, %s, 2)" % _sql_quote(p)
        g1v = _decode_escapes_sql(g1) if unquote else g1
        return "CASE WHEN %s <> '' THEN %s ELSE %s END" % (g1, g1v, g2)

    return "CASE WHEN %s THEN %s ELSE %s END" % (
        _ADV_SQL,
        render(pat_qa or S.quote_aware(pat), unquote=True),
        render(pat),
    )


# Unterminated-string detection on span-DELIMITING quotes: rows carrying a
# backslash first drop every `\x` escape pair (scanner.go qvalue's two-byte
# skip), mirroring parse._odd_quotes_expr exactly.
_QTEXT = (
    "(CASE WHEN contains(text, '\\') THEN regexp_replace(text, %s, '', 'g') "
    "ELSE text END)" % _sql_quote(S.UNQUOTE_RX)
)
ODD_QUOTES = "((length({q}) - length(replace({q}, '\"', ''))) % 2 = 1)".format(q=_QTEXT)


def _bad_conjunct(present_pat: str, val_pat: str) -> str:
    return "(regexp_matches(text, %s) AND regexp_extract(text, %s, 1) = '')" % (
        _sql_quote(present_pat),
        _sql_quote(val_pat),
    )


_ROUTER_BAD = " OR ".join(
    "(CASE WHEN %s THEN %s ELSE %s END)"
    % (
        _ADV_SQL,
        _bad_conjunct(S.PAT_ROUTER_PRESENT_QA[k], S.ROUTER_INT_KEYS_QA[k]),
        _bad_conjunct(S.PAT_ROUTER_PRESENT[k], S.ROUTER_INT_KEYS[k]),
    )
    for k in ("connect", "service", "status", "bytes")
)

_DYNO_ECODE_OK = "regexp_matches(substr(text, 8, 2), '^(\\d\\d|[+-]\\d)$')"

PARSE_ERROR_SQL = (
    "CASE msg_class "
    " WHEN 'router' THEN (" + ODD_QUOTES + " OR " + _ROUTER_BAD + ")"
    " WHEN 'router_error' THEN " + ODD_QUOTES +
    " WHEN 'dyno_mem' THEN " + ODD_QUOTES +
    " WHEN 'dyno_load' THEN " + ODD_QUOTES +
    " WHEN 'dyno_error' THEN NOT " + _DYNO_ECODE_OK +
    " ELSE FALSE END"
)


def classified_cte(transcripts_path: str) -> str:
    """WITH-clause prefix: t (raw + token + µs time) and c (+ msg_class)."""
    return f"""
WITH t AS (
  SELECT *,
    CASE WHEN role LIKE 't.%' THEN role ELSE conv_id END AS token,
    epoch_us(ts) AS time
  FROM read_parquet('{transcripts_path}')
), c AS (
  SELECT *,
    CASE
      WHEN token IS NULL OR token = '' THEN 'token_missing'
      WHEN NOT (role = 'heroku' OR role LIKE 't.%') THEN 'unknown_user'
      WHEN tool = 'router' THEN
        CASE WHEN contains(text, ' code=H') THEN 'router_error'
             WHEN contains(text, ' code=blank-app') OR contains(text, ' desc="Blank app"') THEN 'router_blank'
             ELSE 'router' END
      ELSE
        CASE WHEN starts_with(text, 'Error R') THEN 'dyno_error'
             WHEN contains(text, 'sample#memory_total') THEN 'dyno_mem'
             WHEN contains(text, 'sample#load_avg_1m') THEN 'dyno_load'
             ELSE 'unknown_heroku' END
    END AS msg_class
  FROM t
), p AS (
  SELECT *, ({PARSE_ERROR_SQL}) AS parse_error FROM c
)
"""


def sink_router(path: str) -> str:
    return classified_cte(path) + f"""
SELECT token, time,
  {_int_field(S.ROUTER_INT_KEYS['status'])} AS status,
  {_int_field(S.ROUTER_INT_KEYS['service'])} AS service
FROM p WHERE msg_class = 'router' AND NOT parse_error
"""


def sink_events_router(path: str) -> str:
    return classified_cte(path) + f"""
SELECT token, time, {_str_field(S.PAT_CODE, S.PAT_CODE_QA)} AS code
FROM p WHERE msg_class = 'router_error' AND NOT parse_error
"""


def sink_dyno_mem(path: str) -> str:
    src = _str_field(S.PAT_SOURCE, S.PAT_SOURCE_QA)
    return classified_cte(path) + f"""
SELECT token, time, {src} AS source,
  {_float_field(S.MEM_FLOAT_KEYS['memory_cache'])} AS memory_cache,
  {_int_field(S.MEM_INT_KEYS['memory_pgpgin'])} AS memory_pgpgin,
  {_int_field(S.MEM_INT_KEYS['memory_pgpgout'])} AS memory_pgpgout,
  {_float_field(S.MEM_FLOAT_KEYS['memory_rss'])} AS memory_rss,
  {_float_field(S.MEM_FLOAT_KEYS['memory_swap'])} AS memory_swap,
  {_float_field(S.MEM_FLOAT_KEYS['memory_total'])} AS memory_total,
  split_part({src}, '.', 1) AS dyno_type
FROM p WHERE msg_class = 'dyno_mem' AND NOT parse_error AND {src} <> ''
"""


def sink_dyno_load(path: str) -> str:
    src = _str_field(S.PAT_SOURCE, S.PAT_SOURCE_QA)
    return classified_cte(path) + f"""
SELECT token, time, {src} AS source,
  {_float_field(S.LOAD_KEYS['load_avg_1m'])} AS load_avg_1m,
  {_float_field(S.LOAD_KEYS['load_avg_5m'])} AS load_avg_5m,
  {_float_field(S.LOAD_KEYS['load_avg_15m'])} AS load_avg_15m,
  split_part({src}, '.', 1) AS dyno_type
FROM p WHERE msg_class = 'dyno_load' AND NOT parse_error AND {src} <> ''
"""


def sink_events_dyno(path: str) -> str:
    return classified_cte(path) + f"""
SELECT token, time, tool AS what, 'R' AS type,
  CAST(substr(text, 8, 2) AS INT) AS code,
  text AS message,
  split_part(tool, '.', 1) AS dyno_type
FROM p WHERE msg_class = 'dyno_error' AND NOT parse_error
"""


def class_counts(path: str) -> str:
    return classified_cte(path) + """
SELECT msg_class AS counter, count(*) AS n FROM c GROUP BY msg_class
UNION ALL SELECT 'lines' AS counter, count(*) AS n FROM c
UNION ALL SELECT 'logfmt_parse_error' AS counter, count(*) AS n FROM p WHERE parse_error
"""


def router_error_code_counts(path: str) -> str:
    return classified_cte(path) + f"""
SELECT {_str_field(S.PAT_CODE, S.PAT_CODE_QA)} AS code, count(*) AS n
FROM p WHERE msg_class = 'router_error' AND NOT parse_error
GROUP BY 1
"""


def router_rollup(path: str) -> str:
    return classified_cte(path) + f"""
, r AS (
  SELECT token,
    {_int_field(S.ROUTER_INT_KEYS['status'])} AS status,
    {_int_field(S.ROUTER_INT_KEYS['service'])} AS service
  FROM p WHERE msg_class = 'router' AND NOT parse_error
)
SELECT token,
  count(*) AS n_requests,
  round(avg(service), 6) AS avg_service,
  round(quantile_cont(service, 0.5), 6) AS p50_service,
  round(quantile_cont(service, 0.95), 6) AS p95_service,
  round(quantile_cont(service, 0.99), 6) AS p99_service,
  CAST(sum(CASE WHEN status >= 500 THEN 1 ELSE 0 END) AS BIGINT) AS n_5xx
FROM r GROUP BY token
"""


def router_rollup_windowed(path: str, window_seconds: int = 60) -> str:
    w_us = window_seconds * 1_000_000
    return classified_cte(path) + f"""
, r AS (
  SELECT time - (time % {w_us}) AS window_start_us,
    {_int_field(S.ROUTER_INT_KEYS['service'])} AS service
  FROM p WHERE msg_class = 'router' AND NOT parse_error
)
SELECT window_start_us,
  count(*) AS n_requests,
  round(quantile_cont(service, 0.5), 6) AS p50_service,
  round(quantile_cont(service, 0.99), 6) AS p99_service
FROM r GROUP BY window_start_us
"""


def enrich_counts(path: str, tools_path: str, roles_path: str) -> str:
    return classified_cte(path) + f"""
SELECT
  coalesce(d.tool_kind, 'unknown') AS tool_kind,
  coalesce(r.role_class, CASE WHEN c.role LIKE 't.%' THEN 'token' ELSE 'unknown' END) AS role_class,
  c.msg_class AS msg_class,
  count(*) AS n
FROM c
LEFT JOIN read_parquet('{tools_path}') d ON c.tool = d.tool
LEFT JOIN read_parquet('{roles_path}') r ON c.role = r.role
GROUP BY 1, 2, 3
"""


def route_buckets(path: str, n_buckets: int) -> str:
    from .route import bucket_sql

    return classified_cte(path) + f"""
SELECT token, {bucket_sql('token', n_buckets)} AS bucket
FROM c WHERE msg_class <> 'token_missing'
GROUP BY token
"""


def sessions(path: str, gap_seconds: int) -> str:
    """Gap-based sessionization replay (sessions.py): µs-exact gaps, NULL ts
    never breaks a session."""
    gap_us = gap_seconds * 1_000_000
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, epoch_us(ts) AS ts_us
  FROM read_parquet('{path}')
), g AS (
  SELECT conv_id, turn_idx, ts_us,
    CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY conv_id ORDER BY turn_idx, ts_us)
              > {gap_us} THEN 1 ELSE 0 END AS brk
  FROM t
), s AS (
  SELECT conv_id, turn_idx, ts_us,
    CAST(sum(brk) OVER (PARTITION BY conv_id ORDER BY turn_idx, ts_us
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
  FROM g
)
SELECT conv_id, session_idx,
  count(*) AS n_turns,
  min(turn_idx) AS first_turn,
  max(turn_idx) AS last_turn,
  min(ts_us) AS start_us,
  max(ts_us) AS end_us
FROM s GROUP BY conv_id, session_idx
"""


def dyno_type_rollup(path: str) -> str:
    src = _str_field(S.PAT_SOURCE, S.PAT_SOURCE_QA)
    mu = lambda c: f"CAST(floor({c} * 1000000) AS BIGINT)"  # noqa: E731
    return classified_cte(path) + f"""
, dl AS (
  SELECT split_part({src}, '.', 1) AS dyno_type, {src} AS source,
    {_float_field(S.LOAD_KEYS['load_avg_1m'])} AS l1,
    {_float_field(S.LOAD_KEYS['load_avg_5m'])} AS l5,
    {_float_field(S.LOAD_KEYS['load_avg_15m'])} AS l15
  FROM p WHERE msg_class = 'dyno_load' AND NOT parse_error AND {src} <> ''
)
SELECT dyno_type, source, count(*) AS n,
  min(l1) AS min_1m, max(l1) AS max_1m,
  CAST(sum({mu('l1')}) AS BIGINT) AS sum_1m_micro,
  CAST(sum({mu('l5')}) AS BIGINT) AS sum_5m_micro,
  CAST(sum({mu('l15')}) AS BIGINT) AS sum_15m_micro
FROM dl GROUP BY dyno_type, source
"""


def top_tokens(path: str, k: int) -> str:
    return classified_cte(path) + f"""
, counts AS (
  SELECT token, count(*) AS n_requests
  FROM p WHERE msg_class = 'router' AND NOT parse_error GROUP BY token
)
SELECT CAST(rank AS INT) AS rank, token, n_requests FROM (
  SELECT *, row_number() OVER (ORDER BY n_requests DESC, token ASC) AS rank
  FROM counts) WHERE rank <= {k}
"""


def stale_tokens(path: str) -> str:
    """http.go:14,129-155 staleness predicate over the two dyno series,
    as_of = dataset max time (deterministic time.Now() replay)."""
    src = _str_field(S.PAT_SOURCE, S.PAT_SOURCE_QA)
    return classified_cte(path) + f"""
, u AS (
  SELECT token, time, 'dyno_load' AS series
  FROM p WHERE msg_class = 'dyno_load' AND NOT parse_error AND {src} <> ''
  UNION ALL
  SELECT token, time, 'dyno_mem' AS series
  FROM p WHERE msg_class = 'dyno_mem' AND NOT parse_error AND {src} <> ''
)
SELECT token, series, max(time) AS latest_time,
  ((SELECT max(time) FROM u) - max(time)) > {24 * 60 * 1_000_000} AS stale
FROM u GROUP BY token, series
"""


def batch_size_rollup(frames_path: str) -> str:
    """drain.go:46 batches.sizes distribution, exact percentiles."""
    return f"""
WITH sizes AS (
  SELECT batch_id, count(*) AS sz FROM read_parquet('{frames_path}') GROUP BY batch_id
)
SELECT CAST(count(*) AS BIGINT) AS n_batches,
  round(avg(sz), 6) AS mean_sz,
  CAST(min(sz) AS BIGINT) AS min_sz,
  CAST(max(sz) AS BIGINT) AS max_sz,
  round(quantile_cont(sz, 0.5), 6) AS p50_sz,
  round(quantile_cont(sz, 0.95), 6) AS p95_sz,
  round(quantile_cont(sz, 0.99), 6) AS p99_sz
FROM sizes
"""


def delivery_sizes(path: str) -> str:
    """poster.go:35-38 deliver.sizes replay: rows per (sink, token, 1-second
    event-time bucket) → per-sink size distribution (aggregate.py analog)."""
    src = _str_field(S.PAT_SOURCE, S.PAT_SOURCE_QA)
    return classified_cte(path) + f"""
, u AS (
  SELECT CASE
      WHEN msg_class = 'router' AND NOT parse_error THEN 'router'
      WHEN msg_class = 'router_error' AND NOT parse_error THEN 'events_router'
      WHEN msg_class = 'dyno_mem' AND NOT parse_error AND {src} <> '' THEN 'dyno_mem'
      WHEN msg_class = 'dyno_load' AND NOT parse_error AND {src} <> '' THEN 'dyno_load'
      WHEN msg_class = 'dyno_error' AND NOT parse_error THEN 'events_dyno'
    END AS sink, token, time
  FROM p
), d AS (
  SELECT sink, token, time - (time % 1000000) AS window_start_us, count(*) AS sz
  FROM u WHERE sink IS NOT NULL GROUP BY 1, 2, 3
)
SELECT sink,
  CAST(count(*) AS BIGINT) AS n_deliveries,
  round(avg(sz), 6) AS mean_sz,
  CAST(min(sz) AS BIGINT) AS min_sz,
  CAST(max(sz) AS BIGINT) AS max_sz,
  round(quantile_cont(sz, 0.5), 6) AS p50_sz,
  round(quantile_cont(sz, 0.95), 6) AS p95_sz,
  round(quantile_cont(sz, 0.99), 6) AS p99_sz
FROM d GROUP BY sink
"""


def sink_freshness(path: str) -> str:
    return classified_cte(path) + """
SELECT token, max(time) AS latest_time
FROM p WHERE msg_class = 'router' AND NOT parse_error
GROUP BY token
"""


def turn_ordering(path: str) -> str:
    """Stable turn ordering + per-turn text equality surface: window ops over
    (conv_id, turn_idx) — prev_role lag and a per-conv line number."""
    return f"""
WITH t AS (SELECT * FROM read_parquet('{path}'))
SELECT conv_id, turn_idx, text,
  lag(role) OVER w AS prev_role,
  row_number() OVER w AS turn_seq
FROM t WHERE conv_id IS NOT NULL
WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
"""


def lineage_counts(transcripts_path: str) -> str:
    """Per-source-file lineage: filename (basename) × msg_class row counts —
    the rows-in side of the lineage ledger, oracle-checked."""
    inner = classified_cte(transcripts_path).replace(
        f"read_parquet('{transcripts_path}')",
        f"(SELECT *, regexp_extract(filename, '([^/]+)$', 1) AS source_file"
        f" FROM read_parquet('{transcripts_path}', filename=true))",
    )
    return inner + """
SELECT source_file, msg_class, count(*) AS rows FROM c GROUP BY 1, 2
"""


def frames_replay_counts(frames_path: str) -> str:
    """Raw logplex-frame replay: regex header split (lpx/reader.go:43-116),
    stateful token override (drain.go:103-105), 2-format time parse with
    drop+count (drain.go:118-127), then classification counts."""
    rx = r"^(\d+) (<\d+>\d) (\S+) (\S+) (\S+) (\S+) (\S+) (.*)$"
    return f"""
WITH f AS (
  SELECT batch_id, line_no, drain_token,
    regexp_extract(frame, '{rx}', 3) AS time_str,
    regexp_extract(frame, '{rx}', 5) AS name,
    regexp_extract(frame, '{rx}', 6) AS procid,
    regexp_extract(frame, '{rx}', 8) AS body
  FROM read_parquet('{frames_path}')
), o AS (
  SELECT *,
    coalesce(
      last_value(CASE WHEN name LIKE 't.%' THEN name END IGNORE NULLS)
        OVER (PARTITION BY batch_id ORDER BY line_no ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      drain_token) AS token,
    coalesce(
      try_strptime(time_str, '%Y-%m-%dT%H:%M:%S.%f+00:00'),
      try_strptime(time_str, '%Y-%m-%dT%H:%M:%S+00:00')) AS ts
  FROM f
)
SELECT
  CASE
    WHEN token IS NULL OR token = '' THEN 'token_missing'
    WHEN NOT (name = 'heroku' OR name LIKE 't.%') THEN 'unknown_user'
    WHEN ts IS NULL THEN 'time_parse_error'
    WHEN procid = 'router' THEN
      CASE WHEN contains(body, ' code=H') THEN 'router_error'
           WHEN contains(body, ' code=blank-app') OR contains(body, ' desc="Blank app"') THEN 'router_blank'
           ELSE 'router' END
    ELSE
      CASE WHEN starts_with(body, 'Error R') THEN 'dyno_error'
           WHEN contains(body, 'sample#memory_total') THEN 'dyno_mem'
           WHEN contains(body, 'sample#load_avg_1m') THEN 'dyno_load'
           ELSE 'unknown_heroku' END
  END AS counter,
  count(*) AS n
FROM o GROUP BY 1
UNION ALL SELECT 'batches', count(DISTINCT batch_id) FROM f
UNION ALL SELECT 'lines', count(*) FROM f
"""
