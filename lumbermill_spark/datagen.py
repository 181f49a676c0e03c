"""Deterministic, vectorized synthetic transcripts generator.

Produces the input table of BASELINE.json's input_hint —
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` — whose ``text`` column carries the reference's log-line
classes in the exact formats of the reference generator
(lpxgen/heroku.go:76-105), plus controlled malformed variants exercising every
error-policy branch of drain.go / router_msg.go / dyno_msg.go.

Everything is numpy-vectorized off a single seeded Generator, so the same
(sf, seed) always regenerates byte-identical parquet; results are cached under
``LUMBERMILL_DATA_DIR`` (default ``<repo>/.data``). Scale: ``TURNS_PER_SF`` =
20M rows/sf → sf0.001≈20k, sf0.01≈200k, sf0.1≈2M turns. Conversation keys are
skewed (~1% of conv_ids own ~50% of turns) to exercise the salted-repartition
path the north_rule requires.
"""

from __future__ import annotations

import os
import re
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
TURNS_PER_SF = 20_000_000
BASE_EPOCH_US = 1_735_689_600_000_000  # 2025-01-01T00:00:00Z
ROW_GROUP_ROWS = 64_000  # small row groups → parallel local scans at local[32]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def data_dir() -> str:
    return os.environ.get("LUMBERMILL_DATA_DIR", os.path.join(_REPO_ROOT, ".data"))


def sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)) or sf_dir)
    if not m:
        m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.01


def _sf_tag(sf: float) -> str:
    return ("%g" % sf).replace("-", "m")


# ---------------------------------------------------------------------------
# vectorized string helpers
# ---------------------------------------------------------------------------


def _hex(rng: np.random.Generator, n: int, width: int) -> np.ndarray:
    """n random lowercase hex strings of the given width."""
    out = np.char.mod("%0{}x".format(width), rng.integers(0, 16**width, size=n, dtype=np.uint64))
    return out.astype(object)


def _uuid4(rng: np.random.Generator, n: int) -> np.ndarray:
    """n uuid4-shaped strings (8-4-4-4-12), vectorized."""
    a = _hex(rng, n, 8)
    b = _hex(rng, n, 4)
    c = np.char.mod("4%03x", rng.integers(0, 16**3, size=n, dtype=np.uint64)).astype(object)
    d = np.char.mod("%04x", (rng.integers(0, 16**3, size=n, dtype=np.uint64) | 0x8000)).astype(object)
    e = _hex(rng, n, 12)
    return a + "-" + b + "-" + c + "-" + d + "-" + e


def _fmt2(rng: np.random.Generator, n: int, scale: float) -> np.ndarray:
    """%0.2f formatted floats in [0, scale) (lpxgen uses %0.2f everywhere)."""
    return np.char.mod("%0.2f", rng.random(n) * scale).astype(object)


def _ints(rng: np.random.Generator, n: int, lo: int, hi: int) -> np.ndarray:
    return np.char.mod("%d", rng.integers(lo, hi, size=n)).astype(object)


_METHODS = np.array(["GET", "HEAD", "POST"], dtype=object)  # lpxgen/heroku.go:23
_PATHS = np.array(
    ["/about", "/api", "/blog", "/docs", "/events", "/help", "/legal",
     "/policy", "/pricing", "/privacy", "/security", "/support", "/tos"],
    dtype=object,
)  # lpxgen/heroku.go:19-22
_STATUSES = np.array(["200", "301", "302", "400", "401", "403", "404", "500"], dtype=object)
_H_CODES = np.array(["H12", "H13", "H18", "H19", "H20", "H99"], dtype=object)
_H_DESCS = np.array(
    ["Request timeout", "Connection closed without response", "Server Request Interrupted",
     "Backend connection timeout", "App boot timeout", "Platform error"],
    dtype=object,
)
_R_CODES = np.array(["10", "12", "14", "15"], dtype=object)
_R_DESCS = np.array(
    ["Boot timeout", "Exit timeout", "Memory quota exceeded", "Memory quota vastly exceeded"],
    dtype=object,
)
_UNKNOWN_HEROKU = np.array(
    ["State changed from starting to up", "Starting process with command `bundle exec rails`",
     "Stopping all processes with SIGTERM", "Process exited with status 0",
     "Restarting", "Build succeeded"],
    dtype=object,
)
# control-escape pairs as raw text bytes (backslash + char); the decode side
# maps them per unquote.go:86-119 (schemas.ESCAPE_TABLE)
_CTRL_ESCS = np.array(["\\t", "\\n", "\\r", "\\b", "\\f"], dtype=object)
_UNKNOWN_USER = np.array(
    ["hello from the app", "user log line lorem ipsum", "INFO completed request",
     "DEBUG cache warmup done", "processing job 12345", "warn: retrying connection"],
    dtype=object,
)


def _router_fields(rng: np.random.Generator, n: int) -> dict[str, np.ndarray]:
    return {
        "method": rng.choice(_METHODS, n),
        "path": rng.choice(_PATHS, n),
        "hex8": _hex(rng, n, 8),
        "rid": _uuid4(rng, n),
        "ip": (
            _ints(rng, n, 1, 255) + "." + _ints(rng, n, 0, 255) + "."
            + _ints(rng, n, 0, 255) + "." + _ints(rng, n, 1, 255)
        ),
        "connect": _ints(rng, n, 0, 100),
        "service": _ints(rng, n, 0, 600),
        "status": rng.choice(_STATUSES, n),
        "bytes": _ints(rng, n, 300, 1300),
    }


def _router_text(f: dict[str, np.ndarray]) -> np.ndarray:
    # exact format of lpxgen/heroku.go:76-85
    return (
        "at=info method=" + f["method"] + ' path="' + f["path"] + '" host=' + f["hex8"]
        + ".herokuapp.com request_id=" + f["rid"] + ' fwd="' + f["ip"] + '" dyno=web.1 connect='
        + f["connect"] + "ms service=" + f["service"] + "ms status=" + f["status"]
        + " bytes=" + f["bytes"]
    )


def _dyno_prefix(rng: np.random.Generator, n: int) -> np.ndarray:
    return (
        "source=web." + _ints(rng, n, 0, 5) + " dyno=heroku." + _ints(rng, n, 0, 1_000_000)
        + "." + _uuid4(rng, n)
    )


def _gen_texts(rng: np.random.Generator, cls: np.ndarray, n: int) -> np.ndarray:
    """Build the text column for each class label (vectorized per class)."""
    text = np.empty(n, dtype=object)

    def idx(name):
        return np.nonzero(cls == name)[0]

    i = idx("router")
    if len(i):
        text[i] = _router_text(_router_fields(rng, len(i)))
    # malformed router: status=abc → Atoi error → row DROPPED (router_msg.go:70-75)
    i = idx("router_bad_status")
    if len(i):
        f = _router_fields(rng, len(i))
        f["status"] = np.full(len(i), "abc", dtype=object)
        text[i] = _router_text(f)
    # malformed router: service= empty → Atoi("") error → row DROPPED
    i = idx("router_empty_service")
    if len(i):
        f = _router_fields(rng, len(i))
        f["service"] = np.full(len(i), "", dtype=object)
        text[i] = _router_text(f)
    # unterminated quote → logfmt scanner error → row DROPPED
    i = idx("router_unterminated")
    if len(i):
        f = _router_fields(rng, len(i))
        text[i] = _router_text(f) + ' desc="oops'
    i = idx("router_error")
    if len(i):
        k = rng.integers(0, len(_H_CODES), size=len(i))
        f = _router_fields(rng, len(i))
        text[i] = (
            "at=error code=" + _H_CODES[k] + ' desc="' + _H_DESCS[k] + '" method=' + f["method"]
            + ' path="' + f["path"] + '" host=' + f["hex8"] + ".herokuapp.com request_id="
            + f["rid"] + ' fwd="' + f["ip"] + '" dyno=web.1 connect=' + f["connect"]
            + "ms service=" + f["service"] + "ms status=503 bytes=0 sock=client"
        )
    # router_error with empty ints → ints swallowed to 0, row KEPT (router_msg.go:126-141)
    i = idx("router_error_empty_ints")
    if len(i):
        k = rng.integers(0, len(_H_CODES), size=len(i))
        text[i] = (
            "at=error code=" + _H_CODES[k] + ' desc="' + _H_DESCS[k]
            + '" method=GET path="/" host=x.herokuapp.com dyno= connect= service= status= bytes= sock=client'
        )
    i = idx("router_blank")
    if len(i):
        text[i] = (
            'at=error code=blank-app desc="Blank app" method=GET path="' + rng.choice(_PATHS, len(i))
            + '" host=' + _hex(rng, len(i), 8) + ".herokuapp.com fwd=\"-\" dyno= connect= service= status=502 bytes="
        )
    i = idx("dyno_error")
    if len(i):
        k = rng.integers(0, len(_R_CODES), size=len(i))
        text[i] = "Error R" + _R_CODES[k] + " (" + _R_DESCS[k] + ")"
    # Error R with non-2-digit code slice → Atoi error → row DROPPED (dyno_msg.go:33-36)
    i = idx("dyno_error_bad")
    if len(i):
        text[i] = np.where(rng.random(len(i)) < 0.5, "Error R9 (oops)", "Error Rxx (bad code)")
    i = idx("dyno_mem")
    if len(i):
        text[i] = (
            _dyno_prefix(rng, len(i))
            + " sample#memory_total=" + _fmt2(rng, len(i), 512.0) + "MB sample#memory_rss="
            + _fmt2(rng, len(i), 256.0) + "MB sample#memory_cache=" + _fmt2(rng, len(i), 0.01)
            + "MB sample#memory_swap=" + _fmt2(rng, len(i), 0.01) + "MB sample#memory_pgpgin="
            + _ints(rng, len(i), 0, 400_000) + "pages sample#memory_pgpgout="
            + _ints(rng, len(i), 0, 400_000) + "pages"
        )
    # mem line missing source= → row silently dropped (drain.go:201)
    i = idx("dyno_mem_nosource")
    if len(i):
        text[i] = (
            "dyno=heroku.1." + _uuid4(rng, len(i)) + " sample#memory_total="
            + _fmt2(rng, len(i), 512.0) + "MB sample#memory_rss=" + _fmt2(rng, len(i), 256.0) + "MB"
        )
    i = idx("dyno_load")
    if len(i):
        text[i] = (
            _dyno_prefix(rng, len(i))
            + " sample#load_avg_1m=" + _fmt2(rng, len(i), 5.0)
            + " sample#load_avg_5m=" + _fmt2(rng, len(i), 5.0)
            + " sample#load_avg_15m=" + _fmt2(rng, len(i), 5.0)
        )
    i = idx("dyno_load_nosource")
    if len(i):
        text[i] = (
            "dyno=heroku.2." + _uuid4(rng, len(i)) + " sample#load_avg_1m=" + _fmt2(rng, len(i), 5.0)
            + " sample#load_avg_5m=" + _fmt2(rng, len(i), 5.0) + " sample#load_avg_15m=" + _fmt2(rng, len(i), 5.0)
        )
    # adversarial quoted spans: a `key=` / bare-keyword sequence INSIDE a
    # quoted value. The fast patterns would misread these; they dispatch the
    # quote-parity patterns in every engine AND the DuckDB oracle, so the
    # driver's value-exact gate exercises that machinery end-to-end (before
    # round 4 it only lived in unit fixtures).
    i = idx("router_adversarial")
    if len(i):
        f = _router_fields(rng, len(i))
        half = rng.random(len(i)) < 0.5
        # trap A: in-span `status=999` occurs BEFORE the real status — a
        # first-occurrence (non-parity) extraction would return 999.
        trap_a = (
            'at=info note="x status=999 y" method=' + f["method"] + ' path="' + f["path"]
            + '" host=' + f["hex8"] + ".herokuapp.com request_id=" + f["rid"]
            + " dyno=web.1 connect=" + f["connect"] + "ms service=" + f["service"]
            + "ms status=" + f["status"] + " bytes=" + f["bytes"]
        )
        # trap B: bare keyword `connect` inside a span with NO real connect
        # key — a non-parity presence probe would drop the row; the scanner
        # keeps it with connect=0.
        trap_b = (
            'at=info note="has connect inside" method=' + f["method"] + ' path="' + f["path"]
            + '" host=' + f["hex8"] + ".herokuapp.com request_id=" + f["rid"]
            + " dyno=web.1 service=" + f["service"] + "ms status=" + f["status"]
            + " bytes=" + f["bytes"]
        )
        text[i] = np.where(half, trap_a, trap_b)
    i = idx("router_error_escaped")
    if len(i):
        k = rng.integers(0, len(_H_CODES), size=len(i))
        # escaped quotes inside desc (scanner.go qvalue two-byte skip +
        # unquote): the span carries \" and whitespace → quote-parity path,
        # and the odd-quote drop rule must NOT count the escaped quotes
        text[i] = (
            "at=error code=" + _H_CODES[k] + ' desc="Request \\"timed out\\" upstream"'
            + " method=GET path=\"/\" host=x.herokuapp.com dyno=web.1 connect=1ms"
            + " service=30000ms status=503 bytes=0 sock=client"
        )
    i = idx("dyno_mem_adversarial")
    if len(i):
        # in-span `source=web.99` before the real source: a first-occurrence
        # extraction would route the point to the wrong dyno
        text[i] = (
            'note="fake source=web.99 z" ' + _dyno_prefix(rng, len(i))
            + " sample#memory_total=" + _fmt2(rng, len(i), 512.0) + "MB sample#memory_rss="
            + _fmt2(rng, len(i), 256.0) + "MB sample#memory_cache=" + _fmt2(rng, len(i), 0.01)
            + "MB sample#memory_swap=" + _fmt2(rng, len(i), 0.01) + "MB sample#memory_pgpgin="
            + _ints(rng, len(i), 0, 400_000) + "pages sample#memory_pgpgout="
            + _ints(rng, len(i), 0, 400_000) + "pages"
        )
    i = idx("dyno_load_escaped")
    if len(i):
        # the EXTRACTED source itself is a quoted value with an escaped
        # quote → decode must yield web"N.M in every engine and the oracle
        text[i] = (
            'source="web\\"' + _ints(rng, len(i), 0, 5) + "." + _ints(rng, len(i), 0, 9)
            + '" dyno=heroku.' + _ints(rng, len(i), 0, 1_000_000) + "." + _uuid4(rng, len(i))
            + " sample#load_avg_1m=" + _fmt2(rng, len(i), 5.0)
            + " sample#load_avg_5m=" + _fmt2(rng, len(i), 5.0)
            + " sample#load_avg_15m=" + _fmt2(rng, len(i), 5.0)
        )
    i = idx("dyno_mem_ctrl_escaped")
    if len(i):
        # CONTROL escapes inside the quoted, EXTRACTED source value: \t \n
        # \r \b \f all decode to their control bytes in every engine and
        # both oracles (schemas.ESCAPE_CHAIN on the regex-only sides, the
        # exact unquote.go walk on the Python sides), so the sink hash gate
        # carries a literal tab/newline end-to-end. \uXXXX is deliberately
        # absent: the regex-only sides leave it literal (schemas.py escape
        # contract) — it is pinned by pytest goldens instead.
        esc = rng.choice(_CTRL_ESCS, len(i))
        text[i] = (
            'source="web' + esc + _ints(rng, len(i), 0, 5) + "." + _ints(rng, len(i), 0, 9)
            + '" dyno=heroku.' + _ints(rng, len(i), 0, 1_000_000) + "." + _uuid4(rng, len(i))
            + " sample#memory_total=" + _fmt2(rng, len(i), 512.0) + "MB sample#memory_rss="
            + _fmt2(rng, len(i), 256.0) + "MB sample#memory_cache=" + _fmt2(rng, len(i), 0.01)
            + "MB sample#memory_swap=" + _fmt2(rng, len(i), 0.01) + "MB sample#memory_pgpgin="
            + _ints(rng, len(i), 0, 400_000) + "pages sample#memory_pgpgout="
            + _ints(rng, len(i), 0, 400_000) + "pages"
        )
    i = idx("unknown_heroku")
    if len(i):
        text[i] = rng.choice(_UNKNOWN_HEROKU, len(i))
    i = idx("unknown_user")
    if len(i):
        text[i] = rng.choice(_UNKNOWN_USER, len(i))
    # cross line: mem-style text but tool=router → router branch default →
    # routerMsg parse finds no int keys → all-zero router point, row KEPT
    i = idx("cross_mem_on_router")
    if len(i):
        text[i] = (
            _dyno_prefix(rng, len(i)) + " sample#memory_total=" + _fmt2(rng, len(i), 512.0) + "MB"
        )
    return text


# generator class → (weight, tool kind, role kind)
# tool: "router" | "dyno" (web.N / worker.N); role: "heroku" unless overridden
_CLASS_MIX = [
    ("router", 0.47, "router"),
    ("router_bad_status", 0.005, "router"),
    ("router_empty_service", 0.005, "router"),
    ("router_unterminated", 0.003, "router"),
    ("router_error", 0.05, "router"),
    ("router_error_empty_ints", 0.005, "router"),
    ("router_adversarial", 0.004, "router"),
    ("router_error_escaped", 0.002, "router"),
    ("dyno_mem_adversarial", 0.002, "dyno"),
    ("dyno_load_escaped", 0.002, "dyno"),
    ("dyno_mem_ctrl_escaped", 0.002, "dyno"),
    ("router_blank", 0.02, "router"),
    ("cross_mem_on_router", 0.002, "router"),
    ("dyno_error", 0.03, "dyno"),
    ("dyno_error_bad", 0.003, "dyno"),
    ("dyno_mem", 0.13, "dyno"),
    ("dyno_mem_nosource", 0.004, "dyno"),
    ("dyno_load", 0.13, "dyno"),
    ("dyno_load_nosource", 0.004, "dyno"),
    ("unknown_heroku", 0.06, "dyno"),
    ("unknown_user", 0.04, "dyno"),
]


def generate_transcripts(sf: float, seed: int = SEED, ts_offset_us: int = 0) -> "pa.Table":
    n = max(2000, int(TURNS_PER_SF * sf))
    rng = np.random.default_rng([seed, int(round(sf * 100000))])

    # --- skewed conversation assignment: ~1% hot conv_ids own ~50% of turns
    n_convs = max(50, n // 40)
    n_hot = max(1, n_convs // 100)
    conv_uuid = _uuid4(rng, n_convs)
    conv_ids = np.char.add("t.", conv_uuid.astype(str)).astype(object)
    hot = rng.random(n) < 0.5
    conv_idx = np.where(
        hot,
        rng.integers(0, n_hot, size=n),
        rng.integers(n_hot, n_convs, size=n),
    )
    conv = conv_ids[conv_idx]

    # dense 0-based turn_idx per conv (vectorized groupby-cumcount)
    order = np.argsort(conv_idx, kind="stable")
    sorted_idx = conv_idx[order]
    starts = np.r_[0, np.nonzero(np.diff(sorted_idx))[0] + 1]
    cum = np.arange(n) - np.repeat(np.arange(n)[starts], np.diff(np.r_[starts, n]))
    turn_idx = np.empty(n, dtype=np.int32)
    turn_idx[order] = cum.astype(np.int32)

    # --- class labels
    labels = np.array([c[0] for c in _CLASS_MIX], dtype=object)
    weights = np.array([c[1] for c in _CLASS_MIX])
    weights = weights / weights.sum()
    cls = rng.choice(labels, size=n, p=weights)

    tool_kind = {c[0]: c[2] for c in _CLASS_MIX}
    is_router_tool = np.isin(cls, [k for k, v in tool_kind.items() if v == "router"])
    dyno_proc = np.where(
        rng.random(n) < 0.8,
        np.char.add("web.", np.char.mod("%d", rng.integers(1, 20, size=n))),
        np.char.add("worker.", np.char.mod("%d", rng.integers(1, 8, size=n))),
    ).astype(object)
    tool = np.where(is_router_tool, "router", dyno_proc).astype(object)

    # --- roles: heroku / token-prefixed (self) / token-prefixed (override) / user
    r = rng.random(n)
    role = np.full(n, "heroku", dtype=object)
    role[r < 0.03] = conv[r < 0.03]  # t.-prefixed, same token (override is identity)
    ovr = (r >= 0.03) & (r < 0.04)  # t.-prefixed, DIFFERENT token → override fires
    role[ovr] = np.char.add("t.", _uuid4(rng, int(ovr.sum())).astype(str)).astype(object)
    user = cls == "unknown_user"
    role[user] = "user"
    # a sliver of missing conv_id (and role not t.-prefixed) → token_missing
    miss = (rng.random(n) < 0.003) & ~ovr & (r >= 0.04)
    conv = conv.copy()
    conv[miss] = None

    # --- text and timestamps
    text = _gen_texts(rng, cls, n)
    ts_us = (
        BASE_EPOCH_US + ts_offset_us + np.arange(n, dtype=np.int64) * 50_000
        + rng.integers(0, 50_000, size=n)
    )

    return pa.table(
        {
            "conv_id": pa.array(conv, type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(role, type=pa.string()),
            "text": pa.array(text, type=pa.string()),
            "tool": pa.array(tool, type=pa.string()),
            "ts": pa.array(ts_us, type=pa.timestamp("us", tz="UTC")),
        }
    )


# ---------------------------------------------------------------------------
# raw-frame fixture: logplex frames incl. both time formats, an invalid time,
# and mid-batch token override (drain.go:87,103-105,118-127)
# ---------------------------------------------------------------------------


def generate_frames(sf: float, seed: int = SEED) -> "pa.Table":
    n_batches = max(20, int(2000 * sf))
    rng = np.random.default_rng([seed + 1, int(round(sf * 100000))])
    rows = {"batch_id": [], "line_no": [], "drain_token": [], "frame": []}
    for b in range(n_batches):
        batch_id = "b%06d" % b
        tok = "t." + str(_uuid4(rng, 1)[0])
        n_lines = 3 + int(rng.integers(0, 8))
        override_at = int(rng.integers(1, n_lines)) if rng.random() < 0.4 else -1
        override_tok = "t." + str(_uuid4(rng, 1)[0])
        for ln in range(n_lines):
            fields = _router_fields(rng, 1)
            body = str(_router_text(fields)[0])
            # both accepted formats + ~3% invalid time (drain.go:118-127)
            u = rng.random()
            if u < 0.03:
                t = "not-a-time"
            elif u < 0.5:
                t = "2025-01-01T00:%02d:%02d.%06d+00:00" % (ln % 60, b % 60, int(rng.integers(0, 1_000_000)))
            else:
                t = "2025-01-01T00:%02d:%02d+00:00" % (ln % 60, b % 60)
            name = override_tok if ln == override_at else "heroku"
            syslog = "<158>1 %s host %s router - %s" % (t, name, body)
            frame = "%d %s" % (len(syslog) + 1, syslog)
            rows["batch_id"].append(batch_id)
            rows["line_no"].append(ln)
            rows["drain_token"].append(tok)
            rows["frame"].append(frame)
    return pa.table(
        {
            "batch_id": pa.array(rows["batch_id"], type=pa.string()),
            "line_no": pa.array(rows["line_no"], type=pa.int32()),
            "drain_token": pa.array(rows["drain_token"], type=pa.string()),
            "frame": pa.array(rows["frame"], type=pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# enrichment dimensions (broadcast-join fixtures, FIXTURES.md §4)
# ---------------------------------------------------------------------------


def dim_tools_table() -> "pa.Table":
    tools = ["router"] + ["web.%d" % i for i in range(1, 20)] + ["worker.%d" % i for i in range(1, 8)]
    return pa.table(
        {
            "tool": pa.array(tools, type=pa.string()),
            "tool_kind": pa.array(
                ["router" if t == "router" else t.split(".")[0] for t in tools], type=pa.string()
            ),
            "is_router": pa.array([t == "router" for t in tools], type=pa.bool_()),
        }
    )


def dim_roles_table() -> "pa.Table":
    return pa.table(
        {
            "role": pa.array(["heroku", "user", "assistant", "system"], type=pa.string()),
            "role_class": pa.array(["platform", "enduser", "agent", "agent"], type=pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# cached-parquet entry points
# ---------------------------------------------------------------------------


def _write_atomic(table: "pa.Table", path: str, row_group_rows: int = ROW_GROUP_ROWS) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet.tmp")
    os.close(fd)
    try:
        pq.write_table(table, tmp, row_group_size=row_group_rows)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def transcripts_path(sf: float) -> str:
    return os.path.join(data_dir(), "transcripts_sf%s.parquet" % _sf_tag(sf))


def generate_raw_bodies(sf: float, seed: int = SEED) -> "pa.Table":
    """Concatenated length-prefixed drain bodies — one row per HTTP batch —
    built from the SAME frame rows as generate_frames (deterministic reuse):
    each frame contributes ``<len> <syslog>\\n`` where <len> already counts
    the trailing newline (lpx octet-counting). lm_frames_scan byte-scans
    these and must match the lm_frames_replay oracle over the
    one-frame-per-row fixture exactly."""
    t = generate_frames(sf, seed)
    bids = t["batch_id"].to_pylist()
    toks = t["drain_token"].to_pylist()
    frames_ = t["frame"].to_pylist()
    bodies: dict[str, list[str]] = {}
    tok_of: dict[str, str] = {}
    for b, tok, fr in zip(bids, toks, frames_):
        bodies.setdefault(b, []).append(fr + "\n")
        tok_of[b] = tok
    keys = sorted(bodies)
    return pa.table(
        {
            "batch_id": pa.array(keys, type=pa.string()),
            "drain_token": pa.array([tok_of[k] for k in keys], type=pa.string()),
            "body": pa.array(["".join(bodies[k]) for k in keys], type=pa.string()),
        }
    )


def frames_path(sf: float) -> str:
    return os.path.join(data_dir(), "frames_sf%s.parquet" % _sf_tag(sf))


def raw_bodies_path(sf: float) -> str:
    return os.path.join(data_dir(), "raw_bodies_sf%s.parquet" % _sf_tag(sf))


def dims_path(name: str) -> str:
    return os.path.join(data_dir(), "dim_%s.parquet" % name)


# Above this sf, transcripts are generated as a DIRECTORY of part files,
# each produced independently (own chunk-keyed RNG stream, own ts offset so
# event time stays monotone across parts) — bounded memory at any sf, and
# the part files are what the pipeline's chunk_files/resume machinery
# actually operates on. Chunk size is pinned so the output is a pure
# function of sf, never of worker count or scheduling.
CHUNKED_MIN_SF = 2.0
CHUNK_SF = 0.25  # 5M turns per part file


def _gen_transcript_chunk(args: tuple) -> str:
    sf_part, chunk_idx, path = args
    if not os.path.exists(path):
        t = generate_transcripts(
            sf_part,
            seed=SEED + 7919 * (chunk_idx + 1),
            ts_offset_us=int(chunk_idx * TURNS_PER_SF * sf_part) * 50_000,
        )
        _write_atomic(t, path)
    return path


def ensure_transcripts(sf: float, workers: int | None = None) -> str:
    p = transcripts_path(sf)
    if os.path.exists(p):
        return p
    if sf < CHUNKED_MIN_SF:
        _write_atomic(generate_transcripts(sf), p)
        return p
    import json
    import shutil
    from concurrent.futures import ProcessPoolExecutor

    n_chunks = int(round(sf / CHUNK_SF))
    if abs(n_chunks * CHUNK_SF - sf) > 1e-9:
        raise ValueError(
            "chunked generation requires sf to be a multiple of CHUNK_SF=%s (got sf=%s); "
            "pick e.g. sf=%s or sf=%s" % (CHUNK_SF, sf, n_chunks * CHUNK_SF, (n_chunks + 1) * CHUNK_SF)
        )
    tmp = p + ".tmpdir"
    # Leftover part files from an interrupted run are only reusable when they
    # were generated under the SAME constants — a stale tmpdir from an older
    # seed/chunking version would silently mix into the final dataset and
    # break the "pure function of sf" determinism claim (round-3 advice).
    manifest = {"seed": SEED, "chunk_sf": CHUNK_SF, "turns_per_sf": TURNS_PER_SF}
    mpath = os.path.join(tmp, "_manifest.json")
    if os.path.isdir(tmp):
        try:
            with open(mpath) as fh:
                stale = json.load(fh) != manifest
        except (OSError, ValueError):
            stale = True
        if stale:
            shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    with open(mpath, "w") as fh:
        json.dump(manifest, fh)
    jobs = [
        (CHUNK_SF, i, os.path.join(tmp, "part-%05d.parquet" % i)) for i in range(n_chunks)
    ]
    workers = workers or min(16, os.cpu_count() or 4)
    with ProcessPoolExecutor(max_workers=workers) as ex:
        list(ex.map(_gen_transcript_chunk, jobs))
    # the underscore-prefixed manifest stays in the final directory: Spark's
    # parquet reader ignores _* files, and it documents how the data was built
    os.replace(tmp, p)
    return p


def ensure_frames(sf: float) -> str:
    p = frames_path(sf)
    if not os.path.exists(p):
        _write_atomic(generate_frames(sf), p)
    return p


def ensure_raw_bodies(sf: float) -> str:
    p = raw_bodies_path(sf)
    if not os.path.exists(p):
        _write_atomic(generate_raw_bodies(sf), p)
    return p


def ensure_dims() -> dict[str, str]:
    out = {}
    for name, tbl in (("tools", dim_tools_table()), ("roles", dim_roles_table())):
        p = dims_path(name)
        if not os.path.exists(p):
            _write_atomic(tbl, p)
        out[name] = p
    return out


def ensure_for_sf_dir(sf_dir: str) -> dict[str, str]:
    """Everything a queries()/oracle pair needs for a given testdata dir."""
    sf = sf_from_dir(sf_dir)
    out = ensure_dims()
    out["transcripts"] = ensure_transcripts(sf)
    out["frames"] = ensure_frames(sf)
    out["raw_bodies"] = ensure_raw_bodies(sf)
    return out
