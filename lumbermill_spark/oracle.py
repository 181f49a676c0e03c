"""Pure-Python row-at-a-time reference implementation of the reference
pipeline's branch logic — the pytest golden against which the distributed
engine is compared (SURVEY §5 rebuild plan, layer b).

This is a clean-room reimplementation from the documented grammar and branch
structure (logfmt/decode.go:11-20 EBNF, logfmt/scanner.go state machine,
drain.go:96-274 dispatch, router_msg.go / dyno_msg.go handlers) — Python
idioms, not a transliteration. It intentionally shares NO code with the Spark
implementation (parse.py) so agreement between the two is meaningful.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class LogfmtError(Exception):
    pass


def scan_logfmt(data: str):
    """Yield (key, value|None) pairs per the logfmt EBNF; raise LogfmtError on
    an unterminated quoted string (the scanner's only fatal condition for our
    message corpus). Mirrors logfmt/scanner.go:10-149 semantics."""
    pairs = []
    err = None
    i, n = 0, len(data)

    def ident_char(c):
        return c > " " and c not in ('"', "=")

    while i < n:
        c = data[i]
        if not ident_char(c):
            i += 1
            continue
        # key
        m = i
        while i < n and ident_char(data[i]):
            i += 1
        key = data[m:i]
        if i >= n:
            pairs.append((key, None))
            break
        if data[i] != "=":
            pairs.append((key, None))
            i += 1
            continue
        i += 1  # past '='
        if i >= n:
            # scanner.go equal-state EOF: key reported with nil value
            pairs.append((key, None))
            break
        c = data[i]
        if ident_char(c):
            m = i
            while i < n and ident_char(data[i]):
                i += 1
            pairs.append((key, data[m:i]))
            i += 1
        elif c == '"':
            m = i
            i += 1
            esc = False
            closed = False
            while i < n:
                if data[i] == "\\":
                    i += 2
                    esc = True
                    continue
                if data[i] == '"':
                    i += 1
                    closed = True
                    break
                i += 1
            if not closed:
                err = err or LogfmtError("unterminated string")
                break
            raw = data[m:i]
            if esc:
                try:
                    val = _unquote(raw)
                except LogfmtError as e:
                    err = err or e
                    continue
            else:
                val = raw[1:-1]
            pairs.append((key, val))
        else:
            pairs.append((key, None))  # key= followed by garbage
            i += 1
    if err:
        raise err
    return pairs


def _getu4_oracle(h: str) -> int:
    # unquote.go getu4: exactly four hex digits, else -1 (no '+'/' ' forms)
    if len(h) == 4 and all(c in "0123456789abcdefABCDEF" for c in h):
        return int(h, 16)
    return -1


def _unquote(raw: str) -> str:
    # JSON-style escapes (logfmt/unquote.go:37-149): identity set
    # '"' '\\' '/' '\'' (the apostrophe is valid JSON-for-logfmt even though
    # strict JSON rejects it, unquote.go:86), control set \b \f \n \r \t,
    # and \uXXXX with UTF-16 surrogate-pair joining — an invalid pair or a
    # lone surrogate becomes U+FFFD exactly as unquote.go:128-140 does.
    out = []
    i = 1
    end = len(raw) - 1
    mapping = {'"': '"', "\\": "\\", "'": "'", "/": "/", "b": "\b", "f": "\f", "n": "\n", "r": "\r", "t": "\t"}
    while i < end:
        c = raw[i]
        if c == "\\":
            i += 1
            e = raw[i] if i < end else ""
            if e in mapping:
                out.append(mapping[e])
                i += 1
            elif e == "u":
                hi = _getu4_oracle(raw[i + 1 : i + 5])
                if hi < 0:
                    raise LogfmtError("bad escape")
                i += 5
                if 0xD800 <= hi <= 0xDBFF and raw[i : i + 2] == "\\u":
                    lo = _getu4_oracle(raw[i + 2 : i + 6])
                    if 0xDC00 <= lo <= 0xDFFF:
                        out.append(chr(0x10000 + ((hi - 0xD800) << 10) + (lo - 0xDC00)))
                        i += 6
                        continue
                    out.append("�")
                    continue
                out.append(chr(hi) if not 0xD800 <= hi <= 0xDFFF else "�")
            else:
                raise LogfmtError("bad escape")
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _atoi(s: str | None) -> int:
    """strconv.Atoi: optional sign, digits only, no whitespace."""
    if s is None or s == "":
        raise ValueError("empty")
    body = s[1:] if s[0] in "+-" else s
    if not body or not body.isdigit() or not body.isascii():
        raise ValueError(s)
    return int(s)


def _atof(s: str | None) -> float:
    if s is None or s == "":
        raise ValueError("empty")
    return float(s)  # Go ParseFloat accepts the same decimal/exponent forms


def _trim_suffix(s: str, suf: str) -> str:
    return s[: -len(suf)] if s.endswith(suf) else s


# ---------------------------------------------------------------------------
# per-class projections (the HandleLogfmt handlers)
# ---------------------------------------------------------------------------


@dataclass
class RouterMsg:  # router_msg.go:31-87
    status: int = 0
    service: int = 0

    def handle(self, key, val):
        sval = "" if val is None else val
        if key == "connect":
            _atoi(_trim_suffix(sval, "ms"))
        elif key == "service":
            self.service = _atoi(_trim_suffix(sval, "ms"))
        elif key == "status":
            self.status = _atoi(sval)
        elif key == "bytes":
            _atoi(sval)


@dataclass
class RouterError:  # router_msg.go:89-149 (int errors swallowed)
    code: str = ""

    def handle(self, key, val):
        if key == "code":
            self.code = "" if val is None else val


@dataclass
class DynoMem:  # dyno_msg.go:41-72 (suffix-matched keys, errors swallowed)
    source: str = ""
    vals: dict = field(default_factory=dict)

    def handle(self, key, val):
        sval = "" if val is None else val
        if key == "source":
            self.source = sval
            return
        for suf, unit, conv in (
            ("memory_total", "MB", float),
            ("memory_rss", "MB", float),
            ("memory_cache", "MB", float),
            ("memory_swap", "MB", float),
            ("memory_pgpgin", "pages", int),
            ("memory_pgpgout", "pages", int),
        ):
            if key.endswith(suf):
                try:
                    v = (_atof if conv is float else _atoi)(_trim_suffix(sval, unit))
                except ValueError:
                    v = conv(0)
                self.vals[suf] = conv(v)
                return


@dataclass
class DynoLoad:  # dyno_msg.go:74-96
    source: str = ""
    vals: dict = field(default_factory=dict)

    def handle(self, key, val):
        sval = "" if val is None else val
        if key == "source":
            self.source = sval
            return
        for suf in ("load_avg_1m", "load_avg_5m", "load_avg_15m"):
            if key.endswith(suf):
                try:
                    self.vals[suf] = _atof(sval)
                except ValueError:
                    self.vals[suf] = 0.0
                return


def _run_handler(text: str, handler) -> bool:
    """logfmt.Unmarshal: walk pairs through the handler; False ⇔ error.
    The Go scanner keeps scanning after a handler error but returns the first
    error at the end (scanner.go saveError)."""
    err = False
    try:
        pairs = scan_logfmt(text)
    except LogfmtError:
        return False
    for k, v in pairs:
        try:
            handler.handle(k, v)
        except ValueError:
            err = True
    return not err


# ---------------------------------------------------------------------------
# the drain loop over transcript-shaped rows
# ---------------------------------------------------------------------------


def process_rows(rows):
    """rows: iterable of dicts (conv_id, turn_idx, role, text, tool, time_us).

    Returns (sinks dict of row-lists matching parse.py sink columns, counters
    dict) implementing drain.go:96-274 faithfully.
    """
    sinks = {k: [] for k in ("router", "events_router", "dyno_mem", "dyno_load", "events_dyno")}
    counters: dict[str, int] = {}

    def inc(name, k=1):
        counters[name] = counters.get(name, 0) + k

    for r in rows:
        inc("lines")
        role, tool, text = r["role"] or "", r["tool"] or "", r["text"] or ""
        token = role if role.startswith("t.") else (r["conv_id"] or "")
        if token == "":
            inc("token_missing")
            continue
        if not (role == "heroku" or role.startswith("t.")):
            inc("unknown_user")
            continue
        time = r["time_us"]
        if tool == "router":
            if " code=H" in text:
                inc("router_error")
                re_ = RouterError()
                if not _run_handler(text, re_):
                    inc("logfmt_parse_error")
                    continue
                inc("router_errors." + re_.code)
                sinks["events_router"].append((token, time, re_.code))
            elif " code=blank-app" in text or ' desc="Blank app"' in text:
                inc("router_blank")
            else:
                inc("router")
                rm = RouterMsg()
                if not _run_handler(text, rm):
                    inc("logfmt_parse_error")
                    continue
                sinks["router"].append((token, time, rm.status, rm.service))
        else:
            if text.startswith("Error R"):
                inc("dyno_error")
                code2 = text[7:9]
                try:
                    if len(code2) != 2:  # reference would panic; we drop
                        raise ValueError(code2)
                    code = _atoi(code2)
                except ValueError:
                    inc("logfmt_parse_error")
                    continue
                sinks["events_dyno"].append(
                    (token, time, tool, "R", code, text, tool.split(".")[0])
                )
            elif "sample#memory_total" in text:
                inc("dyno_mem")
                dm = DynoMem()
                if not _run_handler(text, dm):
                    inc("logfmt_parse_error")
                    continue
                if dm.source != "":
                    v = dm.vals
                    sinks["dyno_mem"].append(
                        (
                            token,
                            time,
                            dm.source,
                            v.get("memory_cache", 0.0),
                            v.get("memory_pgpgin", 0),
                            v.get("memory_pgpgout", 0),
                            v.get("memory_rss", 0.0),
                            v.get("memory_swap", 0.0),
                            v.get("memory_total", 0.0),
                            dm.source.split(".")[0],
                        )
                    )
            elif "sample#load_avg_1m" in text:
                inc("dyno_load")
                dl = DynoLoad()
                if not _run_handler(text, dl):
                    inc("logfmt_parse_error")
                    continue
                if dl.source != "":
                    v = dl.vals
                    sinks["dyno_load"].append(
                        (
                            token,
                            time,
                            dl.source,
                            v.get("load_avg_1m", 0.0),
                            v.get("load_avg_5m", 0.0),
                            v.get("load_avg_15m", 0.0),
                            dl.source.split(".")[0],
                        )
                    )
            else:
                inc("unknown_heroku")
    return sinks, counters
