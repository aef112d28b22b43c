"""Parse stage: raw lines → typed parsed-line DataFrame (+ reject side
output).

Mirrors the reference's read→parse path
(/root/reference/lib/logship.js:95-120 + lib/postfix-doc.js:12-37):

1. envelope grok (drop-to-rejects on miss)            [P1]
2. program pre-filter ^(postfix|rspamd|rmilter)       [P2]
3. per-program grammar extraction                      [P3]
4. qid-presence filter (production read path drops     [P4]
   qid-less lines, lib/logship.js:107-111)
5. date normalization → ISO string with tz offset      [P5]

Physical design: **one Arrow-vectorized mapInPandas pass** (pandas
``str.extract``, C-regex, each pattern applied once per batch).
The earlier pure-Catalyst formulation (functions/grammar.py) was
measured ~20× slower because CollapseProject inlines the envelope
regex into every downstream field expression — ~30 executions of the
same pattern per line; Catalyst has no common-subexpression reuse
across projection fields. The stage stays narrow (no shuffle), and
column pruning still reaches the scan (only the line column and
passengers are read).
"""

from __future__ import annotations

import datetime as dt
import re
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..functions.grammar import (ENVELOPE_RE, MSG_REST_RE, PROG_FILTER_RE,
                                 QID_RE)

# flat parsed-line columns, FIXTURES.md §2 (all strings in flight —
# the reference keeps size/nrcpt as strings, test/logship.js:26-27;
# numeric typing happens at the sink schema)
PARSED_FIELDS = [
    "qid", "from", "size", "nrcpt", "to", "relay", "delay", "delays",
    "dsn", "status", "message-id", "resent-message-id", "uid",
    "message", "msg", "queue_id", "spam_scan", "virus_scan", "dkim",
    "score", "raw_msg",
]

_ANGLE_KEYS = ["from", "to", "message-id", "resent-message-id"]
_PLAIN_KEYS = ["size", "nrcpt", "relay", "delay", "delays", "dsn", "uid",
               "spam_scan", "virus_scan", "dkim", "score"]

_FUTURE_SLACK = pd.Timedelta(seconds=6 * 30 * 24 * 60 * 60)  # ref: 6×30 d


@dataclass
class ParseResult:
    parsed: DataFrame   # lines that produced a keyed record
    rejects: DataFrame  # envelope misses / filtered progs / qid-less
    all_rows: Optional[DataFrame] = None  # full grok output (parsed ∪
    # rejects share its lineage) — callers persist THIS frame so the
    # scan+parse runs once per batch, then derive counts/dates from it


def _normalize_dates(mon: pd.Series, day: pd.Series, hh: pd.Series,
                     mi: pd.Series, ss: pd.Series, tz: str,
                     now: dt.datetime) -> pd.Series:
    """Vectorized reference date rule (lib/postfix-doc.js:39-145):
    current-year assumption, minus-one-year when >6×30 d in the future,
    ISO-8601 with the IANA zone's offset at that wall time."""
    datestr = (str(now.year) + "-" + mon + "-" + day.str.zfill(2)
               + " " + hh + ":" + mi + ":" + ss)
    ts = pd.to_datetime(datestr, format="%Y-%b-%d %H:%M:%S",
                        errors="coerce")
    now_ts = pd.Timestamp(now)
    too_far = ts > (now_ts + _FUTURE_SLACK)
    if too_far.any():
        ts = ts.where(~too_far, ts - pd.DateOffset(years=1))
    loc = ts.dt.tz_localize(tz, ambiguous=True, nonexistent="shift_forward")
    s = loc.dt.strftime("%Y-%m-%dT%H:%M:%S%z")
    return s.str[:-2] + ":" + s.str[-2:]


def _grok_batch(pdf: pd.DataFrame, line_col: str, tz: str,
                now: dt.datetime) -> pd.DataFrame:
    """One vectorized pass: envelope → pre-filter → grammar → dates.
    Adds host/prog/date, every PARSED_FIELDS column, and
    ``reject_reason`` (null for kept rows)."""
    line = pdf[line_col].fillna("")
    env = line.str.extract(ENVELOPE_RE)
    mon, day, hh, mi, ss = (env[i] for i in range(5))
    host, prog, msg = env[5], env[6], env[8]

    envelope_ok = prog.notna()
    prog_ok = envelope_ok & prog.str.match(PROG_FILTER_RE, na=False)
    is_postfix = prog.str.startswith("postfix/").fillna(False)

    qid = msg.str.extract(QID_RE)[0].where(is_postfix)
    rest = msg.str.extract(MSG_REST_RE)[0].where(is_postfix)

    out = pdf.copy()
    out["host"] = host
    out["prog"] = prog
    out["date"] = _normalize_dates(mon, day, hh, mi, ss, tz, now) \
        .where(envelope_ok)

    for k in _ANGLE_KEYS:
        out[k] = rest.str.extract(rf"(?:^|[,\s]){re.escape(k)}=<([^>]*)>",
                                  expand=True)[0]
    for k in _PLAIN_KEYS:
        pat = rf"(?:^|[,\s]){re.escape(k)}=([^,\s]+)"
        ser = rest.str.extract(pat, expand=True)[0]
        if k in ("spam_scan", "virus_scan", "dkim", "score"):
            # rmilter/rspamd keys live in the free-form msg
            ser = ser.fillna(msg.where(~is_postfix)
                             .str.extract(pat, expand=True)[0])
        out[k] = ser
    out["status"] = rest.str.extract(r"(?:^|[,\s])status=(.*)$",
                                     expand=True)[0]

    is_bounce = (prog == "postfix/bounce").fillna(False)
    out["message"] = rest.where(is_bounce)
    has_kv = rest.str.contains(r"(?:^|[,\s])[A-Za-z-]+=", na=False)
    out["msg"] = rest.where(is_postfix & ~is_bounce & ~has_kv
                            & rest.notna() & (rest != ""))

    queue_id = msg.str.extract(r"queue.?id:\s*<([^>]+)>",
                               expand=True)[0].where(~is_postfix)
    out["queue_id"] = queue_id
    out["raw_msg"] = msg.where(~is_postfix & prog_ok)

    out["qid"] = qid.fillna(queue_id)

    reason = pd.Series(pd.NA, index=pdf.index, dtype="object")
    reason = reason.mask(~envelope_ok, "envelope_miss")
    reason = reason.mask(envelope_ok & ~prog_ok, "prog_filtered")
    out["reject_reason"] = reason
    # NaN → None on the generated string columns so Arrow emits proper
    # nulls (passenger columns keep their native dtypes untouched)
    for c in ["host", "prog", "date", *PARSED_FIELDS, "reject_reason"]:
        col = out[c]
        out[c] = col.astype(object).where(col.notna(), None)
    return out


def parse_all(
    lines: DataFrame,
    *,
    line_col: str = "line",
    tz: str = "America/Phoenix",
    now: Optional[dt.datetime] = None,
    passengers: Optional[list[str]] = None,
) -> DataFrame:
    """Full grok over a raw-line DataFrame: selected passengers
    preserved, parsed columns + ``reject_reason`` added. Narrow; one
    Arrow pass.

    ``passengers`` limits which input columns cross the Python
    boundary and return — every byte of an unused passenger column is
    serialized twice, so callers should name only what downstream
    stages read (default: all input columns, test-friendly).
    """
    if now is None:
        now = dt.datetime.now()
    if passengers is None:
        passengers = [c for c in lines.columns if c != line_col]
    in_cols = [line_col] + [c for c in passengers if c != line_col]
    lines = lines.select(*[F.col(f"`{c}`") for c in in_cols])

    keep_fields = [f for f in lines.schema.fields if f.name in passengers]
    schema = StructType(
        keep_fields
        + [StructField("host", StringType()),
           StructField("prog", StringType()),
           StructField("date", StringType())]
        + [StructField(f, StringType()) for f in PARSED_FIELDS]
        + [StructField("reject_reason", StringType())]
    )

    def grok(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = _grok_batch(pdf, line_col, tz, now)
            yield out[[f.name for f in schema.fields]]

    return lines.mapInPandas(grok, schema)


def parse_lines(
    lines: DataFrame,
    *,
    line_col: str = "line",
    tz: str = "America/Phoenix",
    now: Optional[dt.datetime] = None,
    require_qid: bool = True,
    passengers: Optional[list[str]] = None,
) -> ParseResult:
    """Raw-line DataFrame → (parsed, rejects).

    ``lines`` must carry ``line_col`` plus any passenger columns
    (``line_no``, ``batch_seq``, ``url`` …); ``passengers`` selects
    which of them survive the parse (see :func:`parse_all`).
    ``require_qid=False`` reproduces the test/replay entry point
    (readLogLine, lib/logship.js:163-167) which enqueues qid-less
    parsed lines.
    """
    all_rows = parse_all(lines, line_col=line_col, tz=tz, now=now,
                         passengers=passengers)
    out_passengers = [c for c in all_rows.columns
                      if c in lines.columns and c != line_col]

    kept = all_rows.filter(F.col("reject_reason").isNull()) \
                   .drop("reject_reason")
    rejects = all_rows.filter(F.col("reject_reason").isNotNull()) \
                      .select(*out_passengers, "reject_reason")

    if require_qid:
        qid_ok = F.col("qid").isNotNull() & (F.col("qid") != "")
        parsed = kept.filter(qid_ok)
        qid_rejects = kept.filter(~qid_ok).select(
            *out_passengers, F.lit("no_qid").alias("reject_reason"))
        rejects = rejects.unionByName(qid_rejects)
    else:
        parsed = kept

    return ParseResult(parsed=parsed, rejects=rejects, all_rows=all_rows)
