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

Scale notes: the whole stage is narrow (no shuffle); the cheap rlike
pre-filter sits *before* the wide struct projection because Catalyst
will not reorder predicates around struct construction; column pruning
and parquet predicate pushdown pass through untouched.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import grammar
from ..functions.dates import normalize_syslog_date

# flat parsed-line columns, FIXTURES.md §2 (all strings in flight —
# the reference keeps size/nrcpt as strings, test/logship.js:26-27;
# numeric typing happens at the sink schema)
PARSED_FIELDS = [
    "qid", "from", "size", "nrcpt", "to", "relay", "delay", "delays",
    "dsn", "status", "message-id", "resent-message-id", "uid",
    "message", "msg", "queue_id", "spam_scan", "virus_scan", "dkim",
    "score", "raw_msg",
]


@dataclass
class ParseResult:
    parsed: DataFrame   # lines that produced a keyed record
    rejects: DataFrame  # envelope misses / filtered progs / qid-less


def parse_lines(
    lines: DataFrame,
    *,
    line_col: str = "line",
    tz: str = "America/Phoenix",
    now: Optional[dt.datetime] = None,
    require_qid: bool = True,
) -> ParseResult:
    """Raw-line DataFrame → (parsed, rejects).

    ``lines`` must carry ``line_col`` plus any passenger columns
    (``line_no``, ``batch_seq``, ``url`` …) which are preserved.
    ``require_qid=False`` reproduces the test/replay entry point
    (readLogLine, lib/logship.js:163-167) which enqueues qid-less
    parsed lines.
    """
    env = grammar.apply_grammar(lines, line_col=line_col)

    envelope_ok = F.col("prog").isNotNull() & (F.col("prog") != "")
    prog_ok = F.col("prog").rlike(grammar.PROG_FILTER_RE)

    kept = env.filter(envelope_ok & prog_ok)
    rejects = env.filter(~(envelope_ok & prog_ok)).select(
        *lines.columns,
        F.when(envelope_ok, F.lit("prog_filtered"))
         .otherwise(F.lit("envelope_miss")).alias("reject_reason"),
    )

    date = normalize_syslog_date(
        F.col("_mon"), F.col("_day"), F.col("_hh"), F.col("_mi"),
        F.col("_ss"), tz=tz, now=now,
    )

    flat = kept.select(
        *lines.columns,
        F.col("host"),
        F.col("prog"),
        date.alias("date"),
        *[F.col(f"parsed.`{f}`").alias(f) for f in PARSED_FIELDS],
    )

    # effective key: postfix qid, else rmilter/rspamd queue_id hoist
    flat = flat.withColumn("qid", F.coalesce(F.col("qid"), F.col("queue_id")))

    if require_qid:
        qid_ok = F.col("qid").isNotNull() & (F.col("qid") != "")
        parsed = flat.filter(qid_ok)
        qid_rejects = flat.filter(~qid_ok).select(
            *lines.columns, F.lit("no_qid").alias("reject_reason"))
        rejects = rejects.unionByName(qid_rejects)
    else:
        parsed = flat

    return ParseResult(parsed=parsed, rejects=rejects)
