"""Syslog envelope + per-program grok grammars as Catalyst column
expressions.

Semantics mirror the reference pipeline's two-stage parse
(/root/reference/lib/postfix-doc.js:12-37): stage 1 splits the syslog
envelope ``MMM dd HH:mm:ss host prog[pid]: msg``; stage 2 applies the
program-specific grammar to ``msg``. Field inventory is pinned by the
reference's tests (/root/reference/test/logship.js:24-30,
test/postfix-doc.js:100-261) since the grammar package itself
(postfix-parser) is external.

Everything here is a pure ``pyspark.sql.functions`` expression —
JVM-side, inside whole-stage codegen. No Python UDFs in the parse hot
path; at 100 TB the parse stage is a narrow map over the scan with
predicate pushdown intact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- stage 1: envelope -------------------------------------------------
# "Jul 26 04:18:34 mx12 postfix/qmgr[28761]: 3mfHGL1r9gzyQP: ..."
# Lines without `prog[pid]:` fail the envelope parse and are dropped
# (reference: test/mail.log line "madeup: Gobbely Gook" → parse error).
ENVELOPE_RE = (
    r"^([A-Z][a-z]{2})\s+(\d{1,2})\s+(\d{2}):(\d{2}):(\d{2})\s+"
    r"(\S+)\s+([A-Za-z0-9._/-]+)\[(\d+)\]:\s+(.*)$"
)

# stage-2 pre-filter before the expensive grammar extraction
# (reference: lib/postfix-doc.js:20). Kept as an explicit early filter
# because Catalyst will not reorder predicates around later struct
# building; cheap rlike runs against the scan output directly.
PROG_FILTER_RE = r"^(postfix|rspamd|rmilter)"

# postfix queue-id at the head of msg: "3mPVKl0Mhjz7sXv: rest".
# Accepted shapes: any alnum token containing a digit (long base-52
# ids always do), OR an uppercase-HEX token of >=6 chars (short-format
# ids like DEADBEEF are legitimately digit-less but always hex). The
# hex restriction matters: a bare `[0-9A-Z]+` also matches NOQUEUE —
# "postfix/smtpd ... NOQUEUE: reject: ..." is ubiquitous in real logs,
# and treating NOQUEUE as a qid folds every reject line on every host
# into one unbounded mega-doc (wrong doc semantics AND the exact
# hot-key detonation the fold elsewhere defends against). Free-form
# prefixes ("statistics:", "warning:") are lowercase words with no
# digit, so neither alternative matches.
QID_RE = r"^((?:(?=[0-9A-Za-z]*\d)[0-9A-Za-z]+)|(?:[0-9A-F]{6,})):\s"
MSG_REST_RE = r"^[0-9A-Za-z]+:\s(.*)$"


def parse_envelope(line: Column) -> Column:
    """line → struct(mon, day, hh, mi, ss, host, prog, pid, msg).

    Null struct fields when the envelope regex does not match; callers
    drop rows with a null ``prog`` (parse-error side output).
    """
    return F.struct(
        F.regexp_extract(line, ENVELOPE_RE, 1).alias("mon"),
        F.regexp_extract(line, ENVELOPE_RE, 2).alias("day"),
        F.regexp_extract(line, ENVELOPE_RE, 3).alias("hh"),
        F.regexp_extract(line, ENVELOPE_RE, 4).alias("mi"),
        F.regexp_extract(line, ENVELOPE_RE, 5).alias("ss"),
        F.regexp_extract(line, ENVELOPE_RE, 6).alias("host"),
        F.regexp_extract(line, ENVELOPE_RE, 7).alias("prog"),
        F.regexp_extract(line, ENVELOPE_RE, 8).alias("pid"),
        F.regexp_extract(line, ENVELOPE_RE, 9).alias("msg"),
    )


def _kv(msg: Column, key: str, *, angle: bool = False) -> Column:
    """Extract ``key=value`` from a postfix message tail.

    ``angle=True`` unwraps ``key=<value>`` (sender/recipient style —
    null sender ``from=<>`` yields the empty string, matching the
    reference's null-sender rule lib/postfix-doc.js:216).
    Returns NULL (not '') when the key is absent so merge rules can
    distinguish "absent" from "empty".
    """
    if angle:
        pat = rf"(?:^|[,\s]){key}=<([^>]*)>"
    else:
        pat = rf"(?:^|[,\s]){key}=([^,\s]+)"
    hit = F.regexp_extract(msg, pat, 1)
    present = msg.rlike(rf"(?:^|[,\s]){key}=")
    return F.when(present, hit)


def _status(msg: Column) -> Column:
    """status=... runs to end of line (includes the '(...)' detail)."""
    pat = r"(?:^|[,\s])status=(.*)$"
    return F.when(msg.rlike(r"(?:^|[,\s])status="), F.regexp_extract(msg, pat, 1))


def parse_program_fields(prog: Column, msg: Column) -> Column:
    """Stage-2 grammar: (prog, msg) → wide nullable struct.

    One sparse struct covering every program's fields (the union of
    the reference's parsed-line keys, FIXTURES.md §2). Catalyst prunes
    unused members downstream; at scan time this is still one narrow
    projection.
    """
    qid = F.when(msg.rlike(QID_RE), F.regexp_extract(msg, QID_RE, 1))
    rest = F.regexp_extract(msg, MSG_REST_RE, 1)
    is_postfix = prog.startswith("postfix/")

    # rmilter/rspamd carry the queue id inside the free-form message:
    # "msg done: queue_id: <795941FED7>" (lib/postfix-doc.js:236-239)
    queue_id_in_msg = F.when(
        msg.rlike(r"queue.?id:\s*<[^>]+>"),
        F.regexp_extract(msg, r"queue.?id:\s*<([^>]+)>", 1),
    )

    return F.struct(
        F.when(is_postfix, qid).alias("qid"),
        _kv(rest, "from", angle=True).alias("from"),
        _kv(rest, "size").alias("size"),
        _kv(rest, "nrcpt").alias("nrcpt"),
        _kv(rest, "to", angle=True).alias("to"),
        _kv(rest, "relay").alias("relay"),
        _kv(rest, "delay").alias("delay"),
        _kv(rest, "delays").alias("delays"),
        _kv(rest, "dsn").alias("dsn"),
        _status(rest).alias("status"),
        _kv(rest, "message-id", angle=True).alias("message-id"),
        _kv(rest, "resent-message-id", angle=True).alias("resent-message-id"),
        _kv(rest, "uid").alias("uid"),
        # bounce: the whole tail is the human message
        F.when(prog == "postfix/bounce", rest).alias("message"),
        # free-form tail only — 'removed', 'released from hold',
        # 'statistics: …'. Structured key=value tails produce no msg
        # (the reference's parsed qmgr/smtp objects carry no msg key).
        F.when(
            is_postfix & (prog != "postfix/bounce") & (rest != "")
            & ~rest.rlike(r"(?:^|[,\s])[A-Za-z-]+="),
            rest,
        ).alias("msg"),
        F.when(~is_postfix, queue_id_in_msg).alias("queue_id"),
        _kv(msg, "spam_scan").alias("spam_scan"),
        _kv(msg, "virus_scan").alias("virus_scan"),
        _kv(msg, "dkim").alias("dkim"),
        _kv(msg, "score").alias("score"),
        F.when(~is_postfix, msg).alias("raw_msg"),
    )


def apply_grammar(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Full two-stage parse plan over a DataFrame with a raw-line column.

    Emits the flat parsed-line schema (all strings, FIXTURES.md §2)
    plus ``host``/``prog`` and the envelope date parts. Rows that fail
    the envelope or lack a prog are *kept* with null prog so callers
    can split a parse-reject side output (reference logs these,
    lib/postfix-doc.js:294-296).
    """
    env = parse_envelope(F.col(line_col))
    df = df.withColumn("_env", env)
    df = df.withColumn(
        "_env", F.when(F.col("_env.prog") != "", F.col("_env"))
    )  # whole-struct null on envelope miss
    fields = parse_program_fields(F.col("_env.prog"), F.col("_env.msg"))
    return df.select(
        "*",
        F.col("_env.host").alias("host"),
        F.col("_env.prog").alias("prog"),
        F.col("_env.mon").alias("_mon"),
        F.col("_env.day").alias("_day"),
        F.col("_env.hh").alias("_hh"),
        F.col("_env.mi").alias("_mi"),
        F.col("_env.ss").alias("_ss"),
        fields.alias("parsed"),
    ).drop("_env")
