"""Deterministic synthetic ``pages`` table generator.

Input shape per BASELINE.json input_hint:
``pages(url string, warc_ts timestamp, html binary, text string,
lang string)`` — Common-Crawl-style rows whose ``html`` embeds one
syslog-style log line each (the raw-payload analog of the reference's
/root/reference/test/mail.log corpus), so the parse→assemble pipeline
has real work to do at any scale.

Fully distributed and seedless-deterministic: everything is a pure
Catalyst expression over ``spark.range`` — no driver-side row lists, no
wall clock, no RNG state. Generating 10⁹ rows is the same code as 10³.

Each url plays the reference's queue-id role and follows one of ten
message-lifecycle scenarios (delivery, null-sender+duplicate, pickup,
bounce, postsuper, rspamd, reject lines, expired, still-open, scache),
covering every merge rule and drop path in SURVEY.md §2.2/§2.4.
Hot-key skew is planted: the first ``n_hot`` urls get ``hot_lines``
smtp delivery attempts each (high-volume relay analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------- text
_VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu",
]
_LANGS = ["en", "de", "fr", "es", "zh"]

# one lifecycle template per scenario; line templates reference
# %1$s=qid %2$s=sender %3$s=rcpt %4$s=relay %5$s=msgid
_SCENARIOS: list[list[tuple[str, str]]] = [
    [  # 0: full delivery
        ("postfix/cleanup", "%1$s: message-id=<%5$s>"),
        ("postfix/qmgr", "%1$s: from=<%2$s>, size=2666, nrcpt=2 (queue active)"),
        ("postfix/smtp", "%1$s: to=<%3$s>, relay=%4$s, delay=0.51, delays=0.44/0.01/0.05/0.01, dsn=2.0.0, status=sent (250 2.0.0 Ok: queued as Abc123)"),
        ("postfix/qmgr", "%1$s: removed"),
    ],
    [  # 1: null sender + exact duplicate smtp line
        ("postfix/qmgr", "%1$s: from=<>, size=813, nrcpt=1 (queue active)"),
        ("postfix/smtp", "%1$s: to=<%3$s>, relay=%4$s, delay=0.53, delays=0.13/0/0.23/0.16, dsn=2.0.0, status=sent (250 Queued!)"),
        ("postfix/smtp", "%1$s: to=<%3$s>, relay=%4$s, delay=0.53, delays=0.13/0/0.23/0.16, dsn=2.0.0, status=sent (250 Queued!)"),
        ("postfix/qmgr", "%1$s: removed"),
    ],
    [  # 2: pickup + local
        ("postfix/pickup", "%1$s: uid=1206 from=<%2$s>"),
        ("postfix/qmgr", "%1$s: from=<%2$s>, size=451, nrcpt=1 (queue active)"),
        ("postfix/local", "%1$s: to=<%3$s>, relay=local, dsn=2.0.0, status=sent (delivered to maildir)"),
        ("postfix/qmgr", "%1$s: removed"),
    ],
    [  # 3: bounce + error
        ("postfix/qmgr", "%1$s: from=<%2$s>, size=1999, nrcpt=1 (queue active)"),
        ("postfix/bounce", "%1$s: sender non-delivery notification: Bn40tx2Qz"),
        ("postfix/error", "%1$s: to=<%3$s>, relay=none, delay=34093, delays=34093/0.07/0/0.19, dsn=4.4.1, status=deferred (connection timed out)"),
        ("postfix/qmgr", "%1$s: removed"),
    ],
    [  # 4: postsuper hold/release
        ("postfix/qmgr", "%1$s: from=<%2$s>, size=720, nrcpt=1 (queue active)"),
        ("postfix/postsuper", "%1$s: released from hold"),
        ("postfix/postsuper", "%1$s: removed"),
    ],
    [  # 5: rspamd scan then delivery
        ("rspamd", "rspamd_message_parse: loaded message; queue-id: <%1$s>; score=4.50"),
        ("postfix/qmgr", "%1$s: from=<%2$s>, size=3120, nrcpt=1 (queue active)"),
        ("postfix/smtp", "%1$s: to=<%3$s>, relay=%4$s, delay=1.02, delays=0.5/0.1/0.3/0.12, dsn=2.0.0, status=sent (250 ok)"),
        ("postfix/qmgr", "%1$s: removed"),
    ],
    [  # 6: reject lines interleaved (prog filter + envelope miss)
        ("spamd", "spamd: identified spam (9.3/5.0) for nagios:1209 in 0.8 seconds, 5 bytes."),
        ("__garbage__", "Gobbely Gook"),
        ("postfix/qmgr", "%1$s: from=<%2$s>, size=100, nrcpt=1 (queue active)"),
        ("postfix/qmgr", "%1$s: removed"),
    ],
    [  # 7: expired, returned to sender
        ("postfix/qmgr", "%1$s: from=<%2$s>, size=222, nrcpt=1 (queue active)"),
        ("postfix/qmgr", "%1$s: from=<%2$s>, status=expired, returned to sender"),
        ("postfix/qmgr", "%1$s: removed"),
    ],
    [  # 8: still open (no removal → isFinal=false, deferred)
        ("postfix/cleanup", "%1$s: message-id=<%5$s>"),
        ("postfix/qmgr", "%1$s: from=<%2$s>, size=5500, nrcpt=3 (queue active)"),
        ("postfix/smtp", "%1$s: to=<%3$s>, relay=%4$s, delay=300, delays=299/0.5/0.2/0.3, dsn=4.0.0, status=deferred (lost connection)"),
    ],
    [  # 9: scache statistics (silent drop path) + delivery
        ("postfix/scache", "statistics: start interval Jul 26 04:00:00"),
        ("postfix/qmgr", "%1$s: from=<%2$s>, size=640, nrcpt=1 (queue active)"),
        ("postfix/qmgr", "%1$s: removed"),
    ],
]

_HOT_SMTP = ("postfix/smtp", "%1$s: to=<bulk%6$d@list.example.net>, relay=%4$s, delay=0.9, delays=0.4/0.1/0.2/0.2, dsn=2.0.0, status=sent (250 ok %6$d)")


def _scenario_sql_arrays() -> tuple[str, str]:
    """SQL array-of-array literals for (prog, template) per scenario."""
    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"
    progs = ",".join("array(" + ",".join(q(p) for p, _ in sc) + ")" for sc in _SCENARIOS)
    tmpls = ",".join("array(" + ",".join(q(t) for _, t in sc) + ")" for sc in _SCENARIOS)
    return f"array({progs})", f"array({tmpls})"


def generate_pages(
    spark: SparkSession,
    n_urls: int,
    *,
    n_hot: int = 0,
    hot_lines: int = 512,
    n_partitions: int = 32,
) -> DataFrame:
    """Build the deterministic pages table: one row per log line.

    ``n_hot`` urls additionally receive ``hot_lines`` distinct smtp
    delivery lines each — the planted hot-key skew from FIXTURES.md §5.
    """
    progs_sql, tmpls_sql = _scenario_sql_arrays()
    vocab_sql = "array(" + ",".join(f"'{w}'" for w in _VOCAB) + ")"
    langs_sql = "array(" + ",".join(f"'{l}'" for l in _LANGS) + ")"

    u = spark.range(0, n_urls, 1, n_partitions).withColumnRenamed("id", "uidx")
    u = u.withColumn("scen", (F.col("uidx") % len(_SCENARIOS)).cast("int"))
    u = u.withColumn("is_hot", F.col("uidx") < F.lit(n_hot))
    u = u.withColumn(
        "n_lines",
        F.expr(f"size(element_at({progs_sql}, scen + 1))")
        + F.when(F.col("is_hot"), F.lit(hot_lines)).otherwise(F.lit(0)),
    )
    rows = u.select(
        "*", F.explode(F.sequence(F.lit(0), F.col("n_lines") - 1)).alias("li"))

    # base lifecycle line vs extra hot-key smtp lines
    base_n = F.expr(f"size(element_at({progs_sql}, scen + 1))")
    in_base = F.col("li") < base_n
    prog = F.when(in_base, F.expr(f"element_at(element_at({progs_sql}, scen + 1), li + 1)")).otherwise(F.lit(_HOT_SMTP[0]))
    tmpl = F.when(in_base, F.expr(f"element_at(element_at({tmpls_sql}, scen + 1), li + 1)")).otherwise(F.lit(_HOT_SMTP[1]))

    # deterministic identifiers
    qid = F.concat(F.lit("3"), F.upper(F.conv(F.col("uidx").cast("string"), 10, 36)), F.lit("zXy"))
    sender = F.format_string("sender%d@origin.example.com", (F.col("uidx") % 97).cast("int"))
    rcpt = F.format_string("rcpt%d@dest.example.net", (F.col("uidx") % 53).cast("int"))
    relay = F.format_string("10.2.2.%d[10.2.2.%d]:2527", (F.col("uidx") % 7 + 1).cast("int"), (F.col("uidx") % 7 + 1).cast("int"))
    msgid = F.format_string("M%d@anc-dev-web1.example.net", F.col("uidx"))
    host = F.when(F.col("is_hot"), F.lit("mx1")).otherwise(
        F.format_string("mx%d", (F.col("uidx") % 8 + 1).cast("int")))

    # syslog timestamp: Jul {24+uidx%3} 04:{mm}:{ss}; strictly ordered
    # within a url by line index (li drives seconds→minutes carry).
    # Scenario 1's duplicate smtp line (li=2) reuses li=1's timestamp so
    # the two lines are byte-identical → exercises exact-dup suppression.
    eff_li = F.when((F.col("scen") == 1) & (F.col("li") == 2),
                    F.lit(1)).otherwise(F.col("li"))
    tot = (F.col("uidx") * 7 + eff_li).cast("int")
    day = (F.lit(24) + F.col("uidx") % 3).cast("int")
    hh = (F.lit(4) + (tot % 43200) / 3600).cast("int")
    mi = ((tot % 3600) / 60).cast("int")
    ss = (tot % 60).cast("int")
    stamp = F.format_string("Jul %2d %02d:%02d:%02d", day, hh, mi, ss)

    msg = F.expr(
        "format_string(tmpl, qid, sender, rcpt, relay, msgid, int(li))")
    line = F.when(
        F.col("prog") == "__garbage__",
        F.concat(F.col("stamp"), F.lit(" "), F.col("host"), F.lit(" madeup: "), F.col("msg")),
    ).otherwise(
        F.format_string("%s %s %s[%d]: %s", F.col("stamp"), F.col("host"),
                        F.col("prog"), (F.col("uidx") % 30000 + 100).cast("int"), F.col("msg")),
    )

    # page text: deterministic vocab sample; urls with uidx%17==1 reuse
    # the previous url's text verbatim (exact-dup cluster for dedup ops)
    text_key = F.when((F.col("uidx") % 17 == 1) & (F.col("uidx") > 0),
                      F.col("uidx") - 1).otherwise(F.col("uidx"))
    n_words = (text_key % 20 + 10).cast("int")
    text = F.expr(
        f"array_join(transform(sequence(0, int(tkey % 20 + 10) - 1), "
        f"i -> element_at({vocab_sql}, int((tkey * 31 + i * 7) % 26) + 1)), ' ')"
    )

    lang = F.expr(f"element_at({langs_sql}, int(uidx % 5) + 1)")
    url = F.format_string("https://crawl.example.org/%d/page-%d.html",
                          (F.col("uidx") % 1000).cast("int"), F.col("uidx"))

    # warc_ts: fixed epoch + per-line offset (no wall clock)
    warc_ts = F.to_timestamp(F.format_string(
        "2024-07-%02d %02d:%02d:%02d", day, hh, mi, ss))

    staged = rows.select(
        F.col("uidx"), F.col("li"), F.col("scen"),
        prog.alias("prog"), tmpl.alias("tmpl"), qid.alias("qid"),
        sender.alias("sender"), rcpt.alias("rcpt"), relay.alias("relay"),
        msgid.alias("msgid"), host.alias("host"), stamp.alias("stamp"),
        text_key.alias("tkey"), day.alias("day"), hh.alias("hh"),
        mi.alias("mi"), ss.alias("ss"),
    ).withColumn("msg", msg).withColumn("line", line)

    html = F.concat(
        F.lit("<!--LOG["), F.col("line"), F.lit("]GOL--><html><body><p>"),
        F.col("text"), F.lit("</p></body></html>"),
    ).cast("binary")

    return (
        staged
        .withColumn("text", text)
        .withColumn("url", url)
        .withColumn("warc_ts", warc_ts)
        .withColumn("lang", lang)
        .withColumn("html", html)
        .select("url", "warc_ts", "html", "text", "lang")
    )


def lang_dim(spark: SparkSession) -> DataFrame:
    rows = [
        ("en", "English", "germanic"), ("de", "German", "germanic"),
        ("fr", "French", "romance"), ("es", "Spanish", "romance"),
        ("zh", "Chinese", "sinitic"),
    ]
    return spark.createDataFrame(rows, "lang string, lang_name string, family string")


def host_dim(spark: SparkSession) -> DataFrame:
    rows = [(f"mx{i}", "us-west" if i <= 4 else "eu-central",
             "edge" if i % 2 else "core") for i in range(1, 9)]
    return spark.createDataFrame(rows, "host string, region string, tier string")


def golden_mail_log(spark: SparkSession) -> DataFrame:
    """The 6-line golden corpus, shaped like the reference's
    test/mail.log (1 prog-filtered, 1 envelope miss, cleanup + qmgr +
    smtp for one qid, 1 empty) but with this repo's own synthetic
    values. Expected: 6 in → 3 parsed → 1 doc with 2 events."""
    qid = "3mTESTqid01"
    lines = [
        "Jul  5 06:52:01 mx9 spamd[11526]: spamd: identified spam (9.3/5.0) for nagios:1209 in 0.8 seconds, 5 bytes.",
        f"Jul  5 06:52:11 mx9 postfix/cleanup[21893]: {qid}: message-id=<G1@web.example.net>",
        f"Jul  5 06:52:11 mx9 postfix/qmgr[20459]: {qid}: from=<>, size=2666, nrcpt=2 (queue active)",
        f"Jul  5 06:52:11 mx9 postfix/smtp[22030]: {qid}: to=<56597@dest.example.net>, relay=10.2.2.85[10.2.2.85]:2527, delay=0.51, delays=0.44/0.01/0.05/0.01, dsn=2.0.0, status=sent (250 2.0.0 Ok: queued as 3mTESTnext01)",
        "Jul 30 00:10:11 imac27 madeup: Gobbely Gook",
        "",
    ]
    return spark.createDataFrame(
        [(i + 1, l) for i, l in enumerate(lines)], "line_no long, line string")
