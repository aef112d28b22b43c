"""Parse-stage tests mirroring the reference's readLogLine assertions
(/root/reference/test/logship.js:18-42): field extraction, string-typed
numerics, ISO date with tz offset, and the drop paths."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from log_ship_elastic_postfix_spark.operators.parse import parse_lines

NOW = dt.datetime(2015, 8, 1, 0, 0, 0)  # deterministic clock

QMGR_LINE = ("Jul 26 04:18:34 mx12 postfix/qmgr[28761]: 3mfHGL1r9gzyQP: "
             "from=<system>, size=813, nrcpt=1 (queue active)")


def _parse_one_df(spark, line):
    return spark.createDataFrame([(1, line)], "line_no long, line string")


def _parse_one(spark, line, **kw):
    return parse_lines(_parse_one_df(spark, line), now=NOW, **kw)


def test_qmgr_line_fields(spark):
    res = _parse_one(spark, QMGR_LINE)
    rows = res.parsed.collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r["qid"] == "3mfHGL1r9gzyQP"
    assert r["from"] == "system"
    assert r["size"] == "813"        # strings in flight, like the reference
    assert r["nrcpt"] == "1"
    assert r["host"] == "mx12"
    assert r["prog"] == "postfix/qmgr"
    assert r["date"] == "2015-07-26T04:18:34-07:00"  # Phoenix offset


def test_smtp_line_fields(spark):
    line = ("Jul 26 04:18:35 mx12 postfix/smtp[22030]: 3mfHGL1r9gzyQP: "
            "to=<56597@dest.example.net>, relay=10.2.2.85[10.2.2.85]:2527, "
            "delay=0.51, delays=0.44/0.01/0.05/0.01, dsn=2.0.0, "
            "status=sent (250 2.0.0 Ok: queued as 3mTESTnext01)")
    r = _parse_one(spark, line).parsed.collect()[0].asDict()
    assert r["to"] == "56597@dest.example.net"
    assert r["relay"] == "10.2.2.85[10.2.2.85]:2527"
    assert r["delay"] == "0.51"
    assert r["delays"] == "0.44/0.01/0.05/0.01"
    assert r["dsn"] == "2.0.0"
    assert r["status"] == "sent (250 2.0.0 Ok: queued as 3mTESTnext01)"


def test_null_sender_is_empty_string(spark):
    line = ("Jul  5 06:52:11 mx9 postfix/qmgr[20459]: 3mPVKl0Mhjz7sXv: "
            "from=<>, size=2666, nrcpt=2 (queue active)")
    r = _parse_one(spark, line).parsed.collect()[0].asDict()
    assert r["from"] == ""
    assert r["size"] == "2666"
    assert r["nrcpt"] == "2"


def test_cleanup_message_id(spark):
    line = ("Jul  5 06:52:11 mx9 postfix/cleanup[21893]: 3mPVKl0Mhjz7sXv: "
            "message-id=<E1ZB06G@web.example.net>")
    r = _parse_one(spark, line).parsed.collect()[0].asDict()
    assert r["message-id"] == "E1ZB06G@web.example.net"


def test_removed_msg(spark):
    line = "Jul 26 04:18:40 mx12 postfix/qmgr[28761]: 3mfHGL1r9gzyQP: removed"
    r = _parse_one(spark, line).parsed.collect()[0].asDict()
    assert r["msg"] == "removed"
    assert r["status"] is None


def test_rspamd_queue_id_hoist(spark):
    line = ("Jul 26 04:18:30 mx12 rspamd[1234]: rspamd_message_parse: "
            "loaded message; queue-id: <795941FED7>; score=4.50")
    r = _parse_one(spark, line).parsed.collect()[0].asDict()
    assert r["qid"] == "795941FED7"
    assert r["score"] == "4.50"


def test_prog_prefilter_drops_spamd(spark):
    line = ("Jul 29 18:10:56 mx1 spamd[16960]: spamd: identified spam "
            "(9.3/5.0) for nagios:1210 in 0.9 seconds, 5 bytes")
    res = _parse_one(spark, line)
    assert res.parsed.count() == 0
    rej = res.rejects.collect()
    assert len(rej) == 1 and rej[0]["reject_reason"] == "prog_filtered"


def test_envelope_miss_drops_garbage(spark):
    res = _parse_one(spark, "Jul 30 00:10:11 imac27 madeup: Gobbely Gook")
    rej = res.rejects.collect()
    assert len(rej) == 1 and rej[0]["reject_reason"] == "envelope_miss"


def test_year_inference_steps_back(spark):
    # with now = Jan 15 2015, a Dec 26 date is ~345d in the future —
    # >6×30d → previous year (reference lib/postfix-doc.js:49-53)
    df = _parse_one_df(spark, "Dec 26 04:18:34 mx12 postfix/qmgr[28761]: 3mfHGL1r9gzyQP: removed")
    r = parse_lines(df, now=dt.datetime(2015, 1, 15)).parsed.collect()[0]
    assert r["date"].startswith("2014-12-26T04:18:34")
    # while a date under the 6×30d slack keeps the current year:
    # now = Aug 2015 → Dec 26 is 147d ahead → stays 2015
    r2 = _parse_one(spark, "Dec 26 04:18:34 mx12 postfix/qmgr[28761]: 3mfHGL1r9gzyQP: removed").parsed.collect()[0]
    assert r2["date"].startswith("2015-12-26T04:18:34")


def test_timezone_offset_dst(spark):
    # America/New_York: EDT (-04:00) in July, EST (-05:00) in January
    july = "Jul 26 04:18:34 mx12 postfix/qmgr[28761]: 3mfHGL1r9gzyQP: removed"
    jan = "Jan 26 04:18:34 mx12 postfix/qmgr[28761]: 3mfHGL1r9gzyQP: removed"
    rj = _parse_one(spark, july, tz="America/New_York").parsed.collect()[0]
    rn = _parse_one(spark, jan, tz="America/New_York").parsed.collect()[0]
    assert rj["date"].endswith("-04:00")
    assert rn["date"].endswith("-05:00")
