"""Syslog date normalization — year inference + IANA-timezone offset
formatting, as pure Catalyst expressions.

Reference semantics (/root/reference/lib/postfix-doc.js:39-145):
syslog dates carry no year and no zone. The reference (a) assumes the
current year, stepping back one year when that lands >6×30 days in the
future; (b) formats the *literal* time components with the configured
IANA timezone's UTC offset at that wall time, e.g.
``2015-07-26T04:18:34-07:00`` (asserted /root/reference/test/logship.js:30).

"now" is an explicit parameter (never the wall clock) so every test and
replay is deterministic — the reference reads ``new Date()`` at parse
time, which makes its own tests year-dependent; we keep the rule but pin
the clock.
"""

from __future__ import annotations

import datetime as dt
from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
          "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]

# reference rule: >6 "months" where a month is exactly 30 days
# (lib/postfix-doc.js:50: 6 * 30 * 24 * 60 * 60 * 1000 ms)
_FUTURE_SLACK_SECONDS = 6 * 30 * 24 * 60 * 60


def month_number(mon: Column) -> Column:
    """'Jul' → 7 (int); null for unknown month names."""
    pairs: list[Column] = []
    for i, m in enumerate(MONTHS, start=1):
        pairs.extend([F.lit(m), F.lit(i)])
    return F.element_at(F.create_map(*pairs), mon)


def _wall_string(year: Column, mon_no: Column, day: Column,
                 hh: Column, mi: Column, ss: Column) -> Column:
    """Zero-padded 'yyyy-MM-dd HH:mm:ss' built from string components."""
    return F.concat_ws(
        " ",
        F.concat_ws("-", year.cast("string"),
                    F.lpad(mon_no.cast("string"), 2, "0"),
                    F.lpad(day, 2, "0")),
        F.concat_ws(":", F.lpad(hh, 2, "0"), F.lpad(mi, 2, "0"),
                    F.lpad(ss, 2, "0")),
    )


def tz_offset_seconds(wall: Column, tz: str) -> Column:
    """UTC offset (seconds) of IANA zone ``tz`` at local wall time ``wall``.

    ``to_utc_timestamp`` interprets its input as wall time in ``tz``;
    the difference vs interpreting the same wall time as UTC *is* the
    zone offset — DST-correct, no Python, no Intl API.
    """
    as_utc = F.to_timestamp(wall)
    real = F.to_utc_timestamp(as_utc, tz)
    return (F.unix_timestamp(as_utc) - F.unix_timestamp(real)).cast("long")


def _offset_string(offset_secs: Column) -> Column:
    sign = F.when(offset_secs < 0, F.lit("-")).otherwise(F.lit("+"))
    abs_s = F.abs(offset_secs)
    hh = F.lpad(F.floor(abs_s / 3600).cast("string"), 2, "0")
    mm = F.lpad(F.floor((abs_s % 3600) / 60).cast("string"), 2, "0")
    return F.concat(sign, hh, F.lit(":"), mm)


def normalize_syslog_date(
    mon: Column, day: Column, hh: Column, mi: Column, ss: Column,
    *, tz: str = "America/Phoenix", now: Optional[dt.datetime] = None,
) -> Column:
    """(envelope date parts) → ISO-8601 string with explicit zone offset.

    Output shape pinned by the reference: ``YYYY-MM-DDTHH:mm:ss±HH:MM``.
    Applies the current-year / minus-one-year inference against the
    supplied deterministic ``now``.
    """
    if now is None:
        now = dt.datetime.now()
    now_lit = F.lit(now.strftime("%Y-%m-%d %H:%M:%S"))
    year_now = F.lit(now.year)

    mon_no = month_number(mon)
    wall_this = _wall_string(year_now, mon_no, day, hh, mi, ss)
    too_far = (
        F.unix_timestamp(F.to_timestamp(wall_this))
        - F.unix_timestamp(F.to_timestamp(now_lit))
    ) > F.lit(_FUTURE_SLACK_SECONDS)
    year = F.when(too_far, year_now - 1).otherwise(year_now)

    wall = _wall_string(year, mon_no, day, hh, mi, ss)
    offset = _offset_string(tz_offset_seconds(wall, tz))
    return F.when(
        mon_no.isNotNull(),
        F.concat(F.regexp_replace(wall, " ", "T"), offset),
    )


def date_suffix(iso_date: Column) -> Column:
    """ISO doc date → 'YYYY-MM-DD' routing suffix.

    Reference: per-day index names ``postfix-orphan-YYYY-MM-DD``
    (/root/reference/lib/logship.js:143-161). The ISO string is already
    zero-padded, so this is a zero-cost substring — no timestamp parse,
    no session-timezone sensitivity.
    """
    return F.substring(iso_date, 1, 10)
