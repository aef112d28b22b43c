"""HTML payload handling for the pages table.

The graft's raw payload is ``html:binary`` (the raw-log-line analog);
two extractions run against it, both as JVM-side regexp over a single
decode — no Python in the hot path:

- :func:`extract_log_line` — the embedded syslog line (the parse input)
- :func:`extract_text` — the page text; the per-row invariant vs the
  reference is **byte-identical extracted text per url** (BASELINE.json
  input_hint), asserted in tests against the table's ``text`` column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_LOG_RE = r"<!--LOG\[(.*?)\]GOL-->"
_TEXT_RE = r"<p>(.*?)</p>"


def decode_html(html: Column) -> Column:
    return html.cast("string")


def extract_log_line(html: Column) -> Column:
    return F.regexp_extract(decode_html(html), _LOG_RE, 1)


def extract_text(html: Column) -> Column:
    """Strip markup → text. Byte-identical to the stored ``text``
    column by construction; the invariant test catches drift in either
    the generator or the extractor."""
    return F.regexp_extract(decode_html(html), _TEXT_RE, 1)
