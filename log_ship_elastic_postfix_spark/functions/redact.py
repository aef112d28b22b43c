"""PII redaction + deterministic corpus splitting — two more ops every
large-scale training-data pipeline runs before anything ships to a
trainer.

Both are pure Catalyst expressions (JVM, codegen, no Python) built on
regex syntax common to Java regex and RE2 (``\\d``, ``\\b``, explicit
character classes — no lookbehind, no backreferences), so an external
SQL engine can restate the exact rule for differential checking.

Redaction policy (the common-crawl-pipeline subset; each rule is
independently testable and counted so a pipeline can report per-rule
hit rates the way the parse stage reports reject reasons):

  1. email addresses            → ``<EMAIL>``
  2. IPv4 addresses             → ``<IP>``
  3. 13-19 digit runs (PAN-ish) → ``<NUM>``

Order matters and is part of the contract: emails first (their local
parts may contain digit runs), then IPs (dot-separated short digit
groups can never overlap a 13+ digit run), then long digit runs.

Deterministic splitting: train/heldout assignment must be a pure
function of the document id — re-runs, backfills and multi-team reads
all agree with no coordination, and changing corpus size never
reshuffles prior assignments (the property RNG-based sampling lacks).
The rule is an md5-prefix threshold: 2 hex chars = 256 buckets, so the
achievable fractions are k/256 (documented; at trainer scale nobody
asks for finer than ~0.4 %).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
LONGNUM_RE = r"\b\d{13,19}\b"

_RULES = ((EMAIL_RE, "<EMAIL>", "n_emails"),
          (IPV4_RE, "<IP>", "n_ips"),
          (LONGNUM_RE, "<NUM>", "n_longnums"))


def redact_pii(text: Column) -> Column:
    """text → struct(text_redacted, n_emails, n_ips, n_longnums).

    Counts are taken BEFORE each replacement, on the text as the rule
    sees it (i.e. after the previous rules ran) — the counts therefore
    sum to the number of placeholders inserted, exactly."""
    fields = []
    cur = text
    for pattern, token, name in _RULES:
        fields.append(F.regexp_count(cur, F.lit(pattern)).alias(name))
        cur = F.regexp_replace(cur, pattern, token)
    return F.struct(cur.alias("text_redacted"), *fields)


def split_bucket(id_col: Column) -> Column:
    """Stable 256-bucket assignment: the first md5 hex byte of the id
    rendered as a string. Pure function of the id — no RNG, no seed
    state, identical in any engine with md5."""
    return F.substring(F.md5(id_col.cast("string")), 1, 2)


def split_assign(id_col: Column, train_frac: float = 0.8) -> Column:
    """'train' / 'heldout' with P(train) = floor(train_frac·256)/256
    (floor, not round: 0.8 → 204 buckets → threshold 'cc', so the
    published rule "bucket < hex(floor(frac·256))" is exact and an
    external engine restating it agrees on EVERY bucket — a round()
    here once produced 'cd' while the oracle said 'cc', a mismatch
    invisible until a corpus contains a bucket-'cc' id).

    Lexicographic compare of the 2-hex-char bucket against the
    threshold prefix — both sides lowercase hex, so the rule is a
    plain string inequality any SQL engine evaluates identically.

    The endpoints are special-cased, not compared: ``k >= 256``
    (frac = 1.0) would format as the THREE-char string ``"100"``,
    and ``"ff" < "100"`` is lexicographically False — the string
    inequality silently sent ~93 % of docs to heldout when 100 %
    train was requested. ``k <= 0`` is the symmetric degenerate
    (compare against ``"00"`` happens to work, but the constant is
    clearer and engine-independent). For 1 ≤ k ≤ 255 both sides are
    exactly 2 chars and the inequality is total and correct —
    pinned by the frac-grid property test in test_round5.py."""
    k = max(0, min(256, int(train_frac * 256)))
    if k >= 256:
        return F.lit("train")
    if k <= 0:
        return F.lit("heldout")
    threshold = format(k, "02x")
    return F.when(split_bucket(id_col) < F.lit(threshold),
                  F.lit("train")).otherwise(F.lit("heldout"))
