"""Corpus composition report — the "dataset card" rollup every corpus
release ships with, and the per-sink count-parity idea of the
reference (/root/reference/lib/logship.js:330-335, per-index document
tallies) generalized to a multi-dimensional composition matrix.

One ROLLUP aggregation over (source, lang): per-(source, lang) cells,
per-source subtotals, and a grand total, each with exact integer
measures only (doc/token/byte counts, extrema) so an external SQL
engine restates the report bit-identically — no floating averages in
the contract (readers derive ratios from the exact sums).

Scale shape: a narrow projection computes per-doc measures
(token_count, octet_length) with zero Python, then ROLLUP plans as
ONE expand + partial+final aggregation — a single exchange keyed on
the (small) group tuple regardless of corpus size. Document text
never shuffles; the output is O(|sources| × |langs|) rows.

Rollup NULL semantics: subtotal rows null-fill the rolled-up columns,
and engines disagree on NULL sort order — so the report coalesces
group columns to the literal ``(all)`` and carries the standard SQL
``grouping_id`` bitmask, making every row non-null, unambiguous
(a real ``(all)`` value in the data cannot be confused with a
subtotal), and identically orderable in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import token_count

_ALL = "(all)"


def corpus_report(df: DataFrame, *, text_col: str = "text",
                  group_cols: tuple = ("source", "lang"),
                  ) -> DataFrame:
    """(docs) → composition matrix over ``group_cols`` with rollup
    subtotals. Columns: ``group_cols…, grouping_id, n_docs, n_tokens,
    n_bytes, max_doc_tokens, min_doc_tokens``."""
    base = df.select(
        *[F.col(c) for c in group_cols],
        token_count(F.col(text_col)).alias("_tok"),
        F.octet_length(F.col(text_col)).cast("long").alias("_bytes"))
    agg = (base.rollup(*group_cols)
           .agg(F.grouping_id().cast("long").alias("grouping_id"),
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("_tok").alias("n_tokens"),
                F.sum("_bytes").alias("n_bytes"),
                F.max("_tok").alias("max_doc_tokens"),
                F.min("_tok").alias("min_doc_tokens")))
    return agg.select(
        *[F.coalesce(F.col(c), F.lit(_ALL)).alias(c)
          for c in group_cols],
        "grouping_id", "n_docs", "n_tokens", "n_bytes",
        "max_doc_tokens", "min_doc_tokens")
