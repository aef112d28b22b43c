"""Pages-table source: scan + line extraction + batch planning.

The reference tails one log file in bounded batches (batchLimit=1024,
/root/reference/lib/logship.js:95-120) with a bookmark for resume. The
graft's source is a table of Common-Crawl-style pages; "a batch" is a
deterministic horizontal slice of the table (at production scale: an
Iceberg snapshot/partition set; here: a stable hash bucket of urls so
every line of a url lands in the same batch, preserving the
intra-batch fold order guarantee the reference gets from file order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.html import extract_log_line, extract_text


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def pages_to_lines(pages: DataFrame) -> DataFrame:
    """pages → raw-line DataFrame with ordering + passenger columns.

    ``line_no`` is the within-url order key (warc_ts is strictly
    increasing per url by generation); the decode+regex is JVM-side.
    Deliberately narrow — the page text does NOT ride along (every
    byte here crosses the Arrow boundary into the parse UDF and back;
    text validation has its own scan, :func:`text_invariant_violations`).
    """
    return pages.select(
        F.col("url"),
        F.col("lang"),
        F.unix_timestamp(F.col("warc_ts")).alias("line_no"),
        extract_log_line(F.col("html")).alias("line"),
    )


def text_invariant_violations(pages: DataFrame) -> DataFrame:
    """Rows whose extracted text differs from the stored ``text`` —
    the byte-identical-per-url invariant scan (BASELINE.json). Narrow,
    JVM-only; run as a data-quality gate beside the pipeline."""
    return (pages
            .withColumn("extracted_text", extract_text(F.col("html")))
            .filter(F.col("extracted_text") != F.col("text"))
            .select("url", "warc_ts", "text", "extracted_text"))


def with_batch_seq(lines: DataFrame, n_batches: int) -> DataFrame:
    """Deterministic batch assignment: all lines of a url share a batch
    (the file-order analog), spread uniformly by url hash."""
    return lines.withColumn(
        "batch_seq", F.pmod(F.xxhash64(F.col("url")), F.lit(n_batches)).cast("int"))
