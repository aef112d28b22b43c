"""Streaming ingest metrics: watermarked windowed aggregation.

The batch pipeline's count metrics (route.sink_counts, the reference's
per-batch tallies — /root/reference/lib/logship.js:337-393 logs doc
counts per bulk write) have a streaming analog a production ingest
needs: rows/bytes per (event-time window, lang) computed continuously
with bounded state. Unlike the doc-assembly path (state-in-sink,
unbounded lateness — see microbatch.py), *metrics* tolerate finality,
so this is the one place a watermark is correct: a window closes when
the watermark (max event time − allowed lateness) passes its end, its
row is emitted exactly once (append mode), and its state is dropped —
state size is O(open windows × langs), not O(history).

Late rows inside the allowed lateness still count (the window is open);
rows later than the watermark are dropped by construction — the
documented trade against unbounded state that the doc path refuses and
the metrics path accepts.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .microbatch import stream_pages


def windowed_ingest_metrics(
    stream: DataFrame,
    *,
    ts_col: str = "warc_ts",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """pages stream → (window_start, window_end, lang, n_rows, n_bytes).

    Pure declarative plan: watermark + tumbling window + partial/final
    count/sum — Spark's streaming state store keeps one small aggregate
    row per open (window, lang); no custom state code."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("w"),
                 "lang")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.sum(F.length("html")).alias("n_bytes"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "lang", "n_rows", "n_bytes")
    )


def start_ingest_metrics_stream(
    spark: SparkSession,
    pages_path: str,
    *,
    checkpoint_dir: str,
    out_path: Optional[str] = None,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    output_mode: str = "append",
    query_name: str = "ingest_metrics",
    available_now: bool = True,
    max_files_per_trigger: int = 4,
):
    """Start the metrics query.

    ``output_mode="append"`` (production): finalized windows only,
    exactly once, to a parquet table at ``out_path`` — bounded state.
    ``output_mode="complete"`` with ``out_path=None`` (tests/dev):
    all windows so far to an in-memory table named ``query_name``.
    """
    agg = windowed_ingest_metrics(
        stream_pages(spark, pages_path,
                     max_files_per_trigger=max_files_per_trigger),
        window_duration=window_duration, watermark=watermark)
    writer = (agg.writeStream.outputMode(output_mode)
              .option("checkpointLocation", checkpoint_dir)
              .queryName(query_name))
    if out_path is not None:
        writer = writer.format("parquet").option("path", out_path)
    else:
        writer = writer.format("memory")
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
