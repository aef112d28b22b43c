"""Structured Streaming surface: incremental pages → foreachBatch.

The reference is a continuous tailer (safe-log-reader: batchLimit=1024
lines per batch, batchDelay=5 s between batches, watchDelay=10 s file
watch — /root/reference/lib/logship.js:86-120, ini:29-40). The Spark
equivalent keeps the reference's key architectural decision — **state
lives in the sink, not in executors** (unbounded lateness, no
watermark, lib/logship.js:259-312) — so the stream is just a file
source feeding ``foreachBatch`` into the *same* batch pipeline:

    readStream(maxFilesPerTrigger) → foreachBatch(run_batch + upsert)

No ``mapGroupsWithState``: per-key state in executors would grow with
the key universe (10¹² urls) and break the reference's
replay-from-sink semantics. ``checkpointLocation`` carries the source
offsets (the bookmark analog); the manifest store adds per-batch
lineage on top.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ..operators.state import StateStore
from ..plans.pipeline import PipelineConfig, run_batch
from ..sources.bookmark import BookmarkStore
from ..sources.pages import pages_to_lines


def stream_pages(
    spark: SparkSession,
    pages_path: str,
    *,
    schema=None,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Incremental file source over the pages table directory."""
    if schema is None:
        schema = spark.read.parquet(pages_path).schema
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(pages_path))


def start_pipeline_stream(
    spark: SparkSession,
    pages_path: str,
    *,
    cfg: PipelineConfig,
    state: StateStore,
    checkpoint_dir: str,
    bookmark: Optional[BookmarkStore] = None,
    trigger_seconds: Optional[int] = None,
    available_now: bool = False,
):
    """Wire the batch pipeline into foreachBatch and start the query.

    ``trigger_seconds`` is the batchDelay analog; ``available_now=True``
    drains the backlog then stops (the replay/catch-up mode).
    """
    stream = stream_pages(spark, pages_path)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if bookmark is not None and bookmark.is_processed(batch_id):
            return  # replayed batch after checkpoint recovery
        lines = pages_to_lines(batch_df)
        run_batch(spark, lines, cfg, batch_seq=batch_id, state=state,
                  bookmark=bookmark)

    writer = (stream.writeStream.foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("update"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
