"""Routing + fan-out sinks.

Reference semantics (/root/reference/lib/logship.js:337-393): each doc
routes to a dated index — ``<parent.index>-YYYY-MM-DD`` when a parent
id is attached, else ``<index>-YYYY-MM-DD`` (the "orphan" series); the
redundant ``qid`` is dropped from the body (it is the ``_id``).

Spark design: routing is two cheap narrow columns (``sink``,
``route_date``); the write fans out via ``partitionBy(sink,
route_date)`` so each (sink, day) lands in its own directory tree —
the Iceberg-partitioned analog of per-day index names, giving the same
partition-pruned lookups the reference engineered with uniqYMD index
lists (lib/logship.js:263-279).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.dates import date_suffix

ORPHAN_SINK = "postfix-orphan"
PARENT_SINK = "postfix-parent"
REJECT_SINK = "rejects"


def route_docs(
    docs: DataFrame,
    *,
    orphan_sink: str = ORPHAN_SINK,
    parent_sink: str = PARENT_SINK,
) -> DataFrame:
    """docs (+ optional _parent) → docs + (sink, route_date)."""
    has_parent = (F.col("_parent").isNotNull()
                  if "_parent" in docs.columns else F.lit(False))
    return (
        docs
        .withColumn("sink", F.when(has_parent, F.lit(parent_sink))
                             .otherwise(F.lit(orphan_sink)))
        .withColumn("route_date", date_suffix(F.col("date")))
    )


def write_routed(routed: DataFrame, path: str, mode: str = "append",
                 typed: bool = True) -> None:
    """Fan-out partitioned write. ``qid`` stays as a column (the _id
    analog — parquet has no out-of-band doc id).

    ``typed=True`` applies the index-map-template sink typing
    (date→timestamp, delay/nrcpt→float, size→double — S7,
    /root/reference/index-map-template.json:5-18) so the terminal
    table is consumer-typed while the in-flight pipeline stays
    all-string like the reference."""
    if typed:
        from .sink_schema import apply_sink_types
        routed = apply_sink_types(routed)
    (routed.write.mode(mode)
     .partitionBy("sink", "route_date")
     .parquet(path))


def write_rejects(rejects: DataFrame, path: str, mode: str = "append") -> None:
    """Dead-letter sink for parse rejects, partitioned by reason.

    The reference only logs parse errors (emitParseError,
    lib/postfix-doc.js:294-296); a persistent reject table is the
    pipeline-grade equivalent — replayable, countable, and partition-
    pruned by reject_reason for triage queries."""
    (rejects.write.mode(mode)
     .partitionBy("reject_reason")
     .parquet(path))


def sink_counts(routed: DataFrame) -> DataFrame:
    """Per-sink routed-count parity metric (BASELINE.json), plus the
    reference's per-batch new/match tallies analog. Partial+final agg —
    no extra shuffle beyond the groupBy exchange."""
    return (routed.groupBy("sink")
            .agg(F.count(F.lit(1)).alias("doc_count"),
                 F.sum(F.col("n_events")).alias("event_count"),
                 F.sum(F.when(F.col("isFinal"), 1).otherwise(0)).alias("final_count"))
            .orderBy("sink"))
