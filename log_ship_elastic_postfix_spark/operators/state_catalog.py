"""Catalog-table state backend: the real ``MERGE INTO`` path.

:class:`~.state.StateStore` (parquet + dynamic partition overwrite)
*simulates* row-level MERGE faithfully in-sandbox; on a cluster with a
MERGE-capable v2 catalog (Iceberg, Delta) the honest implementation is
one SQL statement per batch. This module is that implementation — the
backend switch the round-3 review flagged as "still unwritten code".

Differences from the parquet simulation, all inherent to real MERGE:

- ``detect_noop`` is per-ROW (``WHEN MATCHED AND <content changed>``)
  — exactly the reference's ``detect_noop: true`` bulk option
  (/root/reference/lib/logship.js:370) — instead of the per-partition
  approximation dynamic overwrite forces.
- partition migration needs no cleanup: MERGE matches on the key and
  updates in place; the engine rewrites only files containing matches.
- compaction is the catalog's own maintenance procedure
  (``rewrite_data_files``), not a directory swap.

The SQL builders are pure functions so the statement shape is unit-
tested in this container (which ships no Iceberg/Delta jars); the
execution path is the same two calls on any real cluster:
``ensure(spark, template_df)`` once, ``upsert(spark, batch)`` per
batch. Nothing else in the pipeline changes — ``run_batch`` takes
either store (duck-typed: exists/preflight/read/lookup/upsert).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BATCH_VIEW = "_log_ship_incoming_batch"


def _qcols(cols: Sequence[str], alias: str) -> str:
    """Qualified, sorted column list — the canonical content-hash
    operand order (matches StateStore._doc_hash: sorted columns)."""
    return ", ".join(f"{alias}.`{c}`" for c in sorted(cols))


def merge_sql(table: str, cols: Sequence[str], *,
              dates: Optional[Sequence[str]] = None,
              detect_noop: bool = True,
              source_view: str = _BATCH_VIEW) -> str:
    """Build the per-batch MERGE statement.

    - ``ON`` matches the doc key (qid) AND prunes target partitions to
      the batch's route_dates (the uniqYMD scoping, same predicate the
      parquet backend pushes into its scan) — an Iceberg MERGE uses it
      to skip non-matching partitions entirely.
    - ``detect_noop`` guards the UPDATE with a canonical content-hash
      inequality, so byte-identical re-deliveries rewrite no files
      (idempotent replay, per row).
    """
    on = "t.`qid` = s.`qid`"
    if dates:
        quoted = ", ".join("'" + d.replace("'", "''") + "'"
                           for d in dates)
        on += f" AND t.`route_date` IN ({quoted})"
    update_guard = ""
    if detect_noop:
        update_guard = (
            " AND xxhash64(to_json(struct(" + _qcols(cols, "t")
            + "))) != xxhash64(to_json(struct(" + _qcols(cols, "s")
            + ")))")
    return (
        f"MERGE INTO {table} t\n"
        f"USING {source_view} s\n"
        f"ON {on}\n"
        f"WHEN MATCHED{update_guard} THEN UPDATE SET *\n"
        f"WHEN NOT MATCHED THEN INSERT *"
    )


def create_table_sql(table: str, *, using: str = "iceberg",
                     source_view: str = _BATCH_VIEW) -> str:
    """CTAS-shaped DDL: schema from the first batch, partition layout
    identical to the parquet backend's directory scheme."""
    return (
        f"CREATE TABLE IF NOT EXISTS {table}\n"
        f"USING {using}\n"
        f"PARTITIONED BY (`sink`, `route_date`)\n"
        f"AS SELECT * FROM {source_view} LIMIT 0"
    )


def compact_sql(table: str) -> str:
    """Iceberg maintenance procedure — the OPTIMIZE analog the parquet
    backend implements as a directory swap. ``table`` must be a
    catalog-qualified name (catalog.db.tbl)."""
    catalog, _, rest = table.partition(".")
    return f"CALL {catalog}.system.rewrite_data_files('{rest}')"


class CatalogStateStore:
    """Drop-in for :class:`~.state.StateStore` over a MERGE-capable
    catalog table. Same duck-typed surface the pipeline uses:
    ``exists / preflight / read / lookup / upsert / compact``."""

    def __init__(self, table: str, *, using: str = "iceberg"):
        self.table = table
        self.using = using

    def exists(self, spark: SparkSession) -> bool:
        return bool(spark.catalog.tableExists(self.table))

    def preflight(self, spark: SparkSession) -> None:
        """Sink availability gate (the ES-ping analog): the catalog
        must resolve and, if the table exists, a metadata-only read
        must succeed — before any parse work is spent."""
        try:
            if self.exists(spark):
                spark.table(self.table).limit(0).collect()
        except Exception as exc:  # noqa: BLE001 — any failure gates
            raise PermissionError(
                f"catalog state table {self.table!r} failed preflight: "
                f"{exc}") from exc

    def ensure(self, spark: SparkSession, template: DataFrame) -> None:
        """Create the table from the first batch's schema if absent."""
        if not self.exists(spark):
            template.limit(0).createOrReplaceTempView(_BATCH_VIEW)
            spark.sql(create_table_sql(self.table, using=self.using))

    def read(self, spark: SparkSession) -> Optional[DataFrame]:
        if not self.exists(spark):
            return None
        return spark.table(self.table)

    def lookup(self, spark: SparkSession, keys: DataFrame,
               dates: Optional[list[str]] = None) -> Optional[DataFrame]:
        state = self.read(spark)
        if state is None:
            return None
        if dates:
            state = state.filter(F.col("route_date").isin(dates))
        return state.join(F.broadcast(keys.select("qid").distinct()),
                          "qid", "inner")

    def upsert(self, spark: SparkSession, incoming: DataFrame,
               detect_noop: bool = True) -> bool:
        """Row-level MERGE of the batch. Returns True (the engine's
        snapshot metadata, not a pre-scan, says whether rows changed —
        a no-op MERGE commits an empty snapshot)."""
        self.ensure(spark, incoming)
        dates = [r["route_date"] for r in
                 incoming.select("route_date").distinct().collect()]
        incoming.createOrReplaceTempView(_BATCH_VIEW)
        spark.sql(merge_sql(self.table, incoming.columns, dates=dates,
                            detect_noop=detect_noop))
        return True

    def compact(self, spark: SparkSession) -> bool:
        if not self.exists(spark):
            return False
        spark.sql(compact_sql(self.table))
        return True
