"""Round-5 regression tests: the split_assign frac-endpoint bug, the
compact() crashed-swap recovery window, and the deterministic
committed-routing pin (VERDICT r4 #1 + both ADVICE mediums + low)."""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import functions as F

from log_ship_elastic_postfix_spark.functions import redact
from log_ship_elastic_postfix_spark.operators import route
from log_ship_elastic_postfix_spark.operators.state import StateStore


# ----------------------------------------- split_assign: frac grid
def _expected_split(doc_id: int, frac: float) -> str:
    """The PUBLISHED rule, restated independently: bucket = first md5
    hex byte of str(id); train iff bucket index < floor(frac*256)."""
    k = max(0, min(256, int(frac * 256)))
    bucket = hashlib.md5(str(doc_id).encode()).hexdigest()[:2]
    return "train" if int(bucket, 16) < k else "heldout"


def test_split_assign_frac_grid(spark):
    """Sweep the whole domain incl. both endpoints. frac=1.0 once
    produced the 3-char threshold '100' and lexicographically sent
    ~93% of docs to heldout ('ff' < '100' is False) — VERDICT r4 #1."""
    ids = list(range(600))  # >2x256 so every bucket appears w.h.p.
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    for frac in (0.0, 1 / 256, 0.5, 255 / 256, 1.0):
        got = {r["doc_id"]: r["s"] for r in df.select(
            "doc_id",
            redact.split_assign(F.col("doc_id"), frac).alias("s"))
            .collect()}
        want = {i: _expected_split(i, frac) for i in ids}
        assert got == want, f"frac={frac}"
    # endpoint totality, stated explicitly
    full = df.select(redact.split_assign(F.col("doc_id"), 1.0).alias("s"))
    assert full.filter(F.col("s") != "train").count() == 0
    none = df.select(redact.split_assign(F.col("doc_id"), 0.0).alias("s"))
    assert none.filter(F.col("s") != "heldout").count() == 0


# ------------------------------- compact(): crashed-swap recovery
def _seed_store(spark, tmp_path) -> tuple[StateStore, set]:
    store = StateStore(str(tmp_path / "state"))
    cols = ["qid", "sink", "route_date", "payload"]
    rows = [(f"q{j}", "postfix-orphan", "2024-07-01", f"v{j}")
            for j in range(6)]
    assert store.upsert(spark, spark.createDataFrame(rows, cols))
    return store, {tuple(r) for r in store.read(spark).collect()}


def test_compact_crash_between_renames_recovers_from_tmp(spark, tmp_path):
    """Crash window: base renamed to __compact_old, __compact_tmp (the
    complete compacted copy) not yet swapped in. read()/exists() must
    recover instead of reporting 'no state' (ADVICE medium)."""
    store, before = _seed_store(spark, tmp_path)
    base = str(tmp_path / "state")
    # the compacted tmp copy is complete before the first rename, so
    # a byte-copy of base is a faithful stand-in for it
    shutil.copytree(base, base + "__compact_tmp")
    os.rename(base, base + "__compact_old")
    assert not os.path.exists(base)

    assert store.exists(spark), "recovery must surface the survivor"
    assert os.path.exists(base)
    assert not os.path.exists(base + "__compact_old"), (
        "old copy is deleted only AFTER base is restored")
    assert {tuple(r) for r in store.read(spark).collect()} == before


def test_compact_crash_before_swap_recovers_from_old(spark, tmp_path):
    """Crash window: base moved aside and tmp already gone/never
    written — the pre-compaction copy under __compact_old is the only
    copy and must be promoted back, never deleted."""
    store, before = _seed_store(spark, tmp_path)
    base = str(tmp_path / "state")
    os.rename(base, base + "__compact_old")

    assert store.read(spark) is not None
    assert {tuple(r) for r in store.read(spark).collect()} == before
    assert not os.path.exists(base + "__compact_old")


def test_compact_after_crash_recovery_roundtrip(spark, tmp_path):
    """A compact() issued on a crashed store first heals the swap,
    then compacts normally — content identical, siblings cleaned."""
    store, before = _seed_store(spark, tmp_path)
    base = str(tmp_path / "state")
    shutil.copytree(base, base + "__compact_tmp")
    os.rename(base, base + "__compact_old")

    assert store.compact(spark)
    assert {tuple(r) for r in store.read(spark).collect()} == before
    assert not os.path.exists(base + "__compact_tmp")
    assert not os.path.exists(base + "__compact_old")


def test_exists_false_on_truly_empty_store(spark, tmp_path):
    """Recovery must not invent state where none ever existed."""
    store = StateStore(str(tmp_path / "nothing"))
    assert not store.exists(spark)
    assert store.read(spark) is None


# ----------------------- pin_committed_routing: deterministic pick
def test_pin_committed_routing_deterministic(spark):
    """A qid committed under two (sink, route_date) pairs (the
    documented cross-date scoping gap) must pin to the SAME pair on
    every run — max(route_date, sink), not dropDuplicates' arbitrary
    survivor (ADVICE low)."""
    routed = spark.createDataFrame(
        [("q1", "postfix-parent", "2024-07-09", "x")],
        "qid string, sink string, route_date string, payload string")
    committed_rows = [
        ("q1", "postfix-orphan", "2024-07-01"),
        ("q1", "postfix-parent", "2024-07-03"),
        ("q1", "postfix-orphan", "2024-07-03"),
    ]
    import itertools
    seen = set()
    for perm in itertools.permutations(committed_rows):
        committed = spark.createDataFrame(
            list(perm), "qid string, sink string, route_date string")
        got = route.pin_committed_routing(routed, committed).collect()
        assert len(got) == 1
        seen.add((got[0]["sink"], got[0]["route_date"]))
    # one deterministic answer across all input orders: the max
    # (route_date, sink) committed pair
    assert seen == {("postfix-parent", "2024-07-03")}
