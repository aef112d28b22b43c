"""Structured Streaming surface: availableNow drain over the pages
directory must converge to the same state as the batch pipeline."""

from __future__ import annotations

import pytest

from log_ship_elastic_postfix_spark import datagen
from log_ship_elastic_postfix_spark.operators.state import StateStore
from log_ship_elastic_postfix_spark.plans.pipeline import (
    PipelineConfig, run_pipeline)
from log_ship_elastic_postfix_spark.sources.bookmark import BookmarkStore
from log_ship_elastic_postfix_spark.streaming.microbatch import (
    start_pipeline_stream)


@pytest.mark.timeout(300)
def test_stream_equals_batch(spark, tmp_path):
    pages_path = str(tmp_path / "pages")
    datagen.generate_pages(spark, 30, n_partitions=3) \
        .write.mode("overwrite").parquet(pages_path)

    cfg = PipelineConfig()
    stream_state = StateStore(str(tmp_path / "stream_state"))
    bm = BookmarkStore(str(tmp_path / "stream_bm"))
    q = start_pipeline_stream(
        spark, pages_path, cfg=cfg, state=stream_state,
        checkpoint_dir=str(tmp_path / "ckpt"), bookmark=bm,
        available_now=True)
    q.awaitTermination(240)

    batch_state = StateStore(str(tmp_path / "batch_state"))
    run_pipeline(spark, spark.read.parquet(pages_path),
                 PipelineConfig(n_batches=1), state=batch_state)

    a = {r["qid"]: r.asDict(recursive=True)
         for r in stream_state.read(spark).collect()}
    b = {r["qid"]: r.asDict(recursive=True)
         for r in batch_state.read(spark).collect()}
    assert set(a) == set(b)
    for qid in b:
        assert a[qid]["n_events"] == b[qid]["n_events"], qid
        assert a[qid]["isFinal"] == b[qid]["isFinal"], qid
        assert sorted(map(str, a[qid]["events"])) == \
            sorted(map(str, b[qid]["events"])), qid
    # streaming commits left lineage manifests
    assert len(bm.processed_batches()) >= 1


@pytest.mark.timeout(300)
def test_stream_checkpoint_restart_picks_up_new_files(spark, tmp_path):
    """Kill-and-restart with the same checkpointLocation: the restarted
    query must process only files that arrived after the first drain,
    and the final state must equal a one-shot batch run over
    everything (the source-offset bookmark analog)."""
    from pyspark.sql import functions as F

    pages_path = str(tmp_path / "pages2")
    all_pages = datagen.generate_pages(spark, 40, n_partitions=2).cache()
    wave1 = all_pages.filter(F.col("url").rlike("page-[0-2]?[0-9]\\.html$"))
    wave2 = all_pages.subtract(wave1)
    assert wave1.count() > 0 and wave2.count() > 0
    wave1.write.mode("overwrite").parquet(pages_path)

    cfg = PipelineConfig()
    state = StateStore(str(tmp_path / "ckpt_state"))
    ckpt = str(tmp_path / "ckpt2")
    q = start_pipeline_stream(spark, pages_path, cfg=cfg, state=state,
                              checkpoint_dir=ckpt, available_now=True)
    q.awaitTermination(240)
    n_after_wave1 = state.read(spark).count()
    assert 0 < n_after_wave1 < 40

    # second wave lands while the query is DOWN; restart from checkpoint
    wave2.write.mode("append").parquet(pages_path)
    q2 = start_pipeline_stream(spark, pages_path, cfg=cfg, state=state,
                               checkpoint_dir=ckpt, available_now=True)
    q2.awaitTermination(240)

    batch_state = StateStore(str(tmp_path / "ckpt_batch_state"))
    run_pipeline(spark, all_pages, PipelineConfig(n_batches=1),
                 state=batch_state)
    a = {r["qid"]: r.asDict(recursive=True)
         for r in state.read(spark).collect()}
    b = {r["qid"]: r.asDict(recursive=True)
         for r in batch_state.read(spark).collect()}
    assert set(a) == set(b) and len(a) == 40
    for qid in b:
        assert a[qid]["n_events"] == b[qid]["n_events"], qid
        assert a[qid]["isFinal"] == b[qid]["isFinal"], qid


@pytest.mark.timeout(300)
def test_windowed_metrics_stream_matches_batch(spark, tmp_path):
    """Watermarked windowed ingest metrics (complete mode): the drained
    stream's per-(window, lang) counts equal the batch groupBy over the
    same table."""
    from pyspark.sql import functions as F
    from log_ship_elastic_postfix_spark.streaming.metrics import (
        start_ingest_metrics_stream, windowed_ingest_metrics)

    pages_path = str(tmp_path / "mpages")
    datagen.generate_pages(spark, 60, n_partitions=3) \
        .write.mode("overwrite").parquet(pages_path)

    q = start_ingest_metrics_stream(
        spark, pages_path, checkpoint_dir=str(tmp_path / "mckpt"),
        output_mode="complete", query_name="m_complete",
        available_now=True)
    q.awaitTermination(240)

    got = {(r["window_start"], r["lang"]): (r["n_rows"], r["n_bytes"])
           for r in spark.sql("select * from m_complete").collect()}
    pages = spark.read.parquet(pages_path)
    want = {(r["window_start"], r["lang"]): (r["n_rows"], r["n_bytes"])
            for r in (pages.groupBy(
                F.window("warc_ts", "1 hour").alias("w"), "lang")
                .agg(F.count(F.lit(1)).alias("n_rows"),
                     F.sum(F.length("html")).alias("n_bytes"))
                .select(F.col("w.start").alias("window_start"), "lang",
                        "n_rows", "n_bytes")).collect()}
    assert got == want
    assert len(got) > 1


@pytest.mark.timeout(300)
def test_windowed_metrics_append_emits_finalized_windows(spark, tmp_path):
    """Append mode + watermark: after draining, only windows whose end
    precedes the final watermark are emitted to the sink — each exactly
    once, state dropped (the bounded-state contract)."""
    from pyspark.sql import functions as F
    from log_ship_elastic_postfix_spark.streaming.metrics import (
        start_ingest_metrics_stream)

    pages_path = str(tmp_path / "apages")
    pages = datagen.generate_pages(spark, 60, n_partitions=3)
    pages.write.mode("overwrite").parquet(pages_path)
    out = str(tmp_path / "metrics_out")

    q = start_ingest_metrics_stream(
        spark, pages_path, checkpoint_dir=str(tmp_path / "ackpt"),
        out_path=out, output_mode="append", watermark="2 hours",
        available_now=True)
    q.awaitTermination(240)

    emitted = spark.read.parquet(out)
    max_ts = pages.agg(F.max("warc_ts")).collect()[0][0]
    import datetime as dt
    wm = max_ts - dt.timedelta(hours=2)
    # every emitted window is finalized (closed before the watermark)
    for r in emitted.collect():
        assert r["window_end"] <= wm, (r["window_end"], wm)
    # exactly-once: no duplicate (window, lang) rows
    n = emitted.count()
    assert n == emitted.select("window_start", "lang").distinct().count()
    # the batch truth agrees on every emitted row
    want = {(r["window_start"], r["lang"]): r["n_rows"]
            for r in (pages.groupBy(
                F.window("warc_ts", "1 hour").alias("w"), "lang")
                .agg(F.count(F.lit(1)).alias("n_rows"))
                .select(F.col("w.start").alias("window_start"), "lang",
                        "n_rows")).collect()}
    for r in emitted.collect():
        assert want[(r["window_start"], r["lang"])] == r["n_rows"]


@pytest.mark.timeout(300)
def test_dedup_ingest_stream_end_to_end(spark, tmp_path):
    """Streaming crawl ingest: cross-batch duplicates never reach the
    corpus; within-batch first-id-wins; manifests record kept/in."""
    import os as _os
    import shutil

    from log_ship_elastic_postfix_spark.streaming.ingest import (
        start_dedup_ingest_stream)

    src = str(tmp_path / "src")
    # two source files -> two micro-batches (maxFilesPerTrigger=1);
    # file 2 repeats file 1's content under new ids
    spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "alpha   TEXT")],
        "doc_id long, text string").coalesce(1) \
        .write.mode("overwrite").parquet(src + "/f1")
    spark.createDataFrame(
        [(10, "beta text"), (11, "gamma text")],
        "doc_id long, text string").coalesce(1) \
        .write.mode("append").parquet(src + "/f2")
    # single top-level dir for the file source
    flat = str(tmp_path / "flat")
    _os.makedirs(flat, exist_ok=True)
    for i, d in enumerate(("f1", "f2")):
        for f in sorted(_os.listdir(src + "/" + d)):
            if f.endswith(".parquet"):
                dst = f"{flat}/{i:03d}.parquet"
                shutil.copy(f"{src}/{d}/{f}", dst)
                # the file source orders by modification time — pin
                # it so batch 0 is deterministically f1
                _os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    from log_ship_elastic_postfix_spark.sources.bookmark import (
        BookmarkStore)
    bm = BookmarkStore(str(tmp_path / "bm"))
    q = start_dedup_ingest_stream(
        spark, flat,
        corpus_path=str(tmp_path / "corpus"),
        hash_path=str(tmp_path / "hashes"),
        bookmark=bm,
        checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(240)

    corpus = spark.read.parquet(str(tmp_path / "corpus"))
    kept = sorted(r["doc_id"] for r in corpus.collect())
    # file order is lexicographic: batch0={1,2,3}, batch1={10,11};
    # 3 dups 1 within-batch, 10 dups 2 cross-batch
    assert kept == [1, 2, 11]
    mans = [bm.read_manifest(b) for b in bm.processed_batches()]
    assert sorted(m["n_in"] for m in mans) == [2, 3]
    assert sorted(m["n_kept"] for m in mans) == [1, 2]


@pytest.mark.timeout(300)
def test_dedup_ingest_replay_windows_are_idempotent(spark, tmp_path):
    """Drive DedupIngest.process directly through every crash window:
    (a) full replay after bookmark commit is a no-op; (b) replay after
    the hash append but BEFORE the bookmark commit reproduces the
    identical corpus — the batch's own hashes must not anti-join its
    replay to empty (the silent-loss window the batch-id exclusion
    closes)."""
    from log_ship_elastic_postfix_spark.sources.bookmark import (
        BookmarkStore)
    from log_ship_elastic_postfix_spark.streaming.ingest import (
        DedupIngest)

    bm = BookmarkStore(str(tmp_path / "bm"))
    ing = DedupIngest(str(tmp_path / "corpus"),
                      str(tmp_path / "hashes"), bm)
    b0 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string")
    ing.process(b0, 0)

    def corpus_ids():
        return sorted(
            r["doc_id"] for r in
            spark.read.parquet(str(tmp_path / "corpus")).collect())

    assert corpus_ids() == [1, 2]

    # (a) committed batch replays as a no-op
    ing.process(b0, 0)
    assert corpus_ids() == [1, 2]
    assert bm.processed_batches() == [0]

    # (b) crash window: batch 1's hashes land but the bookmark commit
    # is lost -> replay must regenerate the identical corpus dir
    b1 = spark.createDataFrame(
        [(10, "beta"), (11, "gamma")], "doc_id long, text string")
    ing.process(b1, 1)
    assert corpus_ids() == [1, 2, 11]
    import os as _os
    _os.remove(bm._manifest_path(1))  # simulate lost commit
    assert not bm.is_processed(1)
    ing.process(b1, 1)  # replay with its own hashes already present
    assert corpus_ids() == [1, 2, 11]
    # and the duplicate hash rows cannot affect a later batch
    b2 = spark.createDataFrame(
        [(20, "gamma"), (21, "delta")], "doc_id long, text string")
    ing.process(b2, 2)
    assert corpus_ids() == [1, 2, 11, 21]
