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
