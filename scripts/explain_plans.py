#!/usr/bin/env python3
"""Print the physical plans of the pipeline stages for plan-quality
review: verifies parquet pushdown/pruning on the scan, single exchange
for the sessionizer, broadcast (not shuffle) enrich joins, and
whole-stage codegen spans over the parse expressions.

Output is committed to PLANS.md so plan regressions show up in diffs.
"""

from __future__ import annotations

import io
import os
import sys
import tempfile
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def main() -> None:
    spark = (SparkSession.builder.master("local[4]")
             .appName("explain-plans")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from log_ship_elastic_postfix_spark import datagen
    from log_ship_elastic_postfix_spark.operators import enrich, route
    from log_ship_elastic_postfix_spark.operators.assemble import assemble
    from log_ship_elastic_postfix_spark.operators.parse import parse_lines
    from log_ship_elastic_postfix_spark.plans.pipeline import PipelineConfig
    from log_ship_elastic_postfix_spark.sources.pages import (
        pages_to_lines, with_batch_seq)

    workdir = tempfile.mkdtemp(prefix="explain_")
    pages_path = os.path.join(workdir, "pages")
    datagen.generate_pages(spark, 2000, n_partitions=8) \
        .write.mode("overwrite").parquet(pages_path)

    cfg = PipelineConfig()
    pages = spark.read.parquet(pages_path)
    lines = with_batch_seq(pages_to_lines(pages), 1)

    sections: list[tuple[str, object]] = []

    # 1. scan + parse (narrow; pruned columns; codegen)
    pr = parse_lines(lines, tz=cfg.tz, now=cfg.now)
    sections.append(("parse stage (scan → envelope/grammar → filters)",
                     pr.parsed.select("qid", "host", "date", "size")))

    # 2. full pipeline to routed docs (one exchange on qid + broadcast)
    docs = assemble(pr.parsed)
    parent_map = spark.createDataFrame(
        [("3QzXy", "p1")], "qid string, parent string")
    routed = route.route_docs(enrich.with_parent(docs, parent_map))
    sections.append(("full pipeline (parse → sessionize → enrich → route)",
                     routed.select("qid", "sink", "route_date", "n_events")))

    # 3. per-sink counts (partial+final agg)
    sections.append(("sink counts", route.sink_counts(routed)))

    # 4. single-pass batch: with the grok output persisted (as
    # run_batch does when state/bookmark consumers exist), every
    # downstream frame reads InMemoryTableScan — the scan+parse of the
    # batch runs exactly once
    pr_cached = parse_lines(lines, tz=cfg.tz, now=cfg.now)
    pr_cached.all_rows.persist()
    pr_cached.all_rows.count()
    sections.append((
        "single-pass batch (persisted grok → InMemoryTableScan, "
        "one scan per batch)",
        pr_cached.parsed.select("qid").groupBy().count()))

    # 5. LSH near-dup family (localCheckpoint patched to identity so
    # the candidate joins stay visible; production truncates lineage).
    # NOTE: must patch the CONCRETE classic class — Spark 4's
    # pyspark.sql.DataFrame is an abstract facade and patching it is a
    # silent no-op (same bug fixed in tests/test_plan_quality.py).
    import pyspark.sql.classic.dataframe as _classic
    _DF = _classic.DataFrame
    orig_ckpt = _DF.localCheckpoint
    _DF.localCheckpoint = lambda self, eager=True: self  # type: ignore
    try:
        from log_ship_elastic_postfix_spark.functions import urls as uu
        from log_ship_elastic_postfix_spark.operators import dedup as dd
        docs_small = spark.createDataFrame(
            [(i, f"alpha beta gamma delta {i % 5} epsilon zeta {i % 3}")
             for i in range(50)], ["doc_id", "text"])
        sections.append((
            "minhash near-dup (sig → band/bucket exchange → capped "
            "self-join → shuffle-join verify; ids/hashes only on every "
            "exchange)",
            dd.near_duplicates_minhash(docs_small, threshold=0.5)))
        sections.append((
            "cross-doc line dedup (hash-keyed freq → verdict join → "
            "doc reassembly)",
            dd.boilerplate_line_dedup(docs_small, min_docs=2)))
        urls_small = spark.createDataFrame(
            [(i, f"http://www.site{i % 9}.com/?utm_campaign={i}")
             for i in range(50)], ["doc_id", "url"])
        sections.append((
            "url dedup (single exchange on canonical_url, "
            "partial+final min-struct agg)",
            uu.dedup_by_canonical_url(urls_small, url_col="url")))
        # round-5 additions
        from log_ship_elastic_postfix_spark.operators import (
            packing as pk, perplexity as pp)
        from log_ship_elastic_postfix_spark.functions import textstats
        bench_small = spark.createDataFrame(
            [("alpha beta gamma",)], ["text"])
        sections.append((
            "span decontamination scrub (bench hashes broadcast, "
            "id-keyed regroup; span text is payload, never a key)",
            dd.scrub_contaminated_spans(docs_small, bench_small)))
        model, unk = pp.build_unigram_model(docs_small)
        sections.append((
            "perplexity scoring (token exchange for the model build, "
            "broadcast model join, id-keyed score agg)",
            pp.perplexity_scores(docs_small, model, unk)))
        sections.append((
            "sequence packing, BPE budget (single shard exchange, "
            "per-shard window cumsum — no global window)",
            pk.pack_documents(docs_small, budget=64, n_shards=8,
                              token_counter=textstats.bpe_ish_token_count)))
    finally:
        _DF.localCheckpoint = orig_ckpt

    buf = io.StringIO()
    with redirect_stdout(buf):
        for title, df in sections:
            print(f"\n{'=' * 70}\n## {title}\n{'=' * 70}")
            df.explain("formatted")
    text = buf.getvalue()
    print(text)

    exchanges = text.count("Exchange ")
    bhj = text.count("BroadcastHashJoin")
    wsc = text.count("WholeStageCodegen")
    print(f"\n--- plan stats: exchanges={exchanges} "
          f"broadcast_joins={bhj} codegen_spans={wsc}")
    spark.stop()


if __name__ == "__main__":
    main()
