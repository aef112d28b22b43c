#!/usr/bin/env python3
"""Per-stage wall-time profile of the pipeline at two parallelism
levels: where does the time go — JVM parse, qid shuffle + Python fold,
or the sink write? Run solo (no concurrent Spark jobs)."""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_spark, stage_pages  # noqa: E402


def profile(cpus: int, pages_path: str, workdir: str) -> dict:
    from pyspark.sql import functions as F
    from log_ship_elastic_postfix_spark.operators import route
    from log_ship_elastic_postfix_spark.operators.assemble import assemble
    from log_ship_elastic_postfix_spark.operators.parse import parse_lines
    from log_ship_elastic_postfix_spark.plans.pipeline import PipelineConfig
    from log_ship_elastic_postfix_spark.sources.pages import (
        pages_to_lines, with_batch_seq)

    spark = build_spark(cpus, shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = PipelineConfig()
    out: dict = {"cpus": cpus}

    def timed(name, fn):
        t0 = time.monotonic()
        r = fn()
        out[name] = round(time.monotonic() - t0, 2)
        return r

    # warm
    pages_w = spark.read.parquet(pages_path)
    lines_w = with_batch_seq(pages_to_lines(pages_w), 1).limit(20000)
    pr_w = parse_lines(lines_w, now=cfg.now)
    assemble(pr_w.parsed.select(
        "qid", "host", "prog", "date", "batch_seq", "line_no",
        *[F.col(f"`{c}`") for c in
          __import__("log_ship_elastic_postfix_spark.operators.parse",
                     fromlist=["PARSED_FIELDS"]).PARSED_FIELDS if c != "qid"])
    ).write.format("noop").mode("overwrite").save()

    from log_ship_elastic_postfix_spark.operators.parse import PARSED_FIELDS
    pages = spark.read.parquet(pages_path)
    lines = with_batch_seq(pages_to_lines(pages), 1)
    n_lines = timed("scan_count", lambda: lines.count())

    pr = parse_lines(lines, now=cfg.now)
    timed("parse_noop", lambda: pr.parsed.write.format("noop")
          .mode("overwrite").save())

    pruned = pr.parsed.select(
        "qid", "host", "prog", "date", "batch_seq", "line_no",
        *[F.col(f"`{c}`") for c in PARSED_FIELDS if c != "qid"])
    docs = assemble(pruned)
    timed("parse_fold_noop", lambda: docs.write.format("noop")
          .mode("overwrite").save())

    routed = route.route_docs(docs.withColumn(
        "_parent", F.lit(None).cast("string")))
    sink = os.path.join(workdir, f"profile_sink_{cpus}")
    shutil.rmtree(sink, ignore_errors=True)
    timed("full_write", lambda: route.write_routed(routed, sink))
    out["n_lines"] = n_lines
    spark.stop()
    return out


def main():
    workdir = os.environ.get("SPARK_GRAFT_WORKDIR", "/tmp/log_ship_bench")
    n_urls = int(os.environ.get("PROFILE_URLS", "600000"))
    s = build_spark(16)
    s.sparkContext.setLogLevel("ERROR")
    pages_path = stage_pages(s, n_urls, workdir, n_hot=8, hot_lines=1024)
    s.stop()
    for cpus in (8, 32):
        print(json.dumps(profile(cpus, pages_path, workdir)))


if __name__ == "__main__":
    main()
