"""Sequence packing: assign documents to fixed-token-budget training
sequences — the step between a cleaned corpus and a trainer's sampler.

Rule (deterministic, SQL-restatable, and the standard scale shape):

- documents are sharded by ``id % n_shards`` (any deterministic shard
  key works; modulo keeps the rule restatable in plain SQL);
- within a shard, documents are taken in id order and packed
  greedily: a document's sequence is the one its FIRST token lands in
  (``seq_id = floor(cumulative_tokens_before_doc / budget)``), so a
  document may straddle its sequence's end — the trainer-side reader
  splits or pads, exactly like fixed-stride packing of a token stream.

Scale shape: one exchange on the shard key, then a per-shard ordered
window cumsum — the window never spans shards, so ``n_shards`` is the
parallelism knob and no global sort/single-partition window exists
anywhere (the classic packing-at-scale mistake). Output is one row per
document: (id, shard, n_tokens, seq_id, offset_in_seq).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.textstats import token_count


def pack_documents(df: DataFrame, *, id_col: str = "doc_id",
                   text_col: str = "text", budget: int = 1024,
                   n_shards: int = 8) -> DataFrame:
    """(id, text) → (id, shard, n_tokens, seq_id, offset_in_seq)."""
    assert budget > 0 and n_shards > 0
    d = df.select(
        F.col(id_col),
        token_count(F.col(text_col)).alias("n_tokens"),
        (F.col(id_col) % n_shards).cast("long").alias("shard"))
    w = (Window.partitionBy("shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("_s")
    d = d.select(id_col, "shard", "n_tokens", start)
    return d.select(
        id_col, "shard", "n_tokens",
        F.floor(F.col("_s") / budget).cast("long").alias("seq_id"),
        F.pmod(F.col("_s"), F.lit(budget)).cast("long")
        .alias("offset_in_seq"))


def sequence_stats(packed: DataFrame) -> DataFrame:
    """Per-(shard, seq_id) rollup: docs and tokens per sequence —
    the packing-efficiency report (partial+final agg, one exchange)."""
    return (packed.groupBy("shard", "seq_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("n_tokens"))
            .orderBy("shard", "seq_id"))
