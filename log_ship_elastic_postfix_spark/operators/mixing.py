"""Corpus mixing: the two operations between a cleaned corpus and a
trainer's data loader that decide WHAT the model sees and in WHAT
order — deterministic versions of both, so re-runs, backfills and
multi-team reads agree with zero coordination (the same property
:func:`~..functions.redact.split_assign` gives splits):

1. **Weighted stratum sampling** (`weighted_sample`): corpus-mixing
   weights per stratum (domain, language, quality bucket — "keep 100%
   of wiki, 30% of common-crawl, 5% of the tail"). Keep/drop is a
   pure function of (stratum, id): an md5-prefix threshold exactly
   like the train/heldout split, but with an 8-hex-char bucket
   (16⁸ ≈ 4.3·10⁹ levels, so weights are exact to ~2.3·10⁻¹⁰ — per-
   mille mixing weights are representable where the split's 256
   buckets would round them away).

2. **Training-order shuffle** (`training_order`): a deterministic
   pseudo-random permutation — order by md5(seed:id) — sharded for
   scale: the only exchange keys on the shard, each shard orders
   independently (the trainer interleaves shards round-robin, the
   standard distributed-loader contract). Changing ``seed`` gives an
   independent permutation; same seed is bit-stable forever.

Both rules are md5-only (no engine-specific hash), so an external SQL
engine restates them verbatim — xxhash64 would be cheaper per row but
DuckDB/Trino/BigQuery don't agree on its seeding, and a mixing rule
you can't re-audit in another engine is a provenance liability.

Scale shape: `weighted_sample` is a zero-exchange narrow filter
(scan-speed, pipelined); `training_order`'s per-shard window mirrors
:mod:`.packing` — ``n_shards`` sized like there (≥ rows / 10M).
"""

from __future__ import annotations

from typing import Mapping, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_BUCKET_HEX = 8  # 16^8 levels


def _bucket(stratum: Column, id_col: Column) -> Column:
    """8-hex-char bucket of 'stratum:id' — lowercase hex, compared
    lexicographically against same-width thresholds."""
    return F.substring(
        F.md5(F.concat(stratum.cast("string"), F.lit(":"),
                       id_col.cast("string"))),
        1, _BUCKET_HEX)


def _threshold(frac: float) -> Optional[str]:
    """frac → 8-hex threshold; None means 'keep everything' (the
    k≥2³² endpoint — same 3-char-'100' lesson as split_assign: a
    9-char threshold would compare wrong, so endpoints never reach
    the string inequality)."""
    k = int(frac * (16 ** _BUCKET_HEX))
    if k >= 16 ** _BUCKET_HEX:
        return None
    return format(max(k, 0), f"0{_BUCKET_HEX}x")


def keep_flag(stratum: Column, id_col: Column,
              weights: Mapping[str, float], *,
              default_frac: float = 0.0) -> Column:
    """Boolean keep-decision column: P(keep | stratum s) =
    floor(w_s·16⁸)/16⁸, independent across docs, stable in the id."""
    bucket = _bucket(stratum, id_col)

    def frac_cond(frac: float) -> Column:
        t = _threshold(frac)
        if t is None:
            return F.lit(True)
        if frac <= 0:
            return F.lit(False)
        return bucket < F.lit(t)

    expr = None
    for s, w in sorted(weights.items()):
        cond = frac_cond(w)
        expr = (F.when(stratum == s, cond) if expr is None
                else expr.when(stratum == s, cond))
    default = frac_cond(default_frac)
    return default if expr is None else expr.otherwise(default)


def weighted_sample(df: DataFrame, weights: Mapping[str, float], *,
                    stratum_col: str, id_col: str = "doc_id",
                    default_frac: float = 0.0) -> DataFrame:
    """Filter to the deterministic weighted mix. Narrow — no
    exchange; composes with any downstream stage at scan speed."""
    return df.filter(keep_flag(F.col(stratum_col), F.col(id_col),
                               weights, default_frac=default_frac))


def training_order(df: DataFrame, *, id_col: str = "doc_id",
                   seed: str = "0", n_shards: int = 64) -> DataFrame:
    """(id, …) → (id, shard, position): a deterministic shuffled
    read order. ``sort_key = md5(seed:id)`` scatters uniformly; the
    shard is the key's first byte mod ``n_shards`` (so shard sizes
    are balanced independent of id distribution) and ``position`` is
    the rank within the shard — one exchange on shard, per-shard
    sort, no global ordering anywhere."""
    assert n_shards > 0
    key = F.md5(F.concat(F.lit(str(seed)), F.lit(":"),
                         F.col(id_col).cast("string")))
    d = df.select(F.col(id_col), key.alias("_k")).select(
        id_col, "_k",
        F.pmod(F.conv(F.substring("_k", 1, 2), 16, 10).cast("long"),
               F.lit(n_shards)).alias("shard"))
    w = Window.partitionBy("shard").orderBy("_k", id_col)
    return (d.select(
        id_col, "shard",
        (F.row_number().over(w) - 1).cast("long").alias("position")))
