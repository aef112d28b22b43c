"""Similarity search over embedding columns (``array<float>``).

Two paths, as a training-data pipeline needs both:

- brute-force cosine top-k — the correctness baseline. Dot products via
  ``F.zip_with`` + ``F.aggregate`` (JVM, codegen); top-k via window
  ``row_number`` over a partition-pruned candidate join.
- LSH-bucketed ANN (random-hyperplane signs) — the scale path: each
  vector lands in ``n_tables`` sign-buckets; candidate pairs only join
  within buckets, so the exchange is on bucket keys, never O(n²).
  Hyperplanes are deterministic (seeded arithmetic), not RNG state.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, _dot(a, b) / denom).otherwise(F.lit(0.0))


def brute_force_topk(
    df: DataFrame, *, id_col: str = "vec_id", vec_col: str = "embedding",
    k: int = 5, queries: DataFrame | None = None,
) -> DataFrame:
    """Exact cosine top-k neighbors for every query vector.

    ``queries`` defaults to the corpus itself (self-join, excluding
    self-matches). Ties break on neighbor id — deterministic output.
    At scale the corpus side would be bucketed/broadcast in chunks;
    this operator is the oracle the ANN path is verified against.
    """
    from pyspark.sql.window import Window

    corpus = df.select(F.col(id_col).alias("nbr_id"),
                       F.col(vec_col).alias("nbr_vec"))
    qs = (queries or df).select(F.col(id_col).alias("query_id"),
                                F.col(vec_col).alias("query_vec"))
    scored = (qs.crossJoin(corpus)
              .filter(F.col("query_id") != F.col("nbr_id"))
              .withColumn("score", F.round(
                  cosine(F.col("query_vec"), F.col("nbr_vec")), 6)))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("nbr_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "nbr_id", "score", "rank"))


def _hyperplane(dim: int, table: int, bit: int) -> list[float]:
    """Deterministic pseudo-random unit hyperplane via a sine-mix hash
    (same construction everywhere — no RNG state, reproducible across
    runs/languages)."""
    vals = []
    for d in range(dim):
        x = math.sin((table * 131071 + bit * 8191 + d * 524287 + 1) * 0.0001)
        vals.append(x)
    n = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / n for v in vals]


def lsh_sign_buckets(
    df: DataFrame, *, id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int = 64, n_tables: int = 4, n_bits: int = 8,
) -> DataFrame:
    """vector → (table, bucket) sign-signature keys.

    One Arrow pandas UDF computing the full (batch × tables·bits) sign
    matrix as a single numpy matmul — the pure-expression form costs
    n_tables·n_bits interpreted array-aggregate passes per row.
    """
    planes = np.array([
        _hyperplane(dim, t, b) for t in range(n_tables)
        for b in range(n_bits)], dtype=np.float64).T  # (dim, T*B)
    weights = np.array([1 << (n_bits - 1 - b) for b in range(n_bits)],
                       dtype=np.int64)

    @pandas_udf("array<long>")
    def buckets(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.array(vecs.tolist(), dtype=np.float64)  # (n, dim)
        signs = (mat @ planes >= 0).astype(np.int64)     # (n, T*B)
        signs = signs.reshape(len(mat), n_tables, n_bits)
        vals = (signs * weights[None, None, :]).sum(axis=2)  # (n, T)
        return pd.Series(vals.tolist())

    return (df.select(F.col(id_col), F.col(vec_col),
                      F.posexplode(buckets(F.col(vec_col)))
                      .alias("tbl", "bucket"))
            .select(id_col, vec_col, "tbl", "bucket"))


def ann_topk(
    df: DataFrame, *, id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int = 64, k: int = 5, n_tables: int = 4, n_bits: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates share ≥1 sign-bucket; exact cosine
    + window rank within the candidate set. Recall rises with
    ``n_tables``; the join key is (tbl, bucket) so the shuffle volume
    is corpus × n_tables, not corpus²."""
    from pyspark.sql.window import Window

    b = lsh_sign_buckets(df, id_col=id_col, vec_col=vec_col, dim=dim,
                         n_tables=n_tables, n_bits=n_bits)
    left = b.select(F.col(id_col).alias("query_id"),
                    F.col(vec_col).alias("query_vec"), "tbl", "bucket")
    right = b.select(F.col(id_col).alias("nbr_id"),
                     F.col(vec_col).alias("nbr_vec"), "tbl", "bucket")
    cand = (left.join(right, ["tbl", "bucket"])
            .filter(F.col("query_id") != F.col("nbr_id"))
            .select("query_id", "query_vec", "nbr_id", "nbr_vec")
            .dropDuplicates(["query_id", "nbr_id"]))
    scored = cand.withColumn("score", F.round(
        cosine(F.col("query_vec"), F.col("nbr_vec")), 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("nbr_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "nbr_id", "score", "rank"))


def embedding_near_duplicates(
    df: DataFrame, *, id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int = 64, threshold: float = 0.95, n_tables: int = 6, n_bits: int = 6,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b) above threshold,
    via the LSH candidate path."""
    b = lsh_sign_buckets(df, id_col=id_col, vec_col=vec_col, dim=dim,
                         n_tables=n_tables, n_bits=n_bits)
    left = b.select(F.col(id_col).alias("id_a"),
                    F.col(vec_col).alias("vec_a"), "tbl", "bucket")
    right = b.select(F.col(id_col).alias("id_b"),
                     F.col(vec_col).alias("vec_b"), "tbl", "bucket")
    cand = (left.join(right, ["tbl", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "vec_a", "id_b", "vec_b")
            .dropDuplicates(["id_a", "id_b"]))
    return (cand.withColumn("score", F.round(
        cosine(F.col("vec_a"), F.col("vec_b")), 6))
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score"))
