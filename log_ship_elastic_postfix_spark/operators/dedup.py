"""Deduplication operators for large-scale training-data pipelines.

The duplicate-url / hot-key story in the north_star generalizes to the
standard corpus-dedup toolbox; each operator here is expressible at
10¹²-row scale:

- exact: hash-groupBy on content (one exchange on a 64-bit hash, not
  the full text; keeper = min id — deterministic)
- MinHash + LSH: shingle → k minhashes → b bands → exchange on
  (band, band-hash) buckets only; candidate pairs verified by exact
  Jaccard. No O(n²) stage anywhere.
- SimHash: 64-bit weighted-projection fingerprint; near-dups collide
  on 16-bit key slices (pigeonhole over 4 tables).
- n-gram Jaccard: exact verification primitive (used standalone for
  small candidate sets and as the LSH verifier).

Physical note: the signature computations (MinHash, SimHash) are
Arrow-vectorized pandas UDFs with numpy inner loops. A pure-expression
formulation (k × transform/array_min) re-evaluates the shingle pipeline
once per signature slot — Catalyst does not share subexpressions across
projection fields — and measured ~100× slower at any scale. The
banding/bucketing/joins around the signatures stay JVM-side.
Hash functions are deterministic (crc32 / xxhash64 + universal-hash
mixing), never Python's salted ``hash``.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_MERSENNE31 = (1 << 31) - 1  # universal-hash field


def normalize_text(text: Column) -> Column:
    """Canonical form for content comparison: lowercase, collapsed
    whitespace, trimmed."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def exact_duplicates(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: groups of identical (normalized) content.

    Returns one row per duplicated content group: keeper id (min),
    group size, and the full member list. The exchange key is the
    content hash, so skewed giant texts never shuffle their bodies.
    """
    h = F.xxhash64(normalize_text(F.col(text_col))).alias("content_hash")
    return (df.select(F.col(id_col), h)
            .groupBy("content_hash")
            .agg(F.min(id_col).alias("keeper_id"),
                 F.count(F.lit(1)).alias("group_size"),
                 F.sort_array(F.collect_list(id_col)).alias("member_ids"))
            .filter(F.col("group_size") > 1))


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingle set (distinct), JVM-side via transform over
    the token array — no Python. Used by the exact-Jaccard verifier."""
    toks = F.split(normalize_text(text), " ")
    k = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j + 1).cast("int"))
                                     for j in range(n)]),
    )
    return F.when(k > 0, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>"))


# ------------------------------------------------------------- signatures
def _shingle_set(text: str, n: int) -> set[str]:
    toks = (text or "").lower().split()
    if len(toks) < n:
        return set()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def minhash_signature(text_col: Column, k: int = 32,
                      n_shingle: int = 3) -> Column:
    """k minhash values over word n-gram shingles (one Arrow batch pass,
    numpy (a_i·h + b_i) mod 2³¹−1 with h = crc32(shingle))."""
    a = np.array([((2 * i + 1) * 2654435761) % _MERSENNE31 or 1
                  for i in range(k)], dtype=np.int64)
    b = np.array([(i * 0x9E3779B1 + 0x5BD1E995) % _MERSENNE31
                  for i in range(k)], dtype=np.int64)
    empty = [int(_MERSENNE31)] * k

    @pandas_udf("array<long>")
    def sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            sh = _shingle_set(t, n_shingle)
            if not sh:
                out.append(empty)
                continue
            h = np.fromiter((zlib.crc32(s.encode("utf-8")) for s in sh),
                            dtype=np.int64, count=len(sh)) % _MERSENNE31
            vals = (a[:, None] * h[None, :] + b[:, None]) % _MERSENNE31
            out.append(vals.min(axis=1).tolist())
        return pd.Series(out)

    return sig(text_col)


def simhash64(text_col: Column, n_shingle: int = 2) -> Column:
    """64-bit SimHash over word shingles: per-bit majority vote of
    64-bit shingle hashes (crc32 of the shingle and of its reverse,
    concatenated), one numpy pass per Arrow batch."""
    bit_positions = np.arange(64, dtype=np.uint64)

    @pandas_udf("long")
    def sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            sh = _shingle_set(t, n_shingle)
            if not sh:
                out.append(0)
                continue
            h = np.fromiter(
                ((zlib.crc32(s.encode("utf-8"))
                  | (zlib.crc32(s[::-1].encode("utf-8")) << 32))
                 for s in sh),
                dtype=np.uint64, count=len(sh))
            bits = ((h[:, None] >> bit_positions[None, :]) & 1).astype(np.int64)
            votes = (bits * 2 - 1).sum(axis=0)
            packed = np.uint64(0)
            for i in range(64):
                if votes[i] > 0:
                    packed |= np.uint64(1) << np.uint64(i)
            out.append(int(packed.astype(np.int64)))
        return pd.Series(out, dtype="int64")

    return sig(text_col)


# ----------------------------------------------------------------- LSH
def minhash_lsh_candidates(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id",
    n_shingle: int = 3, k: int = 32, bands: int = 8,
) -> DataFrame:
    """LSH candidate pairs: equal band-slice → same bucket → pair.

    Scale path: the only exchange is groupBy(band, band_hash); bucket
    sizes are bounded by collision rate, and the self-join happens
    within buckets (b × tiny), never across the corpus.
    """
    rows = k // bands
    sig = minhash_signature(F.col(text_col), k, n_shingle)
    with_sig = df.select(F.col(id_col), sig.alias("sig"))
    band_cols = []
    for band in range(bands):
        band_slice = F.slice(F.col("sig"), band * rows + 1, rows)
        band_cols.append(F.struct(
            F.lit(band).alias("band"),
            F.xxhash64(F.concat_ws(",", *[
                F.element_at(band_slice, i + 1).cast("string")
                for i in range(rows)])).alias("bucket")))
    exploded = (with_sig
                .withColumn("bnd", F.explode(F.array(*band_cols)))
                .select(id_col, F.col("bnd.band").alias("band"),
                        F.col("bnd.bucket").alias("bucket")))
    buckets = (exploded.groupBy("band", "bucket")
               .agg(F.sort_array(F.collect_set(id_col)).alias("ids"))
               .filter(F.size("ids") > 1))
    pairs = (buckets
             .select(F.explode(_pairs_from_sorted("ids")).alias("p"))
             .select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b"))
             .distinct())
    return pairs


def _pairs_from_sorted(ids_col: str) -> Column:
    """All (a<b) pairs from a sorted id array, via nested transform +
    flatten (built-in, no UDF)."""
    ids = F.col(ids_col)
    return F.flatten(F.transform(
        F.sequence(F.lit(0), F.size(ids) - 2),
        lambda i: F.transform(
            F.slice(ids, (i + 2).cast("int"), F.size(ids)),
            lambda b: F.struct(F.element_at(ids, (i + 1).cast("int")).alias("a"),
                               b.alias("b"))),
    ))


def jaccard_pairs(
    df: DataFrame, pairs: DataFrame, *, text_col: str = "text",
    id_col: str = "doc_id", n_shingle: int = 3, threshold: float = 0.7,
) -> DataFrame:
    """Exact n-gram Jaccard verification of candidate pairs."""
    sh = df.select(F.col(id_col),
                   shingles(F.col(text_col), n_shingle).alias("sh"))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return (joined.select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def near_duplicates_minhash(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id",
    n_shingle: int = 3, k: int = 32, bands: int = 8, threshold: float = 0.7,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact Jaccard verify."""
    cand = minhash_lsh_candidates(
        df, text_col=text_col, id_col=id_col, n_shingle=n_shingle,
        k=k, bands=bands)
    return jaccard_pairs(df, cand, text_col=text_col, id_col=id_col,
                         n_shingle=n_shingle, threshold=threshold)


def simhash_near_duplicates(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id",
    max_hamming: int = 3, n_shingle: int = 2, n_tables: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: bucket on 16-bit key slices (4 tables →
    any pair within hamming ≤3 collides in ≥1 table by pigeonhole),
    verify by exact hamming distance."""
    sh = df.select(F.col(id_col), simhash64(F.col(text_col), n_shingle)
                   .alias("simhash"))
    tables = []
    for t in range(n_tables):
        key = F.shiftrightunsigned(F.col("simhash"), t * 16) \
               .bitwiseAND(F.lit(0xFFFF))
        tables.append(sh.select(id_col, "simhash", F.lit(t).alias("tbl"),
                                key.alias("bkey")))
    exploded = tables[0]
    for t in tables[1:]:
        exploded = exploded.unionByName(t)
    b = (exploded.groupBy("tbl", "bkey")
         .agg(F.array_sort(F.collect_set(F.struct(F.col(id_col).alias("id"),
                                                  F.col("simhash").alias("sh"))))
              .alias("members"))
         .filter(F.size("members") > 1))
    pairs = (b.select(F.explode(_pairs_from_sorted("members")).alias("p"))
             .select(F.col("p.a.id").alias("id_a"), F.col("p.a.sh").alias("sh_a"),
                     F.col("p.b.id").alias("id_b"), F.col("p.b.sh").alias("sh_b"))
             .distinct())
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (pairs.select("id_a", "id_b", ham.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))
