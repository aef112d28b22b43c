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
  on rotated prefix buckets.
- n-gram Jaccard: exact verification primitive (used standalone for
  small candidate sets and as the LSH verifier).

Hash functions are deterministic arithmetic (xxhash64 + odd-multiplier
mixing), never Python's salted ``hash``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 64-bit mixing constants (Splitmix64/Murmur finalizer style)
_MIX = -7046029254386353131  # 0x9E3779B97F4A7C15 as signed


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
    the token array — no Python."""
    toks = F.split(normalize_text(text), " ")
    k = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j + 1).cast("int"))
                                     for j in range(n)]),
    )
    return F.when(k > 0, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>"))


_MERSENNE31 = (1 << 31) - 1  # universal-hash field; keeps every
# intermediate < 2^62 so ANSI-mode long arithmetic never overflows


def minhash_signature(shingle_col: Column, k: int = 32) -> Column:
    """k minhash values: min over shingles of ((a_i·h + b_i) mod p) with
    h = xxhash64(shingle) reduced into the Mersenne-31 field.

    k independent universal hashes, entirely built-in (transform +
    array_min), vectorized in codegen — no Python, no overflow.
    """
    base = F.transform(shingle_col,
                       lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE31)))
    def _uhash(a: int, b: int):
        return lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MERSENNE31))

    sigs = []
    for i in range(k):
        a = (2 * i + 1) * 2654435761 % _MERSENNE31 or 1
        b = (i * 0x9E3779B1 + 0x5BD1E995) % _MERSENNE31
        sigs.append(F.array_min(F.transform(base, _uhash(a, b)))
                    .alias(f"mh_{i}"))
    return F.array(*sigs)


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
    sig = minhash_signature(shingles(F.col(text_col), n_shingle), k)
    with_sig = df.select(F.col(id_col), sig.alias("sig"))
    band_cols = []
    for b in range(bands):
        band_slice = F.slice(F.col("sig"), b * rows + 1, rows)
        band_cols.append(F.struct(
            F.lit(b).alias("band"),
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


# ---------------------------------------------------------------- simhash
def simhash64(text: Column, n_shingle: int = 2) -> Column:
    """64-bit SimHash over word shingles, fully built-in: per-bit
    weighted vote via aggregate over the shingle-hash array."""
    hashes = F.transform(shingles(text, n_shingle), lambda s: F.xxhash64(s))
    bits = []
    for i in range(64):
        vote = F.aggregate(
            hashes, F.lit(0),
            lambda acc, h: acc + F.when(
                h.bitwiseAND(F.lit(1 << i if i < 63 else -(2 ** 63))) != 0,
                F.lit(1)).otherwise(F.lit(-1)))
        bits.append(F.when(vote > 0, F.lit(1 << i if i < 63 else -(2 ** 63)))
                    .otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


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
        key = F.shiftrightunsigned(F.col("simhash"), t * 16).bitwiseAND(F.lit(0xFFFF))
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
    pairs = (b.select(F.explode(_pairs_from_sorted_structs("members")).alias("p"))
             .select(F.col("p.a.id").alias("id_a"), F.col("p.a.sh").alias("sh_a"),
                     F.col("p.b.id").alias("id_b"), F.col("p.b.sh").alias("sh_b"))
             .distinct())
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (pairs.select("id_a", "id_b", ham.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))


def _pairs_from_sorted_structs(col_name: str) -> Column:
    arr = F.col(col_name)
    return F.flatten(F.transform(
        F.sequence(F.lit(0), F.size(arr) - 2),
        lambda i: F.transform(
            F.slice(arr, (i + 2).cast("int"), F.size(arr)),
            lambda b: F.struct(F.element_at(arr, (i + 1).cast("int")).alias("a"),
                               b.alias("b"))),
    ))
