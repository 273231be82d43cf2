"""Deduplication operators for LLM training-data pipelines.

All hashing is md5-derived (first 15/12 hex chars -> BIGINT), chosen
because it is byte-identical in Spark (`conv(substr(md5(..)))`) and DuckDB
(`('0x'||substr(md5(..)))::BIGINT`) — so even the randomized-looking
operators (MinHash, SimHash) are fully oracle-checkable. Everything here
is built-in expressions (codegen'd, no Python in the row path).

Scale design:
- exact dedup: one hash-groupBy — shuffle keyed on the content hash, so
  100 TB dedups with per-key state of one row (min doc id).
- MinHash-LSH: signature computation is a per-row map (no shuffle);
  banding turns near-dup search into an equi-join on (band_idx, band_key)
  — the only shuffle is bucket-sized, never all-pairs. Candidates are
  then verified with exact Jaccard (standard LSH verify step).
- SimHash: per-row fold to one 48-bit integer; near-dup buckets come from
  bit-chunk keys the same banding way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MOD = 1_000_000_007

# -- hashing expression builders (Spark side) --------------------------------


def token_hash_expr(token_expr: str, seed_expr: str) -> str:
    """60-bit md5-derived hash of a token, parameterized by seed."""
    return (
        f"cast(conv(substr(md5(concat({token_expr}, '#', {seed_expr})), 1, 15), 16, 10)"
        " as bigint)"
    )


def minhash_sig(tokens_col: str, n_hashes: int = 16) -> Column:
    """Array of n_hashes min-hash values over a token array (pure map)."""
    h = token_hash_expr("t", "i")
    return F.expr(
        f"transform(sequence(0, {n_hashes - 1}),"
        f" i -> array_min(transform({tokens_col}, t -> {h})))"
    )


def lsh_band_keys(sig_col: str, bands: int = 4, rows: int = 4) -> Column:
    """Array of `bands` band keys: md5 over each signature slice."""
    parts = ", ".join(f"element_at({sig_col}, {rows}*j + {r})" for r in range(1, rows + 1))
    return F.expr(f"transform(sequence(0, {bands - 1}), j -> md5(concat_ws(',', {parts})))")


def simhash48(tokens_col: str) -> Column:
    """48-bit SimHash of a token array: per-bit +-1 vote fold, sign, pack.

    One aggregate() fold per row — no explode, no shuffle; the 48-bit
    space comes from md5's first 12 hex chars.
    """
    th = "cast(conv(substr(md5(t), 1, 12), 16, 10) as bigint)"
    return F.expr(
        f"""aggregate(
  {tokens_col},
  array_repeat(cast(0 as bigint), 48),
  (acc, t) -> zip_with(acc,
                       transform(sequence(0, 47), k -> (shiftright({th}, k) & 1) * 2 - 1),
                       (a, b) -> a + cast(b as bigint)),
  acc -> aggregate(zip_with(acc, sequence(0, 47),
                            (c, k) -> if(c > 0, shiftleft(cast(1 as bigint), k), cast(0 as bigint))),
                   cast(0 as bigint), (s, x) -> s + x)
)"""
    )


# -- dataframe-level operators ----------------------------------------------


def exact_dedup(df: DataFrame, content: str, id_col: str) -> DataFrame:
    """Keep one row (min id) per normalized-content hash."""
    h = F.md5(F.lower(F.trim(F.col(content))))
    return (
        df.withColumn("content_hash", h)
        .groupBy("content_hash")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
    )


def jaccard_pairs(
    tokenized: DataFrame,
    id_col: str,
    tokens_col: str,
    block_col: str | None = None,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact token-set Jaccard over candidate pairs.

    Pairs are generated within `block_col` groups (metadata blocking) or
    globally when None — global all-pairs is only for small inputs; at
    scale use minhash_lsh_pairs for candidate generation instead.
    Output: (id_a, id_b, n_shared, n_a, n_b, jaccard), id_a < id_b.
    """
    t = tokenized.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(F.col(tokens_col)).alias("_toks"),
        *([F.col(block_col).alias("_blk")] if block_col else []),
    ).withColumn("_n", F.size("_toks"))
    e = t.select("_id", "_n", *(["_blk"] if block_col else []), F.explode("_toks").alias("_tok"))
    a, b = e.alias("a"), e.alias("b")
    cond = (F.col("a._tok") == F.col("b._tok")) & (F.col("a._id") < F.col("b._id"))
    if block_col:
        cond = cond & (F.col("a._blk") == F.col("b._blk"))
    shared = (
        a.join(b, cond)
        .groupBy(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._n").alias("n_a"),
            F.col("b._n").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    jac = F.col("n_shared") / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
    return shared.withColumn("jaccard", jac).where(F.col("jaccard") >= threshold)


def minhash_lsh_pairs(
    tokenized: DataFrame,
    id_col: str,
    tokens_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH near-dup pairs, verified with exact Jaccard.

    1. per-row signature (map only)
    2. band keys -> posexplode -> equi-join on (band_idx, key): candidates
    3. exact Jaccard verify on the (small) candidate set
    """
    rows = n_hashes // bands
    t = tokenized.select(
        F.col(id_col).alias("_id"), F.array_distinct(F.col(tokens_col)).alias("_toks")
    )
    sig = t.withColumn("_sig", minhash_sig("_toks", n_hashes)).withColumn(
        "_bands", lsh_band_keys("_sig", bands, rows)
    )
    banded = sig.select(
        "_id", "_toks", F.posexplode("_bands").alias("_bidx", "_bkey")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._bidx") == F.col("b._bidx"))
            & (F.col("a._bkey") == F.col("b._bkey"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._toks").alias("_ta"),
            F.col("b._toks").alias("_tb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("_ta", "_tb"))
    union = F.size("_ta") + F.size("_tb") - inter
    return (
        cand.withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
