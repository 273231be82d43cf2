"""Empty-input robustness: operators with driver-side adaptivity
(vocab counts, checkpointed edge lists, iterative loops) must degrade to
empty/identity results instead of crashing when their input collapses to
zero rows — the oracle gate never exercises this because the testdata is
never empty."""

from __future__ import annotations

from pyspark.sql import functions as F

from cellbase_spark.io import load_table
from cellbase_spark.operators.dedup import (
    blocked_bitmap_jaccard_pairs,
    connected_components,
    jaccard_pairs,
    minhash_lsh_pairs,
)


def _empty_docs(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.where(F.lit(False)).select(
        "doc_id", "source", F.split("text", " ").alias("toks")
    )


def test_connected_components_no_edges(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    edges = d.select(
        F.col("doc_id").alias("id_a"), F.col("doc_id").alias("id_b")
    ).where(F.lit(False))
    out = connected_components(d, edges, id_col="doc_id")
    rows = out.collect()
    assert len(rows) == d.count()
    assert all(r["cluster_id"] == r["doc_id"] and r["is_canonical"] for r in rows)


def test_jaccard_operators_empty_input(spark, sf_dir):
    t = _empty_docs(spark, sf_dir)
    assert (
        jaccard_pairs(
            t, id_col="doc_id", tokens_col="toks", block_col="source", threshold=0.5
        ).count()
        == 0
    )
    assert (
        blocked_bitmap_jaccard_pairs(
            t, id_col="doc_id", tokens_col="toks", block_col="source", threshold=0.5
        ).count()
        == 0
    )


def test_minhash_empty_input(spark, sf_dir):
    t = _empty_docs(spark, sf_dir).select("doc_id", "toks")
    assert (
        minhash_lsh_pairs(
            t, id_col="doc_id", tokens_col="toks", bitmap_vocab_limit=4096
        ).count()
        == 0
    )


def test_singleton_block_yields_no_pairs(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    one = d.orderBy("doc_id").limit(1).select(
        "doc_id", "source", F.split("text", " ").alias("toks")
    )
    assert (
        blocked_bitmap_jaccard_pairs(
            one, id_col="doc_id", tokens_col="toks", block_col="source", threshold=0.5
        ).count()
        == 0
    )


def test_gram_explode_guards_short_docs(spark):
    """Docs shorter than the gram width must yield ZERO grams, not crash:
    Spark's sequence(1, 0) produces descending [1, 0] and slice(toks, 0, n)
    then raises — the CASE guard in corpus.py keeps short docs empty
    (matching the oracle's empty generate_series)."""
    from cellbase_spark.queries.corpus import q_boilerplate, q_contamination

    rows = [(i, "s", t) for i, t in enumerate(
        ["one two three", "a", "", "w x y z v u t s r q"]
    )]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    df.createOrReplaceTempView("___short_docs")
    # Exercise the exact gram expression both keys use (6-gram form).
    from pyspark.sql import functions as F

    g = df.select(
        "doc_id",
        F.explode(
            F.expr(
                "flatten(transform(array(split(text, ' ')), toks ->"
                " transform(CASE WHEN size(toks) >= 6"
                "   THEN sequence(1, size(toks) - 5) ELSE array() END,"
                " i -> concat_ws(' ', slice(toks, i, 6)))))"
            )
        ).alias("gram"),
    )
    out = g.collect()
    assert {r["doc_id"] for r in out} == {3}  # only the 10-token doc
    assert len(out) == 5  # 10 - 6 + 1


def test_bounded_vocab_probe_small_vocab_exact(spark):
    """Under the limit, the probe returns the EXACT distinct count (the
    bitmap builders size their words with it)."""
    from cellbase_spark.operators import dedup

    df = spark.range(0, 2000).select((F.col("id") % 37).cast("string").alias("_tok"))
    assert dedup._bounded_vocab_size(df, "_tok", limit=100) == 37


def test_bounded_vocab_probe_large_vocab_never_full_counts(spark, monkeypatch):
    """Over the limit, the probe must decide from the SAMPLE alone — the
    100 TB contract is that a huge vocabulary is detected without a full
    token shuffle. _exact_distinct is forbidden via monkeypatch."""
    from cellbase_spark.operators import dedup

    def _boom(*a, **k):
        raise AssertionError("exact distinct count ran on the over-limit path")

    monkeypatch.setattr(dedup, "_exact_distinct", _boom)
    df = spark.range(0, 50_000).select(F.col("id").cast("string").alias("_tok"))
    assert (
        dedup._bounded_vocab_size(df, "_tok", limit=64, probe_df=df.sample(0.2, seed=7))
        is None
    )


def test_vocab_probe_cached_across_executions(spark, monkeypatch):
    """The probe result is an engine-stats cache entry: a second call on
    a semantically identical token stream must run ZERO probe jobs
    (round 4 — the r3 tiered probe's per-call driver actions were the
    whole q_dedup_near bench regression)."""
    from cellbase_spark.operators import dedup

    df = spark.range(0, 1000).select((F.col("id") % 21).cast("string").alias("_tok"))
    dedup._VOCAB_STATS.clear()
    assert dedup._bounded_vocab_size(df, "_tok", limit=100) == 21

    def _boom(*a, **k):
        raise AssertionError("probe re-ran despite cache")

    monkeypatch.setattr(dedup, "_exact_distinct", _boom)
    df2 = spark.range(0, 1000).select((F.col("id") % 21).cast("string").alias("_tok"))
    assert dedup._bounded_vocab_size(df2, "_tok", limit=100) == 21
