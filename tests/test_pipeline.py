"""Tests for the training-pipeline queries (queries/pipeline.py):
deterministic sampling/splits, sequence packing, approx-percentile
tolerance, and the repartition-stability property that motivates
hash-based sampling over df.sample()."""

from __future__ import annotations

from pyspark.sql import functions as F

from cellbase_spark.io import load_table
from cellbase_spark.operators.sampling import hash_bucket
from cellbase_spark.queries.pipeline import (
    q_agg_approx_percentile,
    q_pack_sequences,
    q_sample_hash,
    q_split_train_test,
)


def test_hash_sample_stable_under_repartition(spark, sf_dir):
    """THE property that justifies content-hash sampling: membership must
    not change when the physical partitioning does (df.sample() fails
    this — per-partition seeding)."""
    o = load_table(spark, sf_dir, "orders")
    base = {
        r["o_orderkey"]
        for r in o.withColumn("b", hash_bucket("o_orderkey"))
        .where(F.col("b") < 10)
        .select("o_orderkey")
        .collect()
    }
    repart = {
        r["o_orderkey"]
        for r in o.repartition(13, "o_custkey")
        .withColumn("b", hash_bucket("o_orderkey"))
        .where(F.col("b") < 10)
        .select("o_orderkey")
        .collect()
    }
    assert base == repart
    n_total = o.count()
    # ~10% with slack: binomial spread at sf0.001 (1500 orders) is wide
    assert 0.04 * n_total < len(base) < 0.18 * n_total


def test_split_partitions_are_exhaustive_and_disjoint(spark, sf_dir):
    rows = q_split_train_test(spark, sf_dir).collect()
    splits = {r["split"]: r["n_docs"] for r in rows}
    d = load_table(spark, sf_dir, "documents")
    assert sum(splits.values()) == d.count()
    assert set(splits) <= {"train", "val", "test"}
    assert splits.get("train", 0) > splits.get("test", 0)


def test_pack_sequences_conserves_tokens(spark, sf_dir):
    """Bins partition the corpus: per-lang bin_tokens sums to the total
    token count, and every bin except the last per lang is 'full' (its
    cumulative end crosses a 4096 boundary by construction)."""
    packed = q_pack_sequences(spark, sf_dir)
    got = {
        (r["lang"], r["bin"]): (r["n_docs"], r["bin_tokens"]) for r in packed.collect()
    }
    d = load_table(spark, sf_dir, "documents")
    tok_total = d.select(
        F.sum(F.size(F.split(F.col("text"), " "))).alias("t")
    ).collect()[0]["t"]
    assert sum(t for _, t in got.values()) == tok_total
    assert sum(n for n, _ in got.values()) == d.count()
    # bins are contiguous: for each lang, bins are 0..max with no gaps
    by_lang: dict[str, list[int]] = {}
    for (lang, b), _ in got.items():
        by_lang.setdefault(lang, []).append(b)
    for lang, bins in by_lang.items():
        assert sorted(bins) == list(range(max(bins) + 1)), lang


def test_approx_percentile_within_tolerance(spark, sf_dir):
    """GK sketch at accuracy=1000 must land within 1% relative error of
    the exact sort-based percentile. The key emits that verdict per
    group (round 14 gate form); this test asserts it AND re-derives the
    envelope independently so a broken verdict expression can't
    self-certify."""
    rows = q_agg_approx_percentile(spark, sf_dir).collect()
    assert rows and all(r["within_tol"] for r in rows), rows
    li = load_table(spark, sf_dir, "lineitem")
    both = {
        r["l_returnflag"]: (r["ap"], r["ex"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile_approx(l_extendedprice, array(0.5, 0.9, 0.99), 1000)"
            ).alias("ap"),
            F.expr(
                "percentile(l_extendedprice, array(0.5, 0.9, 0.99))"
            ).alias("ex"),
        )
        .collect()
    }
    assert set(both) == {r["l_returnflag"] for r in rows}
    for flag, (ap, ex) in both.items():
        for a, e in zip(ap, ex):
            assert abs(a - e) <= 0.01 * abs(e) + 1e-9, (flag, a, e)


def test_sample_hash_matches_filtered_scan_plan(spark, sf_dir):
    """The sample is a narrow map: its plan must contain no exchange."""
    df = q_sample_hash(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_merge_upsert_action_accounting(spark, sf_dir):
    """Every base row survives (kept/updated), every synthetic insert
    lands, and updated rows actually changed."""
    from cellbase_spark.queries.pipeline import q_merge_upsert

    merged = q_merge_upsert(spark, sf_dir).cache()
    c = load_table(spark, sf_dir, "customer")
    n_base = c.count()
    n_upd = c.where(F.col("c_custkey") % 10 == 0).count()
    n_ins = c.where(F.col("c_custkey") % 97 == 0).count()
    actions = {r["merge_action"]: r["n"] for r in
               merged.groupBy("merge_action").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert actions.get("updated", 0) == n_upd
    assert actions.get("inserted", 0) == n_ins
    assert actions.get("kept", 0) == n_base - n_upd
    merged.unpersist()


def test_embed_quantize_reconstruction_error(spark, sf_dir):
    """int8 codes must reconstruct each vector within half a quant step
    (scale/254 per component... conservatively scale/127)."""
    from cellbase_spark.queries.llm_similarity import q_embed_quantize

    rows = q_embed_quantize(spark, sf_dir).limit(50).collect()
    orig = {r["vec_id"]: r["embedding"] for r in
            load_table(spark, sf_dir, "embeddings").collect()}
    assert rows
    for r in rows:
        scale = r["scale"]
        # codes are comma-joined (driver canon can't hash array cells)
        codes = [int(c) for c in r["codes"].split(",")]
        assert all(-127 <= c <= 127 for c in codes)
        recon = [c * scale / 127.0 for c in codes]
        for a, b in zip(recon, orig[r["vec_id"]]):
            assert abs(a - b) <= scale / 127.0 + 1e-6
