"""Semantic tests for the time-series / corpus / layout operator batch
(queries/timeseries.py, queries/corpus.py, queries/layout.py) — the
properties the DuckDB hash-match can't see: gap-fill invariants, interval
contiguity, skyline dominance, prefilter-vs-plain-join equivalence,
chunk coverage, and weighted-sample bias direction."""

from __future__ import annotations

from pyspark.sql import functions as F

from cellbase_spark.io import load_table
from cellbase_spark.queries.corpus import q_chunk_documents, q_sample_weighted
from cellbase_spark.queries.layout import q_skyline, q_zorder
from cellbase_spark.queries.timeseries import (
    q_gap_fill,
    q_scd2_intervals,
)


def test_gap_fill_dense_spine_and_locf(spark, sf_dir):
    out = q_gap_fill(spark, sf_dir).cache()
    try:
        # Dense grid: every event_type has every hour exactly once.
        per_type = out.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"), F.countDistinct("hour").alias("nd")
        )
        rows = per_type.collect()
        spine = {r["n"] for r in rows}
        assert len(spine) == 1, "all types share one spine length"
        assert all(r["n"] == r["nd"] for r in rows)
        # LOCF: filled_sum never NULL, and gap rows repeat a prior value.
        assert out.where(F.col("filled_sum").isNull()).count() == 0
    finally:
        out.unpersist()


def test_scd2_intervals_are_contiguous_per_user(spark, sf_dir):
    out = q_scd2_intervals(spark, sf_dir)
    # Within a user, each interval's valid_to equals the next valid_from
    # (by construction) and consecutive states differ (runs are maximal).
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("valid_from")
    chk = out.select(
        "user_id",
        "state",
        "valid_from",
        "valid_to",
        F.lead("valid_from").over(w).alias("next_from"),
        F.lead("state").over(w).alias("next_state"),
    )
    bad_gap = chk.where(
        F.col("valid_to").isNotNull() & (F.col("valid_to") != F.col("next_from"))
    ).count()
    bad_run = chk.where(
        F.col("next_state").isNotNull() & (F.col("state") == F.col("next_state"))
    ).count()
    assert bad_gap == 0
    assert bad_run == 0
    # Event conservation: interval n_events sums to the table count.
    total = out.agg(F.sum("n_events")).first()[0]
    assert total == load_table(spark, sf_dir, "events").count()


def test_skyline_no_dominated_survivor(spark, sf_dir):
    sky = q_skyline(spark, sf_dir)
    pts = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_totalprice", "o_orderdate")
        .count()
    )
    s = sky.alias("s")
    q = pts.alias("q")
    dominated = (
        s.join(
            q,
            (F.col("q.o_totalprice") >= F.col("s.o_totalprice"))
            & (F.col("q.o_orderdate") >= F.col("s.o_orderdate"))
            & (
                (F.col("q.o_totalprice") > F.col("s.o_totalprice"))
                | (F.col("q.o_orderdate") > F.col("s.o_orderdate"))
            ),
            "left_semi",
        )
    ).count()
    assert dominated == 0
    assert sky.count() >= 1


def test_zorder_key_locality(spark, sf_dir):
    out = q_zorder(spark, sf_dir)
    # zkey must be a bijection of (nationkey, bal_bucket) pairs: same
    # pair -> same key, different pair -> different key.
    pairs = out.select("c_nationkey", "bal_bucket", "zkey").distinct()
    assert (
        pairs.groupBy("c_nationkey", "bal_bucket")
        .agg(F.countDistinct("zkey").alias("k"))
        .where(F.col("k") != 1)
        .count()
        == 0
    )
    assert (
        pairs.groupBy("zkey").count().where(F.col("count") > 1).count() == 0
    )
    # Low-bit locality: nationkey is recoverable from even bits.
    recon = out.where(
        F.expr(
            "cast(c_nationkey as bigint) != "
            "((zkey >> 0) & 1) + (((zkey >> 2) & 1) << 1) + (((zkey >> 4) & 1) << 2)"
            " + (((zkey >> 6) & 1) << 3) + (((zkey >> 8) & 1) << 4)"
            " + (((zkey >> 10) & 1) << 5) + (((zkey >> 12) & 1) << 6)"
            " + (((zkey >> 14) & 1) << 7)"
        )
    ).count()
    assert recon == 0


def test_chunks_cover_every_token(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_toks")
    )
    chunks = q_chunk_documents(spark, sf_dir)
    # One chunk per stride start, and the chunk sizes sum to exactly
    # sum_i min(32, n_toks - 24*i): full windows except clamped tails.
    agg = chunks.groupBy("doc_id").agg(
        F.sum("n_tokens").alias("tok_sum"), F.count(F.lit(1)).alias("n_chunks")
    )
    joined = agg.join(docs, "doc_id").withColumn(
        "expected",
        F.expr(
            "aggregate(sequence(0L, cast(floor((n_toks - 1) / 24) as bigint)),"
            " 0L, (acc, i) -> acc + least(cast(32 as bigint), n_toks - 24 * i))"
        ),
    )
    assert joined.where(
        F.col("n_chunks") != F.floor((F.col("n_toks") - 1) / 24) + 1
    ).count() == 0
    assert joined.where(F.col("tok_sum") != F.col("expected")).count() == 0


def test_weighted_sample_prefers_heavy_rows(spark, sf_dir):
    picked = q_sample_weighted(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders")
    mean_all = o.agg(F.avg("o_totalprice")).first()[0]
    mean_picked = picked.agg(F.avg("o_totalprice")).first()[0]
    # Probability proportional to totalprice -> the sample mean must sit
    # clearly above the population mean.
    assert mean_picked > mean_all * 1.1
    assert picked.count() == 100


def test_funnel_step_order_and_depth(spark, sf_dir):
    from cellbase_spark.queries.analytics import q_funnel

    f = q_funnel(spark, sf_dir).cache()
    try:
        # Step timestamps must be strictly increasing where present, and
        # depth must agree with which steps are populated.
        assert f.where(
            F.col("click_ts").isNotNull() & (F.col("click_ts") <= F.col("view_ts"))
        ).count() == 0
        assert f.where(
            F.col("purchase_ts").isNotNull()
            & (F.col("purchase_ts") <= F.col("click_ts"))
        ).count() == 0
        assert f.where(
            (F.col("funnel_depth") == 3) & F.col("purchase_ts").isNull()
        ).count() == 0
        assert f.where(
            (F.col("funnel_depth") < 3) & F.col("purchase_ts").isNotNull()
        ).count() == 0
        # funnel counts are monotone non-increasing by step
        d = {r["funnel_depth"]: r["n"] for r in
             f.groupBy("funnel_depth").agg(F.count(F.lit(1)).alias("n")).collect()}
        reached = [sum(v for k, v in d.items() if k >= s) for s in (1, 2, 3)]
        assert reached[0] >= reached[1] >= reached[2]
    finally:
        f.unpersist()


def test_retention_day0_equals_cohort_sizes(spark, sf_dir):
    from cellbase_spark.queries.analytics import q_retention

    r = q_retention(spark, sf_dir)
    # offset 0 row exists for every cohort and sums to the user count
    day0 = r.where(F.col("day_offset") == 0).agg(F.sum("n_users")).first()[0]
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert day0 == n_users
    assert r.where(F.col("day_offset") < 0).count() == 0


def test_equidepth_buckets_are_balanced_and_ordered(spark, sf_dir):
    from cellbase_spark.queries.analytics import q_histogram_equidepth

    h = q_histogram_equidepth(spark, sf_dir).orderBy("decile").collect()
    counts = [r["n"] for r in h]
    assert max(counts) - min(counts) <= 1  # ntile balance
    for a, b in zip(h, h[1:]):
        assert a["hi"] <= b["lo"]  # buckets tile the value range in order
