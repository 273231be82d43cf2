"""Crash-safe artifact publishing (operators/publish.py, r11 verdict
task #4): one commit path for the ANN index, the BM25 postings index and
the dedup band table. Each family gets a crash-injection test — kill the
publish between build/stamp and swap, assert readers still see the OLD
artifact in full (never a half-published one), then assert a clean
re-publish succeeds and sweeps the leftovers."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cellbase_spark.operators import publish
from cellbase_spark.operators.publish import (
    BUILD_SUFFIX,
    CRASH_POINTS,
    InjectedCrash,
    publish_artifact,
    publish_artifact_dir,
    stamp_props,
)
from cellbase_spark.operators.similarity import table_props


@pytest.fixture(autouse=True)
def _no_crash_leak():
    yield
    CRASH_POINTS.clear()


def _tiny_embeddings(spark, n=40, dim=4, offset=0):
    return spark.range(offset, offset + n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(1, {dim}),"
            " i -> cast(((id * 7 + i * 3) % 11) as double) / 11.0)"
        ).alias("embedding"),
    )


def _docs(spark, n=30, offset=0):
    return spark.range(offset, offset + n).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "concat('tok', cast(id % 5 as string), ' common tok',"
            " cast(id % 3 as string))"
        ).alias("text"),
    )


def _no_build_leftovers(spark, table):
    return [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith(f"{table}{BUILD_SUFFIX}".lower())
    ]


# ---- generic helper behavior ------------------------------------------------


def test_publish_artifact_smoke_and_marker(spark, tmp_path):
    t, p = "pub_t_smoke", str(tmp_path / "art")

    def writer(tt, tp):
        spark.range(3).write.mode("overwrite").option("path", tp).format(
            "parquet"
        ).saveAsTable(tt)

    publish_artifact(spark, t, p, writer, {"cellbase.k": "v"}, absorbed_ids={"b", "a"})
    props = table_props(spark, t, max_age_sec=0)
    assert props["cellbase.k"] == "v"
    assert props["cellbase.complete"] == "1"
    assert props["cellbase.absorbed_ids"] == "a,b"
    assert props["cellbase.build_id"]
    assert spark.table(t).count() == 3
    assert _no_build_leftovers(spark, t) == []
    spark.sql(f"DROP TABLE {t}")


def test_publish_crash_before_stamp_leaves_old_intact(spark, tmp_path):
    t, p = "pub_t_prestamp", str(tmp_path / "art")

    def writer_v(v):
        def w(tt, tp):
            spark.range(v).write.mode("overwrite").option("path", tp).format(
                "parquet"
            ).saveAsTable(tt)
        return w

    publish_artifact(spark, t, p, writer_v(5), {})
    old_id = table_props(spark, t, max_age_sec=0)["cellbase.build_id"]

    CRASH_POINTS.add("after_build")
    with pytest.raises(InjectedCrash):
        publish_artifact(spark, t, p, writer_v(9), {})
    CRASH_POINTS.clear()
    # old artifact fully intact, same identity
    assert spark.table(t).count() == 5
    assert table_props(spark, t, max_age_sec=0)["cellbase.build_id"] == old_id
    # the crashed temp is markerless garbage; a fresh publish sweeps it
    publish_artifact(spark, t, p, writer_v(9), {})
    assert spark.table(t).count() == 9
    assert table_props(spark, t, max_age_sec=0)["cellbase.build_id"] != old_id
    assert _no_build_leftovers(spark, t) == []
    spark.sql(f"DROP TABLE {t}")


def test_publish_dir_crash_leaves_no_partial(spark, tmp_path):
    out = str(tmp_path / "gen2")
    CRASH_POINTS.add("after_build_dir")
    with pytest.raises(InjectedCrash):
        publish_artifact_dir(
            lambda d: spark.range(4).write.parquet(d), out
        )
    CRASH_POINTS.clear()
    assert not os.path.exists(out)  # never half-visible
    publish_artifact_dir(lambda d: spark.range(4).write.parquet(d), out)
    assert spark.read.parquet(out).count() == 4
    # temp siblings swept
    parent = os.path.dirname(out)
    assert [e for e in os.listdir(parent) if BUILD_SUFFIX in e] == []


def test_publish_dir_existing_generation_is_idempotent(spark, tmp_path):
    """Retrying a publish whose rename landed but whose caller-side
    bookkeeping (tombstone clear) did not must converge, not raise —
    the retry-after-crash repair path of the r12 advice."""
    out = str(tmp_path / "gen1")
    publish_artifact_dir(lambda d: spark.range(2).write.parquet(d), out)
    before = sorted(os.listdir(out))

    def _never(d):
        raise AssertionError("writer must not run on an idempotent retry")

    publish_artifact_dir(_never, out)  # no error, no rewrite
    assert sorted(os.listdir(out)) == before
    assert spark.read.parquet(out).count() == 2


def test_stamp_props_escapes_quotes(spark, tmp_path):
    t = "pub_t_quote"
    spark.range(1).write.mode("overwrite").option(
        "path", str(tmp_path / "q")
    ).format("parquet").saveAsTable(t)
    stamp_props(spark, t, {"cellbase.note": "it's quoted"})
    assert table_props(spark, t, max_age_sec=0)["cellbase.note"] == "it's quoted"
    spark.sql(f"DROP TABLE {t}")


# ---- family: ANN index ------------------------------------------------------


def test_ann_rebuild_crash_between_stamp_and_swap(spark, tmp_path):
    """Kill the ANN index rebuild after the temp is stamped but before
    the swap: every probe-visible property of the OLD index — rows,
    geometry, build identity — must be untouched."""
    from cellbase_spark.operators.similarity import build_ann_index

    t, p = "pub_ann_crash", str(tmp_path / "annidx")
    build_ann_index(_tiny_embeddings(spark, 40), t, p, n_centroids=2, n_planes=2)
    before = table_props(spark, t, max_age_sec=0)
    n_before = spark.table(t).count()
    assert n_before == 40 and before["cellbase.complete"] == "1"

    CRASH_POINTS.add("after_stamp")
    with pytest.raises(InjectedCrash):
        build_ann_index(
            _tiny_embeddings(spark, 60, offset=1000), t, p,
            n_centroids=2, n_planes=2,
        )
    CRASH_POINTS.clear()
    after = table_props(spark, t, max_age_sec=0)
    assert spark.table(t).count() == n_before
    assert after["cellbase.build_id"] == before["cellbase.build_id"]
    assert after["cellbase.n_centroids"] == before["cellbase.n_centroids"]

    # retry completes: new corpus served, garbage swept
    build_ann_index(
        _tiny_embeddings(spark, 60, offset=1000), t, p,
        n_centroids=2, n_planes=2,
    )
    assert spark.table(t).count() == 60
    assert (
        table_props(spark, t, max_age_sec=0)["cellbase.build_id"]
        != before["cellbase.build_id"]
    )
    assert _no_build_leftovers(spark, t) == []
    spark.sql(f"DROP TABLE {t}")


def test_ann_compact_records_absorbed_ids(spark, tmp_path):
    from cellbase_spark.operators.similarity import (
        build_ann_index,
        compact_ann_index,
    )

    g1, g2, out = "pub_ann_g1", "pub_ann_g2", "pub_ann_out"
    build_ann_index(
        _tiny_embeddings(spark, 20), g1, str(tmp_path / "g1"),
        n_centroids=2, n_planes=2,
    )
    build_ann_index(
        _tiny_embeddings(spark, 20, offset=100), g2, str(tmp_path / "g2"),
        n_centroids=2, n_planes=2,
    )
    ids = {
        table_props(spark, g, max_age_sec=0)["cellbase.build_id"]
        for g in (g1, g2)
    }
    compact_ann_index(spark, out, str(tmp_path / "out"), [g1, g2])
    props = table_props(spark, out, max_age_sec=0)
    assert props["cellbase.complete"] == "1"
    assert set(props["cellbase.absorbed_ids"].split(",")) == ids
    assert spark.table(out).count() == 40
    for t in (g1, g2, out):
        spark.sql(f"DROP TABLE {t}")


# ---- family: BM25 postings index -------------------------------------------


def test_bm25_rebuild_crash_between_stamp_and_swap(spark, tmp_path):
    """Same kill for the BM25 family: the OLD postings artifact keeps
    serving with its frozen corpus stats; the retry replaces it whole."""
    from cellbase_spark.operators.text import bm25_probe, build_bm25_index

    t, p = "pub_bm25_crash", str(tmp_path / "bm25idx")
    build_bm25_index(_docs(spark, 30), t, p, n_buckets=8)
    before = table_props(spark, t, max_age_sec=0)
    probe_before = sorted(
        map(tuple, bm25_probe(spark, t, ["tok1", "common"], k=5).collect())
    )

    CRASH_POINTS.add("after_stamp")
    with pytest.raises(InjectedCrash):
        build_bm25_index(_docs(spark, 50, offset=500), t, p, n_buckets=8)
    CRASH_POINTS.clear()
    after = table_props(spark, t, max_age_sec=0)
    assert after["cellbase.build_id"] == before["cellbase.build_id"]
    assert after["cellbase.n_docs"] == before["cellbase.n_docs"] == "30"
    assert probe_before == sorted(
        map(tuple, bm25_probe(spark, t, ["tok1", "common"], k=5).collect())
    )

    build_bm25_index(_docs(spark, 50, offset=500), t, p, n_buckets=8)
    fresh = table_props(spark, t, max_age_sec=0)
    assert fresh["cellbase.n_docs"] == "50"
    assert fresh["cellbase.build_id"] != before["cellbase.build_id"]
    assert _no_build_leftovers(spark, t) == []
    spark.sql(f"DROP TABLE {t}")


# ---- family: dedup band table ----------------------------------------------


def test_band_compact_crash_leaves_no_partial_generation(spark, tmp_path):
    """Kill the band-table compaction after the write but before the
    atomic rename: the new generation directory must NOT exist (readers
    stay on the old generation; a partial dir would silently serve short
    results), tombstones stay marked, and the retry lands the complete
    generation and clears them."""
    from cellbase_spark.operators.dedup import (
        compact_dedup_bands,
        delete_from_dedup_index,
        read_dedup_tombstones,
    )

    band_dir = str(tmp_path / "bands_g1")
    bands = spark.range(20).select(
        F.col("id").alias("_id"),
        (F.col("id") % 4).alias("band_idx"),
        F.md5(F.col("id").cast("string")).alias("band_key"),
    )
    bands.write.parquet(band_dir)
    delete_from_dedup_index(spark, band_dir, [3, 7])
    assert read_dedup_tombstones(spark, band_dir).count() == 2

    gen2 = str(tmp_path / "bands_g2")
    CRASH_POINTS.add("after_build_dir")
    with pytest.raises(InjectedCrash):
        compact_dedup_bands(spark, [band_dir], gen2)
    CRASH_POINTS.clear()
    assert not os.path.exists(gen2)  # never a half generation
    # tombstones NOT cleared — the old generation still needs them
    assert read_dedup_tombstones(spark, band_dir).count() == 2

    compact_dedup_bands(spark, [band_dir], gen2)
    out = spark.read.parquet(gen2)
    assert out.count() == 18
    assert out.where(F.col("_id").isin(3, 7)).count() == 0
    # tombstones cleared after the successful publish
    ts = read_dedup_tombstones(spark, band_dir)
    assert ts is None or ts.count() == 0


def test_publish_crash_mid_swap_recovers_on_retry(spark, tmp_path):
    """The narrowest remaining window: crash BETWEEN the two catalog
    renames (old already trashed, new not yet exposed). The final name
    is briefly unresolvable — a loud missing-table error, never half
    data — and a re-run of the SAME publish repairs it: the sweep
    clears the trash + temp, the writer rebuilds, and readers resolve
    the new artifact."""
    t, p = "pub_t_midswap", str(tmp_path / "art")

    def writer_v(v):
        def w(tt, tp):
            spark.range(v).write.mode("overwrite").option("path", tp).format(
                "parquet"
            ).saveAsTable(tt)
        return w

    publish_artifact(spark, t, p, writer_v(5), {})
    CRASH_POINTS.add("mid_swap")
    with pytest.raises(InjectedCrash):
        publish_artifact(spark, t, p, writer_v(9), {})
    CRASH_POINTS.clear()
    # the window is loud, not wrong: final name unresolvable, no reader
    # can see a half-published artifact under it
    assert not spark.catalog.tableExists(t)
    # retry repairs end-to-end
    publish_artifact(spark, t, p, writer_v(9), {})
    assert spark.table(t).count() == 9
    assert table_props(spark, t, max_age_sec=0)["cellbase.complete"] == "1"
    assert _no_build_leftovers(spark, t) == []
    spark.sql(f"DROP TABLE {t}")


def _age(path, sec=7200):
    """Backdate every entry in a tree (vacuum ages by NEWEST mtime)."""
    import time

    old = time.time() - sec
    os.utime(path, (old, old))
    for root, dirs, files in os.walk(path):
        for e in dirs + files:
            os.utime(os.path.join(root, e), (old, old))


def test_vacuum_sweeps_stale_scratch_and_pins_live(spark, tmp_path):
    from cellbase_spark.operators.publish import vacuum

    root = str(tmp_path)
    # stale scratch from a dead process
    stale = os.path.join(root, "cellbase_spark_sf0_1_99999")
    os.makedirs(os.path.join(stale, "keyed"))
    open(os.path.join(stale, "keyed", "part-0"), "w").write("x")
    _age(stale)
    # stale publish temp
    bld = os.path.join(root, "ann_idx__build_deadbeef")
    os.makedirs(bld)
    _age(bld)
    # stale-named dir that a LIVE catalog table serves (publish swap
    # renames names, never bytes) — must survive on the catalog pin
    livedir = os.path.join(root, "live_idx__build_cafe")
    t = "vac_live_t"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.range(3).write.option("path", livedir).format("parquet").saveAsTable(t)
    _age(livedir)
    # young dir (in-flight build) — survives the age floor
    young = os.path.join(root, "cellbase_spark_sf1_88888")
    os.makedirs(young)
    # own-process scratch — survives even when old
    own = os.path.join(root, f"cellbase_spark_sfx_{os.getpid()}")
    os.makedirs(own)
    _age(own)
    # old dir with ONE fresh file (long build mid-write) — survives
    mid = os.path.join(root, "cellbase_spark_sf2_77777")
    os.makedirs(mid)
    _age(mid)
    open(os.path.join(mid, "still-writing"), "w").write("x")
    # non-engine dir — never touched regardless of age
    other = os.path.join(root, "user_data")
    os.makedirs(other)
    _age(other)

    deleted = vacuum(spark, older_than_sec=3600, scratch_root=root)

    assert sorted(deleted) == [bld, stale]
    assert not os.path.exists(stale) and not os.path.exists(bld)
    for kept in (livedir, young, own, mid, other):
        assert os.path.exists(kept), kept
    assert spark.table(t).count() == 3  # live artifact still serves
    spark.sql(f"DROP TABLE {t}")


def test_vacuum_generations_keeps_live_and_tombstones(spark, tmp_path):
    from cellbase_spark.operators.publish import vacuum_generations

    root = str(tmp_path / "gens")
    for d in ("gen1", "gen2", "gen2_tombstones", "gen0"):
        os.makedirs(os.path.join(root, d))
        open(os.path.join(root, d, "part-0"), "w").write("x")
        _age(os.path.join(root, d))
    live = os.path.join(root, "gen2")

    deleted = vacuum_generations(spark, root, live, older_than_sec=3600)

    assert sorted(os.path.basename(p) for p in deleted) == ["gen0", "gen1"]
    assert os.path.exists(live)
    assert os.path.exists(os.path.join(root, "gen2_tombstones"))

    # dangling live pointer refuses to vacuum anything (crash pin)
    with pytest.raises(ValueError, match="does not exist"):
        vacuum_generations(spark, root, os.path.join(root, "gen9"), 3600)
    with pytest.raises(ValueError, match="not under"):
        vacuum_generations(spark, root, "/elsewhere/gen2", 3600)


def test_vacuum_reclaims_nested_crashed_builds(spark, tmp_path):
    """A crashed __build_ temp nested inside a LIVE scratch tree (the
    parent stays young because another artifact there is active) is
    reclaimed by vacuum's walk pass — with the same live-catalog pin."""
    from cellbase_spark.operators.publish import vacuum

    root = str(tmp_path)
    home = os.path.join(root, "cellbase_spark_sfy_31337")
    crashed = os.path.join(home, "annindex__build_dead")
    os.makedirs(crashed)
    _age(crashed)
    # a fresh file elsewhere keeps the PARENT young (active artifact)
    os.makedirs(os.path.join(home, "annindex_live"))
    # a nested build dir a live catalog table serves — pinned
    served = os.path.join(home, "bm25__build_live")
    t = "vac_nested_live_t"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.range(2).write.option("path", served).format("parquet").saveAsTable(t)
    _age(served)

    deleted = vacuum(spark, older_than_sec=3600, scratch_root=root)

    assert deleted == [crashed]
    assert not os.path.exists(crashed)
    assert os.path.exists(served) and spark.table(t).count() == 2
    spark.sql(f"DROP TABLE {t}")


def test_band_compact_retry_preserves_late_tombstones(spark, tmp_path):
    """r13 ADVICE medium: a tombstone appended AFTER a generation was
    published (takedown landing in the crash window / idempotent retry)
    must survive the retry's tombstone clear — the old unconditional
    truncate resurrected the deleted doc in later probes. The fold keeps
    exactly the rows whose doc survives in the published generation."""
    from cellbase_spark.operators.dedup import (
        compact_dedup_bands,
        delete_from_dedup_index,
        read_dedup_tombstones,
    )

    band_dir = str(tmp_path / "bands_g1")
    spark.range(20).select(
        F.col("id").alias("_id"),
        (F.col("id") % 4).alias("band_idx"),
        F.md5(F.col("id").cast("string")).alias("band_key"),
    ).write.parquet(band_dir)
    delete_from_dedup_index(spark, band_dir, [3])

    gen2 = str(tmp_path / "bands_g2")
    compact_dedup_bands(spark, [band_dir], gen2)
    assert spark.read.parquet(gen2).where("_id = 3").count() == 0
    ts = read_dedup_tombstones(spark, band_dir)
    assert ts is None or ts.count() == 0  # folded tombstone cleared

    # takedown lands AFTER the publish; a crashed caller retries the
    # SAME compaction (publish_artifact_dir no-ops on existing gen2)
    delete_from_dedup_index(spark, band_dir, [5])
    compact_dedup_bands(spark, [band_dir], gen2)
    kept = read_dedup_tombstones(spark, band_dir)
    assert kept is not None and [r._id for r in kept.collect()] == [5], (
        "late tombstone was truncated by the no-op retry"
    )
    # probe semantics: gen2 anti-joined with the kept tombstones still
    # hides doc 5 — the takedown was never silently dropped
    visible = spark.read.parquet(gen2).join(kept, "_id", "left_anti")
    assert visible.where("_id = 5").count() == 0
    assert visible.count() == 18  # 20 - folded 3 - tombstoned 5


def test_vacuum_durable_pin_protects_foreign_sessions_artifact(spark, tmp_path):
    """r13 ADVICE medium: vacuum's can't-delete-the-live-artifact pin
    must survive process death. Simulate the cron-in-a-fresh-session
    deployment by DROPPING the catalog entry (a fresh session's catalog
    is empty) — the durable pin publish wrote must still protect the
    artifact's bytes; unpinning releases them to the next sweep."""
    from cellbase_spark.operators.publish import (
        unpin_artifact,
        vacuum,
    )

    t, p = "vac_pin_t", str(tmp_path / "pinned_art")

    def w(tt, tp):
        spark.range(4).write.mode("overwrite").option("path", tp).format(
            "parquet"
        ).saveAsTable(tt)

    publish_artifact(spark, t, p, w, {})
    loc = publish.artifact_location(spark, t)
    spark.sql(f"DROP TABLE {t}")  # fresh session: no catalog pin
    _age(loc)

    deleted = vacuum(spark, older_than_sec=3600, scratch_root=str(tmp_path))
    assert loc not in deleted and os.path.exists(loc), (
        "durable pin did not protect a foreign session's artifact"
    )

    unpin_artifact(t)
    deleted = vacuum(spark, older_than_sec=3600, scratch_root=str(tmp_path))
    assert loc in deleted and not os.path.exists(loc)


def test_vacuum_pass_two_skips_foreign_and_own_trees(spark, tmp_path):
    """r13 ADVICE low: the nested `__build_` sweep must only walk the
    engine's own top-level trees — a foreign application's build-named
    directory under the scratch root is not ours to delete, and the
    current process's own scratch is exempt in BOTH passes."""
    from cellbase_spark.operators.publish import vacuum

    root = str(tmp_path)
    # foreign tree: old __build_ dir nested under a non-engine parent
    foreign = os.path.join(root, "other_app", "job__build_X")
    os.makedirs(foreign)
    _age(os.path.join(root, "other_app"))
    # own-process engine tree with an old nested build (may be mid-query)
    own = os.path.join(root, f"cellbase_spark_sfz_{os.getpid()}")
    own_nested = os.path.join(own, "idx__build_Y")
    os.makedirs(own_nested)
    _age(own)
    # control: a dead process's engine tree with the same shape IS swept
    dead = os.path.join(root, "cellbase_spark_sfz_424242")
    dead_nested = os.path.join(dead, "idx__build_Z")
    os.makedirs(dead_nested)
    _age(dead)

    deleted = vacuum(spark, older_than_sec=3600, scratch_root=root)

    assert os.path.exists(foreign), "foreign application tree was walked"
    assert os.path.exists(own_nested), "own scratch swept in pass two"
    assert dead in deleted and not os.path.exists(dead)


def test_ann_index_attach_zero_rebuild_foreign_probe(spark, sf_dir, monkeypatch):
    """r13 verdict #1 pin: once a durable ANN artifact is published, a
    session that never built it (fresh/foreign catalog) must serve
    probes through attach_artifact with ZERO rebuild — both build paths
    are FORBIDDEN here — and the probe plan must be the partition-pruned
    scan, hash-identical results to the first serve."""
    from cellbase_spark.io import source_signature
    from cellbase_spark.queries import llm_similarity as sim

    # first call: ingest happens (in a SEPARATE process) iff the durable
    # artifact doesn't exist yet, then this session attaches and probes
    rows1 = [tuple(r) for r in sim.q_ann_index_attach(spark, sf_dir).collect()]
    assert len(rows1) == 20

    # simulate the foreign session: empty this catalog of the attachment
    sig = source_signature(sf_dir, "embeddings")
    spark.sql(f"DROP TABLE IF EXISTS cb_annindex_att_{sig}")

    def _forbid(*a, **k):
        raise AssertionError("attach path attempted a rebuild")

    monkeypatch.setattr(sim, "_ingest_ann_index_foreign", _forbid)
    import cellbase_spark.operators.similarity as simop

    monkeypatch.setattr(simop, "build_ann_index", _forbid)

    df = sim.q_ann_index_attach(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan
    rows2 = [tuple(r) for r in df.collect()]
    assert rows1 == rows2


def test_attach_artifact_refuses_torn_state(spark, tmp_path):
    """attach must fail LOUDLY on every torn durable state: missing
    pointer, missing manifest, missing completion marker, and a
    pointer/manifest build_id desync — never quietly serve."""
    import json

    from cellbase_spark.operators.publish import (
        MANIFEST_NAME,
        attach_artifact,
        pointer_path,
    )

    base = str(tmp_path / "art")
    with pytest.raises(FileNotFoundError, match="publish pointer"):
        attach_artifact(spark, "att_torn_t", base)

    def w(tt, tp):
        spark.range(6).write.mode("overwrite").option("path", tp).format(
            "parquet"
        ).saveAsTable(tt)

    publish_artifact(spark, "att_torn_src", base, w, {})
    spark.sql("DROP TABLE att_torn_src")
    loc = json.load(open(pointer_path(base)))["location"]

    manifest = json.load(open(os.path.join(loc, MANIFEST_NAME)))
    bad = dict(manifest, **{"cellbase.build_id": "deadbeef"})
    json.dump(bad, open(os.path.join(loc, MANIFEST_NAME), "w"))
    with pytest.raises(RuntimeError, match="build_id"):
        attach_artifact(spark, "att_torn_t", base)

    bad = dict(manifest)
    bad.pop("cellbase.complete")
    json.dump(bad, open(os.path.join(loc, MANIFEST_NAME), "w"))
    with pytest.raises(RuntimeError, match="completion"):
        attach_artifact(spark, "att_torn_t", base)

    os.remove(os.path.join(loc, MANIFEST_NAME))
    with pytest.raises(FileNotFoundError, match="manifest"):
        attach_artifact(spark, "att_torn_t", base)

    # repaired manifest attaches fine (unpartitioned artifact branch)
    json.dump(manifest, open(os.path.join(loc, MANIFEST_NAME), "w"))
    t = attach_artifact(spark, "att_torn_t", base)
    assert spark.table(t).count() == 6
    spark.sql(f"DROP TABLE {t}")


def test_concurrent_reader_during_publish_swap_and_reclaim(spark, tmp_path):
    """r13 verdict #5 witness: a long-running reader mid-query on
    generation N while a publish flips the table to N+1 and reclaims
    N's bytes must either complete with ONE generation's FULL result or
    fail loudly — never return silently short/mixed rows. The loudness
    contract rests on ignoreMissingFiles staying false (a true value
    would silently drop deleted splits), so that conf is pinned here
    too. A query's file listing resolves once, so a mixed-generation
    result would mean the swap leaked through mid-plan — asserted
    impossible."""
    import threading
    import time

    assert (
        spark.conf.get("spark.sql.files.ignoreMissingFiles", "false") == "false"
    ), "engine must not silently skip deleted files"

    t, p = "pub_race_t", str(tmp_path / "race_art")

    def writer(tag):
        def w(tt, tp):
            (
                spark.range(4000)
                .select("id", F.lit(tag).alias("gen"))
                .repartition(64)
                .write.mode("overwrite")
                .option("path", tp)
                .format("parquet")
                .saveAsTable(tt)
            )
        return w

    publish_artifact(spark, t, p, writer("g1"), {})
    base = spark.table(t)

    def slow(batches):
        for b in batches:
            time.sleep(0.3)
            yield b

    slow_df = base.mapInPandas(slow, base.schema)
    outcome: dict = {}

    def run():
        try:
            outcome["rows"] = slow_df.collect()
        except Exception as e:  # loud failure is a VALID outcome
            outcome["err"] = e

    th = threading.Thread(target=run)
    th.start()
    time.sleep(0.6)  # reader underway with partitions still pending
    publish_artifact(spark, t, p, writer("g2"), {})  # swap + reclaim g1
    th.join(180)
    assert not th.is_alive(), "reader hung across the swap"

    if "rows" in outcome:
        rows = outcome["rows"]
        assert len(rows) == 4000, f"silently short read: {len(rows)} rows"
        gens = {r.gen for r in rows}
        assert gens == {"g1"} or gens == {"g2"}, f"mixed generations: {gens}"
    else:
        # loud is fine: the reader observed the reclaim as an ERROR,
        # never as a short result
        assert outcome["err"] is not None

    # post-race: fresh readers serve generation 2 in full
    assert spark.table(t).count() == 4000
    assert {r.gen for r in spark.table(t).select("gen").distinct().collect()} == {"g2"}
    spark.sql(f"DROP TABLE {t}")


def test_attach_follows_moved_pointer_to_new_generation(spark, tmp_path):
    """A long-lived session holding an attachment at generation 1 must,
    on re-attach after a publish moved the pointer, serve generation 2
    (the stale catalog entry is dropped and re-registered) — and an
    unchanged pointer re-attach is a no-op returning the same entry."""
    import json

    from cellbase_spark.operators.publish import attach_artifact, pointer_path

    base = str(tmp_path / "moving_art")

    def writer(n):
        def w(tt, tp):
            spark.range(n).write.mode("overwrite").option("path", tp).format(
                "parquet"
            ).saveAsTable(tt)
        return w

    publish_artifact(spark, "mov_src", base, writer(5), {})
    spark.sql("DROP TABLE mov_src")
    t = attach_artifact(spark, "mov_att", base)
    assert spark.table(t).count() == 5
    gen1_id = json.load(open(pointer_path(base)))["build_id"]

    # no-op re-attach: same generation, entry kept
    assert attach_artifact(spark, "mov_att", base) == t
    assert spark.table(t).count() == 5

    # publish generation 2 under the same naming base (pointer moves)
    publish_artifact(spark, "mov_src", base, writer(9), {})
    spark.sql("DROP TABLE mov_src")
    assert json.load(open(pointer_path(base)))["build_id"] != gen1_id
    t2 = attach_artifact(spark, "mov_att", base)
    assert t2 == t and spark.table(t2).count() == 9, (
        "re-attach did not follow the moved pointer"
    )
    spark.sql(f"DROP TABLE {t2}")


def test_foreign_ingest_serializes_concurrent_callers(tmp_path):
    """Two concurrent callers ingesting the same home: exactly ONE child
    process runs (O_EXCL lock), the loser waits and returns once the
    winner's pointer lands, and both see the published artifact."""
    import threading

    from cellbase_spark.operators.publish import (
        attached_dir,
        foreign_ingest,
    )

    home = str(tmp_path / "race_home" / "gen1")
    counter = str(tmp_path / "ingest_runs")
    os.makedirs(counter)
    # child needs no Spark: it lands the dir atomically-enough for the
    # test, stamps _SUCCESS, bumps the run counter, writes the pointer
    script = """
import os, sys, time, uuid
home, counter = sys.argv[1], sys.argv[2]
time.sleep(1.5)
open(os.path.join(counter, uuid.uuid4().hex), "w").write("run")
os.makedirs(home)
open(os.path.join(home, "_SUCCESS"), "w").write("")
from cellbase_spark.operators.publish import publish_dir_pointer
publish_dir_pointer(home)
"""
    errs: list = []

    def call():
        try:
            foreign_ingest(home, script, [home, counter], timeout=120)
        except Exception as e:
            errs.append(e)

    threads = [threading.Thread(target=call) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(150)
    assert not errs, errs
    assert len(os.listdir(counter)) == 1, "ingest ran more than once"
    assert attached_dir(home) == os.path.abspath(home)


# ---- round 15: pin retention, sweep sparing, pre-swap pin, lock races -------


def _pin_file(table):
    import hashlib

    from cellbase_spark.operators.publish import pins_dir

    return os.path.join(
        pins_dir(), f"pin_{hashlib.sha1(table.encode()).hexdigest()[:16]}.json"
    )


def test_vacuum_pin_retention_expires_untouched_pins(spark, tmp_path):
    """r14 ADVICE medium: a durable pin nobody refreshes (no publish, no
    attach within the retention window) must stop protecting its
    location — superseded signature homes age out instead of living
    forever. Default (no retention) keeps today's conservative
    behavior."""
    from cellbase_spark.operators.publish import unpin_artifact, vacuum

    t, p = "vac_ret_t", str(tmp_path / "ret_art")

    def w(tt, tp):
        spark.range(4).write.mode("overwrite").option("path", tp).format(
            "parquet"
        ).saveAsTable(tt)

    publish_artifact(spark, t, p, w, {})
    loc = publish.artifact_location(spark, t)
    spark.sql(f"DROP TABLE {t}")  # fresh-session simulation
    _age(loc)
    _age(_pin_file(t), sec=7200)  # pin last refreshed 2h ago

    # no retention window: pin protects regardless of age
    deleted = vacuum(spark, older_than_sec=3600, scratch_root=str(tmp_path))
    assert os.path.exists(loc)

    # retention window shorter than the pin's age: location sweepable
    deleted = vacuum(
        spark, older_than_sec=3600, scratch_root=str(tmp_path),
        pin_retention_sec=3600,
    )
    assert loc in deleted and not os.path.exists(loc)
    # vanished-location pin file is pruned on the next read
    from cellbase_spark.operators.publish import durable_pins

    durable_pins()
    assert not os.path.exists(_pin_file(t))
    unpin_artifact(t)


def test_pin_refresh_inside_retention_window_protects(spark, tmp_path):
    """The flip side: an artifact ATTACHED within the window keeps its
    protection — attach refreshes the pin mtime, so only truly
    untouched artifacts expire."""
    from cellbase_spark.operators.publish import (
        attach_artifact,
        unpin_artifact,
        vacuum,
    )

    t, p = "vac_ret_fresh_t", str(tmp_path / "ret_fresh_art")

    def w(tt, tp):
        spark.range(4).write.mode("overwrite").option("path", tp).format(
            "parquet"
        ).saveAsTable(tt)

    publish_artifact(spark, t, p, w, {})
    loc = publish.artifact_location(spark, t)
    spark.sql(f"DROP TABLE {t}")
    _age(loc)
    att = attach_artifact(spark, t, p)  # refreshes the pin's mtime
    spark.sql(f"DROP TABLE {att}")

    vacuum(
        spark, older_than_sec=3600, scratch_root=str(tmp_path),
        pin_retention_sec=3600,
    )
    assert os.path.exists(loc), "freshly attached artifact was swept"
    unpin_artifact(t)


def test_sweep_stale_builds_spares_pointer_location(spark, tmp_path):
    """r14 ADVICE medium: a FRESH session republishing to an existing
    naming base (tableExists false) must not rmtree the generation the
    durable pointer names — foreign sessions are serving it via attach,
    and a crash mid-build would otherwise leave a dangling pointer."""
    import json

    from cellbase_spark.operators.publish import (
        attach_artifact,
        pointer_path,
        unpin_artifact,
    )

    t, base = "sweep_ptr_t", str(tmp_path / "sweep_art")

    def writer(n):
        def w(tt, tp):
            spark.range(n).write.mode("overwrite").option("path", tp).format(
                "parquet"
            ).saveAsTable(tt)
        return w

    publish_artifact(spark, t, base, writer(5), {})
    gen1 = json.load(open(pointer_path(base)))["location"]
    spark.sql(f"DROP TABLE {t}")  # simulate: republisher is a fresh session
    unpin_artifact(t)  # isolate the POINTER spare (no pin assist)

    CRASH_POINTS.add("after_build")
    with pytest.raises(InjectedCrash):
        publish_artifact(spark, t, base, writer(9), {})
    CRASH_POINTS.clear()

    assert os.path.isdir(gen1), (
        "sweep deleted the pointer-named serving generation"
    )
    att = attach_artifact(spark, "sweep_ptr_att", base)
    assert spark.table(att).count() == 5  # still serving gen1 in full
    spark.sql(f"DROP TABLE {att}")

    # the completed republish supersedes gen1 normally
    publish_artifact(spark, t, base, writer(9), {})
    att = attach_artifact(spark, "sweep_ptr_att", base)
    assert spark.table(att).count() == 9
    spark.sql(f"DROP TABLE {att}")
    spark.sql(f"DROP TABLE {t}")
    unpin_artifact(t)


def test_publish_pin_and_pointer_land_before_swap(spark, tmp_path):
    """r14 ADVICE low: the new generation must NEVER be live-but-
    unpinned. Crash after the pointer/pin write but before the swap:
    the pointer names the complete new generation (attach serves it),
    the pin protects it from a fresh-session vacuum, and re-running the
    publish repairs the catalog."""
    import json

    from cellbase_spark.operators.publish import (
        attach_artifact,
        pointer_path,
        unpin_artifact,
        vacuum,
    )

    t, base = "preswap_t", str(tmp_path / "preswap_art")

    def writer(n):
        def w(tt, tp):
            spark.range(n).write.mode("overwrite").option("path", tp).format(
                "parquet"
            ).saveAsTable(tt)
        return w

    publish_artifact(spark, t, base, writer(5), {})
    CRASH_POINTS.add("after_pointer")
    with pytest.raises(InjectedCrash):
        publish_artifact(spark, t, base, writer(9), {})
    CRASH_POINTS.clear()

    # in-session catalog still serves the OLD generation (swap never ran)
    assert spark.table(t).count() == 5
    # the pointer + pin name the NEW complete generation
    gen2 = json.load(open(pointer_path(base)))["location"]
    att = attach_artifact(spark, "preswap_att", base)
    assert spark.table(att).count() == 9
    spark.sql(f"DROP TABLE {att}")
    # fresh-session vacuum cannot sweep the pre-swap generation: pinned
    _age(gen2)
    deleted = vacuum(spark, older_than_sec=3600, scratch_root=str(tmp_path))
    assert gen2 not in deleted and os.path.exists(gen2)

    # re-running the publish repairs end-to-end
    publish_artifact(spark, t, base, writer(9), {})
    assert spark.table(t).count() == 9
    spark.sql(f"DROP TABLE {t}")
    unpin_artifact(t)


def test_dir_pointer_home_keyed_pin_supersedes_generations(tmp_path):
    """r14 ADVICE medium: roll-forward dir-face generations publishing
    under one home must REPLACE the home's pin, not accumulate one
    immortal pin per generation."""
    from cellbase_spark.operators.publish import (
        durable_pins,
        publish_dir_pointer,
        unpin_artifact,
    )

    home = str(tmp_path / "roll_home")
    gens = []
    for i in (1, 2):
        g = os.path.join(str(tmp_path), f"roll_gen{i}")
        os.makedirs(g)
        open(os.path.join(g, "_SUCCESS"), "w").write("")
        publish_dir_pointer(g, home=home)
        gens.append(os.path.abspath(g))

    pins = durable_pins()
    assert gens[1] in pins
    assert gens[0] not in pins, "superseded generation's pin survived"
    unpin_artifact(f"dir:{os.path.abspath(home)}")


def test_foreign_ingest_failed_child_with_pointer_is_success(tmp_path):
    """r14 ADVICE low: a child that PUBLISHED the pointer and then died
    (teardown crash, or a lost-takeover racer colliding with the
    winner's generation) is a success — the artifact is valid and
    attach validates it independently."""
    from cellbase_spark.operators.publish import attached_dir, foreign_ingest

    home = str(tmp_path / "dies_home" / "gen1")
    script = """
import os, sys
home = sys.argv[1]
os.makedirs(home)
open(os.path.join(home, "_SUCCESS"), "w").write("")
from cellbase_spark.operators.publish import publish_dir_pointer
publish_dir_pointer(home)
sys.exit(3)
"""
    foreign_ingest(home, script, [home], timeout=120)  # must not raise
    assert attached_dir(home) == os.path.abspath(home)


def test_foreign_ingest_live_holder_never_usurped(tmp_path):
    """r14 ADVICE low: a lock older than `timeout` whose HOLDER is still
    alive (legitimately slow ingest) must not be taken over — the
    waiter keeps waiting and returns via the winner's pointer."""
    import json as _json
    import threading
    import time as _time

    from cellbase_spark.operators.publish import foreign_ingest, pointer_path

    home = str(tmp_path / "slow_home" / "gen1")
    os.makedirs(os.path.dirname(home))
    lock = f"{home}.ingest_lock"
    with open(lock, "w") as fh:
        _json.dump({"pid": os.getpid(), "ts": _time.time()}, fh)
    os.utime(lock, (_time.time() - 9999, _time.time() - 9999))  # "old"

    counter = str(tmp_path / "usurp_runs")
    os.makedirs(counter)
    script = """
import os, sys, uuid
home, counter = sys.argv[1], sys.argv[2]
open(os.path.join(counter, uuid.uuid4().hex), "w").write("run")
os.makedirs(home, exist_ok=True)
open(os.path.join(home, "_SUCCESS"), "w").write("")
from cellbase_spark.operators.publish import publish_dir_pointer
publish_dir_pointer(home)
"""
    errs: list = []

    def call():
        try:
            foreign_ingest(home, script, [home, counter], timeout=5)
        except Exception as e:
            errs.append(e)

    th = threading.Thread(target=call)
    th.start()
    _time.sleep(4.0)  # several wait cycles past `timeout` age
    assert th.is_alive(), "waiter should still be waiting on a live holder"
    assert os.listdir(counter) == [], "live holder's lock was usurped"
    # the slow holder finishes: lands the artifact, pointer, drops lock
    os.makedirs(home, exist_ok=True)
    open(os.path.join(home, "_SUCCESS"), "w").write("")
    from cellbase_spark.operators.publish import publish_dir_pointer

    publish_dir_pointer(home)
    os.remove(lock)
    th.join(30)
    assert not th.is_alive() and not errs, errs
    assert os.listdir(counter) == []  # waiter never ran its own child


def test_foreign_ingest_dead_holder_taken_over_once(tmp_path):
    """A lock whose recorded pid is dead AND older than `timeout` is
    taken over (atomically — the rename admits exactly one winner)."""
    import json as _json
    import subprocess
    import sys
    import time as _time

    from cellbase_spark.operators.publish import attached_dir, foreign_ingest

    # a pid that existed and is now gone
    dead = subprocess.run(
        [sys.executable, "-c", "import os; print(os.getpid())"],
        capture_output=True, text=True,
    )
    dead_pid = int(dead.stdout.strip())

    home = str(tmp_path / "dead_home" / "gen1")
    os.makedirs(os.path.dirname(home))
    lock = f"{home}.ingest_lock"
    with open(lock, "w") as fh:
        _json.dump({"pid": dead_pid, "ts": _time.time() - 9999}, fh)
    os.utime(lock, (_time.time() - 9999, _time.time() - 9999))

    counter = str(tmp_path / "dead_runs")
    os.makedirs(counter)
    script = """
import os, sys, uuid
home, counter = sys.argv[1], sys.argv[2]
open(os.path.join(counter, uuid.uuid4().hex), "w").write("run")
os.makedirs(home, exist_ok=True)
open(os.path.join(home, "_SUCCESS"), "w").write("")
from cellbase_spark.operators.publish import publish_dir_pointer
publish_dir_pointer(home)
"""
    foreign_ingest(home, script, [home, counter], timeout=60)
    assert len(os.listdir(counter)) == 1
    assert attached_dir(home) == os.path.abspath(home)


def test_tombstone_appended_during_fold_survives(spark, tmp_path):
    """r14 ADVICE low, the last fold window: a takedown landing AFTER
    the fold snapshots the side-table's files (mid-fold) must survive
    the clear — the old in-place overwrite truncated it."""
    from cellbase_spark.operators import dedup as dd
    from cellbase_spark.operators.dedup import (
        compact_dedup_bands,
        delete_from_dedup_index,
        read_dedup_tombstones,
    )

    band_dir = str(tmp_path / "bands_g1")
    spark.range(20).select(
        F.col("id").alias("_id"),
        (F.col("id") % 4).alias("band_idx"),
        F.md5(F.col("id").cast("string")).alias("band_key"),
    ).write.parquet(band_dir)
    delete_from_dedup_index(spark, band_dir, [3])  # folded by the compact

    def _late_takedown():
        dd._TOMBSTONE_FOLD_HOOK = None  # fire once
        delete_from_dedup_index(spark, band_dir, [5])

    dd._TOMBSTONE_FOLD_HOOK = _late_takedown
    try:
        gen2 = str(tmp_path / "bands_g2")
        compact_dedup_bands(spark, [band_dir], gen2)
    finally:
        dd._TOMBSTONE_FOLD_HOOK = None

    # doc 3 was excluded from the generation and its tombstone folded;
    # doc 5's tombstone landed mid-fold and MUST still guard probes
    kept = read_dedup_tombstones(spark, band_dir)
    ids = sorted(r._id for r in kept.select("_id").distinct().collect())
    assert ids == [5], f"mid-fold takedown truncated: {ids}"
    visible = spark.read.parquet(gen2).join(
        kept.select("_id").distinct(), "_id", "left_anti"
    )
    assert visible.where("_id = 5").count() == 0
    assert visible.count() == 18


_ROTATION_INGEST_SCRIPT = """
import os, sys, time
home, table, tag, do_vacuum = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[8]")
    .appName("cellbase-rotation-ingest")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F
from cellbase_spark.operators.publish import publish_artifact, vacuum


def writer(tt, tp):
    (
        spark.range(4000)
        .select("id", F.lit(tag).alias("gen"))
        .repartition(96)
        .write.mode("overwrite")
        .option("path", tp)
        .format("parquet")
        .saveAsTable(tt)
    )


publish_artifact(spark, table, home, writer, {"cellbase.kind": "rotation"})
if do_vacuum == "1":
    # the ingest job's janitor step: this child's catalog serves N+1,
    # the durable pin + pointer moved to N+1 at publish — generation N
    # is unprotected and past the (zero) retention age, so it sweeps.
    time.sleep(0.2)
    deleted = vacuum(spark, older_than_sec=0, scratch_root=os.path.dirname(home))
    print("VACUUMED:", deleted)
spark.stop()
"""


def test_cross_process_generation_rotation_witness(spark, tmp_path):
    """r14 verdict task #3: session A is attached and MID-PROBE on
    generation N when a SEPARATE ingest process force-publishes N+1 and
    its vacuum retires N's bytes. A's in-flight probe must either
    complete one generation's FULL result or fail loudly
    (ignoreMissingFiles=false contract) — never silently short/mixed —
    and A's NEXT probe after re-attach must serve N+1."""
    import threading
    import time

    from cellbase_spark.operators.publish import (
        attach_artifact,
        foreign_ingest,
        unpin_artifact,
    )

    assert (
        spark.conf.get("spark.sql.files.ignoreMissingFiles", "false") == "false"
    ), "engine must not silently skip deleted files"

    home = str(tmp_path / "rot_home" / "rot_art")
    table = "rot_att_t"

    # generation N: built by a separate interpreter, attached by A
    foreign_ingest(home, _ROTATION_INGEST_SCRIPT, [home, table, "g1", "0"])
    t = attach_artifact(spark, table, home)
    base = spark.table(t)

    def slow(batches):
        for b in batches:
            time.sleep(10.0)
            yield b

    slow_df = base.mapInPandas(slow, base.schema)
    outcome: dict = {}

    def run():
        try:
            outcome["rows"] = slow_df.collect()
        except Exception as e:  # loud failure is a VALID outcome
            outcome["err"] = e

    th = threading.Thread(target=run)
    th.start()
    time.sleep(2.0)  # A's probe underway, partitions pending

    # the rotation: a second interpreter publishes N+1 over the same
    # home (force — the pointer exists) and its janitor vacuum retires
    # N's bytes, all while A is mid-probe
    foreign_ingest(
        home, _ROTATION_INGEST_SCRIPT, [home, table, "g2", "1"], force=True
    )

    th.join(300)
    assert not th.is_alive(), "reader hung across the rotation"
    if "rows" in outcome:
        rows = outcome["rows"]
        assert len(rows) == 4000, f"silently short read: {len(rows)} rows"
        gens = {r.gen for r in rows}
        assert gens == {"g1"}, f"mixed/foreign generations mid-probe: {gens}"
    else:
        assert outcome["err"] is not None  # loud, never short

    # A's NEXT probe re-attaches and serves N+1
    t2 = attach_artifact(spark, table, home)
    assert t2 == t
    fresh = spark.table(t2)
    assert fresh.count() == 4000
    assert {r.gen for r in fresh.select("gen").distinct().collect()} == {"g2"}
    spark.sql(f"DROP TABLE {t2}")
    unpin_artifact(table)
