"""Reference-parity facade (cellbase_spark/api.py) + partitioned layout.

The facade must feel like the reference (workbook -> table -> get/where/
rows) while executing as pushed-down lazy scans; the partitioned-write
test pins the 100 TB layout story: a date-partitioned table prunes
partitions at the scan, so a one-day query never touches the other days.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cellbase_spark.api import CellBase
from cellbase_spark.io import load_table, write_parquet_table


def test_point_lookup_roundtrip(spark, sf_dir):
    cb = CellBase(spark, sf_dir)
    row = cb.table("customer").get(1)
    assert row is not None and row["c_custkey"] == 1
    assert cb.table("customer").get(10**12) is None


def test_where_select_stay_lazy_and_compose(spark, sf_dir):
    cb = CellBase(spark, sf_dir)
    t = cb.table("customer").where(F.col("c_acctbal") > 0).select("c_custkey", "c_acctbal")
    assert t.df.columns == ["c_custkey", "c_acctbal"]  # no action has run
    assert all(r["c_acctbal"] > 0 for r in t.rows())


def test_unknown_table_rejected(spark, sf_dir):
    cb = CellBase(spark, sf_dir)
    try:
        cb.table("nope")
        raise AssertionError("expected KeyError")
    except KeyError:
        pass


def test_partitioned_write_prunes_at_scan(spark, sf_dir, tmp_path):
    """events partitioned by event date: a single-day filter must reach
    the scan as a PartitionFilter (only that day's files are listed/read)."""
    out = str(tmp_path / "events_by_day")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts").cast("string")
    )
    write_parquet_table(ev, out, partition_by=["event_date"])

    back = spark.read.parquet(out)
    one_day = back.select(F.min(F.to_date("ts")).cast("string")).first()[0]
    q = back.where(F.col("event_date") == one_day)
    jqe = q._jdf.queryExecution()
    plan = jqe.explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan and "event_date" in plan.split("PartitionFilters")[1].split("\n")[0]
    total = back.count()
    pruned = q.count()
    assert 0 < pruned < total


def test_sql_entry_point(spark, sf_dir):
    cb = CellBase(spark, sf_dir)
    rows = cb.sql(
        "SELECT c_mktsegment, COUNT(*) AS n FROM customer GROUP BY c_mktsegment"
    ).collect()
    assert sum(r["n"] for r in rows) == cb.table("customer").count()


def test_mutation_verbs_copy_on_write(spark, sf_dir, tmp_path):
    """set_value / add_row / remove_row compose as one lazy plan and only
    affect the targeted rows; the original table is untouched
    (copy-on-write, like the reference's in-memory edits before save)."""
    cb = CellBase(spark, sf_dir)
    nation = cb.table("nation")
    n0 = nation.count()

    edited = (
        nation.set_value(3, "n_name", "RENAMED")
        .remove_row(7)
        .add_row({"n_nationkey": 999, "n_name": "ATLANTIS", "n_regionkey": 0})
    )
    # plan-only so far; one action materializes the composed edit chain
    rows = {r["n_nationkey"]: r for r in edited.rows()}
    assert rows[3]["n_name"] == "RENAMED"
    assert 7 not in rows
    assert rows[999]["n_name"] == "ATLANTIS"
    assert len(rows) == n0  # -1 removed, +1 added
    # original unchanged (immutability)
    assert nation.get(3)["n_name"] != "RENAMED"
    assert nation.get(7) is not None

    # save -> reload round-trip preserves the edits and the schema
    out = str(tmp_path / "nation_edited")
    edited.save(out)
    back = spark.read.parquet(out)
    assert back.schema == nation.df.schema
    assert back.where(F.col("n_nationkey") == 999).count() == 1


def test_set_value_preserves_column_type(spark, sf_dir):
    """A cell edit must not widen/retype the column (the reference's
    sheets are typed per SURVEY §1.3)."""
    cb = CellBase(spark, sf_dir)
    cust = cb.table("customer")
    edited = cust.set_value(1, "c_acctbal", 42)  # int literal into double col
    assert edited.df.schema["c_acctbal"].dataType == cust.df.schema["c_acctbal"].dataType
    assert edited.get(1)["c_acctbal"] == 42.0


def test_add_row_rejects_unknown_column(spark, sf_dir):
    cb = CellBase(spark, sf_dir)
    try:
        cb.table("nation").add_row({"bogus": 1})
        raise AssertionError("expected KeyError")
    except KeyError:
        pass


def test_facade_dedup_exact(spark, sf_dir):
    from cellbase_spark.api import CellBase

    cb = CellBase(spark, sf_dir)
    docs = cb.table("documents")
    deduped = docs.dedup_exact("text")
    n_hashes = (
        docs.df.select(F.md5(F.lower(F.trim(F.col("text"))))).distinct().count()
    )
    assert deduped.count() == n_hashes


def test_facade_dedup_clusters_and_pairs(spark, sf_dir):
    from cellbase_spark.api import CellBase

    cb = CellBase(spark, sf_dir)
    docs = cb.table("documents")
    clusters = docs.dedup_clusters("text")
    assert clusters.count() == docs.count()
    pairs = docs.near_dup_pairs("text", threshold=0.9, block_col="source")
    # every pair's two ids must share a cluster at the looser threshold
    assert pairs.columns[:2] == ["id_a", "id_b"]


def test_facade_similar_topk(spark, sf_dir):
    from cellbase_spark.api import CellBase

    cb = CellBase(spark, sf_dir)
    emb = cb.table("embeddings")
    top = emb.similar_topk("embedding", k=5).collect()
    assert len(top) == 5
    scores = [r["score"] for r in top]
    assert scores == sorted(scores, reverse=True)


def test_facade_import_workbook(spark, tmp_path):
    """Reference parity: open a workbook of named sheets as a database —
    each sheet a typed CellTable with point lookup."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from cellbase_spark.api import CellBase
    from cellbase_spark.sources.excel import write_xlsx_workbook

    write_xlsx_workbook(
        {
            "people": (["id", "name"], [[1, "ada"], [2, "bob"]]),
            "scores": (["id", "score"], [[1, 9.5], [2, 7.25]]),
        },
        str(tmp_path / "wb.xlsx"),
    )
    cb = CellBase(spark, str(tmp_path))
    tables = cb.import_workbook(
        str(tmp_path),
        {
            "people": StructType(
                [StructField("id", LongType()), StructField("name", StringType())]
            ),
            "scores": StructType(
                [StructField("id", LongType()), StructField("score", DoubleType())]
            ),
        },
    )
    assert sorted(tables) == ["people", "scores"]
    assert tables["people"].get(1)["name"] == "ada"
    assert tables["scores"].get(2)["score"] == 7.25
    assert tables["people"].count() == 2


def test_export_import_workbook_roundtrip(spark, sf_dir, tmp_path):
    """Reference loop closed both ways: tables -> one .xlsx workbook ->
    tables, values identical."""
    from cellbase_spark import schemas
    from cellbase_spark.api import CellBase

    cb = CellBase(spark, sf_dir)
    path = str(tmp_path / "export.xlsx")
    cb.export_workbook(
        {"region": cb.table("region"), "nation": cb.table("nation")}, path
    )
    back = cb.import_workbook(
        path, {"region": schemas.REGION, "nation": schemas.NATION}
    )
    orig = {r["n_nationkey"]: r["n_name"] for r in cb.table("nation").rows()}
    got = {r["n_nationkey"]: r["n_name"] for r in back["nation"].rows()}
    assert got == orig
    assert back["region"].count() == cb.table("region").count()


def test_save_xlsx_single_sheet(spark, sf_dir, tmp_path):
    from cellbase_spark import schemas
    from cellbase_spark.api import CellBase

    cb = CellBase(spark, sf_dir)
    path = str(tmp_path / "one.xlsx")
    cb.table("region").save(path, fmt="xlsx")
    back = cb.import_workbook(path, {"region": schemas.REGION})
    assert back["region"].count() == 5

def test_edit_save_xlsx_reload_roundtrip(spark, sf_dir, tmp_path):
    """The public reference's core demo loop, end-to-end on the
    spreadsheet face: edit (set_value / add_row / delete_row) ->
    save(fmt='xlsx') -> import_workbook reload -> the edited state, with
    every cell equal (VERDICT r3 'what's missing' 3)."""
    cb = CellBase(spark, sf_dir)
    nation = cb.table("nation")
    edited = (
        nation.set_value(3, "n_name", "RENAMED")
        .delete_row(7)
        .add_row({"n_nationkey": 999, "n_name": "ATLANTIS", "n_regionkey": 0})
    )
    wb = str(tmp_path / "nation.xlsx")
    edited.save(wb, fmt="xlsx")

    back = cb.import_workbook(wb, {"nation": nation.df.schema})["nation"]
    want = {
        (r["n_nationkey"], r["n_name"], r["n_regionkey"])
        for r in edited.rows()
    }
    got = {
        (r["n_nationkey"], r["n_name"], r["n_regionkey"])
        for r in back.rows()
    }
    assert got == want
    assert back.get(3)["n_name"] == "RENAMED"
    assert back.get(7) is None
    assert back.get(999)["n_name"] == "ATLANTIS"


def test_xlsx_export_guard_rejects_fact_tables(spark, sf_dir, tmp_path, monkeypatch):
    """The driver-collect xlsx paths must refuse tables above the row cap
    and point at the distributed cellbase_xlsx sink (VERDICT r3 'what's
    wrong' 2). Cap monkeypatched low so the guard triggers at test scale."""
    import pytest

    import cellbase_spark.api as api_mod

    monkeypatch.setattr(api_mod, "XLSX_EXPORT_MAX_ROWS", 10)
    cb = CellBase(spark, sf_dir)
    orders = cb.table("orders")
    with pytest.raises(ValueError, match="cellbase_xlsx"):
        orders.save(str(tmp_path / "orders.xlsx"), fmt="xlsx")
    with pytest.raises(ValueError, match="cellbase_xlsx"):
        cb.export_workbook({"orders": orders}, str(tmp_path / "wb.xlsx"))
    # dim-sized tables still pass under the real cap
    monkeypatch.setattr(api_mod, "XLSX_EXPORT_MAX_ROWS", 1_000_000)
    cb.table("region").save(str(tmp_path / "region.xlsx"), fmt="xlsx")


def test_duplicated_spans_api(spark):
    """duplicated_spans finds the shared 4-token span across two rows and
    excludes spans unique to one row; counts and min_key are exact."""
    from cellbase_spark.api import CellTable

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over"),
            (2, "a lazy dog the quick brown fox sits"),
            (3, "completely different words here entirely now"),
        ],
        "doc_id long, text string",
    )
    t = CellTable(df, "docs", key_col="doc_id")
    got = {r["span_hash"]: (r["n_rows"], r["n_occ"], r["min_key"])
           for r in t.duplicated_spans("text", window=4).collect()}
    # exactly one 4-token span is shared: "the quick brown fox"
    assert len(got) == 1
    assert list(got.values()) == [(2, 2, 1)]


def test_data_card_api(spark):
    from cellbase_spark.api import CellTable

    df = spark.createDataFrame(
        [(1, "a b c", "web"), (2, "d e", "web"), (3, "f", "book")],
        "doc_id long, text string, src string",
    )
    t = CellTable(df, "docs", key_col="doc_id")
    got = {r["src"]: (r["n_rows"], r["total_tokens"], r["total_chars"])
           for r in t.data_card("text", "src").collect()}
    assert got == {"web": (2, 5, 8), "book": (1, 1, 1)}


def test_source_overlap_api(spark):
    from cellbase_spark.api import CellTable

    df = spark.createDataFrame(
        [
            (1, "t1 t2 t3 t4", "A"),
            (2, "t1 t2 t3 t4", "B"),     # mirrors A: 1 shared 4-span
            (3, "u1 u2 u3 u4", "B"),
            (4, "v1 v2 v3 v4", "C"),     # no overlap with anyone
        ],
        "doc_id long, text string, src string",
    )
    t = CellTable(df, "docs", key_col="doc_id")
    got = {(r["grp_a"], r["grp_b"]): (r["n_shared"], r["n_a"], r["n_b"], r["jaccard"])
           for r in t.source_overlap("text", "src", window=4).collect()}
    assert got == {("A", "B"): (1, 1, 2, 0.5)}


def test_normalize_zscore_api(spark):
    from cellbase_spark.api import CellTable

    df = spark.createDataFrame(
        [(1, "A", 1.0), (2, "A", 3.0), (3, "B", 9.9)],
        "doc_id long, grp string, x double",
    )
    t = CellTable(df, "docs", key_col="doc_id")
    got = {r["doc_id"]: r["z"] for r in t.normalize_zscore("x", "grp").df.collect()}
    assert got == {1: -1.0, 2: 1.0, 3: 0.0}


def test_api_checkpoint_survives_registry_build(spark, sf_dir):
    """Round-6 ckpt scoping fix (ADVICE r5 medium): a checkpoint-backed
    DataFrame returned by the public API must stay collectible AFTER an
    unrelated registered-query build runs (registry builds release only
    handles recorded inside registry_build scope)."""
    import cellbase_spark.queries  # noqa: F401  (populates REGISTRY)
    from cellbase_spark.api import CellBase
    from cellbase_spark.operators import ckpt
    from cellbase_spark.registry import REGISTRY

    cb = CellBase(spark, sf_dir)
    docs = cb.table("documents")
    clusters = docs.dedup_clusters("text")  # API path may checkpoint
    # API-created checkpoints must NOT be in the registry release list
    assert not ckpt._LIVE, "API build recorded handles into _LIVE"
    # run a registered query that itself checkpoints, end-to-end
    REGISTRY["q_sql_recursive"].fn(spark, sf_dir).collect()
    # the API frame is still consumable — its blocks were never freed
    assert clusters.count() > 0


def test_source_overlap_api_is_lazy(spark):
    """Round-6 laziness fix (ADVICE r5 low): source_overlap must not run
    driver actions at construction — totals join in lazily, so the plan
    reflects the table state at EXECUTION time."""
    from cellbase_spark.api import CellTable

    base = spark.createDataFrame(
        [(1, "a b c d e f g h", "s1"), (2, "a b c d e f g h", "s2")],
        "doc_id long, text string, source string",
    )
    t = CellTable(base, "documents")
    plan = t.source_overlap("text", "source", window=4)
    rows = {(r["grp_a"], r["grp_b"]): r["n_shared"] for r in plan.collect()}
    assert rows == {("s1", "s2"): 5}


def test_build_index_then_dedup_incremental(spark, tmp_path):
    """API daily loop: build the persisted index for a corpus table,
    probe it with a new batch — exact dup found via the fingerprint
    star at J=1.0, near-dup found via the banded probe; a unique doc
    matches nothing."""
    from cellbase_spark.api import CellTable

    mk = lambda *rows: spark.createDataFrame(list(rows), "id long, text string")  # noqa: E731
    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16 w17 w18 w19 w20"
    corpus = CellTable(
        mk((1, base), (2, base + " extra21"), (3, "zz1 zz2 zz3 zz4 zz5")),
        "corpus",
        key_col="id",
    )
    idx = str(tmp_path / "idx")
    corpus.build_dedup_index("text", idx)
    batch = CellTable(
        mk((10, base), (11, "q1 q2 q3 q4 q5 q6 q7 q8")),
        "batch",
        key_col="id",
    )
    pairs = {
        (r["id_new"], r["id_corpus"]): r["jaccard"]
        for r in corpus.dedup_incremental(batch, "text", idx).collect()
    }
    assert pairs[(10, 1)] == 1.0       # exact star: canonical match
    assert (10, 2) in pairs            # banded near-dup (20/21 tokens)
    assert all(k[0] != 11 for k in pairs)  # unique doc matches nothing


def test_facade_ann_index_and_search(spark, sf_dir, tmp_path):
    """build_ann_index + ann_search (r7): probing an arbitrary query
    vector returns descending cosine scores, only from the probed
    inverted lists, and the probe result equals a brute-force rank
    restricted to those same lists (the probe loses nothing within
    its scan scope)."""
    import os

    from cellbase_spark.api import CellBase
    from cellbase_spark.operators.similarity import ivf_assign

    cb = CellBase(spark, sf_dir)
    emb = cb.table("embeddings")
    table = f"cb_api_annidx_{os.getpid()}"
    emb.build_ann_index("embedding", table, str(tmp_path / "annidx"))

    qv = [((i * 3) % 7) / 7.0 for i in range(1, 65)]  # arbitrary, not the bench vector
    got = emb.ann_search(table, qv, k=10, nprobe=2).collect()
    assert 0 < len(got) <= 10
    scores = [r.score for r in got]
    assert scores == sorted(scores, reverse=True)
    probed = {r.centroid_id for r in got}
    assert len(probed) <= 2

    # brute-force truth restricted to the probed lists
    qv_sql = "array(" + ", ".join(f"cast({float(v)!r} as double)" for v in qv) + ")"
    truth = (
        ivf_assign(load_table(spark, sf_dir, "embeddings"))
        .where(F.col("centroid_id").isin([int(c) for c in probed]))
        .withColumn("qv", F.expr(qv_sql))
        .withColumn(
            "score",
            F.round(
                F.expr(
                    "aggregate(zip_with(embedding, qv, (x, y) -> cast(x as double) * cast(y as double)),"
                    " cast(0 as double), (acc, v) -> acc + v)"
                )
                / (
                    F.expr(
                        "sqrt(aggregate(zip_with(embedding, embedding, (x, y) -> cast(x as double) * cast(y as double)),"
                        " cast(0 as double), (acc, v) -> acc + v))"
                    )
                    * F.expr(
                        "sqrt(aggregate(zip_with(qv, qv, (x, y) -> cast(x as double) * cast(y as double)),"
                        " cast(0 as double), (acc, v) -> acc + v))"
                    )
                ),
                6,
            ),
        )
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(len(got))
        .select("vec_id")
        .collect()
    )
    assert [r.vec_id for r in got] == [r.vec_id for r in truth]

def test_facade_ann_search_uses_recorded_geometry(spark, tmp_path):
    """Round-8 ADVICE medium regression: an index built with
    n_centroids=16 over NON-64-dim vectors must (a) record its geometry
    in table properties, (b) be probed over ALL 16 lists (the old code
    ranked only 0-7, so lists >= 8 were unreachable), and (c) reject a
    wrong-dimension query vector loudly instead of returning garbage."""
    import os

    import pytest

    from cellbase_spark.api import CellTable

    dim, n = 16, 240
    rows = [(i, [((i * 7 + d * 3) % 19) / 19.0 + 0.01 for d in range(dim)]) for i in range(n)]
    df = spark.createDataFrame(rows, "vid long, vec array<double>")
    t = CellTable(df, "minivecs", key_col="vid")
    table = f"cb_api_annidx16_{os.getpid()}"
    t.build_ann_index("vec", table, str(tmp_path / "annidx16"), n_centroids=16)

    props = {r.key: r.value for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()}
    assert props["cellbase.n_centroids"] == "16"
    assert props["cellbase.dim"] == str(dim)

    # lists >= 8 must exist AND be probe-reachable: probe with nprobe=16
    # (all lists) and check the full id set comes back in rank order
    lists = {r.centroid_id for r in spark.table(table).select("centroid_id").distinct().collect()}
    assert max(lists) >= 8, f"fixture too uniform, lists={sorted(lists)}"
    qv = [((d * 5) % 19) / 19.0 for d in range(dim)]
    got = t.ann_search(table, qv, k=n, nprobe=16).collect()
    assert len(got) == n
    assert {r.centroid_id for r in got} == lists
    scores = [r.score for r in got]
    assert scores == sorted(scores, reverse=True)
    assert all(s is not None for s in scores)

    with pytest.raises(ValueError, match="dims"):
        t.ann_search(table, [0.0] * 64, k=5)


def test_facade_ann_search_trained_centroids(spark, tmp_path):
    """Round-8 ADVICE high regression: an index built with LEARNED
    centroids must be PROBED with the same learned ranking. The index
    here uses explicit centroids at two blob centers with
    NON-CONTIGUOUS ids {0, 5} (the ADVICE low case): a formula-seed
    fallback ranking range(n_centroids=2) would probe id 1 — a list
    that does not exist — and return nothing; the fixed path reads
    cellbase.centroids back from the table properties and opens the one
    list that actually holds the query's blob."""
    import json
    import os

    from cellbase_spark.api import CellTable
    from cellbase_spark.operators.similarity import train_ivf_centroids

    dim, per = 8, 40
    blob_a = [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]
    blob_b = [0.0, 1.0, 0.0, 1.0, 0.0, 0.0, 1.0, 0.0]
    rows = []
    for i in range(per):
        jit = (i % 5) / 100.0
        rows.append((i, [v + jit for v in blob_a]))
        rows.append((per + i, [v + jit for v in blob_b]))
    df = spark.createDataFrame(rows, "vid long, vec array<double>")
    t = CellTable(df, "blobvecs", key_col="vid")
    table = f"cb_api_annidx_tr_{os.getpid()}"
    cents = {0: blob_a, 5: blob_b}
    t.build_ann_index("vec", table, str(tmp_path / "annidxtr"), centroids=cents)

    props = {r.key: r.value for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()}
    assert json.loads(props["cellbase.centroids"]) == {"0": blob_a, "5": blob_b}
    lists = {r.centroid_id for r in spark.table(table).select("centroid_id").distinct().collect()}
    assert lists == {0, 5}  # non-contiguous learned ids, as built

    # query at blob B's center, nprobe=1: must open list 5 only and
    # return only blob-B members in descending score order
    got = t.ann_search(table, blob_b, k=per, nprobe=1).collect()
    assert len(got) == per
    assert {r.centroid_id for r in got} == {5}
    assert all(r.vec_id >= per for r in got)
    scores = [r.score for r in got]
    assert scores == sorted(scores, reverse=True)

    # the TRAINED path end to end: Lloyd means from the formula seeds,
    # build from the learned table, full-width probe sees every row
    trained = train_ivf_centroids(df.select("vid", F.col("vec").alias("embedding")),
                                  n_centroids=4, vec_col="embedding", dim=dim, iters=1)
    assert trained and all(len(v) == dim for v in trained.values())
    table2 = f"cb_api_annidx_tr2_{os.getpid()}"
    t.build_ann_index("vec", table2, str(tmp_path / "annidxtr2"), centroids=trained)
    got2 = t.ann_search(table2, blob_a, k=2 * per, nprobe=len(trained)).collect()
    assert len(got2) == 2 * per


def test_facade_ann_search_adc(spark, sf_dir, tmp_path):
    """Round-9 facade ADC mode: ann_search(method='adc') must score the
    STORED codes against the index's codebook and rank identically to
    the inline pq_adc_expr computation for the same query vector (the
    facade's decimal-summed ADC equals the expression's rounded double
    fold because every subspace term is a round-6dp value and the total
    is a multiple of 1e-6). Unknown methods and no-codes indexes are
    rejected loudly."""
    import os

    import pytest

    from cellbase_spark.api import CellBase
    from cellbase_spark.operators.similarity import (
        ivf_assign,
        pq_adc_expr,
        pq_codes_expr,
    )

    cb = CellBase(spark, sf_dir)
    emb = cb.table("embeddings")
    table = f"cb_api_adc_{os.getpid()}"
    emb.build_ann_index("embedding", table, str(tmp_path / "adcidx"))

    qv = [((i * 37) % 101) / 101.0 for i in range(1, 65)]
    got = emb.ann_search(table, qv, k=40, nprobe=8, method="adc").collect()
    assert len(got) == 40
    dists = [r.adc_dist for r in got]
    assert dists == sorted(dists)

    truth = (
        ivf_assign(load_table(spark, sf_dir, "embeddings"))
        .withColumn("codes", F.expr(pq_codes_expr("embedding")))
        .select("vec_id", F.expr(pq_adc_expr("codes")).alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col("vec_id").asc())
        .limit(40)
        .collect()
    )
    assert [(r.vec_id, r.adc_dist) for r in got] == [
        (r.vec_id, r.adc_dist) for r in truth
    ]

    with pytest.raises(ValueError, match="unknown method"):
        emb.ann_search(table, qv, k=5, method="euclid")


def test_ann_search_refuses_propsless_index(spark, sf_dir, tmp_path):
    """Round-10 (r9 ADVICE): an index table with NO recorded cellbase.*
    geometry (interrupted build between saveAsTable and the properties
    ALTER, or genuinely pre-properties) is REFUSED by default — probing
    it with formula-seed defaults silently opens the wrong lists for a
    trained index. allow_legacy=True opts back in, loudly (a warning),
    and then behaves exactly like the old default-geometry path."""
    import os
    import warnings

    import pytest

    from cellbase_spark.api import CellBase
    from cellbase_spark.operators.similarity import _tblprops_cache

    cb = CellBase(spark, sf_dir)
    emb = cb.table("embeddings")
    table = f"cb_api_noprops_{os.getpid()}"
    emb.build_ann_index("embedding", table, str(tmp_path / "noprops"))

    # simulate the interrupted-build window: strip the recorded geometry
    spark.sql(
        f"ALTER TABLE {table} UNSET TBLPROPERTIES"
        " ('cellbase.n_centroids', 'cellbase.n_planes', 'cellbase.dim',"
        " 'cellbase.build_id')"
    )
    _tblprops_cache(spark).pop(table, None)

    qv = [((i * 3) % 7) / 7.0 for i in range(1, 65)]
    with pytest.raises(ValueError, match="no recorded"):
        emb.ann_search(table, qv, k=5)

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        got = emb.ann_search(table, qv, k=5, allow_legacy=True).collect()
    assert any("legacy default geometry" in str(w.message) for w in caught)
    assert 0 < len(got) <= 5
    scores = [r.score for r in got]
    assert scores == sorted(scores, reverse=True)


def test_table_props_ttl_and_build_id(spark, sf_dir, tmp_path):
    """Round-10 (r9 ADVICE medium): the table-properties cache EXPIRES —
    a stale entry past the TTL is re-read from the catalog, so a
    cross-process rebuild is picked up within TBLPROPS_TTL_SEC instead
    of never; within the TTL the cache serves without a collect. Every
    build records a fresh cellbase.build_id, so an in-process rebuild is
    observable immediately (invalidation) and a geometry-pinning
    consumer can detect a swap by comparing ids."""
    import os
    import time

    from cellbase_spark.api import CellBase
    from cellbase_spark.operators.similarity import _tblprops_cache, table_props

    cb = CellBase(spark, sf_dir)
    emb = cb.table("embeddings")
    table = f"cb_api_ttl_{os.getpid()}"
    emb.build_ann_index("embedding", table, str(tmp_path / "ttlidx"))

    props1 = table_props(spark, table)
    bid1 = props1["cellbase.build_id"]
    assert bid1

    # in-process rebuild invalidates the cache -> new build_id visible
    emb.build_ann_index("embedding", table, str(tmp_path / "ttlidx"))
    bid2 = table_props(spark, table)["cellbase.build_id"]
    assert bid2 != bid1

    # cross-process staleness: plant a poisoned cache entry. Fresh
    # timestamp -> served as-is (cache hit); timestamp past the TTL ->
    # re-read from the catalog, poison discarded.
    cache = _tblprops_cache(spark)
    poisoned = dict(table_props(spark, table), **{"cellbase.build_id": "stale"})
    cache[table] = (time.monotonic(), poisoned)
    assert table_props(spark, table)["cellbase.build_id"] == "stale"
    cache[table] = (time.monotonic() - 10_000.0, poisoned)
    assert table_props(spark, table)["cellbase.build_id"] == bid2
    # max_age_sec=0 forces a re-read regardless of entry age
    cache[table] = (time.monotonic(), poisoned)
    assert table_props(spark, table, max_age_sec=0)[
        "cellbase.build_id"
    ] == bid2


def test_session_memo_dies_with_session():
    """Round-10 (r9 ADVICE low): the per-session memos hold their owner
    weakly — entries vanish when the session object is collected, so a
    recycled id() can never alias a dead session's cache (the old
    id(spark)-keyed dicts could serve a new session the dead one's
    table names / partition counts / index geometry)."""
    import gc

    from cellbase_spark.memo import _SESSION_MEMOS, session_memo

    class FakeSession:  # stands in for SparkSession (weakref-able, hashable)
        pass

    before = len(_SESSION_MEMOS)
    s = FakeSession()
    memo = session_memo(s, "layout")
    memo["sf"] = ("t_l", "t_o")
    assert session_memo(s, "layout")["sf"] == ("t_l", "t_o")
    # distinct names are isolated
    session_memo(s, "other")["sf"] = "different"
    assert session_memo(s, "layout")["sf"] == ("t_l", "t_o")
    assert len(_SESSION_MEMOS) == before + 1

    del s, memo
    gc.collect()
    assert len(_SESSION_MEMOS) == before


def test_registry_checkpoint_handles_stay_bounded(spark, sf_dir):
    """Round-10 (r9 verdict nit): release_prior() must BOUND the
    recorded eager-checkpoint handle list across sequential registry
    builds — the drain runs at the start of every wrapped build, so
    after N checkpoint-using queries _LIVE holds at most the LAST
    build's handles, never the union (the unreleased union is what
    GC-locked the JVM in round 5). scripts/check_oracle.py asserts the
    same bound after every key of the full battery."""
    from cellbase_spark.operators import ckpt
    from cellbase_spark.registry import queries

    qs = queries()
    sizes = []
    for key in ("q_pagerank", "q_cc_iterative", "q_pagerank", "q_dedup_clusters"):
        qs[key](spark, sf_dir).collect()
        sizes.append(len(ckpt._LIVE))
    # bounded: each build's record is a handful of handles, and it never
    # accumulates across builds (sizes would be monotonically growing)
    assert all(s <= 64 for s in sizes), sizes
    assert sizes[2] <= sizes[0] + sizes[1], (
        "handles accumulated across sequential registry builds",
        sizes,
    )
    # an explicit drain empties the record entirely
    ckpt.release_prior()
    assert not ckpt._LIVE


def test_facade_ann_compaction_lifecycle(spark, sf_dir, tmp_path):
    """Round-10 facade: the full ANN index lifecycle is reachable from
    the API — build (trained or not) -> delta generation under the
    SAME geometry -> compact (full rewrite) AND compact-into (leaf-
    targeted in-place). The compacted artifacts must serve ann_search
    identically to probing before compaction."""
    import os

    from cellbase_spark.api import CellBase

    cb = CellBase(spark, sf_dir)
    emb = cb.table("embeddings")
    pid = os.getpid()
    base = f"cb_api_lc_base_{pid}"
    delta = f"cb_api_lc_delta_{pid}"
    emb.build_ann_index("embedding", base, str(tmp_path / "base"))
    # delta batch: every 97th vector, offset ids (same formula geometry)
    d = CellBase(spark, sf_dir).table("embeddings")
    d.df = d.df.where("vec_id % 97 = 3").selectExpr(
        "vec_id + 1000000 as vec_id", "embedding"
    )
    d.key_col = "vec_id"
    d.build_ann_index("embedding", delta, str(tmp_path / "delta"))

    qv = [((i * 3) % 7) / 7.0 for i in range(1, 65)]
    # truth: probe base and delta separately (same geometry, same probe
    # list), merge, re-rank — what a pre-compaction union serve returns
    got_b = emb.ann_search(base, qv, k=50, nprobe=2).collect()
    got_d = emb.ann_search(delta, qv, k=50, nprobe=2).collect()
    want = sorted(
        [(r.vec_id, r.score) for r in got_b] + [(r.vec_id, r.score) for r in got_d],
        key=lambda t: (-t[1], t[0]),
    )[:10]

    comp = f"cb_api_lc_comp_{pid}"
    emb.compact_ann_index(comp, str(tmp_path / "comp"), [base, delta])
    got_c = emb.ann_search(comp, qv, k=10, nprobe=2).collect()
    assert [(r.vec_id, r.score) for r in got_c] == want

    n = emb.compact_ann_index_into(base, [delta])
    assert n > 0
    got_p = emb.ann_search(base, qv, k=10, nprobe=2).collect()
    assert [(r.vec_id, r.score) for r in got_p] == want


def test_ensure_rebuilds_propsless_index(spark, sf_dir):
    """Round-10 review: an index table left WITHOUT its cellbase.*
    geometry (a build that crashed between saveAsTable and the
    properties ALTER) must be REBUILT by the ensure helpers, not served
    — a propsless trained index probed with fallback formula seeds
    would silently open the wrong lists. Strip the props, re-ensure,
    and the geometry must be back (fresh build)."""
    from cellbase_spark.operators.similarity import _tblprops_cache, table_props
    from cellbase_spark.queries.llm_similarity import (
        _ensure_trained_ann_delta,
        _index_ready,
    )

    t = _ensure_trained_ann_delta(spark, sf_dir)
    assert _index_ready(spark, t)
    spark.sql(
        f"ALTER TABLE {t} UNSET TBLPROPERTIES"
        " ('cellbase.n_centroids', 'cellbase.n_planes', 'cellbase.dim',"
        " 'cellbase.centroids', 'cellbase.pq_codebook',"
        " 'cellbase.build_id')"
    )
    _tblprops_cache(spark).clear()
    assert not _index_ready(spark, t)

    t2 = _ensure_trained_ann_delta(spark, sf_dir)
    assert t2 == t
    props = table_props(spark, t, max_age_sec=0)
    assert "cellbase.centroids" in props and "cellbase.build_id" in props


def test_facade_delete_lifecycle(spark, sf_dir, tmp_path):
    """The takedown verbs through the facade: ann_search excludes
    tombstoned vectors the moment delete_from_ann_index runs (and the
    next compaction serves the same answer physically); the dedup probe
    excludes a deleted corpus doc via delete_from_dedup_index."""
    import os

    from cellbase_spark.api import CellBase, CellTable

    cb = CellBase(spark, sf_dir)
    emb = cb.table("embeddings")
    table = f"cb_api_anndel_{os.getpid()}"
    emb.build_ann_index("embedding", table, str(tmp_path / "anndel"))

    qv = [((i * 5) % 11) / 11.0 for i in range(1, 65)]
    before = emb.ann_search(table, qv, k=10, nprobe=2).collect()
    assert before
    doomed = [int(r.vec_id) for r in before[:3]]
    assert emb.delete_from_ann_index(table, doomed) == len(doomed)
    after = emb.ann_search(table, qv, k=10, nprobe=2).collect()
    assert not {int(r.vec_id) for r in after} & set(doomed)
    # survivors keep their order/scores; the head is the old rank minus
    # the deleted prefix
    kept = [int(r.vec_id) for r in before if int(r.vec_id) not in doomed]
    assert [int(r.vec_id) for r in after][: len(kept)] == kept
    # physical repair serves the same answer with no tombstones left
    emb.compact_ann_index_into(table, [])
    again = emb.ann_search(table, qv, k=10, nprobe=2).collect()
    assert [int(r.vec_id) for r in again] == [int(r.vec_id) for r in after]
    spark.sql(f"DROP TABLE IF EXISTS {table}")

    # dedup half
    mk = lambda *rows: spark.createDataFrame(list(rows), "id long, text string")  # noqa: E731
    base = " ".join(f"w{i}" for i in range(1, 21))
    corpus = CellTable(
        mk((1, base), (2, base + " extra21")), "corpus", key_col="id"
    )
    idx = str(tmp_path / "dedupidx")
    corpus.build_dedup_index("text", idx)
    batch = CellTable(mk((10, base)), "batch", key_col="id")
    pairs = {
        (r.id_new, r.id_corpus)
        for r in corpus.dedup_incremental(batch, "text", idx).collect()
    }
    assert pairs == {(10, 1), (10, 2)}
    corpus.delete_from_dedup_index(idx, [1])
    pairs_after = {
        (r.id_new, r.id_corpus)
        for r in corpus.dedup_incremental(batch, "text", idx).collect()
    }
    assert pairs_after == {(10, 2)}


def test_facade_bm25_lifecycle(spark, tmp_path):
    """BM25 through the facade: build the postings index for a corpus
    table, search it, ingest a batch as a second generation (union
    search must see its docs with exactly-summed stats), then compact
    and get the same ranking from one artifact."""
    import os

    from cellbase_spark.api import CellTable

    mk = lambda *rows: spark.createDataFrame(list(rows), "id long, text string")  # noqa: E731
    corpus = CellTable(
        mk(
            (1, "spark joins stream data fast"),
            (2, "the quick brown fox"),
            (3, "spark spark spark and more spark"),
        ),
        "corpus",
        key_col="id",
    )
    base_t = f"cb_api_bm25_{os.getpid()}"
    corpus.build_bm25_index("text", base_t, str(tmp_path / "bm25"))
    top = corpus.bm25_search(base_t, ["spark", "stream"], k=3).collect()
    assert [int(r.doc_id) for r in top][:2] == [3, 1] or {
        int(r.doc_id) for r in top
    } >= {1, 3}
    assert all(r.score > 0 for r in top)

    batch = CellTable(
        mk((10, "stream stream stream processing")), "batch", key_col="id"
    )
    delta_t = f"cb_api_bm25d_{os.getpid()}"
    batch.build_bm25_index("text", delta_t, str(tmp_path / "bm25d"))
    union = corpus.bm25_search([base_t, delta_t], ["spark", "stream"], k=4).collect()
    assert 10 in {int(r.doc_id) for r in union}

    comp_t = f"cb_api_bm25c_{os.getpid()}"
    corpus.compact_bm25_index(comp_t, str(tmp_path / "bm25c"), [base_t, delta_t])
    comp = corpus.bm25_search(comp_t, ["spark", "stream"], k=4).collect()
    assert [(int(r.doc_id), r.score) for r in comp] == [
        (int(r.doc_id), r.score) for r in union
    ]
    for t in (base_t, delta_t, comp_t):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_facade_bm25_delete_lifecycle(spark, tmp_path):
    """The BM25 takedown verb end-to-end: a tombstoned index must
    answer EXACTLY like an index built from scratch over the survivors
    (the avgdl-correction pin — scores, not just membership), re-deletes
    are idempotent for both the anti-join and the stats subtraction,
    deleting a doc the generation never held is a no-op, and compaction
    drops the rows physically, leaving no tombstone side-table."""
    import os

    from pyspark.sql import functions as F

    from cellbase_spark.api import CellTable
    from cellbase_spark.operators.similarity import (
        table_props,
        tombstone_table_name,
    )
    from cellbase_spark.operators.text import compact_bm25_index

    mk = lambda *rows: spark.createDataFrame(list(rows), "id long, text string")  # noqa: E731
    rows = [
        (1, "spark joins stream data fast"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "spark spark spark and more spark"),
        (4, "stream processing with spark structured stream"),
        (5, "completely unrelated text about gardening and soil"),
    ]
    corpus = CellTable(mk(*rows), "corpus", key_col="id")
    pid = os.getpid()
    full_t = f"cb_api_bm25x_{pid}"
    corpus.build_bm25_index("text", full_t, str(tmp_path / "bm25x"))

    # reference: a from-scratch index over the survivors only
    survivors = CellTable(
        mk(*[r for r in rows if r[0] not in (2, 5)]), "surv", key_col="id"
    )
    ref_t = f"cb_api_bm25xr_{pid}"
    survivors.build_bm25_index("text", ref_t, str(tmp_path / "bm25xr"))
    want = [
        (int(r.doc_id), r.score)
        for r in survivors.bm25_search(ref_t, ["spark", "stream"], k=5).collect()
    ]

    assert corpus.delete_from_bm25_index(full_t, [2, 5]) == 2
    got = [
        (int(r.doc_id), r.score)
        for r in corpus.bm25_search(full_t, ["spark", "stream"], k=5).collect()
    ]
    # exact score equality: df, n_docs AND avgdl all corrected (doc 2/5
    # hold no query term, so only the stats correction can make this pass)
    assert got == want

    # idempotent re-delete + deleting an id this generation never held
    assert corpus.delete_from_bm25_index(full_t, [2, 5, 999]) == 2
    again = [
        (int(r.doc_id), r.score)
        for r in corpus.bm25_search(full_t, ["spark", "stream"], k=5).collect()
    ]
    assert again == got

    # physical half: compaction drops the rows and the tombstones
    comp_t = f"cb_api_bm25xc_{pid}"
    compact_bm25_index(spark, comp_t, str(tmp_path / "bm25xc"), [full_t])
    assert not spark.catalog.tableExists(tombstone_table_name(comp_t))
    assert int(table_props(spark, comp_t, max_age_sec=0)["cellbase.tombstones"]) == 0
    left = {
        int(r.doc_id)
        for r in spark.table(comp_t).select("doc_id").distinct().collect()
    }
    assert left == {1, 3, 4}
    props = table_props(spark, comp_t, max_age_sec=0)
    assert int(props["cellbase.n_docs"]) == 3
    surv_len = sum(len(r[1].split(" ")) for r in rows if r[0] not in (2, 5))
    assert int(props["cellbase.total_len"]) == surv_len
    comp = [
        (int(r.doc_id), r.score)
        for r in corpus.bm25_search(comp_t, ["spark", "stream"], k=5).collect()
    ]
    assert comp == want
    for t in (full_t, ref_t, comp_t):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.sql(f"DROP TABLE IF EXISTS {tombstone_table_name(t)}")


def test_bm25_lifecycle_composition_invariance(spark, tmp_path):
    """The mixed multi-step history (base gen + delta gen + takedown
    spanning BOTH generations): the union probe over the tombstoned
    generations, the probe over their compaction, and a from-scratch
    index over the survivors must produce IDENTICAL rankings and
    scores — the verbs commute with serving. Also pins that a takedown
    id absent from a generation contributes nothing to that
    generation's stats correction."""
    import os

    from cellbase_spark.api import CellTable
    from cellbase_spark.operators.similarity import tombstone_table_name
    from cellbase_spark.operators.text import (
        bm25_probe,
        compact_bm25_index,
        delete_from_bm25_index,
    )

    mk = lambda *rows: spark.createDataFrame(list(rows), "id long, text string")  # noqa: E731
    base_rows = [
        (1, "spark joins stream data fast"),
        (2, "the quick brown fox jumps over the dog"),
        (3, "spark spark spark and more spark"),
    ]
    delta_rows = [
        (10, "stream processing with spark structured stream"),
        (11, "gardening soil and compost notes"),
    ]
    pid = os.getpid()
    base_t, delta_t = f"cb_lc_b_{pid}", f"cb_lc_d_{pid}"
    CellTable(mk(*base_rows), "b", key_col="id").build_bm25_index(
        "text", base_t, str(tmp_path / "b")
    )
    CellTable(mk(*delta_rows), "d", key_col="id").build_bm25_index(
        "text", delta_t, str(tmp_path / "d")
    )
    # takedown spans both generations; each delete also names an id the
    # generation does NOT hold (must be a stats no-op there)
    doomed = [2, 11]
    assert delete_from_bm25_index(spark, base_t, doomed) == 1
    assert delete_from_bm25_index(spark, delta_t, doomed) == 1

    ref_t = f"cb_lc_r_{pid}"
    surv = [r for r in base_rows + delta_rows if r[0] not in doomed]
    CellTable(mk(*surv), "r", key_col="id").build_bm25_index(
        "text", ref_t, str(tmp_path / "r")
    )
    terms = ["spark", "stream"]
    want = [(int(r.doc_id), r.score)
            for r in bm25_probe(spark, ref_t, terms, k=5).collect()]
    union = [(int(r.doc_id), r.score)
             for r in bm25_probe(spark, [base_t, delta_t], terms, k=5).collect()]
    assert union == want

    comp_t = f"cb_lc_c_{pid}"
    compact_bm25_index(spark, comp_t, str(tmp_path / "c"), [base_t, delta_t])
    comp = [(int(r.doc_id), r.score)
            for r in bm25_probe(spark, comp_t, terms, k=5).collect()]
    assert comp == want
    left = {int(r.doc_id)
            for r in spark.table(comp_t).select("doc_id").distinct().collect()}
    assert left == {1, 3, 10}
    for t in (base_t, delta_t, ref_t, comp_t):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.sql(f"DROP TABLE IF EXISTS {tombstone_table_name(t)}")


def test_bucketed_table_get_prunes_to_one_bucket(spark, sf_dir):
    """CellBase.table(name, bucketed=True): same lookup answer as the
    plain layout, but the scan is bucket-pruned to 1/16 before any IO
    (r11 verdict task #5)."""
    cb = CellBase(spark, sf_dir)
    t = cb.table("customer", bucketed=True)
    row = t.get(1)
    assert row is not None and row["c_custkey"] == 1
    assert t.get(10**12) is None
    plan = (
        t.df.where(t.df["c_custkey"] == 1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SelectedBucketsCount: 1 out of 16" in plan
    # plain vs bucketed layouts agree row-for-row
    assert sorted(map(tuple, cb.table("customer").df.collect())) == sorted(
        map(tuple, t.df.collect())
    )


def test_bucketed_table_requires_key_column(spark, sf_dir):
    import pytest

    cb = CellBase(spark, sf_dir)
    with pytest.raises(ValueError, match="key column"):
        cb.table("lineitem", bucketed=True)


def test_ods_workbook_import_export_roundtrip(spark, sf_dir, tmp_path):
    """Facade parity for the LibreOffice format (round 12): export two
    tables as one .ods workbook, re-import with declared schemas, edit,
    save a single sheet back as .ods — the reference's full loop in the
    OpenDocument dialect."""
    from cellbase_spark import schemas
    from cellbase_spark.sources.ods import parse_ods_bytes

    cb = CellBase(spark, sf_dir)
    path = str(tmp_path / "dims.ods")
    cb.export_workbook(
        {"region": cb.table("region"), "nation": cb.table("nation")},
        path,
        fmt="ods",
    )
    tables = cb.import_workbook(
        path,
        {"region": schemas.REGION, "nation": schemas.NATION},
        fmt="ods",
    )
    assert tables["nation"].count() == cb.table("nation").count()
    assert tables["region"].get(0) is not None
    # single-sheet save in the ods dialect
    out = str(tmp_path / "region_edited.ods")
    tables["region"].set_value(0, "r_name", "EDITED").save(out, fmt="ods")
    grid = parse_ods_bytes(open(out, "rb").read())
    assert grid[0] == ["r_regionkey", "r_name"]
    assert ["0", "EDITED"] in grid[1:]


def test_workbook_fmt_rejected(spark, sf_dir, tmp_path):
    import pytest

    cb = CellBase(spark, sf_dir)
    with pytest.raises(ValueError, match="unsupported workbook format"):
        cb.import_workbook(str(tmp_path), {}, fmt="xls")
    with pytest.raises(ValueError, match="unsupported workbook format"):
        cb.export_workbook({}, str(tmp_path / "x"), fmt="xls")


def test_cellbase_vacuum_delegates_with_pins(spark, sf_dir, tmp_path):
    """CellBase.vacuum is the publish janitor behind the facade: stale
    engine scratch goes, young dirs and non-engine dirs stay."""
    import os
    import time

    from cellbase_spark.api import CellBase

    root = str(tmp_path)
    stale = os.path.join(root, "cellbase_spark_sfz_12345")
    os.makedirs(stale)
    old = time.time() - 7200
    os.utime(stale, (old, old))
    young = os.path.join(root, "cellbase_spark_sfz_54321")
    os.makedirs(young)

    deleted = CellBase(spark, sf_dir).vacuum(3600, scratch_root=root)
    assert deleted == [stale]
    assert not os.path.exists(stale) and os.path.exists(young)


def test_facade_attach_serves_published_artifact(spark, sf_dir, tmp_path):
    """CellBase.attach: the public face of cross-session serving — an
    artifact published under one name is re-registered (fresh catalog
    shape) and served without rebuild."""
    from cellbase_spark.api import CellBase
    from cellbase_spark.operators.publish import publish_artifact

    base = str(tmp_path / "fac_att")

    def w(tt, tp):
        spark.range(7).write.mode("overwrite").option("path", tp).format(
            "parquet"
        ).saveAsTable(tt)

    publish_artifact(spark, "fac_att_src", base, w, {"cellbase.kind": "demo"})
    spark.sql("DROP TABLE fac_att_src")  # fresh-session shape

    cb = CellBase(spark, sf_dir)
    t = cb.attach("fac_att_served", base)
    assert spark.table(t).count() == 7
    from cellbase_spark.operators.similarity import table_props

    assert table_props(spark, t, max_age_sec=0)["cellbase.kind"] == "demo"
    spark.sql(f"DROP TABLE {t}")
