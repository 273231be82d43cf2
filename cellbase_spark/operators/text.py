"""Text analysis operators for LLM-corpus pipelines: tokenization,
language-ID heuristic, quality scoring, token counting, fingerprinting.

All pure built-in expressions (codegen'd; no Python). Arithmetic uses
integer counts and single IEEE divisions only — bit-identical in any
engine, so every operator is oracle-checkable without rounding fudge.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 1_000_000_007
SEED = 7
BASE = 31

# Tiny marker vocabularies for the language-ID heuristic. A real system
# uses char-n-gram profiles (fastText-style); the heuristic's *shape* —
# per-language evidence scores -> argmax with deterministic tie-break —
# is what scales (one map pass, broadcastable profiles).
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "nicht", "mit"],
    "en": ["the", "and", "of", "to", "in", "is"],
    "es": ["el", "la", "los", "de", "que", "y"],
    "fr": ["le", "la", "les", "et", "des", "est"],
    "zh": ["de", "shi", "le", "bu", "wo", "zai"],
}


def tokens(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(c, " ")


def regex_tokens(text_col: str) -> Column:
    """BPE-ish lexer tokens: letter runs, digit runs (regexp_extract_all)."""
    return F.regexp_extract_all(F.col(text_col), F.lit("[a-z]+|[0-9]+"), 0)


def lang_scores(tokens_col: str) -> dict[str, Column]:
    """Marker-overlap count per language (array_intersect on a tiny
    broadcast-literal vocabulary)."""
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = ", ".join(f"'{m}'" for m in markers)
        out[lang] = F.expr(
            f"size(array_intersect(array_distinct({tokens_col}), array({arr})))"
        )
    return out


def lang_id(tokens_col: str) -> Column:
    """argmax language by marker evidence; ties break alphabetically."""
    scores = lang_scores(tokens_col)
    structs = F.array(
        *[F.struct(c.alias("s"), F.lit(lang).alias("lang")) for lang, c in sorted(scores.items())]
    )
    best = F.aggregate(
        structs,
        F.struct(F.lit(-1).alias("s"), F.lit("zz").alias("lang")),
        lambda acc, cur: F.when(cur["s"] > acc["s"], cur).otherwise(acc),
    )
    return best["lang"]


def quality_score(text_col: str, tokens_col: str) -> Column:
    """Deterministic quality heuristic in [0,1]:
    0.4*min(1, n_tokens/50) + 0.3*(1 - digit_ratio) + 0.3*min(1, avg_len/8)
    """
    n_tok = F.size(F.col(tokens_col))
    n_chars = F.length(F.col(text_col))
    n_digits = n_chars - F.length(F.regexp_replace(F.col(text_col), "[0-9]", ""))
    avg_len = (n_chars - (n_tok - 1)) / n_tok  # chars net of separators
    return (
        0.4 * F.least(F.lit(1.0), n_tok / F.lit(50.0))
        + 0.3 * (F.lit(1.0) - n_digits / n_chars)
        + 0.3 * F.least(F.lit(1.0), avg_len / F.lit(8.0))
    )


def rolling_fingerprint(text_col: str) -> Column:
    """Polynomial rolling hash over characters (seed 7, base 31, mod 1e9+7)
    — an order-sensitive document fingerprint (anagram texts differ, unlike
    bag-of-words hashes). One aggregate() fold; byte-identical in DuckDB
    via list_reduce (probed)."""
    return F.expr(
        f"aggregate(transform(split({text_col}, ''), c -> cast(ascii(c) as bigint)),"
        f" cast({SEED} as bigint), (acc, c) -> (acc * {BASE} + c) % {MOD})"
    )


def rolling_fingerprint_sql(text_expr: str) -> str:
    """DuckDB rendering of rolling_fingerprint (list_reduce lacks an init
    arg -> seed is prepended)."""
    return (
        f"list_reduce(list_prepend(CAST({SEED} AS BIGINT),"
        f" list_transform(string_split({text_expr}, ''), c -> CAST(ascii(c) AS BIGINT))),"
        f" (acc, c) -> (acc * {BASE} + c) % {MOD})"
    )


def build_bm25_index(
    docs,
    table: str,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> None:
    """Persist an INVERTED-INDEX postings artifact for BM25 serving —
    the ANN-index playbook (similarity.build_ann_index) applied to text
    retrieval (r10 VERDICT task #5). One ingest pass writes
    (token, doc_id, tf, dl) postings hive-partitioned by
    tok_bucket = pmod(xxhash64(token), n_buckets), registered as an
    external CATALOG table (partition metadata resolved once, the
    metastore model), with the corpus-global stats BM25 needs —
    n_docs, total_len — frozen into table properties at ingest. A
    probe (bm25_probe) then opens ONLY the query tokens' buckets
    (PartitionFilters IN-list): probe cost tracks the matching
    postings, never the corpus — the rescan form (q_bm25) re-reads and
    re-tokenizes every document per query.

    Per-token document frequency is NOT precomputed: df(token) is the
    row count of that token's postings, available inside the pruned
    read (a config-sized per-term aggregate at query time), so the
    artifact needs no second table. DELTAS: a new batch builds its own
    generation with this same function; bm25_probe unions generations
    with stats SUMMED from their properties (n_docs/total_len are
    additive over disjoint doc sets, df is computed in the union's
    pruned read) — a generation probe is EXACT, never stale, and
    compact_bm25_index merges generations back to one artifact."""
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("toks"),
        F.size(F.split(F.col(text_col), " ")).alias("dl"),
    )
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_len")
    ).first()
    postings = (
        d.select("doc_id", "dl", F.explode("toks").alias("token"))
        .groupBy("doc_id", "dl", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .withColumn(
            "tok_bucket", F.pmod(F.xxhash64("token"), F.lit(n_buckets))
        )
    )
    def _writer(tmp_table: str, tmp_path: str) -> None:
        (
            postings.repartition(F.col("tok_bucket"))
            .write.mode("overwrite")
            .partitionBy("tok_bucket")
            .option("path", tmp_path)
            .format("parquet")
            .saveAsTable(tmp_table)
        )

    from cellbase_spark.operators.publish import publish_artifact

    # crash-safe publish (r11 verdict #4): stats + marker stamped on the
    # temp table in one ALTER, verified, then swapped — a probe can
    # never resolve a postings table whose frozen n_docs/total_len are
    # missing or partial.
    publish_artifact(
        docs.sparkSession,
        table,
        path,
        _writer,
        {
            "cellbase.n_docs": str(int(stats.n_docs)),
            "cellbase.total_len": str(int(stats.total_len)),
            "cellbase.n_buckets": str(int(n_buckets)),
        },
    )


def delete_from_bm25_index(spark, table: str, doc_ids) -> int:
    """DELETE documents from a persisted BM25 postings artifact — the
    takedown verb (round 11), completing the text-index lifecycle to
    parity with the ANN index (similarity.delete_from_ann_index) and
    the dedup band table. Deletion is LOGICAL: the doomed doc_ids land
    in a tombstone side-table and every probe anti-joins them out; no
    postings leaf is rewritten until the next compaction drops the rows
    physically (the LSM/Delta logical-now/physical-later contract).

    BM25 needs one thing the ANN delete did not: the deleted documents'
    lengths. The index's frozen corpus stats (n_docs, total_len) feed
    avgdl, so a probe over the surviving docs must subtract the
    takedown's count and summed dl — otherwise every surviving score is
    computed against a stale avgdl and the delete is approximate, not
    exact. Each doc's dl rides on every one of its posting rows, so the
    tombstone row is (doc_id, dl), captured here by one pruned read of
    the generation being deleted from (ReadSchema doc_id+dl only, the
    doc_id filter pushed to parquet; nothing rewritten). A doc_id not
    present in this generation contributes no tombstone row — it was
    never in this generation's stats, so there is nothing to subtract
    (issue the delete against the generation(s) holding the doc; extra
    generations are harmless no-ops).

    `doc_ids`: a list (takedown-notice shape) or a DataFrame with a
    doc_id column (the scale path — never collected). Appends dedupe
    within the batch; repeats across calls are deduplicated at probe
    time by a distinct() over the takedown-sized side-table, keeping
    re-deletes idempotent for BOTH the anti-join and the stats
    subtraction. Records cellbase.tombstones (distinct count) and
    refreshes cellbase.build_id. Returns the distinct tombstone count."""
    import uuid

    from cellbase_spark.operators.similarity import (
        table_props,
        tombstone_table_name,
    )

    if not spark.catalog.tableExists(table):
        raise ValueError(
            f"delete_from_bm25_index: no such index table {table!r}"
        )
    from pyspark.sql import DataFrame

    if isinstance(doc_ids, DataFrame):
        doomed = doc_ids.select(F.col("doc_id").cast("long")).distinct()
    else:
        doc_ids = list(doc_ids)
        if not doc_ids:
            return int(
                table_props(spark, table, max_age_sec=0).get(
                    "cellbase.tombstones", 0
                )
            )
        doomed = spark.createDataFrame(
            [(int(i),) for i in doc_ids], "doc_id long"
        ).distinct()
    ts_rows = (
        spark.table(table)
        .join(F.broadcast(doomed), "doc_id", "semi")
        .select("doc_id", F.col("dl").cast("long"))
        .distinct()
    )
    ts = tombstone_table_name(table)
    ts_rows.write.mode("append").format("parquet").saveAsTable(ts)
    total = spark.table(ts).select("doc_id").distinct().count()
    from cellbase_spark.operators.publish import stamp_props

    stamp_props(
        spark,
        table,
        {
            "cellbase.tombstones": str(total),
            "cellbase.build_id": uuid.uuid4().hex,
        },
    )
    return total


def _bm25_tombstones(spark, tables: list[str], stats: list[dict]):
    """Distinct union of the (doc_id, dl) tombstone rows recorded on
    `tables` (None when no generation carries tombstones). `stats` are
    the generations' already-read properties — the has-tombstones check
    costs no extra catalog round-trip."""
    from cellbase_spark.operators.similarity import tombstone_table_name

    parts = [
        spark.table(tombstone_table_name(t)).select("doc_id", "dl")
        for t, p in zip(tables, stats)
        if int(p.get("cellbase.tombstones", 0) or 0) > 0
    ]
    if not parts:
        return None
    u = parts[0]
    for x in parts[1:]:
        u = u.unionByName(x)
    return u.distinct()


def compact_bm25_index(spark, out_table: str, path: str, generations: list[str]) -> None:
    """Merge BM25 postings generations into one compacted artifact —
    the band-table/ANN compaction discipline applied to text retrieval
    (round 11): rows carried verbatim (tf/dl are per-(doc, token)
    facts; nothing re-tokenizes), one exchange re-clustering every
    tok_bucket leaf, and the corpus stats SUMMED across generations
    (n_docs/total_len are additive over disjoint doc sets — the
    property that keeps BM25 generations exact rather than stale, see
    bm25_probe). n_buckets must match across generations (the bucket
    function IS this index's geometry; a delta bucketed differently
    would route probes to the wrong leaves, silently).

    Tombstoned documents (delete_from_bm25_index) are dropped
    PHYSICALLY here — their posting rows excluded from the rewrite and
    their count/summed-dl subtracted from the compacted stats — and the
    compacted table starts with no tombstones at all: probed with no
    anti-join and no stats correction, it must answer exactly as the
    tombstoned generations did (logical and physical deletion
    indistinguishable to a probe — the delete contract)."""
    from cellbase_spark.operators.similarity import (
        table_props,
        tombstone_table_name,
    )

    if not generations:
        raise ValueError("compact_bm25_index: no generations to compact")
    stats = [table_props(spark, g, max_age_sec=0) for g in generations]
    buckets = {int(p["cellbase.n_buckets"]) for p in stats}
    if len(buckets) != 1:
        raise ValueError(
            f"compact_bm25_index: generations disagree on n_buckets"
            f" ({sorted(buckets)}) — rebuild the outliers first"
        )
    merged = spark.table(generations[0])
    for g in generations[1:]:
        merged = merged.unionByName(spark.table(g))
    n_docs = sum(int(p["cellbase.n_docs"]) for p in stats)
    total_len = sum(int(p["cellbase.total_len"]) for p in stats)
    tombs = _bm25_tombstones(spark, generations, stats)
    if tombs is not None:
        adj = tombs.agg(
            F.count(F.lit(1)).alias("n"), F.sum("dl").alias("dl")
        ).first()
        n_docs -= int(adj.n)
        total_len -= int(adj.dl or 0)
        merged = merged.join(
            F.broadcast(tombs.select("doc_id")), "doc_id", "left_anti"
        )
    def _writer(tmp_table: str, tmp_path: str) -> None:
        (
            merged.repartition(F.col("tok_bucket"))
            .write.mode("overwrite")
            .partitionBy("tok_bucket")
            .option("path", tmp_path)
            .format("parquet")
            .saveAsTable(tmp_table)
        )

    from cellbase_spark.operators.publish import publish_artifact

    # The compacted artifact is born clean: a stale side-table under the
    # output name (e.g. from a dropped-and-rebuilt table of the same
    # name) would resurrect someone else's takedowns into this probe.
    spark.sql(f"DROP TABLE IF EXISTS {tombstone_table_name(out_table)}")
    # crash-safe publish (r11 verdict #4): summed/corrected stats +
    # marker stamped pre-swap; the source generations' build_ids are
    # recorded as absorbed for audit parity with the ANN compactions.
    publish_artifact(
        spark,
        out_table,
        path,
        _writer,
        {
            "cellbase.n_docs": str(n_docs),
            "cellbase.total_len": str(total_len),
            "cellbase.n_buckets": str(buckets.pop()),
            "cellbase.tombstones": "0",
        },
        absorbed_ids={
            bid
            for bid in (p.get("cellbase.build_id") for p in stats)
            if bid
        },
    )


def bm25_probe(spark, table, terms: list[str], k: int = 20):
    """Serve BM25 top-k for `terms` from the persisted postings index:
    the scan opens only the query tokens' buckets (PartitionFilters
    IN-list over tok_bucket — bucket ids recomputed with the SAME
    xxhash64 expression the build used, via a |terms|-row config
    collect) and pushes the token IN-filter into those files. df per
    term is a |terms|-row aggregate over the pruned read, broadcast
    back; per-doc scoring PIVOTS the per-term contributions into
    columns and adds them in the terms' WRITTEN order — bit-identical
    to the rescan form's fixed expression tree (a float SUM aggregate
    would re-associate the additions; with coalesce-to-0.0 for absent
    terms the pivoted addition is exactly the rescan expression).

    `table` may be a LIST of generations (base + delta batches, the
    build_ann_index lifecycle applied to text): each generation's scan
    is pruned identically and unioned, and the corpus stats are SUMMED
    across the generations' frozen properties — n_docs and total_len
    are additive over disjoint doc sets and df is computed inside the
    union's pruned read, so a generation probe is EXACT, not
    stale-until-compaction (the nicety BM25 has over geometry-frozen
    ANN deltas). n_buckets must agree across generations.

    TOMBSTONES (delete_from_bm25_index): deleted docs are anti-joined
    out BEFORE df is computed (df over survivors only), and the frozen
    n_docs/total_len are corrected by the takedown's distinct count and
    summed dl — one takedown-sized aggregate collected to the driver —
    so the probe over a tombstoned index EXACTLY matches a rescan of
    the surviving corpus, avgdl included.

    Only docs holding >= 1 query term are rankable — identical to the
    rescan top-k whenever k docs score positive (always, for real
    corpora and idf > 0)."""
    from cellbase_spark.operators.similarity import table_props

    tables = [table] if isinstance(table, str) else list(table)
    terms_list = list(terms)
    if len(set(terms_list)) != len(terms_list):
        raise ValueError("bm25_probe: duplicate query terms")
    if {"doc_id", "score"} & set(terms_list):
        # pivot names result columns after the terms themselves; a term
        # literally called doc_id/score would collide with the output
        # schema and mis-resolve silently
        raise ValueError(
            "bm25_probe: terms named 'doc_id'/'score' collide with the"
            " output schema"
        )
    stats = [table_props(spark, t) for t in tables]
    buckets_set = {int(p["cellbase.n_buckets"]) for p in stats}
    if len(buckets_set) != 1:
        raise ValueError(
            f"bm25_probe: generations disagree on n_buckets"
            f" ({sorted(buckets_set)})"
        )
    n_docs = sum(int(p["cellbase.n_docs"]) for p in stats)
    total_len = sum(int(p["cellbase.total_len"]) for p in stats)
    n_buckets = buckets_set.pop()
    terms = list(terms)
    tdf = spark.createDataFrame([(t,) for t in terms], "token string")
    buckets = [
        int(r.b)
        for r in tdf.select(
            F.pmod(F.xxhash64("token"), F.lit(n_buckets)).alias("b")
        ).collect()
    ]
    pred = F.col("tok_bucket").isin(sorted(set(buckets))) & F.col(
        "token"
    ).isin(terms)
    p = spark.table(tables[0]).where(pred)
    for t in tables[1:]:
        p = p.unionByName(spark.table(t).where(pred))
    tombs = _bm25_tombstones(spark, tables, stats)
    if tombs is not None:
        adj = tombs.agg(
            F.count(F.lit(1)).alias("n"), F.sum("dl").alias("dl")
        ).first()
        n_docs -= int(adj.n)
        total_len -= int(adj.dl or 0)
        p = p.join(F.broadcast(tombs.select("doc_id")), "doc_id", "left_anti")
    df_tab = p.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    avgdl = float(total_len) / n_docs
    idf = F.round(
        F.log(
            (F.lit(n_docs) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
            + F.lit(1.0)
        ),
        6,
    )
    tf = F.col("tf").cast("double")
    denom = tf + F.lit(1.2) * (
        F.lit(0.25) + F.lit(0.75) * (F.col("dl") / F.lit(avgdl))
    )
    contrib = (idf * (tf * F.lit(2.2)) / denom).alias("contrib")
    per_term = p.join(F.broadcast(df_tab), "token").select(
        "doc_id", "token", contrib
    )
    pivoted = (
        per_term.groupBy("doc_id")
        .pivot("token", terms)
        .agg(F.first("contrib"))
        .na.fill(0.0, terms)
    )
    score = F.col(terms[0])
    for t in terms[1:]:
        score = score + F.col(t)
    return (
        pivoted.select("doc_id", F.round(score, 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
