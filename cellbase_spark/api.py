"""User-facing facade with the reference's ergonomics on Spark's engine.

The reference (imjp94/cellbase, SURVEY.md §1) exposes: a workbook of named
tables, each backed by one spreadsheet file; rows materialized as typed
objects; point lookup by the key column; callers iterate and filter in
their own code. This facade keeps that mental model — `CellBase` is the
workbook, `CellTable` a sheet, `get()` the id lookup — while every call
compiles to a DataFrame plan that Catalyst optimizes and that scales to a
cluster unchanged:

- `get(id)` is a pushed-down parquet point lookup (row-group + page-index
  skipping), not an in-memory dictionary — same API, 100 TB-safe.
- `where(...)` / `select(...)` stay lazy; `rows()` is the only action.
- the whole table never materializes on the driver unless the caller
  explicitly asks for `rows()` on an unfiltered table.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame, Row, SparkSession

from cellbase_spark import schemas
from cellbase_spark.io import load_table, read_csv_table

# Driver-collect ceiling for the spreadsheet export paths (save(fmt='xlsx')
# and export_workbook): a workbook is a single small file by nature, so
# these paths collect() — which is only safe for dim-sized tables. Above
# the cap they raise and point at the distributed format("cellbase_xlsx")
# sink instead of silently OOM-ing the driver (VERDICT r3 "what's wrong" 2).
XLSX_EXPORT_MAX_ROWS = 1_000_000

# reference convention: the first column is the row key (SURVEY.md §1.2);
# for the driver testdata tables the key column is explicit:
KEY_COLUMNS = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "supplier": "s_suppkey",
    "customer": "c_custkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


class CellTable:
    """One table (the reference's 'sheet'), lazily backed by a DataFrame."""

    def __init__(self, df: DataFrame, name: str, key_col: str | None = None):
        self.df = df
        self.name = name
        self.key_col = key_col or KEY_COLUMNS.get(name) or df.columns[0]

    def get(self, key) -> Row | None:
        """Point lookup by the key column (pushed-down scan filter)."""
        hits = self.df.where(self.df[self.key_col] == key).limit(2).collect()
        if len(hits) > 1:
            raise ValueError(f"key {key!r} is not unique in {self.name}")
        return hits[0] if hits else None

    def where(self, condition: Column | str) -> "CellTable":
        return CellTable(self.df.where(condition), self.name, self.key_col)

    def select(self, *cols) -> "CellTable":
        return CellTable(self.df.select(*cols), self.name, self.key_col)

    def rows(self) -> list[Row]:
        """Materialize (the reference's load-all; here an explicit action)."""
        return self.df.collect()

    def __iter__(self) -> Iterator[Row]:
        return iter(self.df.toLocalIterator())

    def count(self) -> int:
        return self.df.count()

    # -- mutation verbs (reference: set_value / add_row / remove_row /
    # save on the in-memory sheet). Spark DataFrames are immutable, so
    # each verb is copy-on-write: it returns a NEW CellTable whose plan
    # encodes the edit. Nothing materializes until save()/rows(); a chain
    # of edits stays one Catalyst plan (narrow maps — no shuffle), so the
    # 100 TB cost of N edits is one scan + one write, not N passes. -----

    # -- pipeline verbs: the LLM-data operators exposed where a reference
    # user would look for them. Each delegates to the tested operator in
    # cellbase_spark.operators (same plans as the q_* registry keys). ---

    def dedup_exact(self, text_col: str) -> "CellTable":
        """Drop exact duplicates of normalized text, keeping the min-key
        row per content hash (operators/dedup.exact_dedup plan shape)."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        h = F.md5(F.lower(F.trim(F.col(text_col))))
        w = Window.partitionBy(h).orderBy(F.col(self.key_col).asc())
        out = (
            self.df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        return CellTable(out, self.name, self.key_col)

    def near_dup_pairs(
        self, text_col: str, threshold: float = 0.9, block_col: str | None = None
    ) -> DataFrame:
        """Near-duplicate pairs by token Jaccard (prefix-filtered join;
        see operators/dedup.jaccard_pairs for the scale notes)."""
        from pyspark.sql import functions as F

        from cellbase_spark.operators.dedup import jaccard_pairs

        t = self.df.select(
            self.key_col,
            *( [block_col] if block_col else [] ),
            F.split(F.col(text_col), " ").alias("_toks"),
        )
        return jaccard_pairs(
            t,
            id_col=self.key_col,
            tokens_col="_toks",
            block_col=block_col,
            threshold=threshold,
        )

    def dedup_clusters(
        self,
        text_col: str,
        threshold: float = 0.95,
        band_bucket_cap: int = 0,
    ) -> DataFrame:
        """Cluster near-duplicates (MinHash-LSH pairs -> connected
        components); returns (key, cluster_id, is_canonical) per row.
        band_bucket_cap > 0 enables the 100 TB skew guard (over-full
        band buckets excluded — pair with exact-hash dedup for the
        mega-cliques; see q_dedup_full for the full composition)."""
        from pyspark.sql import functions as F

        from cellbase_spark.operators.dedup import (
            connected_components,
            minhash_lsh_pairs,
        )

        t = self.df.select(
            self.key_col, F.split(F.col(text_col), " ").alias("_toks")
        )
        pairs = minhash_lsh_pairs(
            t, id_col=self.key_col, tokens_col="_toks", bands=2,
            threshold=threshold, bitmap_vocab_limit=4096,
            band_bucket_cap=band_bucket_cap,
        )
        return connected_components(
            self.df.select(self.key_col), pairs, id_col=self.key_col
        )

    def similar_topk(self, vec_col: str, k: int = 20) -> DataFrame:
        """Top-k rows by cosine similarity to the deterministic query
        vector (operators/similarity.cosine_topk)."""
        from cellbase_spark.operators.similarity import cosine_topk

        return cosine_topk(self.df, k=k, vec_col=vec_col, id_col=self.key_col)

    def build_ann_index(
        self,
        vec_col: str,
        table: str,
        path: str,
        n_centroids: int = 8,
        n_planes: int = 8,
        centroids: dict[int, list[float]] | None = None,
        pq_codebook: dict[int, dict[int, list[float]]] | None = None,
    ) -> None:
        """Persist this table's ANN index: every vector coarse-quantized
        once (IVF centroid + LSH bucket) into ONE catalog table
        hive-partitioned by both keys (operators/similarity.
        build_ann_index). Paid once at ingest; `ann_search` probes it
        without rescanning or re-quantizing this table — the measured
        alternative (inline assignment per query) was SLOWER than brute
        force at scale (BASELINE.md round-7 ANN section).

        `centroids` switches the IVF lists from the formula seeds to a
        LEARNED centroid table (train_ivf_centroids) — the geometry is
        recorded with the index and `ann_search` ranks against it, so
        the served probe opens the same lists the build populated.
        `pq_codebook` likewise switches the stored codes tier to a
        LEARNED codebook (train_pq_codebook), served by
        `ann_search(method='adc')` — the facade builds everything it
        can serve."""
        from pyspark.sql import functions as F

        from cellbase_spark.operators.similarity import build_ann_index

        build_ann_index(
            self.df.select(
                F.col(self.key_col).alias("vec_id"),
                F.col(vec_col).alias("embedding"),
            ),
            table,
            path,
            n_centroids=n_centroids,
            n_planes=n_planes,
            centroids=centroids,
            pq_codebook=pq_codebook,
        )

    def ann_search(
        self,
        index_table: str,
        query_vec: list[float],
        k: int = 20,
        nprobe: int = 2,
        method: str = "cosine",
        allow_legacy: bool = False,
    ) -> DataFrame:
        """Approximate top-k cosine neighbors of an ARBITRARY query
        vector against a persisted index (build_ann_index): the query's
        nprobe nearest inverted lists become a PartitionFilters IN-list
        (only those directories are opened), exact cosine ranks the
        candidates. The query's centroid ranking runs through the SAME
        Spark fold/round expressions as the index build — a driver-side
        float loop could diverge on tie rounding.

        The probe geometry (n_centroids, vector dim, and — for a
        TRAINED index — the learned centroid table itself) is read from
        the table properties build_ann_index recorded with the index: an
        n_centroids=16 index is ranked over all 16 lists, an index built
        with train_ivf_centroids output is ranked against those SAME
        learned centroids (a formula-seed ranking would open the wrong
        lists and silently miss neighbors whenever nprobe < n_centroids
        — round-8 ADVICE high), and a query vector whose length differs
        from the indexed dimension is rejected loudly instead of
        silently scoring null. An index with NO recorded cellbase.*
        geometry (a build that crashed between the table write and the
        properties ALTER, or a genuinely pre-properties index) is
        REFUSED unless allow_legacy=True, which opts back into the old
        default geometry (8 centroids, 64 dims, formula seeds) with a
        warning (round-9 ADVICE). The property lookup is cached per
        (session, table) with a TTL (operators.similarity.
        TBLPROPS_TTL_SEC) so cross-process rebuilds are picked up;
        in-process build_ann_index invalidates immediately, and every
        build records a fresh cellbase.build_id for staleness
        detection.

        `method`: "cosine" (default) scores candidates by exact cosine
        over the raw vectors; "adc" scores by ASYMMETRIC DISTANCE over
        the STORED 8-byte PQ codes — the serving tier never reads the
        raw vector column (8 bytes/candidate instead of 256; ascending
        distance, so smaller is closer). ADC uses the codebook the
        index was built with: cellbase.pq_codebook for a trained-codes
        index, else the formula codebook; only 64-dim indexes carry a
        codes tier, anything else is rejected loudly. The 8-term ADC
        total is an exact DECIMAL sum of round-6dp subspace distances
        (order-free — the agg may hash-combine freely).

        Static method on the table only for namespacing: the search
        touches the index, never this table's rows."""
        from pyspark.sql import functions as F

        from cellbase_spark.operators.similarity import (
            decode_index_props,
            dot_expr,
            formula_pq_codebook,
            norm_expr,
            table_props,
        )
        from cellbase_spark.queries.llm_similarity import _query_probe_centroids

        if method not in ("cosine", "adc"):
            raise ValueError(f"ann_search: unknown method {method!r}")
        spark = self.df.sparkSession
        props = table_props(spark, index_table)
        if "cellbase.n_centroids" not in props or "cellbase.dim" not in props:
            # Geometry properties are written in ONE ALTER right after
            # the index data lands (build_ann_index): their absence means
            # either a build that crashed in the non-atomic window
            # between saveAsTable and the ALTER, or a genuinely
            # pre-properties index. Probing such a table with the
            # formula-seed defaults silently opens the wrong lists for a
            # trained index (r9 ADVICE low), so refuse by default;
            # allow_legacy=True opts a known pre-properties index back
            # into the old default-geometry behavior, loudly.
            if not allow_legacy:
                raise ValueError(
                    f"ann_search: index {index_table!r} has no recorded"
                    " cellbase.* geometry (interrupted build, or a"
                    " pre-properties index). Rebuild it with"
                    " build_ann_index, or pass allow_legacy=True to"
                    " probe with the build defaults (8 centroids,"
                    " 64 dims, formula seeds)."
                )
            import warnings

            warnings.warn(
                f"ann_search: probing {index_table!r} with legacy default"
                " geometry (no cellbase.* properties recorded)",
                stacklevel=2,
            )
        n_centroids = int(props.get("cellbase.n_centroids", 8))
        dim = int(props.get("cellbase.dim", 64))
        if len(query_vec) != dim:
            raise ValueError(
                f"ann_search: query vector has {len(query_vec)} dims but "
                f"index {index_table!r} was built over {dim} dims"
            )
        if method == "adc" and dim != 64:
            raise ValueError(
                f"ann_search(method='adc'): index {index_table!r} has no "
                f"codes tier (dim={dim}; the PQ codebook is 64-dim-tied)"
            )
        centroids, recorded_cb = decode_index_props(props)
        qv_sql = "array(" + ", ".join(f"cast({float(v)!r} as double)" for v in query_vec) + ")"
        ids = _query_probe_centroids(
            spark,
            nprobe=min(nprobe, n_centroids),
            qv_sql=qv_sql,
            n_centroids=n_centroids,
            dim=dim,
            centroids=centroids,
        )
        idx = spark.table(index_table).where(F.col("centroid_id").isin(ids))
        # logical deletes (delete_from_ann_index): tombstoned rows never
        # reach ranking; one cached-props check, broadcast anti-join
        from cellbase_spark.operators.similarity import apply_tombstones

        idx = apply_tombstones(spark, index_table, idx)
        if method == "adc":
            cb = recorded_cb if recorded_cb is not None else formula_pq_codebook()
            carr = spark.createDataFrame(
                [(s, c, cb[s][c]) for s in sorted(cb) for c in sorted(cb[s])],
                "s int, c long, cvec array<double>",
            )
            qcfg = spark.range(1).select(F.expr(qv_sql).alias("qv"))
            qdist = (
                "round(aggregate(sequence(1, 8), cast(0 as double), (acc, i) ->"
                " acc + (element_at(qv, s * 8 + i) - element_at(cvec, i))"
                " * (element_at(qv, s * 8 + i) - element_at(cvec, i))), 6)"
            )
            return (
                idx.select(
                    "vec_id",
                    F.col("centroid_id").cast("int").alias("centroid_id"),
                    F.posexplode("codes").alias("s", "c"),
                )
                .join(F.broadcast(carr), ["s", "c"])
                .crossJoin(F.broadcast(qcfg))
                .select("vec_id", "centroid_id", F.expr(qdist).alias("d"))
                .groupBy("vec_id", "centroid_id")
                .agg(
                    F.sum(F.col("d").cast("decimal(25,10)"))
                    .cast("double")
                    .alias("adc_dist")
                )
                .orderBy(F.col("adc_dist").asc(), F.col("vec_id").asc())
                .limit(k)
            )
        cfg = (
            spark.range(1)
            .select(F.expr(qv_sql).alias("qv"))
            .select("qv", F.expr(norm_expr("qv")).alias("qnorm"))
        )
        return (
            idx.crossJoin(F.broadcast(cfg))
            .select(
                "vec_id",
                F.col("centroid_id").cast("int").alias("centroid_id"),
                F.round(
                    F.expr(dot_expr("embedding", "qv"))
                    / (F.col("nrm") * F.col("qnorm")),
                    6,
                ).alias("score"),
            )
            .orderBy(F.col("score").desc(), F.col("vec_id").asc())
            .limit(k)
        )

    def compact_ann_index(
        self,
        out_table: str,
        path: str,
        generations: list[str],
    ) -> None:
        """Merge index generations sharing one frozen geometry into a
        single compacted artifact (full rewrite — the periodic deep
        clean). Geometry is verified identical across generations and
        carried forward; every (centroid_id, bucket) leaf lands as one
        file. See operators.similarity.compact_ann_index; the daily
        leaf-targeted form is compact_ann_index_into. Namespaced on the
        table like ann_search: touches the index, never this table."""
        from cellbase_spark.operators.similarity import compact_ann_index

        compact_ann_index(self.df.sparkSession, out_table, path, generations)

    def compact_ann_index_into(
        self, base_table: str, generations: list[str]
    ) -> int:
        """Absorb delta generations INTO `base_table` in place,
        rewriting only the leaves the deltas touch (dynamic partition
        overwrite; untouched leaves are never opened). Returns the
        number of rewritten leaves. The daily repair form; see
        operators.similarity.compact_ann_index_partial."""
        from cellbase_spark.operators.similarity import (
            compact_ann_index_partial,
        )

        return compact_ann_index_partial(
            self.df.sparkSession, base_table, generations
        )

    def delete_from_ann_index(self, index_table: str, ids) -> int:
        """DELETE vectors from a persisted ANN index (takedown/GDPR —
        the lifecycle verb between update and compact): ids land in a
        tombstone side-table, ann_search excludes them immediately, and
        the next compaction (either form) drops the rows physically and
        clears the tombstones. `ids` is a list or a DataFrame with a
        vec_id column. Returns the total distinct tombstoned count.
        See operators.similarity.delete_from_ann_index; namespaced on
        the table like ann_search."""
        from cellbase_spark.operators.similarity import delete_from_ann_index

        return delete_from_ann_index(self.df.sparkSession, index_table, ids)

    def delete_from_dedup_index(self, index_path: str, doc_ids) -> None:
        """DELETE corpus docs from the persisted dedup index written by
        build_dedup_index: ids land in the band table's tombstone
        side-table, dedup_incremental excludes them immediately, and
        compact_dedup_bands drops the band rows physically. `doc_ids`
        is a list or a DataFrame whose first column is the id. See
        operators.dedup.delete_from_dedup_index."""
        from cellbase_spark.operators.dedup import delete_from_dedup_index

        delete_from_dedup_index(
            self.df.sparkSession, f"{index_path}/bands", doc_ids
        )

    def build_bm25_index(
        self, text_col: str, table: str, path: str, n_buckets: int = 64
    ) -> None:
        """Persist this table's BM25 inverted index: (token, doc_id,
        tf, dl) postings hive-partitioned by token bucket, corpus stats
        frozen in table properties (operators/text.build_bm25_index).
        Paid once at ingest; `bm25_search` opens only the query
        tokens' buckets — the rescan alternative re-reads and
        re-tokenizes the corpus per query (measured linear vs sub-linear
        sf1->sf10, BASELINE.md round-11). A new batch builds its own
        generation with this same verb; pass the list to `bm25_search`
        (stats sum exactly) and merge periodically with
        `compact_bm25_index`."""
        from cellbase_spark.operators.text import build_bm25_index

        build_bm25_index(
            self.df, table, path,
            text_col=text_col, id_col=self.key_col, n_buckets=n_buckets,
        )

    def bm25_search(self, tables, terms: list[str], k: int = 20) -> DataFrame:
        """BM25 top-k for `terms` served from the persisted postings
        index (or a LIST of generations — base + deltas; stats sum
        exactly). See operators/text.bm25_probe. Namespaced on the
        table like ann_search: the search touches the index, never this
        table's rows."""
        from cellbase_spark.operators.text import bm25_probe

        return bm25_probe(self.df.sparkSession, tables, terms, k=k)

    def compact_bm25_index(
        self, out_table: str, path: str, generations: list[str]
    ) -> None:
        """Merge BM25 postings generations into one compacted artifact
        (rows verbatim, one tok_bucket exchange, stats summed;
        n_buckets verified equal). See operators/text.
        compact_bm25_index."""
        from cellbase_spark.operators.text import compact_bm25_index

        compact_bm25_index(self.df.sparkSession, out_table, path, generations)

    def delete_from_bm25_index(self, table: str, doc_ids) -> int:
        """Takedown verb for the BM25 postings index: tombstone
        `doc_ids` (list or DataFrame) — O(|takedown|), no leaf
        rewritten; `bm25_search` excludes them and corrects avgdl
        exactly, and the next `compact_bm25_index` drops the rows
        physically. Returns the distinct tombstone count. See
        operators/text.delete_from_bm25_index."""
        from cellbase_spark.operators.text import delete_from_bm25_index

        return delete_from_bm25_index(self.df.sparkSession, table, doc_ids)

    def build_dedup_index(self, text_col: str, path: str) -> None:
        """Write this table's persisted dedup index to `path`: the
        MinHash band table (<path>/bands) and the token-set fingerprint
        star (<path>/fps, one (fp, canon_id) row per distinct token
        set). Paid once at ingest; `dedup_incremental` probes it daily
        without rescanning this corpus."""
        from pyspark.sql import functions as F

        from cellbase_spark.operators.dedup import lsh_band_keys_fused

        t = self.df.select(
            F.col(self.key_col).alias("_id"),
            F.array_distinct(F.split(F.col(text_col), " ")).alias("_toks"),
        )
        (
            t.select(
                "_id",
                F.posexplode(lsh_band_keys_fused("_toks", 16, 2)).alias(
                    "_bidx", "_bkey"
                ),
            )
            .write.mode("overwrite")
            .parquet(f"{path}/bands")
        )
        (
            t.select(
                "_id", F.md5(F.concat_ws(" ", F.array_sort("_toks"))).alias("fp")
            )
            .groupBy("fp")
            .agg(F.min("_id").alias("canon_id"))
            .write.mode("overwrite")
            .parquet(f"{path}/fps")
        )

    def dedup_incremental(
        self,
        batch: "CellTable",
        text_col: str,
        index_path: str,
        threshold: float = 0.95,
        band_bucket_cap: int = 8,
        exact_star: bool = True,
    ) -> DataFrame:
        """New-batch-vs-this-corpus near-dup pairs against the persisted
        index written by `build_dedup_index` — work scales with the
        batch, never the corpus (operators/dedup.incremental_dedup_pairs;
        the q_dedup_incremental_full composition: capped LSH probe +
        exact fingerprint star with bounded output). Docs deleted via
        delete_from_dedup_index are excluded automatically (tombstone
        anti-join on the corpus side)."""
        from pyspark.sql import functions as F

        from cellbase_spark.operators.dedup import (
            incremental_dedup_pairs,
            read_dedup_tombstones,
        )

        spark = self.df.sparkSession
        bt = batch.df.select(
            F.col(batch.key_col).alias("_id"),
            F.array_distinct(F.split(F.col(text_col), " ")).alias("_toks"),
        )
        ct = self.df.select(
            F.col(self.key_col).alias("_id"),
            F.array_distinct(F.split(F.col(text_col), " ")).alias("_toks"),
        )
        return incremental_dedup_pairs(
            batch=bt,
            corpus_bands=spark.read.parquet(f"{index_path}/bands"),
            corpus_tokens=ct,
            id_col="_id",
            tokens_col="_toks",
            n_hashes=16,
            bands=2,
            threshold=threshold,
            band_bucket_cap=band_bucket_cap,
            corpus_fps=(
                spark.read.parquet(f"{index_path}/fps") if exact_star else None
            ),
            corpus_tombstones=read_dedup_tombstones(
                spark, f"{index_path}/bands"
            ),
        )

    def duplicated_spans(
        self, text_col: str, window: int = 8, top: int = 100
    ) -> DataFrame:
        """Cross-row duplicated token spans: every `window`-token sliding
        window hashed, spans shared by >= 2 rows ranked by spread —
        q_span_dedup's plan (one span-hash agg + total-order top-k)."""
        from pyspark.sql import functions as F

        t = self.df.select(
            self.key_col, F.split(F.col(text_col), " ").alias("_ws")
        )
        spans = F.expr(
            f"case when size(_ws) >= {window} then"
            f" transform(sequence(1, size(_ws) - {window - 1}),"
            f" i -> md5(concat_ws(' ', slice(_ws, i, {window}))))"
            " else array() end"
        )
        s = t.select(self.key_col, F.explode(spans).alias("span_hash"))
        return (
            s.groupBy("span_hash")
            .agg(
                F.countDistinct(self.key_col).alias("n_rows"),
                F.count(F.lit(1)).alias("n_occ"),
                F.min(self.key_col).alias("min_key"),
            )
            .where(F.col("n_rows") >= 2)
            .orderBy(
                F.col("n_rows").desc(),
                F.col("n_occ").desc(),
                F.col("span_hash").asc(),
            )
            .limit(top)
        )

    def data_card(self, text_col: str, group_col: str) -> DataFrame:
        """Per-group curation card (docs, tokens, chars) — q_data_card's
        one-agg plan, minus the language columns (schema-agnostic)."""
        from pyspark.sql import functions as F

        return self.df.groupBy(group_col).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.size(F.split(F.col(text_col), " "))).alias("total_tokens"),
            F.sum(F.length(F.col(text_col))).alias("total_chars"),
        )

    def source_overlap(
        self, text_col: str, group_col: str, window: int = 8
    ) -> DataFrame:
        """Cross-group duplicate-mass matrix: distinct shared
        `window`-token spans + span-set Jaccard per group pair —
        q_source_overlap's plan (span-keyed agg with a bounded
        distinct-group set; pair fan-out after reduction). Fully LAZY:
        per-group span totals come in via two broadcast joins of a
        one-row-per-group aggregate frame — no driver collect at
        construction time, so the plan sees the table's state at
        EXECUTION, like every other API method."""
        from pyspark.sql import functions as F

        t = self.df.select(
            F.col(group_col).alias("_g"), F.split(F.col(text_col), " ").alias("_ws")
        )
        spans = F.expr(
            f"case when size(_ws) >= {window} then"
            f" transform(sequence(1, size(_ws) - {window - 1}),"
            f" i -> md5(concat_ws(' ', slice(_ws, i, {window}))))"
            " else array() end"
        )
        hs = t.select("_g", F.explode(spans).alias("_h")).distinct()
        totals = hs.groupBy("_g").agg(F.count(F.lit(1)).alias("_n"))
        pair_expr = (
            "flatten(transform(ss, (x, i) ->"
            " transform(slice(ss, i + 2, size(ss)),"
            " y -> struct(x AS grp_a, y AS grp_b))))"
        )
        pairs = (
            hs.groupBy("_h")
            .agg(F.array_sort(F.collect_set("_g")).alias("ss"))
            .where(F.size("ss") >= 2)
            .select(F.explode(F.expr(pair_expr)).alias("p"))
            .select("p.grp_a", "p.grp_b")
            .groupBy("grp_a", "grp_b")
            .agg(F.count(F.lit(1)).alias("n_shared"))
        )
        ta = totals.select(F.col("_g").alias("grp_a"), F.col("_n").alias("n_a"))
        tb = totals.select(F.col("_g").alias("grp_b"), F.col("_n").alias("n_b"))
        return (
            pairs.join(F.broadcast(ta), "grp_a")
            .join(F.broadcast(tb), "grp_b")
            .select(
                "grp_a",
                "grp_b",
                "n_shared",
                "n_a",
                "n_b",
                F.round(
                    F.col("n_shared")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_shared")).cast(
                        "double"
                    ),
                    6,
                ).alias("jaccard"),
            )
        )

    def normalize_zscore(
        self, value_col: str, group_col: str, out_col: str = "z"
    ) -> "CellTable":
        """Copy-on-write per-group z-score of `value_col` —
        q_zscore_normalize's plan (one moment agg, stats broadcast,
        narrow map; zero-variance groups get z=0). Works on raw doubles
        (no fixed-point lane — the API face trades the oracle's
        bit-exactness for schema-agnosticism)."""
        from pyspark.sql import functions as F

        st = self.df.groupBy(group_col).agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col(value_col).cast("double")).alias("_s"),
            F.sum(F.col(value_col).cast("double") * F.col(value_col)).alias("_sq"),
        )
        mean = F.col("_s") / F.col("_n")
        var = F.col("_sq") / F.col("_n") - mean * mean
        z = F.when(var <= 0, F.lit(0.0)).otherwise(
            (F.col(value_col) - mean) / F.sqrt(var)
        )
        out = (
            self.df.join(F.broadcast(st), group_col)
            .withColumn(out_col, z)
            .drop("_n", "_s", "_sq")
        )
        return CellTable(out, self.name, self.key_col)

    def set_value(self, key, column: str, value) -> "CellTable":
        """The reference's cell edit: table[key][column] = value."""
        from pyspark.sql import functions as F

        if column not in self.df.columns:
            raise KeyError(f"no column {column!r} in {self.name}")
        edited = self.df.withColumn(
            column,
            F.when(F.col(self.key_col) == key, F.lit(value)).otherwise(
                F.col(column)
            ).cast(self.df.schema[column].dataType),
        )
        return CellTable(edited, self.name, self.key_col)

    def add_row(self, row: dict) -> "CellTable":
        """Append one row (reference: add_row). Missing columns -> NULL;
        the single-row side unions by name without a shuffle."""
        unknown = set(row) - set(self.df.columns)
        if unknown:
            raise KeyError(f"unknown columns {sorted(unknown)} in {self.name}")
        new = self.df.sparkSession.createDataFrame(
            [tuple(row.get(c) for c in self.df.columns)], schema=self.df.schema
        )
        return CellTable(
            self.df.unionByName(new), self.name, self.key_col
        )

    def remove_row(self, key) -> "CellTable":
        """Delete by key (reference: remove_row) — an anti-filter."""
        return CellTable(
            self.df.where(self.df[self.key_col] != key), self.name, self.key_col
        )

    # discoverability alias: some spreadsheet-db APIs call this delete_row
    delete_row = remove_row

    def save(self, path: str, fmt: str = "parquet") -> None:
        """Persist the edited sheet (reference: save back to file).
        fmt='xlsx' writes one worksheet named after the table — the
        spreadsheet face of the same data; sheet-sized tables only
        (workbooks are a driver-side format by nature)."""
        writer = self.df.write.mode("overwrite")
        if fmt == "csv":
            from cellbase_spark.io import write_csv_table

            write_csv_table(self.df, path)
        elif fmt == "parquet":
            writer.parquet(path)
        elif fmt in ("xlsx", "ods"):
            if fmt == "ods":
                from cellbase_spark.sources.ods import (
                    write_ods_workbook as write_workbook,
                )
            else:
                from cellbase_spark.sources.excel import (
                    write_xlsx_workbook as write_workbook,
                )

            _guard_xlsx_export(self.df, self.name)
            header = self.df.columns
            body = [[row[c] for c in header] for row in self.df.collect()]
            write_workbook({self.name: (header, body)}, path)
        else:
            raise ValueError(f"unsupported save format {fmt!r}")


class CellBase:
    """The workbook: named tables over a directory of parquet files."""

    def __init__(self, spark: SparkSession, data_dir: str):
        self.spark = spark
        self.data_dir = data_dir

    def table(self, name: str, bucketed: bool = False) -> CellTable:
        """One named table. `bucketed=True` serves it from the key-bucketed
        + key-sorted persisted layout (io.ensure_bucketed_table, built once
        per process+sf): `get(key)` then prunes to ONE bucket's files
        before any IO instead of min/max-pruning every file — the
        dictionary-lookup cost model the reference's `get row by id`
        promises, kept at 100 TB."""
        if name not in schemas.TABLE_NAMES:
            raise KeyError(f"unknown table {name!r}; have {sorted(schemas.TABLE_NAMES)}")
        if bucketed:
            from cellbase_spark.io import ensure_bucketed_table

            key = KEY_COLUMNS.get(name)
            if key is None:
                raise ValueError(f"table {name!r} has no registered key column")
            t = ensure_bucketed_table(self.spark, self.data_dir, name, key)
            return CellTable(self.spark.table(t), name, key)
        return CellTable(load_table(self.spark, self.data_dir, name), name)

    def table_names(self) -> list[str]:
        return sorted(schemas.TABLE_NAMES)

    def vacuum(self, older_than_sec: float = 7 * 86400, **kw) -> list[str]:
        """Retention sweep for the engine's on-disk leftovers — the
        janitor a deployment crons (operators/publish.vacuum): stale
        scratch layouts and crashed-publish temps older than
        `older_than_sec` are reclaimed. Never touched: artifacts in
        THIS session's catalog, artifacts any session ever PUBLISHED
        (publish writes a durable pin file that vacuum honors across
        process lifetimes, so a cron'd vacuum in a fresh session cannot
        sweep another process's serving artifact — r13 ADVICE), this
        process's own scratch, and anything still being written.
        Artifacts retired outside the publish path (bare DROP TABLE)
        should be unpinned via publish.unpin_artifact or passed to a
        later vacuum's keep= audit. Pass pin_retention_sec (e.g. 30
        days) so pins nobody refreshes — superseded signature homes,
        retired generations — eventually release their bytes; publish
        and attach refresh the pin, so anything actually served within
        the window stays protected. Returns the deleted paths."""
        from cellbase_spark.operators.publish import vacuum

        return vacuum(self.spark, older_than_sec, **kw)

    def attach(self, table: str, path: str) -> str:
        """Register an artifact PUBLISHED by any session (this one, a
        dead one, another machine sharing the filesystem) in THIS
        session's catalog with zero rebuild — the serve-forever half of
        build-at-ingest (operators/publish.attach_artifact): pointer
        read, manifest completeness+build_id validation, CREATE with
        the recorded schema, partition import, geometry-prop stamp.
        `path` is the NAMING BASE the publish used (ann index homes,
        bucketed layouts), not the generation directory. Returns the
        catalog table name; torn durable state raises, never serves."""
        from cellbase_spark.operators.publish import attach_artifact

        return attach_artifact(self.spark, table, path)

    def sql(self, query: str) -> DataFrame:
        """SQL entry point (SURVEY.md §3.2 E3): registers every table as a
        temp view (lazy relations, no materialization) and runs the query
        through the same Catalyst pipeline as the DataFrame API."""
        from cellbase_spark.io import register_temp_views

        register_temp_views(self.spark, self.data_dir)
        return self.spark.sql(query)

    def import_csv(self, name: str, path: str, schema) -> CellTable:
        """The reference's core ingestion path: spreadsheet CSV with a
        header row, cells coerced to the declared schema at scan time."""
        return CellTable(read_csv_table(self.spark, path, schema), name)

    def import_workbook(
        self,
        path: str,
        sheet_schemas: dict,
        key_cols: dict | None = None,
        fmt: str = "xlsx",
        schema_mode: str = "strict",
    ) -> dict[str, CellTable]:
        """The reference's open-a-workbook flow: every named sheet of the
        workbook file(s) at `path` becomes a CellTable, typed by its
        declared schema — the full 'author tables in spreadsheet software,
        load them as a database' loop. Each sheet stays an independent
        lazy distributed scan. fmt='xlsx' (sources/excel.read_workbook)
        or 'ods' (sources/ods.read_ods_workbook — the LibreOffice half,
        round 12)."""
        if fmt == "ods":
            from cellbase_spark.sources.ods import read_ods_workbook as read_wb
        elif fmt == "xlsx":
            from cellbase_spark.sources.excel import read_workbook as read_wb
        else:
            raise ValueError(f"unsupported workbook format {fmt!r}")

        dfs = read_wb(self.spark, path, sheet_schemas, schema_mode=schema_mode)
        key_cols = key_cols or {}
        return {
            name: CellTable(df, name, key_cols.get(name))
            for name, df in dfs.items()
        }

    def export_workbook(
        self, tables: dict[str, CellTable], path: str, fmt: str = "xlsx"
    ) -> None:
        """The symmetric save-back flow: every CellTable becomes a named
        worksheet of ONE workbook file — close the reference's round trip
        (author in spreadsheet software -> query as a database -> export
        the edited state back to a spreadsheet). fmt='xlsx' or 'ods'.
        Collects each sheet to the driver: a workbook is a single small
        file by nature, so this is the dim-table/export path, never a
        fact-table sink (those go through save(fmt='parquet'|'csv'), any
        Spark writer, or the distributed cellbase_xlsx/cellbase_ods
        DataSource sinks)."""
        if fmt == "ods":
            from cellbase_spark.sources.ods import (
                write_ods_workbook as write_workbook,
            )
        elif fmt == "xlsx":
            from cellbase_spark.sources.excel import (
                write_xlsx_workbook as write_workbook,
            )
        else:
            raise ValueError(f"unsupported workbook format {fmt!r}")

        sheets = {}
        for name, t in tables.items():
            _guard_xlsx_export(t.df, name)
            header = t.df.columns
            sheets[name] = (header, [[row[c] for c in header] for row in t.df.collect()])
        write_workbook(sheets, path)


def _guard_xlsx_export(df: DataFrame, name: str) -> None:
    """Enforce the 'small only' contract of the driver-collect xlsx paths.

    count() before collect() costs one extra (cheap, column-pruned) job
    and buys a crisp error instead of a driver OOM when someone points
    the workbook exporter at a fact table."""
    n = df.count()
    if n > XLSX_EXPORT_MAX_ROWS:
        raise ValueError(
            f"table {name!r} has {n:,} rows — the workbook export path "
            f"collects to the driver and is capped at "
            f"{XLSX_EXPORT_MAX_ROWS:,} rows. For large tables use the "
            f"distributed sink: df.write.format('cellbase_xlsx')"
            f".mode('overwrite').save(dir) (one part-N.xlsx per partition)."
        )
