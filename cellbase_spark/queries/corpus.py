"""Corpus-preparation operators over ``documents``/``orders`` (SURVEY.md
§2.8 extensions L31-L34): benchmark-contamination detection, fixed-stride
token chunking, weighted reservoir sampling, and a text-source round-trip.

No cellbase analog (the reference has no text pipeline at all); these are
the remaining ops a training-data pipeline needs beyond the dedup /
similarity / quality battery already registered in llm_*.py.

Determinism: n-grams are exact strings (no hashing needed cross-engine);
the weighted sample's randomness is md5-derived (operators/dedup.py
convention: first 13 hex chars -> 52-bit uniform), so both engines draw
the *same* pseudo-random keys.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cellbase_spark.io import fan_out_barrier, load_table
from cellbase_spark.registry import register

@register(
    "q_contamination",
    family="corpus",
    oracle="""
WITH t AS (
  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
), idx AS (
  SELECT doc_id, source, toks,
         unnest(generate_series(1, len(toks) - 4)) AS i
  FROM t
), g AS (
  SELECT doc_id, source, array_to_string(toks[i:i+4], ' ') AS gram FROM idx
), eval_grams AS (
  SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0
), hit AS (
  SELECT g.doc_id, g.source, COUNT(*) AS grams, COUNT(e.gram) AS hits
  FROM g LEFT JOIN eval_grams e ON g.gram = e.gram
  WHERE g.doc_id % 50 <> 0
  GROUP BY g.doc_id, g.source
)
SELECT source,
       COUNT(*) AS docs_scanned,
       CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_contaminated,
       CAST(SUM(grams) AS BIGINT) AS grams_total,
       CAST(SUM(hits) AS BIGINT) AS grams_hit
FROM hit GROUP BY source
""",
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: every held-out doc (doc_id % 50 = 0
    plays the eval set) contributes its distinct word 5-grams; each
    training doc is scored by how many of its 5-grams appear in that set.
    Output: per-source contamination tallies (docs with >= 1 overlapping
    5-gram, and the gram-level hit count).

    Plan: the eval-gram set is ~2% of the corpus' grams after distinct —
    small enough to broadcast at any sane eval size, so the probe side
    never shuffles (left join carries the hit flag). The per-doc regroup
    shuffles (doc_id, source) counts only, not gram strings; at 100 TB
    swap exact grams for 64-bit md5 gram hashes (operators/dedup.py) to
    shrink both the broadcast and the probe width."""
    d = load_table(spark, sf_dir, "documents")
    g = d.select(
        "doc_id",
        "source",
        # let-binding emulation: wrap split() in a 1-element array and
        # lambda-bind it, so the tokenization runs ONCE per row instead of
        # once per gram (CollapseProject would otherwise inline it into
        # the per-element lambda — the expression-blowup trap in
        # BASELINE.md; measured 2x on this explode).
        F.explode(
            F.expr(
                # CASE guard: sequence(1, 0) in Spark yields DESCENDING
                # [1, 0], and slice(toks, 0, 5) then raises — so docs
                # shorter than the gram width must map to array(), which
                # is also what the oracle's generate_series(1, len-4)
                # produces (empty -> doc omitted by the explode).
                "flatten(transform(array(split(text, ' ')), toks ->"
                " transform(CASE WHEN size(toks) >= 5"
                "   THEN sequence(1, size(toks) - 4) ELSE array() END,"
                " i -> concat_ws(' ', slice(toks, i, 5)))))"
            )
        ).alias("gram"),
    )
    eval_grams = g.where(F.col("doc_id") % 50 == 0).select("gram").distinct()
    train = g.where(F.col("doc_id") % 50 != 0)
    hit = (
        train.join(
            F.broadcast(eval_grams.withColumn("hit", F.lit(1))), "gram", "left"
        )
        .groupBy("doc_id", "source")
        .agg(F.count(F.lit(1)).alias("grams"), F.count("hit").alias("hits"))
    )
    return hit.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs_scanned"),
        F.sum((F.col("hits") > 0).cast("bigint")).alias("docs_contaminated"),
        F.sum("grams").alias("grams_total"),
        F.sum("hits").alias("grams_hit"),
    )


@register(
    "q_chunk_documents",
    family="corpus",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), s AS (
  SELECT doc_id, toks, unnest(generate_series(1, len(toks), 24)) AS start
  FROM t
)
SELECT doc_id,
       CAST((start - 1) / 24 AS BIGINT) AS chunk_idx,
       CAST(len(toks[start:start+31]) AS BIGINT) AS n_tokens,
       md5(array_to_string(toks[start:start+31], ' ')) AS chunk_hash
FROM s
""",
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-stride token chunking for context-window packing: 32-token
    windows every 24 tokens (8-token overlap), one output row per chunk
    with its token count and content hash.

    Pure narrow map — sequence/transform/posexplode, zero shuffles; the
    explode multiplies rows ~len/stride-fold but Spark pipelines it into
    the same stage as the scan. Contrast with q_pack_sequences (which
    *joins* chunks into bins and needs a window)."""
    d = load_table(spark, sf_dir, "documents")
    chunks = d.select(
        "doc_id",
        # same let-binding trick as q_contamination: tokenize once per row
        F.posexplode(
            F.expr(
                "flatten(transform(array(split(text, ' ')), toks ->"
                " transform(sequence(1, size(toks), 24),"
                " s -> struct(slice(toks, s, 32) AS toks))))"
            )
        ).alias("chunk_idx", "chunk"),
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.size("chunk.toks").cast("bigint").alias("n_tokens"),
        F.md5(F.concat_ws(" ", F.col("chunk.toks"))).alias("chunk_hash"),
    )


@register(
    "q_sample_weighted",
    family="corpus",
    oracle="""
WITH keyed AS (
  SELECT o_orderkey, o_totalprice,
         ln(CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 13)) AS BIGINT)
            / 4503599627370496.0) / o_totalprice AS k
  FROM orders
)
SELECT o_orderkey, o_totalprice
FROM keyed ORDER BY k DESC, o_orderkey LIMIT 100
""",
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis A-Res):
    each row draws u ~ U(0,1) from md5(orderkey) and keeps key
    ln(u)/weight; the top-k keys are the sample, so selection probability
    is proportional to o_totalprice. Deterministic: both engines derive
    the identical 52-bit uniform from the same md5 prefix.

    Scale: orderBy+limit plans as TakeOrderedAndProject — per-partition
    top-k heaps, only k rows per partition reach the driver; no global
    sort, no shuffle of the data. This is the distributed reservoir."""
    o = load_table(spark, sf_dir, "orders")
    u = (
        F.expr(
            "cast(conv(substr(md5(cast(o_orderkey as string)), 1, 13), 16, 10) as bigint)"
        )
        / F.lit(4503599627370496.0)
    )
    keyed = o.select(
        "o_orderkey", "o_totalprice", (F.log(u) / F.col("o_totalprice")).alias("k")
    )
    return (
        keyed.orderBy(F.col("k").desc(), F.col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "q_scan_text",
    family="scan",
    oracle="SELECT doc_id, text FROM documents",
)
def q_scan_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain-text source round-trip: serialize documents as
    `doc_id<TAB>text` lines via the text sink, re-ingest with
    spark.read.text, and re-parse the two fields (split at the FIRST tab;
    the corpus itself is tab-free). Covers the last built-in file format
    (parquet/csv/jsonl/orc/xlsx/text) in SURVEY.md §2.1."""
    d = load_table(spark, sf_dir, "documents")
    out = os.path.join(tempfile.gettempdir(), "cellbase_spark_text", "documents")
    d.select(
        F.concat_ws("\t", F.col("doc_id").cast("string"), F.col("text")).alias("value")
    ).write.mode("overwrite").text(out)
    raw = spark.read.text(out)
    return raw.select(
        F.expr("cast(substring_index(value, '\t', 1) as bigint)").alias("doc_id"),
        F.expr("substring(value, instr(value, '\t') + 1)").alias("text"),
    )


@register(
    "q_bpe_pairs",
    family="corpus",
    oracle="""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS t FROM documents
),
pairs AS (
  SELECT substring(t, CAST(i AS INTEGER), 2) AS pair
  FROM (SELECT t, unnest(generate_series(1, length(t) - 1)) AS i
        FROM tok WHERE length(t) >= 2)
)
SELECT pair, COUNT(*) AS cnt FROM pairs
GROUP BY pair ORDER BY cnt DESC, pair ASC LIMIT 20
""",
)
def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style merge-candidate scan (L38): count adjacent CHARACTER
    pairs inside every token corpus-wide and rank the top merges — the
    inner loop of byte-pair-encoding vocabulary induction. The pair set
    per token is built with transform(sequence(...)) (one codegen'd
    projection, no Python, no join); the only shuffle carries (pair,
    partial_count) thanks to map-side combine — at 100 TB the exchange
    is bounded by the pair-vocabulary (~1k rows), not the corpus."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("t")).where(F.length("t") >= 2)
    pairs = tok.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("t") - 1),
                lambda i: F.col("t").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair").asc())
        .limit(20)
    )


@register(
    "q_boilerplate",
    family="corpus",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), idx AS (
  SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 5)) AS i FROM t
), g AS (
  SELECT doc_id, array_to_string(toks[i:i+5], ' ') AS gram FROM idx
), b AS (
  SELECT gram FROM (
    SELECT gram, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY gram
  ) WHERE df >= 3
)
SELECT g.doc_id,
       COUNT(*) AS n_grams,
       COUNT(b.gram) AS n_boiler,
       CAST(COUNT(b.gram) AS DOUBLE) / COUNT(*) AS boiler_ratio
FROM g LEFT JOIN b ON g.gram = b.gram
GROUP BY g.doc_id
""",
)
def q_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-corpus boilerplate detection: word 6-grams appearing in >= 3
    DISTINCT documents are 'boilerplate' (repeated headers/footers/
    templates); each doc is scored by the fraction of its 6-grams that
    are boilerplate — the rm-repeated-passages signal of training-data
    cleaning (distinct from q_contamination, which probes an EXTERNAL
    eval set).

    Plan: one gram explode feeds both sides — doc-frequency counts one
    row per distinct (gram, doc) pre-aggregated map-side, and the
    boilerplate set joins back WITHOUT a forced broadcast (its size is
    corpus-dependent; size-based planning/AQE decide). Per-doc regroup
    ships (doc_id, flag) only."""
    d = fan_out_barrier(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    g = d.select(
        "doc_id",
        F.explode(
            F.expr(
                # Same guard as q_contamination: sequence(1, 0) yields
                # descending [1, 0] and slice(toks, 0, 6) raises for
                # docs with < 6 tokens; CASE keeps them empty.
                "flatten(transform(array(split(text, ' ')), toks ->"
                " transform(CASE WHEN size(toks) >= 6"
                "   THEN sequence(1, size(toks) - 5) ELSE array() END,"
                " i -> concat_ws(' ', slice(toks, i, 6)))))"
            )
        ).alias("gram"),
    )
    df_per_gram = (
        g.select("doc_id", "gram")
        .distinct()
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    boiler = df_per_gram.where(F.col("df") >= 3).select(
        "gram", F.lit(1).alias("is_boiler")
    )
    return (
        g.join(boiler, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("is_boiler").alias("n_boiler"),
            (F.count("is_boiler").cast("double") / F.count(F.lit(1))).alias(
                "boiler_ratio"
            ),
        )
    )


@register(
    "q_contain_fuzzy",
    family="corpus",
    oracle="""
WITH t AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents
), ev AS (
  SELECT doc_id AS eval_id, unnest(toks) AS tok, len(toks) AS n_eval
  FROM t WHERE doc_id % 50 = 0
), tr AS (
  SELECT doc_id AS train_id, unnest(toks) AS tok
  FROM t WHERE doc_id % 50 <> 0
), shared AS (
  SELECT tr.train_id, ev.eval_id, ev.n_eval, COUNT(*) AS n_shared
  FROM tr JOIN ev USING (tok)
  GROUP BY tr.train_id, ev.eval_id, ev.n_eval
)
SELECT train_id, eval_id,
       CAST(n_shared AS BIGINT) AS n_shared,
       CAST(n_eval AS BIGINT) AS n_eval,
       round(CAST(n_shared AS DOUBLE) / n_eval, 6) AS containment
FROM shared
WHERE CAST(n_shared AS DOUBLE) / n_eval >= 0.8
""",
)
def q_contain_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy decontamination by token-set CONTAINMENT: an eval doc counts
    as leaked into a training doc when >= 80% of its distinct tokens
    appear in that doc — |eval ∩ train| / |eval| — which catches
    reworded/reordered overlap that q_contamination's exact 5-gram match
    misses (containment, not Jaccard: a long train doc that embeds a
    short eval doc must score 1.0, not be diluted by its own length).

    Plan: the eval side (here doc_id % 50 = 0, ~2% of the corpus; in
    production the benchmark suite, KBs not TBs) explodes to a
    (token, eval_id, n_eval) table that broadcasts; the train side
    explodes and hash-joins it token-by-token WITHOUT shuffling the
    corpus — the only shuffle is the (train_id, eval_id) pair count,
    whose row count is bounded by matched-token pairs. At 100 TB the
    eval broadcast is the decontamination pattern of record (the same
    inverted-index shape every corpus pipeline ships)."""
    d = fan_out_barrier(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    t = d.select("doc_id", F.array_distinct(F.split("text", " ")).alias("toks"))
    ev = (
        t.where(F.col("doc_id") % 50 == 0)
        .select(
            F.col("doc_id").alias("eval_id"),
            F.size("toks").alias("n_eval"),
            F.explode("toks").alias("tok"),
        )
    )
    tr = t.where(F.col("doc_id") % 50 != 0).select(
        F.col("doc_id").alias("train_id"), F.explode("toks").alias("tok")
    )
    shared = (
        tr.join(F.broadcast(ev), "tok")
        .groupBy("train_id", "eval_id", "n_eval")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return shared.select(
        "train_id",
        "eval_id",
        F.col("n_shared").cast("bigint").alias("n_shared"),
        F.col("n_eval").cast("bigint").alias("n_eval"),
        F.round(F.col("n_shared").cast("double") / F.col("n_eval"), 6).alias(
            "containment"
        ),
    ).where(F.col("n_shared").cast("double") / F.col("n_eval") >= 0.8)


@register(
    "q_chunk_cdc",
    family="corpus",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
), flagged AS (
  SELECT doc_id, tok, pos,
         CASE WHEN (('0x' || substr(md5(tok), 1, 15))::BIGINT % 8) = 0
              THEN 1 ELSE 0 END AS boundary
  FROM tok
), chunked AS (
  SELECT doc_id, tok, pos,
         SUM(boundary) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS UNBOUNDED PRECEDING) AS chunk_id
  FROM flagged
), chunks AS (
  SELECT doc_id, chunk_id,
         md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash,
         COUNT(*) AS chunk_len
  FROM chunked GROUP BY doc_id, chunk_id
)
SELECT chunk_hash,
       COUNT(*) AS n_occurrences,
       COUNT(DISTINCT doc_id) AS n_docs,
       MIN(chunk_len) AS chunk_len
FROM chunks
GROUP BY chunk_hash
HAVING COUNT(*) >= 2
ORDER BY n_occurrences DESC, chunk_hash ASC
LIMIT 20
""",
)
def q_chunk_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking + chunk-level dedup: split every document
    at content-determined boundary tokens (md5(tok) % 8 == 0, ~8-token
    average chunks), fingerprint each chunk, and surface the chunks that
    repeat across the corpus — the rsync/LLM-dedup trick that finds
    SHARED PASSAGES shift-invariantly (fixed-stride chunking, cf.
    q_chunk_documents, breaks when one token is inserted upstream;
    content-defined boundaries re-synchronize immediately).

    Scale shape: one explode, ONE shuffle keyed by doc_id for the
    running-sum window (each doc's tokens regroup; no pairwise joins),
    then a chunk-hash-keyed agg whose shuffle carries one row per chunk.
    The md5 boundary decision is per-token compute, no vocab state.
    Determinism: boundaries and fingerprints are md5-derived (bit-equal
    in both engines); ordered string_agg == sorted-struct concat."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok"),
    ).select(
        "doc_id",
        "tok",
        (F.col("pos") + 1).alias("pos"),  # 1-based like generate_subscripts
        F.expr(
            "case when pmod(cast(conv(substr(md5(tok), 1, 15), 16, 10) as bigint), 8) = 0"
            " then 1 else 0 end"
        ).alias("boundary"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    chunked = tok.withColumn("chunk_id", F.sum("boundary").over(w))
    chunks = chunked.groupBy("doc_id", "chunk_id").agg(
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
            )
        ).alias("chunk_hash"),
        F.count(F.lit(1)).alias("chunk_len"),
    )
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("chunk_len").alias("chunk_len"),
        )
        .where(F.col("n_occurrences") >= 2)
        .orderBy(F.col("n_occurrences").desc(), F.col("chunk_hash").asc())
        .limit(20)
    )


_BPE_US = "\x1f"  # unit separator between symbols; precondition: not in text


def _bpe_pairs_sql(sym_src: str) -> str:
    """DuckDB: adjacent-symbol pair counts over a symbol-string column
    `s` in relation {sym_src}; pair key = a || US || b. Single-symbol
    words contribute nothing (generate_series(1, 0) is empty in DuckDB;
    the Spark side guards the same case explicitly — see
    _bpe_pair_counts)."""
    return f"""
  SELECT syms[i] || chr(31) || syms[i + 1] AS pair, COUNT(*) AS cnt
  FROM (SELECT string_split(s, chr(31)) AS syms FROM {sym_src}),
       LATERAL unnest(generate_series(1, len(syms) - 1)) AS u(i)
  GROUP BY 1"""


def _bpe_merge_sql(best: str) -> str:
    """DuckDB: one TEXTBOOK BPE merge step of {best}'s winning pair over
    symbol-string column `s` — greedy leftmost non-overlapping,
    self-pairs included — via the round-10 DOUBLED-DELIMITER rewrite
    (upgrading the round-8/9 two-pass variant whose self-pair runs
    under-merged: 'a a a a a a' became 'aa a aa a' where textbook BPE
    yields 'aa aa aa').

    The rewrite: wrap the string in US sentinels, then double every US
    (each symbol now sits between US-PAIRS), then ONE anchored replace
    of US||a||US||US||b||US with US||ab||US, then collapse US-pairs
    back and trim. Why this is exactly greedy: anchoring to a full US
    on both ends means a pattern can only match two whole adjacent
    symbols (never a prefix of a longer symbol — the pre-round-8
    hazard), and because every inter-symbol boundary is now TWO
    characters, back-to-back occurrences no longer contend for a shared
    boundary character: each match consumes the second US of its left
    boundary pair and the first US of its right pair, leaving one US on
    each side, so the very next adjacency is still matchable and
    leftmost non-overlapping replace() — identical semantics in Spark
    and DuckDB — lands exactly the greedy pairing: a run of n repeated
    symbols merges floor(n/2) times at positions (1,2),(3,4),...
    Uniform US-pair spacing is preserved by construction (the
    replacement reinstates one US per side; symbols are non-empty so
    no US-run ever exceeds 2), which makes the final collapse exact."""
    us = "chr(31)"
    pat = (
        f"{us} || replace((SELECT pair FROM {best}), {us}, {us} || {us})"
        f" || {us}"
    )
    rep = f"{us} || replace((SELECT pair FROM {best}), {us}, '') || {us}"
    return (
        f"trim(replace(replace(replace({us} || s || {us}, {us},"
        f" {us} || {us}), {pat}, {rep}), {us} || {us}, {us}), {us})"
    )


def _bpe_pair_counts(sdf: DataFrame) -> DataFrame:
    """Corpus-wide adjacent-symbol pair counts (Spark side of
    _bpe_pairs_sql). Guarded for single-symbol words: without the CASE,
    F.sequence(1, size-1) at size == 1 is sequence(1, 0) = [1, 0]
    (Spark sequences DESCEND when start > stop) and element_at(syms, 0)
    throws INVALID_ARRAY_INDEX_IN_ELEMENT_AT — a word that collapses to
    one symbol after a merge (e.g. 'in' after merging (i, n)) crashed
    the round-2 recount (round-8 ADVICE high)."""
    syms = F.split(F.col("s"), _BPE_US)
    pairs = F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda k: F.concat(
                F.element_at(syms, k),
                F.lit(_BPE_US),
                F.element_at(syms, k + 1),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        sdf.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _bpe_merge_col(col: Column, pair: str) -> Column:
    """Spark side of _bpe_merge_sql: the doubled-delimiter greedy merge
    of `pair` (a US b) into its concatenation, over a US-joined symbol
    string — textbook BPE for every pair, self-pair runs included (see
    _bpe_merge_sql for the exactness argument); both engines' replace()
    is leftmost non-overlapping, so the results are bit-identical."""
    us = _BPE_US
    pat = F.lit(us + pair.replace(us, us + us) + us)
    rep = F.lit(us + pair.replace(us, "") + us)
    doubled = F.replace(
        F.concat(F.lit(us), col, F.lit(us)), F.lit(us), F.lit(us + us)
    )
    collapsed = F.replace(
        F.replace(doubled, pat, rep), F.lit(us + us), F.lit(us)
    )
    return F.btrim(collapsed, F.lit(us))


@register(
    "q_bpe_train",
    family="corpus",
    oracle=f"""
WITH s0 AS (
  SELECT array_to_string(string_split(t, ''), chr(31)) AS s
  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
  WHERE length(t) >= 2
),
p1 AS ({_bpe_pairs_sql('s0')}),
best1 AS (SELECT pair FROM p1 ORDER BY cnt DESC, pair ASC LIMIT 1),
s1 AS (
  SELECT {_bpe_merge_sql('best1')} AS s
  FROM s0
),
p2 AS ({_bpe_pairs_sql('s1')})
SELECT CAST(1 AS INTEGER) AS round, replace(pair, chr(31), '+') AS pair, cnt
FROM (SELECT pair, cnt FROM p1 ORDER BY cnt DESC, pair ASC LIMIT 5)
UNION ALL
SELECT CAST(2 AS INTEGER) AS round, replace(pair, chr(31), '+') AS pair, cnt
FROM (SELECT pair, cnt FROM p2 ORDER BY cnt DESC, pair ASC LIMIT 5)
""",
)
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ITERATIVE BPE vocabulary training (two unrolled merge rounds) —
    the tokenizer-training analog of q_ivf_train's Lloyd loop, and the
    step q_bpe_pairs (one candidate scan) stops short of: count adjacent
    SYMBOL pairs corpus-wide, merge the best pair into a new symbol
    everywhere (greedy leftmost non-overlapping, BPE's standard rule),
    recount under the merged vocabulary. Emits each round's top-5 pairs
    ('+' shown between symbols) — after round 1 the winning pair is
    gone from round 2's table, replaced by pairs involving the new
    merged symbol.

    Representation that keeps BOTH engines exact: a token's symbol
    sequence is a single string with U+001F between symbols, so the
    merge is a boundary-ANCHORED string replace over DOUBLED delimiters
    — one pass lands exactly the greedy leftmost non-overlapping merge
    step for every pair, self-pair runs included (round 10; proof
    sketch in _bpe_merge_sql). Pair extraction is a split + windowed
    concat,
    guarded for words that collapse to a single symbol
    (_bpe_pair_counts). U+001F not appearing in text is the documented
    precondition.

    Scale shape per round: one narrow map (split + transform) into a
    groupBy whose exchange is bounded by the pair VOCABULARY, not the
    corpus (map-side combine); the winning merge is a 1-row config
    collect re-entered as a literal. More merge rounds = more of the
    same map passes, the 100 TB BPE recipe (real trainers batch
    non-interacting merges per pass; one merge per pass is the exact
    textbook rule)."""
    from cellbase_spark.io import fan_out_barrier

    d = load_table(spark, sf_dir, "documents")
    # fan the corpus out to full parallelism BEFORE the CPU-heavy
    # char-split/pair-explode maps: documents.parquet arrives in ~15
    # splits with skewed text mass, and the straggler task dominated the
    # sf10 wall (measured: one (14+1)/15 task per stage, 270 s total)
    words = fan_out_barrier(d.select("text")).select(
        F.explode(F.split("text", " ")).alias("t")
    ).where(F.length("t") >= 2)
    s0 = words.select(F.concat_ws(_BPE_US, F.split("t", "")).alias("s"))

    p1 = _bpe_pair_counts(s0)
    # winning merge: a 1-row config collect (bounded by construction)
    best1 = p1.orderBy(F.col("cnt").desc(), F.col("pair").asc()).limit(1).collect()[0].pair
    s1 = s0.select(_bpe_merge_col(F.col("s"), best1).alias("s"))
    p2 = _bpe_pair_counts(s1)

    def top5(p: DataFrame, rnd: int) -> DataFrame:
        return (
            p.orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(5)
            .select(
                F.lit(rnd).cast("int").alias("round"),
                F.replace(F.col("pair"), F.lit(_BPE_US), F.lit("+")).alias("pair"),
                "cnt",
            )
        )

    return top5(p1, 1).unionByName(top5(p2, 2))


@register(
    "q_bpe_encode",
    family="corpus",
    oracle=f"""
WITH w AS (
  SELECT source, t FROM (
    SELECT source, unnest(string_split(text, ' ')) AS t FROM documents
  ) WHERE length(t) >= 2
),
s0 AS (
  SELECT source, array_to_string(string_split(t, ''), chr(31)) AS s FROM w
),
p1 AS ({_bpe_pairs_sql('s0')}),
best1 AS (SELECT pair FROM p1 ORDER BY cnt DESC, pair ASC LIMIT 1),
s1 AS (
  SELECT source, {_bpe_merge_sql('best1')} AS s
  FROM s0
),
p2 AS ({_bpe_pairs_sql('s1')}),
best2 AS (SELECT pair FROM p2 ORDER BY cnt DESC, pair ASC LIMIT 1),
s2 AS (
  SELECT source, {_bpe_merge_sql('best2')} AS s
  FROM s1
)
SELECT a.source,
       CAST(a.n_words AS BIGINT) AS n_words,
       CAST(a.syms_before AS BIGINT) AS syms_before,
       CAST(b.syms_after AS BIGINT) AS syms_after,
       round(1.0 - b.syms_after / a.syms_before, 6) AS saved_frac
FROM (SELECT source, COUNT(*) AS n_words,
             SUM(len(string_split(s, chr(31)))) AS syms_before
      FROM s0 GROUP BY source) a
JOIN (SELECT source, SUM(len(string_split(s, chr(31)))) AS syms_after
      FROM s2 GROUP BY source) b USING (source)
""",
)
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENCODE with the trained vocabulary — the payoff metric of
    q_bpe_train: learn the top-2 merges (the same greedy rule: best
    pair, merge everywhere, best pair again), apply both to the whole
    corpus, and report per-source symbol counts before/after plus the
    fraction of symbols saved. This is the number a tokenizer team
    prices vocab additions with (fewer symbols = fewer tokens = cheaper
    training per document).

    Scale shape: the two merge winners are 1-row config collects; the
    encode is a narrow map (two string replaces); the report is one
    per-source agg whose exchange is bounded by source count."""
    from cellbase_spark.io import fan_out_barrier

    d = load_table(spark, sf_dir, "documents")
    words = fan_out_barrier(d.select("source", "text")).select(
        "source", F.explode(F.split("text", " ")).alias("t")
    ).where(F.length("t") >= 2)
    s0 = words.select("source", F.concat_ws(_BPE_US, F.split("t", "")).alias("s"))

    def best(p: DataFrame) -> str:
        return p.orderBy(F.col("cnt").desc(), F.col("pair").asc()).limit(1).collect()[0].pair

    def merge(sdf: DataFrame, pair: str) -> DataFrame:
        return sdf.select("source", _bpe_merge_col(F.col("s"), pair).alias("s"))

    b1 = best(_bpe_pair_counts(s0))
    s1 = merge(s0, b1)
    b2 = best(_bpe_pair_counts(s1))
    s2 = merge(s1, b2)
    n_syms = F.size(F.split(F.col("s"), _BPE_US))
    before = s0.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(n_syms).alias("syms_before"),
    )
    after = s2.groupBy("source").agg(F.sum(n_syms).alias("syms_after"))
    return before.join(after, "source").select(
        "source",
        F.col("n_words").cast("bigint").alias("n_words"),
        F.col("syms_before").cast("bigint").alias("syms_before"),
        F.col("syms_after").cast("bigint").alias("syms_after"),
        F.round(
            F.lit(1.0) - F.col("syms_after") / F.col("syms_before"), 6
        ).alias("saved_frac"),
    )
