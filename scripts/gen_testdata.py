"""Local scale-factor generator for the driver's synthetic schema.

The driver ships sf0.001/0.01/0.1 under /root/testdata (read-only). The
scale-trend evidence (BASELINE.md, VERDICT r3 item 6) needs one notch
more data to replace extrapolation with measurement, so this generates
an sf-N dataset with the SAME schemas (FIXTURES.md, verified against the
parquet footers) and the same marginal distributions (profiled from
sf0.1 via DuckDB on 2026-08-14):

- all draws independent-uniform unless noted (the driver data shows no
  TPC-H-style correlations: corr(l_extendedprice, qty*retail) ~ 0)
- l_quantity integer-valued 1..50 double; dates at midnight; every
  timestamp column is timestamp[us] like the driver parquet footers
- events.value ~ Exponential(mean 50); events.ts over
  2024-01-01..2024-01-30; props = {"k": randint(0,100)}
- documents: 30-token analytics vocab, uniform 10..100 tokens/doc,
  ~5% near-dup rows (copy of a base doc with a 'dup' token spliced in),
  a few exact dups; lang weights en=0.4, others=0.15
- embeddings: unit-normalized 64-dim, 10 label clusters (center-weighted
  mixture so per-label KNN has structure)

Usage: python scripts/gen_testdata.py 1.0 [/root/repo/.localdata/sf1] [documents,embeddings]

Row counts scale linearly from the sf0.1 profile (FIXTURES.md):
supplier 10k/sf1, customer 150k, part 200k, orders 1.5M, lineitem 6M,
events 1M, documents 50k, embeddings 20k; region/nation fixed 5/25.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

ADJ = ["blue", "old", "large", "hot", "cold", "red", "small", "new"]
NOUN = ["widget", "anvil", "bolt", "plate", "rod", "gizmo", "ring", "gear"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["de", "en", "es", "fr", "zh"]
LANG_W = [0.15, 0.40, 0.15, 0.15, 0.15]
VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]

DAY_US = 86_400_000_000


def _dates_us(rng: np.random.Generator, n: int, lo: str, hi: str) -> pa.Array:
    """Uniform midnight dates in [lo, hi] as timestamp[us] (the unit the
    driver parquet footers declare for every timestamp column)."""
    lo_d = np.datetime64(lo, "D").astype(np.int64)
    hi_d = np.datetime64(hi, "D").astype(np.int64)
    days = rng.integers(lo_d, hi_d + 1, n)
    return pa.array(days * DAY_US, type=pa.timestamp("us"))


def _write(out: Path, name: str, table: pa.Table) -> None:
    pq.write_table(table, out / f"{name}.parquet")
    print(f"  {name}: {table.num_rows} rows", file=sys.stderr)


# Above this row count the fact tables stream out in chunks through one
# ParquetWriter instead of materializing every column in RAM at once —
# sf100 lineitem (600M rows) would otherwise peak near ~100 GB of numpy
# + arrow copies. Set ABOVE sf10's 60M so every previously generated
# dir stays byte-stable under re-generation.
CHUNKED_ABOVE = 60_000_000
CHUNK_ROWS = 20_000_000


def _write_chunked(out: Path, name: str, n: int, builder) -> None:
    """builder(start, m) -> pa.Table for rows [start, start+m)."""
    writer = None
    done = 0
    try:
        while done < n:
            m = min(CHUNK_ROWS, n - done)
            t = builder(done, m)
            if writer is None:
                writer = pq.ParquetWriter(out / f"{name}.parquet", t.schema)
            writer.write_table(t)
            done += m
            print(f"  {name}: {done}/{n} rows", file=sys.stderr)
    finally:
        if writer is not None:
            writer.close()


def generate(sf: float, out: Path, only: set[str] | None = None) -> None:
    """`only` restricts generation to the named tables (plus the tiny
    fixed dims) — the sf100 probe-battery rung needs documents +
    embeddings but not 600M lineitem rows. NOTE: skipping tables
    advances the shared rng stream differently than a full run, so a
    partial dir is NOT row-identical to the same tables in a full dir;
    it is for scale benching, never for cross-sf value comparisons."""
    out.mkdir(parents=True, exist_ok=True)

    def want(name: str) -> bool:
        return only is None or name in only or name in ("region", "nation")
    rng = np.random.default_rng(SEED)
    n_supp = int(10_000 * sf)
    n_cust = int(150_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    n_users = int(15_000 * sf)

    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        # unpadded, matching the driver testdata ("NATION_7"): query
        # literals like TPC-H Q21's n_name filter must hit the same rows
        # at every sf — the zero-padded form made Q21 vacuously empty on
        # locally generated data (r15 finding; parity pinned in
        # tests/test_gen_testdata.py)
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    if want("supplier"):
        _write(out, "supplier", pa.table({
            "s_suppkey": pa.array(range(n_supp), pa.int64()),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
            "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
            "s_acctbal": np.round(rng.uniform(-1000, 10_000, n_supp), 2),
        }))
    if want("customer"):
        _write(out, "customer", pa.table({
            "c_custkey": pa.array(range(n_cust), pa.int64()),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
            "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
            "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
        }))
    if want("part"):
        adj = np.array(ADJ)[rng.integers(0, 8, n_part)]
        noun = np.array(NOUN)[rng.integers(0, 8, n_part)]
        _write(out, "part", pa.table({
            "p_partkey": pa.array(range(n_part), pa.int64()),
            "p_name": np.char.add(np.char.add(adj, " "), noun),
            "p_brand": np.array([f"Brand#{i}" for i in range(1, 26)])[
                rng.integers(0, 25, n_part)],
            "p_type": np.array(PTYPES)[rng.integers(0, 6, n_part)],
            "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
            "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 1),
        }))
    if want("orders"):
        def _orders_chunk(start: int, m: int) -> pa.Table:
            return pa.table({
                "o_orderkey": pa.array(range(start, start + m), pa.int64()),
                "o_custkey": pa.array(rng.integers(0, n_cust, m), pa.int64()),
                "o_orderstatus": np.array(["F", "O", "P"])[rng.integers(0, 3, m)],
                "o_totalprice": np.round(rng.uniform(1000, 500_000, m), 2),
                "o_orderdate": _dates_us(rng, m, "1995-01-01", "2001-08-01"),
                "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, m)],
            })
        if n_ord > CHUNKED_ABOVE:
            _write_chunked(out, "orders", n_ord, _orders_chunk)
        else:
            _write(out, "orders", _orders_chunk(0, n_ord))
    if want("lineitem"):
        def _lineitem_chunk(start: int, m: int) -> pa.Table:
            return pa.table({
                "l_orderkey": pa.array(rng.integers(0, n_ord, m), pa.int64()),
                "l_partkey": pa.array(rng.integers(0, n_part, m), pa.int64()),
                "l_suppkey": pa.array(rng.integers(0, n_supp, m), pa.int64()),
                "l_linenumber": pa.array(rng.integers(1, 8, m), pa.int32()),
                "l_quantity": rng.integers(1, 51, m).astype(np.float64),
                "l_extendedprice": np.round(rng.uniform(900, 105_000, m), 2),
                "l_discount": np.round(rng.uniform(0, 0.1, m), 2),
                "l_tax": np.round(rng.uniform(0, 0.08, m), 2),
                "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, m)],
                "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, m)],
                "l_shipdate": _dates_us(rng, m, "1995-01-02", "2001-11-04"),
            })
        if n_li > CHUNKED_ABOVE:
            _write_chunked(out, "lineitem", n_li, _lineitem_chunk)
        else:
            _write(out, "lineitem", _lineitem_chunk(0, n_li))
    if want("events"):
        t0 = np.datetime64("2024-01-01", "us").astype(np.int64)
        t1 = np.datetime64("2024-01-31", "us").astype(np.int64)
        ks = rng.integers(0, 100, n_ev)
        _write(out, "events", pa.table({
            "event_id": pa.array(range(n_ev), pa.int64()),
            "ts": pa.array(np.sort(rng.integers(t0, t1, n_ev)), pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
            "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
            "value": np.round(rng.exponential(50.0, n_ev), 2),
            "props": [f'{{"k": {k}}}' for k in ks],
        }))

    if want("documents"):
        # documents: base corpus + ~5% near-dups (+ a few exact dups)
        vocab = np.array(VOCAB)
        lens = rng.integers(10, 101, n_doc)
        texts: list[str] = []
        for ln in lens:
            texts.append(" ".join(vocab[rng.integers(0, len(vocab), ln)]))
        n_near = n_doc // 20
        for i in range(n_near):
            src = int(rng.integers(0, n_doc))
            toks = texts[src].split(" ")
            toks.insert(int(rng.integers(0, len(toks) + 1)), "dup")
            texts[int(rng.integers(0, n_doc))] = " ".join(toks)
        for _ in range(max(1, n_doc // 625)):
            texts[int(rng.integers(0, n_doc))] = texts[int(rng.integers(0, n_doc))]
        _write(out, "documents", pa.table({
            "doc_id": pa.array(range(n_doc), pa.int64()),
            "text": texts,
            "lang": np.array(LANGS)[rng.choice(5, n_doc, p=LANG_W)],
            "source": np.array([f"src{i}" for i in range(20)])[
                rng.integers(0, 20, n_doc)],
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }))

    if want("embeddings"):
        centers = rng.normal(size=(10, 64))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        labels = rng.integers(0, 10, n_emb)
        vecs = 0.7 * centers[labels] + 0.5 * rng.normal(size=(n_emb, 64))
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        _write(out, "embeddings", pa.table({
            "vec_id": pa.array(range(n_emb), pa.int64()),
            "embedding": pa.array(
                [v for v in vecs.astype(np.float32)],
                pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }))
    (out / "GENERATED.json").write_text(json.dumps(
        {"sf": sf, "seed": SEED, "generator": "scripts/gen_testdata.py"}))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    dest = Path(sys.argv[2]) if len(sys.argv) > 2 else Path(
        __file__).resolve().parent.parent / ".localdata" / f"sf{sf:g}"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    generate(sf, dest, only)
    print(f"wrote sf{sf:g} to {dest}", file=sys.stderr)
