"""scripts/gen_testdata.py must produce EXACTLY the driver testdata
schemas (FIXTURES.md) — otherwise the sf1 scale-trend numbers measure a
different workload than the driver's. Generates a tiny sf into tmp and
compares arrow schemas field-by-field against /root/testdata/sf0.001."""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from gen_testdata import generate  # noqa: E402

DRIVER_SF = Path("/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "supplier", "customer", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def gen_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("gen") / "sf0.001"
    generate(0.001, out)
    return out


@pytest.mark.parametrize("table", TABLES)
def test_schema_matches_driver(gen_dir, table):
    ours = pq.read_schema(gen_dir / f"{table}.parquet")
    theirs = pq.read_schema(DRIVER_SF / f"{table}.parquet")
    assert ours.names == theirs.names, f"{table}: column names differ"
    for name in theirs.names:
        ot = ours.field(name).type
        tt = theirs.field(name).type
        assert str(ot) == str(tt), f"{table}.{name}: {ot} != {tt}"


def test_row_counts_scale(gen_dir):
    li = pq.read_metadata(gen_dir / "lineitem.parquet").num_rows
    assert li == 6000  # 6M * 0.001
    assert pq.read_metadata(gen_dir / "region.parquet").num_rows == 5
    assert pq.read_metadata(gen_dir / "nation.parquet").num_rows == 25


def test_deterministic(tmp_path):
    a = tmp_path / "a"
    b = tmp_path / "b"
    generate(0.001, a)
    generate(0.001, b)
    ta = pq.read_table(a / "documents.parquet")
    tb = pq.read_table(b / "documents.parquet")
    assert ta.equals(tb)


def test_value_domains(gen_dir):
    import pyarrow.compute as pc

    li = pq.read_table(gen_dir / "lineitem.parquet")
    q = li.column("l_quantity")
    assert pc.min(q).as_py() >= 1.0 and pc.max(q).as_py() <= 50.0
    d = pq.read_table(gen_dir / "documents.parquet")
    langs = set(pc.unique(d.column("lang")).to_pylist())
    assert langs <= {"de", "en", "es", "fr", "zh"}
    e = pq.read_table(gen_dir / "embeddings.parquet")
    first = e.column("embedding")[0].as_py()
    assert len(first) == 64
    norm = sum(x * x for x in first) ** 0.5
    assert abs(norm - 1.0) < 1e-5


def test_categorical_values_match_driver(gen_dir):
    """Schema parity is not enough: query LITERALS (Q21's
    n_name = 'NATION_7', Q3's c_mktsegment = 'BUILDING', Q9's p_name
    LIKE '%red%') must select the same rows on generated data as on the
    driver's — the r15 finding was a zero-padded NATION_00 naming that
    made every local-sf Q21 timing vacuously empty."""
    import pyarrow.parquet as pq

    ours_n = pq.read_table(gen_dir / "nation.parquet")["n_name"].to_pylist()
    theirs_n = pq.read_table(DRIVER_SF / "nation.parquet")["n_name"].to_pylist()
    assert sorted(ours_n) == sorted(theirs_n)
    assert "NATION_7" in ours_n

    ours_r = pq.read_table(gen_dir / "region.parquet")["r_name"].to_pylist()
    theirs_r = pq.read_table(DRIVER_SF / "region.parquet")["r_name"].to_pylist()
    assert sorted(ours_r) == sorted(theirs_r)

    ours_seg = set(
        pq.read_table(gen_dir / "customer.parquet")["c_mktsegment"].to_pylist()
    )
    theirs_seg = set(
        pq.read_table(DRIVER_SF / "customer.parquet")["c_mktsegment"].to_pylist()
    )
    assert theirs_seg <= ours_seg, "driver mktsegment values missing locally"
