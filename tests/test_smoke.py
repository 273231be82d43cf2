"""M0 smoke: entry() contract + flagship query shape."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    cols = set(df.columns)
    assert {"l_returnflag", "l_linestatus", "sum_qty", "count_order"} <= cols


def test_queries_and_oracles_align(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 2


def test_flagship_groups(spark, sf_dir):
    df = entrymod.queries()["q_agg_groupby"](spark, sf_dir)
    rows = {(r.l_returnflag, r.l_linestatus) for r in df.collect()}
    # returnflag in {A,N,R} x linestatus in {F,O}; data has the TPC-H
    # correlation (A/R ship old = F, N mostly O) but at minimum >=3 groups
    assert len(rows) >= 3
    assert all(rf in "ANR" and ls in "FO" for rf, ls in rows)


def test_bench_contention_guard_logic():
    """The bench guard-v2 pure logic (no Spark): two ops (cpu+shuffle),
    contended = EITHER op out of its band; bands come from the rolling
    per-host min (a sample below the stored ref tightens the band); the
    rerun check (contended_last) ignores pass-1 samples so a recovered
    pass-2 isn't permanently stamped; min-merge can only improve a key
    across a rerun (errors replaced, never propagated as min(-1, t))."""
    import bench

    def fresh(stored_cpu_warm=0.20, stored_sh_warm=0.40):
        b = bench.GuardBands()
        b.stored = {
            "cpu": {"cold": 0.25, "warm": stored_cpu_warm},
            "shuffle": {"cold": 0.70, "warm": stored_sh_warm},
        }
        return b

    fc = bench.CONTENDED_FACTOR["cpu"]
    fs = bench.CONTENDED_FACTOR["shuffle"]

    # in-band on both ops (cold bracket vs cold band) -> clean
    b = fresh()
    b.samples = {"cpu": [("cold", 0.26)], "shuffle": [("cold", 0.72)]}
    assert not b.contended()
    # shuffle out of band while cpu clean -> contended (the r9 phantom
    # mode the cpu-only guard missed)
    b = fresh()
    b.samples = {
        "cpu": [("warm", 0.21)],
        "shuffle": [("warm", 0.40 * fs * 1.01)],
    }
    assert b.contended()
    # cpu out of band alone still trips
    b = fresh()
    b.samples = {
        "cpu": [("warm", 0.20 * fc * 1.01)],
        "shuffle": [("warm", 0.41)],
    }
    assert b.contended()
    # a COLD sample is judged against the cold band, not the warm min:
    # ordinary cold-start (2x the warm figure) must NOT read as load
    b = fresh()
    b.samples = {"cpu": [("cold", 0.26)], "shuffle": [("cold", 0.69)]}
    assert not b.contended()
    # a faster-than-stored sample TIGHTENS its class band (rolling min):
    # a second warm sample past factor x the new min trips
    b = fresh()
    b.samples = {
        "cpu": [("warm", 0.10), ("warm", 0.10 * fc * 1.01)],
        "shuffle": [("warm", 0.41), ("warm", 0.41)],
    }
    assert b.ref("cpu", "warm") == 0.10
    assert b.contended()
    # contended_last(2) judges only the rerun bracket: contaminated
    # pass-1 samples followed by a clean pass-2 -> not contended
    b = fresh()
    b.samples = {
        "cpu": [("cold", 0.9), ("warm", 0.9), ("warm", 0.21), ("warm", 0.21)],
        "shuffle": [("cold", 0.71)] + [("warm", 0.41)] * 3,
    }
    assert b.contended()  # full-history view stays true
    assert not b.contended_last(2)  # rerun bracket recovered
    # first run on a host (no stored refs): bootstrapped from the
    # DEFAULT_REF bands, so a UNIFORMLY loaded first run is detected —
    # pure self-reference was inert here (one cold sample can never
    # exceed its own minimum; round-10 review finding)
    b = bench.GuardBands()
    b.stored = {
        op: {kl: None for kl in bench.GUARD_CLASSES} for op in bench.GUARD_OPS
    }
    slow = {
        op: {kl: bench.DEFAULT_REF[op][kl] * 3 for kl in bench.GUARD_CLASSES}
        for op in bench.GUARD_OPS
    }
    b.samples = {
        op: [("cold", slow[op]["cold"]), ("warm", slow[op]["warm"])]
        for op in bench.GUARD_OPS
    }
    assert b.contended()
    # ...and an idle-looking first run (at or under the defaults) stays
    # clean; persist() records host truth WITHOUT the default floor
    b2 = bench.GuardBands()
    b2.stored = {
        op: {kl: None for kl in bench.GUARD_CLASSES} for op in bench.GUARD_OPS
    }
    b2.samples = {
        op: [
            ("cold", bench.DEFAULT_REF[op]["cold"] * 0.9),
            ("warm", bench.DEFAULT_REF[op]["warm"] * 0.9),
        ]
        for op in bench.GUARD_OPS
    }
    assert not b2.contended()
    # observe() classifies the first bracket cold, later ones warm
    b2 = bench.GuardBands()
    assert b2._n_brackets == 0

    # min-merge semantics: the REAL bench helper, not an in-test copy
    for prev, best, want in [(None, 1.0, 1.0), (1.0, 0.5, 0.5),
                             (0.5, 0.9, 0.5), (-1.0, 0.7, 0.7)]:
        assert bench._merge_timing(prev, best) == want


def test_bench_guard_ref_decay_and_floor(monkeypatch):
    """Persisted guard minima DECAY 5% per run unless re-confirmed and
    never drop below 20% of the default band (r10 ADVICE low: one timer
    glitch used to tighten the idle band forever, stamping every later
    idle run contended)."""
    import bench

    monkeypatch.setattr(bench, "_save_refs", lambda refs: None)
    b = bench.GuardBands()
    # unconfirmed stored min relaxes by REF_DECAY per persist
    b.stored = {
        "cpu": {"cold": 0.30, "warm": 0.10},
        "shuffle": {"cold": 0.75, "warm": 0.50},
    }
    b.samples = {"cpu": [], "shuffle": []}
    assert b.persist()["cpu"]["warm"] == round(0.10 * b.REF_DECAY, 4)
    # a confirming fresh sample pins the min (no decay past the sample)
    b.samples = {"cpu": [("warm", 0.10)], "shuffle": []}
    assert b.persist()["cpu"]["warm"] == 0.10
    # the floor bounds how far a glitch can undershoot on persist...
    floor = bench.DEFAULT_REF["cpu"]["warm"] * b.REF_FLOOR_FRAC
    b.stored = {
        "cpu": {"cold": 0.30, "warm": 0.0001},
        "shuffle": {"cold": 0.75, "warm": 0.50},
    }
    b.samples = {"cpu": [], "shuffle": []}
    assert b.persist()["cpu"]["warm"] == round(floor, 4)
    # ...and ref() floors a pre-decay glitch value loaded from disk, so
    # the CURRENT run doesn't classify against it either
    assert b.ref("cpu", "warm") == floor


def test_survey_s2_inventory_matches_registry():
    """SURVEY.md §2 is the grading contract: every `q_*` key named in a
    §2 table row must exist in the live registry and vice versa, and
    the stamped inventory-size line must carry the live count — the
    r10 verdict flagged both drifting (a stale "203 keys" line and
    duplicated row IDs). Row IDs must also be unique across §2."""
    import os
    import re

    import cellbase_spark.queries  # noqa: F401 — populates the registry
    from cellbase_spark.registry import REGISTRY

    survey = os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")
    keys: set[str] = set()
    row_ids: list[str] = []
    stamped = None
    in_s2 = False
    with open(survey) as f:
        for line in f:
            if line.startswith("## "):
                in_s2 = line.startswith("## §2")
            if not in_s2:
                continue
            m = re.match(r"\*\*Inventory size [^:]*: (\d+) registered", line)
            if m:
                stamped = int(m.group(1))
            if not line.startswith("| "):
                continue
            cells = [c.strip() for c in line.strip().strip("|").split("|")]
            if not cells or not re.match(r"^[A-Z]\d+[a-z]?$", cells[0]):
                continue
            row_ids.append(cells[0])
            keys.update(re.findall(r"`(q_[a-z0-9_]+)`", cells[-1]))

    reg = set(REGISTRY)
    assert keys - reg == set(), f"SURVEY §2 names unregistered keys: {sorted(keys - reg)}"
    assert reg - keys == set(), f"registry keys missing from SURVEY §2: {sorted(reg - keys)}"
    dupes = sorted({i for i in row_ids if row_ids.count(i) > 1})
    assert dupes == [], f"duplicate SURVEY §2 row IDs: {dupes}"
    assert stamped == len(reg), (
        f"SURVEY §2 inventory line says {stamped} keys, registry has {len(reg)}"
    )
