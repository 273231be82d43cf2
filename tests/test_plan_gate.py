"""Unit tests for the PLANS.md delta gate (scripts/audit_plans.py).

The gate diffs this round's plan summaries against the previous PLANS.md
and fails on regressions (new CART/BNL anywhere; exchange-count increase
or lost pushdown/top-k on pinned keys), so plan damage surfaces in-round
rather than via bench noise (VERDICT r3 item 8). Pure functions — no
SparkSession needed.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from audit_plans import PINNED_KEYS, diff_plans, parse_plans_md  # noqa: E402

_REPO = Path(__file__).resolve().parent.parent


def _row(**over) -> dict:
    base = {
        "exchanges": 2,
        "broadcasts": 1,
        "joins": "BHashx2",
        "topk": "Y",
        "pushed": "Y",
        "codegen": "aqe",
        "aggs": 2,
    }
    base.update(over)
    return base


def test_no_change_passes():
    old = {"q_tpch_q3": _row(), "q_join_inner": _row()}
    assert diff_plans(old, dict(old)) == []


def test_new_cartesian_fails_any_key():
    # q_join_inner is NOT in PINNED_KEYS; CART must still be caught.
    assert "q_join_inner" not in PINNED_KEYS
    old = {"q_join_inner": _row()}
    new = {"q_join_inner": _row(joins="BHashx1,CARTx1")}
    bad = diff_plans(old, new)
    assert len(bad) == 1 and "CART" in bad[0]


def test_new_bnl_fails_but_preexisting_bnl_passes():
    old = {"q_dedup_near": _row(joins="BHashx3,BNLx4"), "q_tpch_q6": _row(joins="-")}
    # pre-existing BNL (the intended 1-row-config pattern) is not a regression
    assert (
        diff_plans(
            old,
            {"q_dedup_near": _row(joins="BHashx3,BNLx4"), "q_tpch_q6": _row(joins="-")},
        )
        == []
    )
    bad = diff_plans(
        old,
        {"q_dedup_near": _row(joins="BHashx3,BNLx4"), "q_tpch_q6": _row(joins="BNLx1")},
    )
    assert len(bad) == 1 and "BNL" in bad[0]


def test_exchange_increase_fails_only_pinned():
    pinned, unpinned = "q_tpch_q3", "q_join_inner"
    assert pinned in PINNED_KEYS and unpinned not in PINNED_KEYS
    old = {pinned: _row(exchanges=1), unpinned: _row(exchanges=1)}
    new = {pinned: _row(exchanges=2), unpinned: _row(exchanges=2)}
    bad = diff_plans(old, new)
    assert len(bad) == 1 and pinned in bad[0] and "exchanges 1 -> 2" in bad[0]


def test_lost_pushdown_and_topk_fail_pinned():
    old = {"q_tpch_q3": _row()}
    bad = diff_plans(old, {"q_tpch_q3": _row(pushed="-", topk="-")})
    assert len(bad) == 2
    assert any("pushdown" in b for b in bad)
    assert any("TakeOrdered" in b for b in bad)


def test_new_key_has_no_baseline():
    assert diff_plans({}, {"q_new_thing": _row(joins="CARTx1")}) == []


def test_parse_real_plans_md_roundtrip():
    text = (_REPO / "PLANS.md").read_text()
    rows = parse_plans_md(text)
    # every registered non-streaming key appears with sane fields
    assert len(rows) > 150
    assert rows["q_tpch_q3"]["topk"] == "Y"
    assert rows["q_agg_groupby"]["exchanges"] >= 1
    for r in rows.values():
        assert isinstance(r["exchanges"], int) and isinstance(r["aggs"], int)
    # the diff of a snapshot against itself is clean
    assert diff_plans(rows, rows) == []


def test_pinned_keys_are_registered():
    from cellbase_spark.registry import queries

    qs = queries()
    missing = [k for k in PINNED_KEYS if k not in qs]
    assert missing == []


def test_pinned_key_missing_from_new_snapshot_fails():
    """A pinned key that fails to explain this round must trip the gate,
    not silently vanish from the table (r4 advisory)."""
    pinned, unpinned = "q_tpch_q3", "q_join_inner"
    assert pinned in PINNED_KEYS and unpinned not in PINNED_KEYS
    old = {pinned: _row(), unpinned: _row()}
    bad = diff_plans(old, {unpinned: _row()})
    assert len(bad) == 1 and pinned in bad[0] and "missing" in bad[0]
    # an unpinned key vanishing is tolerated (streaming/env-gated keys)
    assert diff_plans(old, {pinned: _row()}) == []
