"""Shared header→schema mapping for the spreadsheet sources (xlsx/ods).

Round 13 (r12 verdict #4): the schema-EVOLUTION contract for workbook
re-ingest. Spreadsheet corpora evolve by generation — a sheet saved next
quarter grows a column — and the declared-schema read used to handle
that silently: an extra file column was dropped without a word, and a
declared column missing from the file crashed with a raw
`ValueError: 'x' is not in list` from the executor kernel. Both are the
wrong contract for a data engine. The pinned contract:

- ``schema_mode="strict"`` (default): the file's header set must EQUAL
  the declared column set (order free — reordered sheets are fine).
  Any extra or missing column raises a typed ValueError naming the
  columns and the remedy, so generation drift is LOUD at read time.
- ``schema_mode="evolve"``: parquet-mergeSchema-style union semantics
  with the DECLARED schema as the result projection. A declared column
  missing from this file's header reads as NULL (old generations under
  the new, wider schema); an extra file column not in the declaration
  is ignored (new generations under the old schema read the declared
  projection). Either direction of drift is serveable, by opt-in.
"""

from __future__ import annotations


def check_schema_mode(schema_mode: str) -> None:
    """Eager driver-side validation — a typo'd mode must fail at plan
    time, not as a wrapped executor exception after a cluster launch."""
    if schema_mode not in ("strict", "evolve"):
        raise ValueError(
            f"schema_mode must be 'strict' or 'evolve', got {schema_mode!r}"
        )


def header_positions(
    head: list, field_names: list[str], schema_mode: str, where: str
) -> dict[str, int | None]:
    """Map declared field names onto a sheet's header row.

    Returns {field_name: column index, or None to null-fill} under the
    contract documented in the module docstring. `where` names the file/
    sheet in error messages (executor-side raises must say which of the
    10,000 workbook files drifted).
    """
    check_schema_mode(schema_mode)
    head_names = [h for h in head if h is not None]
    dup = sorted({
        n for n in field_names if head_names.count(n) > 1
    })
    if schema_mode == "strict" and dup:
        # a declared column appearing twice in the sheet is ambiguous —
        # strict refuses rather than silently serving the first copy
        # (evolve keeps the deterministic first-occurrence rule, which
        # is also what positional no-header reads do)
        raise ValueError(
            f"schema mismatch in {where}: declared column(s) duplicated "
            f"in the sheet header: {dup}; de-duplicate the sheet or pass "
            "schema_mode='evolve' to read the first occurrence"
        )
    missing = [n for n in field_names if n not in head_names]
    extra = [h for h in head_names if h not in field_names]
    if schema_mode == "strict" and (missing or extra):
        raise ValueError(
            f"schema mismatch in {where}: "
            + (f"declared columns missing from the sheet: {missing}; " if missing else "")
            + (f"sheet columns not in the declared schema: {extra}; " if extra else "")
            + "pass schema_mode='evolve' to read the declared projection "
            "(missing columns null-filled, extra columns ignored)"
        )
    return {
        n: (head.index(n) if n in head_names else None) for n in field_names
    }
