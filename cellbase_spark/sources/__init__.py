"""Extra table sources beyond io.py's parquet/CSV/JSONL.

excel: distributed .xlsx ingestion (binaryFile + stdlib XML parse) — the
reference's native spreadsheet format, no external packages required.
"""

from cellbase_spark.sources.excel import (  # noqa: F401
    parse_xlsx_bytes,
    read_excel_table,
    write_xlsx,
)
