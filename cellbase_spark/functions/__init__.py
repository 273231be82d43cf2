"""Function helpers: compositions of built-in pyspark.sql.functions only.

No Python UDFs live here — everything stays JVM-side inside whole-stage
codegen (SURVEY.md §4.2). The UDF surface (§2.10) is in queries/udfs.py.
"""

from cellbase_spark.functions.exact import dsum, davg  # noqa: F401
