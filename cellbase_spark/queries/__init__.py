"""Query modules — importing this package populates the registry.

One module per SURVEY.md §2 family. Each module registers its query keys
via cellbase_spark.registry.register.
"""

from cellbase_spark.queries import aggregates  # noqa: F401
from cellbase_spark.queries import analytics  # noqa: F401
from cellbase_spark.queries import corpus  # noqa: F401
from cellbase_spark.queries import filters  # noqa: F401
from cellbase_spark.queries import graph  # noqa: F401
from cellbase_spark.queries import grouping  # noqa: F401
from cellbase_spark.queries import joins  # noqa: F401
from cellbase_spark.queries import layout  # noqa: F401
from cellbase_spark.queries import llm_dedup  # noqa: F401
from cellbase_spark.queries import llm_multimodal  # noqa: F401
from cellbase_spark.queries import llm_similarity  # noqa: F401
from cellbase_spark.queries import llm_text  # noqa: F401
from cellbase_spark.queries import pipeline  # noqa: F401
from cellbase_spark.queries import quality  # noqa: F401
from cellbase_spark.queries import scalars  # noqa: F401
from cellbase_spark.queries import scans  # noqa: F401
from cellbase_spark.queries import setops  # noqa: F401
from cellbase_spark.queries import specialty  # noqa: F401
from cellbase_spark.queries import streaming  # noqa: F401
from cellbase_spark.queries import timeseries  # noqa: F401
from cellbase_spark.queries import tpch  # noqa: F401
from cellbase_spark.queries import tpch_full  # noqa: F401
from cellbase_spark.queries import udfs  # noqa: F401
from cellbase_spark.queries import windows  # noqa: F401
