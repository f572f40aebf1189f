"""aether_firebase_consumer_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query / data-processing capabilities of
eHealthAfrica/aether-firebase-consumer (streaming filter → mask → route →
hash-gated upsert ETL), re-expressed Spark-first:

- the reference's per-message Python interpreter loop becomes declarative
  DataFrame pipelines optimized by Catalyst (predicate pushdown, column
  pruning, join selection are free);
- its SDK-config "operators" (FilterConfig / MaskConfig / path templating /
  content hash / hash-based change detection) are first-class, individually
  testable operators with both batch and Structured Streaming bindings;
- the relational surface the reference lacks (joins, aggregations, windows,
  sorts, set ops) is provided natively through Spark SQL;
- LLM-data-pipeline extensions (dedup, similarity search, text analysis,
  multimodal columns) are built shuffle-aware for 100 TB scale.

Reference citations in docstrings use ``file:line`` relative to
``/root/reference/``.
"""

__version__ = "0.1.0"

from aether_firebase_consumer_spark.session import get_spark  # noqa: F401
from aether_firebase_consumer_spark.tables import TABLES, load_tables, register_views  # noqa: F401
