"""kasper_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference stream-processing library
(nmaquet/kasper, surveyed in SURVEY.md).

The reference is a Kafka micro-batch processing framework (Go); this package
re-expresses its capabilities Spark-first:

- bounded (batch) tier: declarative DataFrame operators over parquet,
  verifiable against a DuckDB oracle (SURVEY.md §2.D);
- streaming tier: Structured Streaming pipelines mirroring the reference's
  consume→process→produce→commit loop (SURVEY.md §2.A A1-A12);
- store/connector tier: Store/MultiStore-compatible surface
  (SURVEY.md §2.A A13-A21);
- north-star operators for large-scale training-data pipelines:
  dedup, similarity search, text analysis, multimodal columns.

Nothing here is a port: execution is delegated to Catalyst/Tungsten via the
DataFrame API; Python only declares plans (pandas UDFs where semantics demand).
"""

from kasper_spark.session import get_spark, stop_spark
from kasper_spark.catalog import TABLES, load_table, load_tables, register_views
from kasper_spark.registry import QUERIES, ORACLES, register_query

__all__ = [
    "get_spark",
    "stop_spark",
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "QUERIES",
    "ORACLES",
    "register_query",
]

__version__ = "0.1.0"
