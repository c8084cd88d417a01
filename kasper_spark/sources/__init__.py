"""Custom Spark data sources (Python DataSource API, Spark 4+)."""

from kasper_spark.sources.topic_dir import (  # noqa: F401
    TopicDirDataSource,
    register_topic_dir_source,
)
