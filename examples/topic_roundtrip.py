"""Produce -> consume -> transform -> produce through the kasper_topic_dir
connector: the reference's producer + hello-world pair
(/root/reference/examples/producer_example.go:25-40,
/root/reference/examples/hello_world_example.go:17-33) on a REAL pluggable
Spark source/sink with Kafka semantics (partitions, offsets, key-hash
routing, checkpoint resume) — no broker required.

Run:  python examples/topic_roundtrip.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kasper_spark.session import get_spark
from kasper_spark.sources.topic_dir import register_topic_dir_source
from kasper_spark.streaming.pipeline import Pipeline, PipelineConfig


def main(spark=None) -> None:
    spark = spark or get_spark("example-topic-roundtrip")
    register_topic_dir_source(spark)
    workdir = tempfile.mkdtemp(prefix="kasper-topic-rt-")
    in_topic = os.path.join(workdir, "words")
    out_topic = os.path.join(workdir, "shouted")

    # producer: write keyed messages into the input topic (sarama-style
    # key-hash partitioning — producer_example.go's StringEncoder pairs)
    messages = spark.createDataFrame(
        [(f"key-{i}", f"hello world {i}") for i in range(10)],
        "key string, value string",
    ).withColumn("ts", F.timestamp_seconds(F.lit(1_700_000_000)))
    messages.write.format("kasper_topic_dir").option("path", in_topic).option(
        "partitions", "4"
    ).mode("append").save()

    # consumer pipeline: topic scan -> transform -> topic sink, offsets
    # committed to the checkpoint after the sink epoch (A6 ordering)
    pipe = Pipeline(
        spark,
        PipelineConfig(name="topic-roundtrip", checkpoint_root=os.path.join(workdir, "ck")),
    )
    out = pipe.topic_dir_source(in_topic).select(
        "key", F.upper(F.col("value")).alias("value"), "ts"
    )
    q = (
        out.writeStream.format("kasper_topic_dir")
        .option("path", out_topic)
        .option("partitions", "2")
        .option("checkpointLocation", pipe.config.checkpoint_location)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    for row in (
        spark.read.format("kasper_topic_dir")
        .option("path", out_topic)
        .load()
        .orderBy("partition", "offset")
        .collect()
    ):
        print(f"p={row['partition']} off={row['offset']} {row['key']} -> {row['value']}")


if __name__ == "__main__":
    main()
