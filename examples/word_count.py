"""Word count: tokenize lines, keep a running per-word counter in state,
emit '{word} has been seen {n} times' (B3 flatMap + B4 stateful count).

Twin of /root/reference/examples/word_count_example.go:22-67 — the store-
backed counter becomes a streaming aggregation in update mode; Spark's
state store replaces the app-visible KV store.

Run:  python examples/word_count.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kasper_spark.session import get_spark
from kasper_spark.streaming.pipeline import Pipeline, PipelineConfig
from kasper_spark.streaming.state import running_word_count


def main(spark=None, use_kafka: bool = False) -> None:
    spark = spark or get_spark("example-word-count")
    workdir = tempfile.mkdtemp(prefix="kasper-wc-")
    pipe = Pipeline(
        spark,
        PipelineConfig(
            name="word-count",
            input_topics=["words"],
            checkpoint_root=os.path.join(workdir, "ck"),
        ),
    )
    src = os.path.join(workdir, "in")
    os.makedirs(src)
    with open(os.path.join(src, "batch1.json"), "w") as f:
        for line in ["the quick brown fox", "the lazy dog", "the quick dog"]:
            f.write(json.dumps({"value": line}) + "\n")
    source = pipe.kafka_source() if use_kafka else pipe.file_source(src, "value string")

    counts = running_word_count(source)
    # the reference emits one message per count update, formatted:
    messages = counts.select(
        F.col("word").alias("key"),
        F.format_string("%s has been seen %d times", "word", "n").alias("value"),
    )
    if use_kafka:
        pipe.kafka_sink(messages, topic="word-counts", available_now=True,
                        output_mode="update")
    else:
        pipe.run_available_now(messages, output_mode="update",
                               query_name="word_counts")
        for r in spark.table("word_counts").orderBy("key").collect():
            print(r["value"])


if __name__ == "__main__":
    main(use_kafka="--kafka" in sys.argv)
