"""Multi-topic consume: one subscription over several topics, routed by the
topic column (B6 / A8).

Twin of /root/reference/examples/multiple_input_topics_example.go. Kasper
required all topics to share a partition count (README.md:36-39); Spark has
no such constraint — the shuffle co-locates keys as needed.

Run:  python examples/multiple_input_topics.py
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

ENVELOPE = "key string, value string, topic string, partition int, offset long"


def main(spark=None, use_kafka: bool = False) -> None:
    spark = spark or get_spark("example-multi-topic")
    workdir = tempfile.mkdtemp(prefix="kasper-multi-")
    pipe = Pipeline(
        spark,
        PipelineConfig(
            name="multi-topic",
            input_topics=["alpha", "beta"],  # ONE subscription (A8)
            checkpoint_root=os.path.join(workdir, "ck"),
        ),
    )
    src = os.path.join(workdir, "in")
    os.makedirs(src)
    with open(os.path.join(src, "batch1.json"), "w") as f:
        for i, (topic, v) in enumerate(
            [("alpha", "a1"), ("beta", "b1"), ("alpha", "a2")]
        ):
            f.write(json.dumps(
                {"key": f"k{i}", "value": v, "topic": topic,
                 "partition": 0, "offset": i}) + "\n")
    source = pipe.kafka_source() if use_kafka else pipe.file_source(src, ENVELOPE)

    # route on the topic column (kasper switched on msg.Topic)
    tagged = source.withColumn(
        "route",
        F.when(F.col("topic") == "alpha", F.lit("handled-by-alpha"))
        .when(F.col("topic") == "beta", F.lit("handled-by-beta"))
        .otherwise(F.lit("unknown")),
    )
    pipe.run_available_now(
        tagged,
        for_each_batch=lambda df, epoch: [
            print(f"[{r['route']}] {r['topic']}/{r['offset']}: {r['value']}")
            for r in df.collect()
        ],
    )


if __name__ == "__main__":
    main(use_kafka="--kafka" in sys.argv)
