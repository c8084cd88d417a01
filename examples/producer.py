"""Producer: re-key/re-value each message to 'Hello {value}' (B2 map).

Twin of /root/reference/examples/producer_example.go:25-40. Demo mode
writes the transformed messages to a JSON sink directory; --kafka produces
to the 'greetings' topic via the acked Kafka sink (A5/A6).

Run:  python examples/producer.py
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
    spark = spark or get_spark("example-producer")
    workdir = tempfile.mkdtemp(prefix="kasper-producer-")
    pipe = Pipeline(
        spark,
        PipelineConfig(
            name="producer",
            input_topics=["names"],
            checkpoint_root=os.path.join(workdir, "ck"),
        ),
    )
    src = os.path.join(workdir, "in")
    os.makedirs(src)
    with open(os.path.join(src, "batch1.json"), "w") as f:
        for i, name in enumerate(["world", "kasper", "spark"]):
            f.write(json.dumps(
                {"key": f"k{i}", "value": name, "topic": "names",
                 "partition": 0, "offset": i}) + "\n")
    source = pipe.kafka_source() if use_kafka else pipe.file_source(src, ENVELOPE)

    greetings = source.select(
        F.col("key"),
        F.format_string("Hello %s", F.col("value").cast("string")).alias("value"),
    )
    if use_kafka:
        pipe.kafka_sink(greetings, topic="greetings", available_now=True)
    else:
        out = os.path.join(workdir, "out")
        pipe.run_available_now(
            greetings, sink_format="json", sink_options={"path": out}
        )
        print(f"greetings written to {out}")


if __name__ == "__main__":
    main(use_kafka="--kafka" in sys.argv)
