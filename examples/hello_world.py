"""Hello-world: print every message's envelope (B1 pass-through).

Twin of /root/reference/examples/hello_world_example.go:17-33. Demo mode
(default) feeds a file source so no broker is needed; pass --kafka to
subscribe to a real topic with the same pipeline object.

Run:  python examples/hello_world.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kasper_spark.session import get_spark
from kasper_spark.streaming.pipeline import Pipeline, PipelineConfig

ENVELOPE = "key string, value string, topic string, partition int, offset long"


def main(spark=None, use_kafka: bool = False) -> None:
    spark = spark or get_spark("example-hello-world")
    workdir = tempfile.mkdtemp(prefix="kasper-hello-")
    pipe = Pipeline(
        spark,
        PipelineConfig(
            name="hello-world",
            input_topics=["hello"],
            checkpoint_root=os.path.join(workdir, "ck"),
        ),
    )
    if use_kafka:
        source = pipe.kafka_source().selectExpr(
            "CAST(key AS STRING) key", "CAST(value AS STRING) value",
            "topic", "partition", "offset"
        )
    else:
        src = os.path.join(workdir, "in")
        os.makedirs(src)
        with open(os.path.join(src, "batch1.json"), "w") as f:
            for i, text in enumerate(["Hello world", "Hej verden", "Hallo Welt"]):
                f.write(json.dumps(
                    {"key": f"k{i}", "value": text, "topic": "hello",
                     "partition": 0, "offset": i}) + "\n")
        source = pipe.file_source(src, ENVELOPE)

    # the reference prints key/value/topic/partition/offset per message
    pipe.run_available_now(
        source,
        for_each_batch=lambda df, epoch: [
            print(f"Got message: key='{r['key']}', value='{r['value']}' "
                  f"[topic={r['topic']}, partition={r['partition']}, offset={r['offset']}]")
            for r in df.collect()
        ],
    )


if __name__ == "__main__":
    main(use_kafka="--kafka" in sys.argv)
