#!/usr/bin/env python3
"""Create and populate the CI Kafka topics for the env-gated broker tests.

Mirrors the role of the reference's topic seeder
(/root/reference/ci/create_topics.sh + ci/populate_topics.go:24-92: two
entity topics — characters and fictions — partitioned by key), re-expressed
over this repo's test corpus: two topics keyed by entity id, JSON values,
hash-partitioned — the same shape the kasper_topic_dir connector twin seeds
locally (tests/test_topic_dir_source.py).

Usage (after `docker compose -f ci/docker-compose.yml up -d`):

    python ci/seed_topics.py [--brokers localhost:9092]

Needs kafka-python (pip install kafka-python) — the same optional dependency
the broker tests import-gate on.
"""

from __future__ import annotations

import argparse
import json
import sys

CHARACTER_TOPIC = "kasper-spark-ci-characters"
FICTION_TOPIC = "kasper-spark-ci-fictions"
PARTITIONS = 4

# Minimal seed corpus: entities + a one-to-many relation across topics, so
# the stream-stream join tests have real referential structure to verify.
CHARACTERS = [
    {"id": f"CHARACTER_{i:03d}", "name": name}
    for i, name in enumerate(
        ["Ada", "Grace", "Edsger", "Barbara", "Donald", "Alan", "Margaret", "Tony"],
        start=1,
    )
]
FICTIONS = [
    {"id": "FICTION_001", "title": "Analytical Engines", "character_ids": ["CHARACTER_001", "CHARACTER_005"]},
    {"id": "FICTION_002", "title": "Compilers at Sea", "character_ids": ["CHARACTER_002"]},
    {"id": "FICTION_003", "title": "Structured Nights", "character_ids": ["CHARACTER_003", "CHARACTER_008"]},
    {"id": "FICTION_004", "title": "Moon Software", "character_ids": ["CHARACTER_004", "CHARACTER_007"]},
    {"id": "FICTION_005", "title": "The Imitation", "character_ids": ["CHARACTER_006"]},
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--brokers", default="localhost:9092")
    args = ap.parse_args()

    try:
        from kafka import KafkaProducer
        from kafka.admin import KafkaAdminClient, NewTopic
    except ImportError:
        print("kafka-python is required: pip install kafka-python", file=sys.stderr)
        return 1

    admin = KafkaAdminClient(bootstrap_servers=args.brokers)
    existing = set(admin.list_topics())
    wanted = [t for t in (CHARACTER_TOPIC, FICTION_TOPIC) if t not in existing]
    if wanted:
        admin.create_topics(
            [NewTopic(t, num_partitions=PARTITIONS, replication_factor=1) for t in wanted]
        )
        print(f"created topics: {wanted}")

    producer = KafkaProducer(
        bootstrap_servers=args.brokers,
        key_serializer=lambda k: k.encode(),
        value_serializer=lambda v: json.dumps(v).encode(),
    )
    for c in CHARACTERS:
        producer.send(CHARACTER_TOPIC, key=c["id"], value=c)
    for f in FICTIONS:
        producer.send(FICTION_TOPIC, key=f["id"], value=f)
    producer.flush()
    print(
        f"seeded {len(CHARACTERS)} characters -> {CHARACTER_TOPIC}, "
        f"{len(FICTIONS)} fictions -> {FICTION_TOPIC}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
