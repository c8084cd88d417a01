"""The two-stage per-key document join must produce the same final
(last-write-wins) documents as the partition-keyed faithful version and the
batch twin — on the same late-arrival fixture."""

from __future__ import annotations

import json
import os

from kasper_spark.streaming.state import (
    assemble_documents_batch,
    assemble_documents_scalable,
)
from tests.test_streaming import CHARACTERS, FICTIONS, _envelope, _write_json_file


def test_scalable_join_matches_batch_twin(spark, tmp_path):
    src = str(tmp_path / "msgs")
    # same staging as the golden test: fictions first, characters trickle in
    _write_json_file(
        src,
        _envelope("fictions", FICTIONS) + _envelope("characters", CHARACTERS[:2], 100),
        "b1.json",
    )
    _write_json_file(src, _envelope("characters", CHARACTERS[2:], 200), "b2.json")

    docs = assemble_documents_scalable(spark, src, str(tmp_path / "work"))
    emitted = [r.asDict() for r in docs.collect()]
    assert emitted, "no documents emitted"
    last = {}
    for e in emitted:  # memory sink appends per batch; later rows win
        last[e["fiction_id"]] = json.loads(e["doc_json"])

    cdf = spark.createDataFrame(CHARACTERS)
    fdf = spark.createDataFrame(FICTIONS)
    batch = {
        r["fiction_id"]: [c["id"] for c in r["characters"]]
        for r in assemble_documents_batch(cdf, fdf).collect()
    }
    stream = {k: [c["id"] for c in v["characters"]] for k, v in last.items()}
    assert stream == batch
    # character payloads fully resolved, in characterIds order
    assert last["FI_03"]["characters"][0]["name"] == "Edsger"
