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


def test_scalable_join_fiction_update_resets_slots(spark, tmp_path):
    """A fiction update that SHRINKS characterIds must produce the updated
    document, not crash on stale slots or mix characters from two versions
    (the version gate in stage 2). Stale stage-1 subscriptions for the
    dropped character keep re-emitting old refs — they must stay inert."""
    src = str(tmp_path / "msgs")
    fi1_v1 = {"id": "FI_01", "fictionType": "Novel", "title": "Engines",
              "characterIds": ["CH_01", "CH_02"]}
    fi1_v2 = {"id": "FI_01", "fictionType": "Novel", "title": "Engines v2",
              "characterIds": ["CH_02"]}
    chars = CHARACTERS[:2]
    # v1 completes with both characters, then v2 drops CH_01, then CH_01
    # updates (stale subscription re-fires)
    _write_json_file(src, _envelope("fictions", [fi1_v1]) + _envelope("characters", chars, 100), "b1.json")
    _write_json_file(src, _envelope("fictions", [fi1_v2], 300), "b2.json")
    ch01_update = dict(CHARACTERS[0], name="Ada Updated")
    _write_json_file(src, _envelope("characters", [ch01_update], 400), "b3.json")

    docs = assemble_documents_scalable(spark, src, str(tmp_path / "work"))
    emitted = [r.asDict() for r in docs.collect()]
    assert emitted
    last = json.loads(emitted[-1]["doc_json"])
    assert last["title"] == "Engines v2"
    assert [c["id"] for c in last["characters"]] == ["CH_02"]
