"""Stateful streaming operators.

Re-expresses the reference's Store-backed processing patterns as Spark
stateful operators:

- running_word_count: B4 — the word-count example's running per-key counter
  (/root/reference/examples/word_count_example.go:33-67). Declarative
  streaming aggregation in update mode; Spark's state store replaces the
  app-visible KV store, with partial aggregation and RocksDB state at scale.

- assemble_documents: B5 — the characters x fictions materialized N:M join
  (/root/reference/topic_processor_test.go:76-155). Kasper buffers both
  sides in stores plus an inverted char->fictions index so a late-arriving
  character re-emits every fiction it completes; a document is emitted only
  when ALL characterIds have arrived, and re-emitted on updates
  (downstream keyed last-write-wins). A plain stream-stream join emits
  per-pair, not per-complete-document, so this is a custom stateful op via
  applyInPandasWithState.

  Keying: by Kafka partition — faithfully mirroring the reference, which
  joins only within a partition and requires its input topics to be
  co-partitioned (/root/reference/README.md:36-39,
  /root/reference/partition_processor.go:53-77). Parallelism therefore
  equals the topic partition count, exactly like kasper's one
  partitionProcessor per partition. (assemble_documents_scalable is the
  per-key two-stage variant that removes the co-partitioning constraint —
  the 100 TB scale path.)

  State never evicts, matching the reference (stores grow forever —
  /root/reference/topic_processor_test.go:94-133); production deployments
  should bound it with timeouts. State is per-group JSON blobs: at kasper
  parity (one group per Kafka partition) this is the same memory profile as
  kasper's in-memory Map store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# output: one row per (possibly re-)emitted complete document
DOCUMENT_SCHEMA = StructType(
    [
        StructField("partition", IntegerType()),
        StructField("fiction_id", StringType()),
        StructField("doc_json", StringType()),
    ]
)

# state: the three stores kasper keeps (characters, fictions, inverted index)
_STATE_SCHEMA = StructType(
    [
        StructField("characters_json", StringType()),
        StructField("fictions_json", StringType()),
        StructField("char_to_fictions_json", StringType()),
    ]
)


def running_word_count(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Streaming running count per word (update mode downstream).

    Batch/streaming twin of the reference word-count: tokenize on single
    spaces, count per word; in streaming each micro-batch emits updated
    (word, n) rows — kasper emitted one message per input record
    (/root/reference/examples/word_count_example.go:36-43), which is the
    same information at a coarser (idempotent-sink-safe) granularity.
    """
    return (
        lines.select(F.explode(F.split(F.col(value_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def assemble_documents(messages: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """Materialized stream-stream document join (B5), keyed by partition.

    ``messages``: envelope rows with at least (topic, partition, offset,
    value:string) where value is the JSON payload; topic discriminates
    'characters' vs 'fictions' rows (B6 routing —
    /root/reference/topic_processor_test.go:83-92).

    Emits (partition, fiction_id, doc_json) every time a fiction document
    becomes complete or an already-complete document is updated by a
    character re-arrival — byte-level semantics of createOutgoingMessage
    (characters array follows the fiction's characterIds order,
    /root/reference/topic_processor_test.go:135-155).

    ``ttl_ms`` (opt-in; default None = reference parity, state never
    evicts): inactivity TTL on the join state via the group-state
    processing-time timeout — a key idle for ttl_ms has its three state
    blobs dropped, bounding state growth the reference never bounded. The
    timeout is re-armed on every batch that touches the key. See
    assemble_documents_tws for the state-v2 (timer-based) form.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def process(key, pdfs, state):
        import json

        import pandas as pd

        if ttl_ms is not None and state.hasTimedOut:
            # idle past the TTL window: evict everything for this key
            state.remove()
            yield pd.DataFrame([], columns=["partition", "fiction_id", "doc_json"])
            return

        if state.exists:
            chars_js, fics_js, idx_js = state.get
            characters = json.loads(chars_js)
            fictions = json.loads(fics_js)
            char_to_fics = json.loads(idx_js)
        else:
            characters, fictions, char_to_fics = {}, {}, {}

        out = []

        def emit_if_complete(fic_id):
            fic = fictions[fic_id]
            if all(cid in characters for cid in fic["characterIds"]):
                doc = {
                    "id": fic["id"],
                    "fictionType": fic["fictionType"],
                    "title": fic["title"],
                    "characters": [characters[cid] for cid in fic["characterIds"]],
                }
                out.append((int(key[0]), fic_id, json.dumps(doc, sort_keys=True)))

        for pdf in pdfs:
            # consumption order within the batch: per-topic offset order
            pdf = pdf.sort_values(["topic", "offset"], kind="mergesort")
            for _, row in pdf.iterrows():
                payload = json.loads(row["value"])
                if row["topic"].endswith("characters"):
                    cid = payload["id"]
                    characters[cid] = payload
                    # late/updated character: re-emit every fiction that
                    # references it (the inverted-index re-emission,
                    # topic_processor_test.go:94-113)
                    for fic_id in char_to_fics.get(cid, []):
                        emit_if_complete(fic_id)
                else:
                    fic_id = payload["id"]
                    fictions[fic_id] = payload
                    for cid in payload["characterIds"]:
                        subs = char_to_fics.setdefault(cid, [])
                        if fic_id not in subs:
                            subs.append(fic_id)
                    emit_if_complete(fic_id)

        state.update(
            (json.dumps(characters), json.dumps(fictions), json.dumps(char_to_fics))
        )
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(out, columns=["partition", "fiction_id", "doc_json"])

    return messages.groupBy("partition").applyInPandasWithState(
        process,
        outputStructType=DOCUMENT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if ttl_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


def assemble_documents_event_ttl(
    messages: DataFrame,
    ttl_ms: int,
    event_time_col: str = "event_ts",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """B5 document join with EVENT-TIME TTL eviction — the production form
    of the TTL knob.

    Same emission semantics as :func:`assemble_documents`, but idle state is
    evicted when the WATERMARK passes ``last activity + ttl_ms`` (one-shot
    event-time timeout, re-armed on every batch that touches the key).
    Event time fixes both problems wall-clock TTL has at scale:

    - **bounded drains terminate**: the watermark is data-driven, so after
      an availableNow run consumes the last file/offset there is no clock
      left to chase — unlike ProcessingTimeTimeout, where Spark schedules
      empty micro-batches forever to advance the wall clock for armed
      timers (round-3 postmortem; ``Pipeline.start`` refuses that
      combination). This variant is safe under ``run_available_now``.
    - **replays are deterministic**: reprocessing a month of history evicts
      keys at the same *stream positions* as the live run did, not
      whenever the reprocessing job's wall clock happens to tick past the
      TTL — so a backfill produces byte-identical output.

    ``messages`` must carry an ``event_time_col`` timestamp column (the
    Kafka source's ``timestamp`` column, or a parsed payload time);
    ``watermark_delay`` is the usual lateness allowance and is orthogonal
    to the TTL. Keys whose timeout lies beyond the final watermark simply
    remain in state when the query stops — eviction is a state-size bound,
    not an output contract.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def process(key, pdfs, state):
        import json

        import pandas as pd

        if state.hasTimedOut:
            # watermark passed last activity + ttl: evict the three blobs
            state.remove()
            yield pd.DataFrame([], columns=["partition", "fiction_id", "doc_json"])
            return

        if state.exists:
            chars_js, fics_js, idx_js = state.get
            characters = json.loads(chars_js)
            fictions = json.loads(fics_js)
            char_to_fics = json.loads(idx_js)
        else:
            characters, fictions, char_to_fics = {}, {}, {}

        out = []

        def emit_if_complete(fic_id):
            fic = fictions[fic_id]
            if all(cid in characters for cid in fic["characterIds"]):
                doc = {
                    "id": fic["id"],
                    "fictionType": fic["fictionType"],
                    "title": fic["title"],
                    "characters": [characters[cid] for cid in fic["characterIds"]],
                }
                out.append((int(key[0]), fic_id, json.dumps(doc, sort_keys=True)))

        last_seen_ms = 0
        for pdf in pdfs:
            ts_max = pdf[event_time_col].max()
            if pd.notna(ts_max):
                last_seen_ms = max(last_seen_ms, int(ts_max.value // 1_000_000))
            pdf = pdf.sort_values(["topic", "offset"], kind="mergesort")
            for _, row in pdf.iterrows():
                payload = json.loads(row["value"])
                if row["topic"].endswith("characters"):
                    cid = payload["id"]
                    characters[cid] = payload
                    for fic_id in char_to_fics.get(cid, []):
                        emit_if_complete(fic_id)
                else:
                    fic_id = payload["id"]
                    fictions[fic_id] = payload
                    for cid in payload["characterIds"]:
                        subs = char_to_fics.setdefault(cid, [])
                        if fic_id not in subs:
                            subs.append(fic_id)
                    emit_if_complete(fic_id)

        state.update(
            (json.dumps(characters), json.dumps(fictions), json.dumps(char_to_fics))
        )
        # one-shot event-time timer: must be strictly beyond the current
        # watermark or Spark rejects it (a key whose activity is already
        # older than watermark-ttl gets the earliest legal slot instead)
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(last_seen_ms + ttl_ms, wm + 1))
        yield pd.DataFrame(out, columns=["partition", "fiction_id", "doc_json"])

    return (
        messages.withWatermark(event_time_col, watermark_delay)
        .groupBy("partition")
        .applyInPandasWithState(
            process,
            outputStructType=DOCUMENT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def assemble_documents_scalable(
    spark,
    messages_path: str,
    workdir: str,
    envelope_schema: str = "topic string, partition int, offset long, value string",
):
    """Two-stage, per-key-parallel form of assemble_documents — the 100 TB
    path. Removes kasper's topic co-partitioning requirement
    (/root/reference/README.md:36-39): state shards by character_id then by
    fiction_id, so parallelism scales with KEY cardinality, not partition
    count, and no single task holds a partition's whole store.

    Stage 1 (keyed by character_id): state = latest character + the set of
    fiction refs subscribed to it (the distributed form of kasper's
    char->fictions inverted index). Emits one (fiction, pos, character) row
    whenever a subscription can be satisfied or a character updates.

    Stage 2 (keyed by fiction_id): state = resolved characters by position.
    Emits the complete document when all positions are filled; re-emits on
    updates (downstream last-write-wins, as in the reference).

    The stages chain through an intermediate JSON directory — the
    re-produce-to-topic fan-out pattern the reference documents as its own
    repartitioning escape hatch (A9, /root/reference/README.md:37-39); in
    production the intermediate is a Kafka topic. Both stages run
    availableNow here; returns the stage-2 emissions DataFrame (bounded).
    """
    import os
    import uuid as _uuid

    from pyspark.sql.streaming.state import GroupStateTimeout

    qname = f"stage2_docs_{_uuid.uuid4().hex[:8]}"
    stage1_out = os.path.join(workdir, "stage1")
    ck1 = os.path.join(workdir, "ck1")
    ck2 = os.path.join(workdir, "ck2")

    # ---- stage 1: key by character_id -----------------------------------
    msgs = (
        spark.readStream.schema(envelope_schema)
        .option("maxFilesPerTrigger", "1")
        .json(messages_path)
    )
    routed = msgs.select(
        "topic",
        "offset",
        "value",
        F.when(
            F.col("topic").endswith("characters"),
            F.get_json_object("value", "$.id"),
        ).alias("char_key"),
    )
    # fiction rows explode into one row per referenced character
    fic = (
        routed.filter(F.col("char_key").isNull())
        .select(
            "offset",
            "value",
            F.posexplode(
                F.from_json(
                    F.get_json_object("value", "$.characterIds"), "array<string>"
                )
            ).alias("pos", "cid"),
        )
        .select(
            F.col("cid").alias("character_id"),
            F.lit("ref").alias("kind"),
            "offset",
            F.to_json(
                F.struct(
                    F.get_json_object("value", "$.id").alias("fiction_id"),
                    F.get_json_object("value", "$.fictionType").alias("fictionType"),
                    F.get_json_object("value", "$.title").alias("title"),
                    F.col("pos"),
                    F.size(
                        F.from_json(
                            F.get_json_object("value", "$.characterIds"),
                            "array<string>",
                        )
                    ).alias("n_needed"),
                    # fiction VERSION = the fiction message's offset: stage 2
                    # resets its slots when a newer version arrives and
                    # ignores refs from older ones, so a fiction update that
                    # shrinks/reorders characterIds can never mix slots from
                    # two versions (stale stage-1 subscriptions re-emit old
                    # refs forever — the version gate makes them inert)
                    F.col("offset").alias("v"),
                )
            ).alias("payload"),
        )
    )
    chars = routed.filter(F.col("char_key").isNotNull()).select(
        F.col("char_key").alias("character_id"),
        F.lit("char").alias("kind"),
        "offset",
        F.col("value").alias("payload"),
    )
    stage1_in = chars.unionByName(fic)

    S1_OUT = StructType(
        [
            StructField("fiction_id", StringType()),
            StructField("ref_json", StringType()),
            StructField("char_json", StringType()),
        ]
    )
    S1_STATE = StructType(
        [
            StructField("char_json", StringType()),
            StructField("refs_json", StringType()),
        ]
    )

    def stage1(key, pdfs, state):
        import json

        import pandas as pd

        char_json, refs = (None, {})
        if state.exists:
            cj, rj = state.get
            char_json = cj if cj else None
            refs = json.loads(rj)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["kind", "offset"], kind="mergesort")
            for _, row in pdf.iterrows():
                if row["kind"] == "char":
                    char_json = row["payload"]
                    for ref in refs.values():  # char update -> re-emit all refs
                        out.append((json.loads(ref)["fiction_id"], ref, char_json))
                else:
                    ref = row["payload"]
                    fid = json.loads(ref)["fiction_id"]
                    pos = json.loads(ref)["pos"]
                    refs[f"{fid}#{pos}"] = ref
                    if char_json is not None:
                        out.append((fid, ref, char_json))
        state.update((char_json if char_json else "", json.dumps(refs)))
        yield pd.DataFrame(out, columns=["fiction_id", "ref_json", "char_json"])

    q1 = (
        stage1_in.groupBy("character_id")
        .applyInPandasWithState(
            stage1, S1_OUT, S1_STATE, "append", GroupStateTimeout.NoTimeout
        )
        # emissions form an event log (each row a new resolution event), so
        # append mode is semantically right — and file sinks require it
        .writeStream.outputMode("append")
        .format("json")
        .option("path", stage1_out)
        .option("checkpointLocation", ck1)
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination()

    # ---- stage 2: key by fiction_id -------------------------------------
    resolved = (
        spark.readStream.schema("fiction_id string, ref_json string, char_json string")
        .option("maxFilesPerTrigger", "1")
        .json(stage1_out)
    )

    S2_OUT = StructType(
        [
            StructField("fiction_id", StringType()),
            StructField("doc_json", StringType()),
        ]
    )
    S2_STATE = StructType([StructField("slots_json", StringType())])

    def stage2(key, pdfs, state):
        import json

        import pandas as pd

        st = json.loads(state.get[0]) if state.exists else {"v": -1, "slots": {}}
        version, slots = st["v"], st["slots"]
        out = []
        for pdf in pdfs:
            for _, row in pdf.iterrows():
                ref = json.loads(row["ref_json"])
                if ref["v"] < version:
                    continue  # stale fiction version — inert
                if ref["v"] > version:
                    version, slots = ref["v"], {}  # fiction updated: reset
                slots[str(ref["pos"])] = {
                    "char": json.loads(row["char_json"]),
                    "meta": ref,
                }
                n_needed = ref["n_needed"]
                if len(slots) == n_needed:
                    meta = ref
                    doc = {
                        "id": meta["fiction_id"],
                        "fictionType": meta["fictionType"],
                        "title": meta["title"],
                        "characters": [
                            slots[str(p)]["char"] for p in range(n_needed)
                        ],
                    }
                    out.append((key[0], json.dumps(doc, sort_keys=True)))
        state.update((json.dumps({"v": version, "slots": slots}),))
        yield pd.DataFrame(out, columns=["fiction_id", "doc_json"])

    q2 = (
        resolved.groupBy("fiction_id")
        .applyInPandasWithState(
            stage2, S2_OUT, S2_STATE, "append", GroupStateTimeout.NoTimeout
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", ck2)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    return spark.table(qname)


def assemble_documents_batch(characters: DataFrame, fictions: DataFrame) -> DataFrame:
    """Bounded twin of assemble_documents for oracle-style verification:
    explode fiction characterIds, join characters, reassemble in
    characterIds order, keep only complete documents. Same output as the
    streaming op's last-write-wins final state.

    Spark-first shape: explode -> broadcast-or-shuffle hash join ->
    groupBy(fiction) with collect_list, ordered by the original array index
    (posexplode) — no Python.
    """
    exploded = fictions.select(
        F.col("id").alias("fiction_id"),
        "fictionType",
        "title",
        F.size("characterIds").alias("n_needed"),
        F.posexplode("characterIds").alias("pos", "cid"),
    )
    joined = exploded.join(characters, exploded.cid == characters.id, "inner")
    return (
        joined.groupBy("fiction_id", "fictionType", "title", "n_needed")
        .agg(
            F.count(F.lit(1)).alias("n_found"),
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("pos"),
                        F.struct(
                            F.col("id"), F.col("name"), F.col("wikipediaUrl")
                        ).alias("c"),
                    )
                )
            ).alias("ordered"),
        )
        .filter(F.col("n_found") == F.col("n_needed"))
        .select(
            "fiction_id",
            "fictionType",
            "title",
            F.transform(F.col("ordered"), lambda s: s["c"]).alias("characters"),
        )
    )


def running_word_count_tws(
    lines: DataFrame, value_col: str = "value", ttl_ms: int | None = None
):
    """Running per-word count on transformWithStateInPandas (the Spark-4
    "state v2" API) — same semantics as running_word_count, plus the knob
    the reference never had: opt-in per-state TTL (ttl_ms), so production
    deployments can bound state growth where kasper's stores grew forever
    (/root/reference/topic_processor_test.go:94-133). ttl_ms=None preserves
    reference parity (no eviction).

    Scale shape: state is one 8-byte counter per word in the RocksDB state
    store, sharded by the groupBy key across executors; TTL cleanup happens
    inside the store (no scan-and-delete job).

    Runtime dependency: pyspark's state-v2 protocol needs google.protobuf
    on driver and workers (absent in some minimal images — the matching
    test importorskips it; this function stays import-clean regardless)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    # nested class: cloudpickle serializes it by value so workers launched
    # from a foreign cwd need no importable kasper_spark (same reasoning as
    # operators/multimodal.py)
    class WordCount(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState("n", "n bigint", ttlDurationMs=ttl_ms)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            total = sum(len(pdf) for pdf in rows)
            prev = self._n.get()[0] if self._n.exists() else 0
            n = prev + total
            self._n.update((n,))
            yield pd.DataFrame({"word": [key[0]], "n": [n]})

        def close(self) -> None:
            pass

    words = (
        lines.select(F.explode(F.split(F.col(value_col), " ")).alias("word"))
        .filter(F.col("word") != "")
    )
    return words.groupBy("word").transformWithStateInPandas(
        WordCount(),
        outputStructType="word string, n bigint",
        outputMode="Update",
        timeMode="None" if ttl_ms is None else "ProcessingTime",
    )


def _make_assemble_docs_processor(ttl_ms: int | None):
    """Factory for the AssembleDocs StatefulProcessor (state v2).

    Split out of assemble_documents_tws so the TTL/eviction logic is
    unit-testable without the state-v2 runtime: executing
    transformWithStateInPandas needs google.protobuf on the workers (absent
    in minimal images), but the processor itself only needs a handle/state
    duck-type — tests drive init/handleInputRows/handleExpiredTimer with
    fakes (tests/test_streaming.py::test_tws_assemble_docs_processor_unit).
    The class stays nested so cloudpickle serializes it by value (workers
    launched from a foreign cwd need no importable kasper_spark)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class AssembleDocs(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._h = handle
            self._chars = handle.getValueState("characters", "j string")
            self._fics = handle.getValueState("fictions", "j string")
            self._idx = handle.getValueState("char_to_fictions", "j string")

        def _load(self, vs):
            import json

            return json.loads(vs.get()[0]) if vs.exists() else {}

        def handleInputRows(self, key, rows, timerValues):
            import json

            import pandas as pd

            characters = self._load(self._chars)
            fictions = self._load(self._fics)
            char_to_fics = self._load(self._idx)
            out = []

            def emit_if_complete(fic_id):
                fic = fictions[fic_id]
                if all(cid in characters for cid in fic["characterIds"]):
                    doc = {
                        "id": fic["id"],
                        "fictionType": fic["fictionType"],
                        "title": fic["title"],
                        "characters": [
                            characters[cid] for cid in fic["characterIds"]
                        ],
                    }
                    out.append(
                        (int(key[0]), fic_id, json.dumps(doc, sort_keys=True))
                    )

            for pdf in rows:
                pdf = pdf.sort_values(["topic", "offset"], kind="mergesort")
                for _, row in pdf.iterrows():
                    payload = json.loads(row["value"])
                    if row["topic"].endswith("characters"):
                        cid = payload["id"]
                        characters[cid] = payload
                        for fic_id in char_to_fics.get(cid, []):
                            emit_if_complete(fic_id)
                    else:
                        fic_id = payload["id"]
                        fictions[fic_id] = payload
                        for cid in payload["characterIds"]:
                            subs = char_to_fics.setdefault(cid, [])
                            if fic_id not in subs:
                                subs.append(fic_id)
                        emit_if_complete(fic_id)

            self._chars.update((json.dumps(characters),))
            self._fics.update((json.dumps(fictions),))
            self._idx.update((json.dumps(char_to_fics),))
            if ttl_ms is not None:
                # sliding inactivity window: one timer per key, re-armed on
                # every batch that touches the key
                for t in self._h.listTimers():
                    self._h.deleteTimer(t)
                self._h.registerTimer(
                    timerValues.getCurrentProcessingTimeInMs() + ttl_ms
                )
            yield pd.DataFrame(
                out, columns=["partition", "fiction_id", "doc_json"]
            )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            import pandas as pd

            self._chars.clear()
            self._fics.clear()
            self._idx.clear()
            self._h.deleteTimer(expiredTimerInfo.getExpiryTimeInMs())
            yield pd.DataFrame(
                [], columns=["partition", "fiction_id", "doc_json"]
            )

        def close(self) -> None:
            pass

    return AssembleDocs()


def assemble_documents_tws(
    messages: DataFrame, ttl_ms: int | None = None
) -> DataFrame:
    """B5 document join on transformWithStateInPandas (state v2), with the
    knob the reference never had: opt-in state TTL via processing-time
    TIMERS. The reference's stores grow forever
    (/root/reference/topic_processor_test.go:94-133); at 100 TB a
    never-evicting join state is a slow leak, so production deployments set
    ttl_ms and idle keys are wiped by the state store's timer sweep — no
    scan-and-delete job, no driver involvement.

    Semantics are identical to assemble_documents while state is live
    (same emission rules, same byte-stable doc_json). TTL is an
    INACTIVITY window: each batch that touches a key re-arms one timer at
    now+ttl_ms; if the key stays idle past that, handleExpiredTimer clears
    all three state blobs (characters, fictions, inverted index), so a
    later completing character finds no fiction to complete — exactly the
    trade a bounded-state deployment opts into. ttl_ms=None preserves
    reference parity (no timers, no eviction).

    Runtime dependency: pyspark's state-v2 protocol needs google.protobuf
    on driver and workers (the matching test importorskips it; the TTL
    logic itself is additionally unit-tested protobuf-free via
    _make_assemble_docs_processor)."""
    return messages.groupBy("partition").transformWithStateInPandas(
        _make_assemble_docs_processor(ttl_ms),
        outputStructType=DOCUMENT_SCHEMA,
        outputMode="Update",
        timeMode="None" if ttl_ms is None else "ProcessingTime",
    )


def ewma_anomalies_tws(events: DataFrame, k: int, den: int) -> DataFrame:
    """Per-user trailing-EWMA anomaly detection on transformWithStateInPandas
    (state v2) — the modern-runtime twin of the applyInPandasWithState form
    in operators/streaming_twins.py. State is one ValueState holding the
    user's last ``k`` integer cents as JSON (~60 bytes); each batch's rows
    are re-ordered by (ts, event_id) before the scan, so given a feed that
    delivers batches in event-time order the emitted anomalies equal the
    batch operator's bit-for-bit (same BIGINT numerator + exact-int float
    divisions; Python ints are arbitrary-precision, floats IEEE doubles).

    ``events`` must carry (user_id long, event_id long, ts timestamp,
    cents bigint). Output mode Append: an anomaly is emitted exactly once,
    when its event is judged."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    # nested class: cloudpickle serializes by value (foreign-cwd workers)
    class EwmaDetect(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._hist = handle.getValueState("hist", "j string")

        def handleInputRows(self, key, rows, timerValues):
            import json

            import pandas as pd

            hist = json.loads(self._hist.get()[0]) if self._hist.exists() else []
            pdf = pd.concat(list(rows)).sort_values(["ts", "event_id"])
            out = []
            for r in pdf.itertuples():
                cents = int(r.cents)
                if len(hist) >= k:
                    num = sum(hist[-j] * (1 << (k - j)) for j in range(1, k + 1))
                    if abs(cents * den - num) > 2 * num:
                        # num == 0 (all-zero trailing history): batch
                        # emits NULL (Spark double div-by-zero), so mirror
                        # that rather than ZeroDivisionError (ADVICE r10)
                        out.append(
                            (
                                int(r.user_id),
                                int(r.event_id),
                                r.ts,
                                cents,
                                num / float(den),
                                (cents * den) / float(num) if num else None,
                            )
                        )
                hist.append(cents)
                if len(hist) > k:
                    hist = hist[-k:]
            self._hist.update((json.dumps(hist),))
            yield pd.DataFrame(
                out,
                columns=["user_id", "event_id", "ts", "cents", "ewma", "ratio"],
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        EwmaDetect(),
        outputStructType=(
            "user_id long, event_id long, ts timestamp, "
            "cents long, ewma double, ratio double"
        ),
        outputMode="Append",
        timeMode="None",
    )


def cusum_alarms_tws(
    events: DataFrame, target: int, slack: int, thresh: int
) -> DataFrame:
    """Fixed-target CUSUM alarms on transformWithStateInPandas (state v2) —
    the modern-runtime twin of cusum_alarm_stream in
    operators/streaming_twins.py. State is one typed ValueState of TWO
    BIGINTs (deviation prefix, running min) — the complete sufficient
    statistic of the closed form S = prefix - min(0, min prefix); pure
    integer arithmetic, so emitted rows equal the batch window plan's
    bit-for-bit given an event-time-ordered feed.

    ``events`` must carry (user_id long, event_id long, ts timestamp,
    cents bigint). Output mode Append: an alarm row is emitted exactly
    once, when its event crosses the threshold."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    # nested class: cloudpickle serializes by value (foreign-cwd workers)
    class CusumScan(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._acc = handle.getValueState("acc", "prefix long, minpre long")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            prefix, minpre = self._acc.get() if self._acc.exists() else (0, 0)
            pdf = pd.concat(list(rows)).sort_values(["ts", "event_id"])
            out = []
            for r in pdf.itertuples():
                cents = int(r.cents)
                prefix += cents - target - slack
                minpre = min(minpre, prefix)
                excess = prefix - min(0, minpre)
                if excess > thresh:
                    out.append(
                        (int(r.user_id), int(r.event_id), r.ts, cents, excess)
                    )
            self._acc.update((prefix, minpre))
            yield pd.DataFrame(
                out, columns=["user_id", "event_id", "ts", "cents", "excess"]
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        CusumScan(),
        outputStructType=(
            "user_id long, event_id long, ts timestamp, cents long, excess long"
        ),
        outputMode="Append",
        timeMode="None",
    )


def funnel_attribution_tws(events: DataFrame) -> DataFrame:
    """Last-touch funnel attribution on transformWithStateInPandas (state
    v2) — the modern-runtime twin of funnel_attribution_stream in
    operators/streaming_twins.py. State is one typed ValueState of FOUR
    BIGINTs (latest view epoch, latest qualifying click epoch, running
    purchase/attributed counts) — the complete sufficient statistic of
    the backward-looking attribution rule; pure integer microsecond
    arithmetic, so revision rows equal the batch window plan's given an
    event-time-ordered feed.

    ``events`` must carry (user_id long, event_id long, ts timestamp,
    event_type string). Output mode Update: each batch emits the touched
    user's CURRENT (n_purchases, n_attributed) revision; counts are
    non-decreasing, so a read-side max-struct reduce keeps the final
    revision."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    _HOUR_US = 3_600 * 1_000_000

    # nested class: cloudpickle serializes by value (foreign-cwd workers)
    class FunnelScan(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._acc = handle.getValueState(
                "acc", "last_view long, last_qclick long, n_purch long, n_attr long"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            last_view, last_qclick, n_purch, n_attr = (
                self._acc.get() if self._acc.exists() else (-1, -1, 0, 0)
            )
            pdf = pd.concat(list(rows)).sort_values(["ts", "event_id"])
            for r in pdf.itertuples():
                ts_us = int(r.ts.value // 1000)
                et = r.event_type
                if et == "view":
                    last_view = ts_us
                elif et == "click":
                    if last_view >= 0 and ts_us <= last_view + _HOUR_US:
                        last_qclick = ts_us
                elif et == "purchase":
                    n_purch += 1
                    if last_qclick >= 0 and ts_us <= last_qclick + _HOUR_US:
                        n_attr += 1
            self._acc.update((last_view, last_qclick, n_purch, n_attr))
            out = [(int(key[0]), n_purch, n_attr)] if n_purch > 0 else []
            yield pd.DataFrame(
                out, columns=["user_id", "n_purchases", "n_attributed"]
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        FunnelScan(),
        outputStructType="user_id long, n_purchases long, n_attributed long",
        outputMode="Update",
        timeMode="None",
    )


def sessionize_apws(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Dynamic-gap sessionization on applyInPandasWithState (state v1) —
    sessionize_tws's SAME-BOUNDARY comparator (r12 verdict ticket #7):
    identical algorithm, identical per-user (start_ns, last_ns, n) open-
    session state, identical sentinel-flush contract, differing ONLY in
    the state protocol (v1 tuple GroupState vs the v2 protobuf
    StatefulProcessor). Running both over the same staged feed isolates
    the v2 protocol's cost from the Arrow boundary and the state shape —
    the round-10 keyed-count ladder's discipline, now on the session
    workload. Same time-ordered-feed contract and max() straggler guard
    as sessionize_tws."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_ns = gap_minutes * 60 * 1_000_000_000

    # nested fn: cloudpickle serializes by value (foreign-cwd workers)
    def sessionize(key, pdfs, state):
        import pandas as pd

        cur = list(state.get) if state.exists else None
        pdf = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        out = []
        for r in pdf.itertuples():
            t = int(pd.Timestamp(r.ts).value)
            sentinel = int(r.event_id) < 0
            if cur is not None and (sentinel or t - cur[1] >= gap_ns):
                out.append((int(key[0]), pd.Timestamp(cur[0]), int(cur[2])))
                cur = None
            if not sentinel:
                if cur is None:
                    cur = [t, t, 1]  # (start_ns, last_ns, n)
                else:
                    cur[1] = max(cur[1], t)
                    cur[2] += 1
        if cur is None:
            state.remove()
        else:
            state.update(tuple(cur))
        yield pd.DataFrame(
            out, columns=["user_id", "session_start", "n_events"]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        sessionize,
        outputStructType="user_id long, session_start timestamp, n_events long",
        stateStructType="start_ns long, last_ns long, n long",
        outputMode="Append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_tws(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Dynamic-gap sessionization on transformWithStateInPandas (state v2)
    — the fourth certified TWS operator and the state-v2 port of the
    session-window family (r11 verdict ticket #7; the native
    session_window twin certifies the built-in operator, this one
    certifies the same semantics through the StatefulProcessor protocol).

    Per-user state is the OPEN session only: (start_ns, last_ns, n) as a
    JSON ValueState (~40 bytes/user, evictable). Each batch's rows are
    re-sorted by (ts, event_id); a row whose gap from the open session's
    last event is >= gap_minutes CLOSES that session (emitted once,
    Append mode — the session_window merge convention: exact-gap starts a
    new session) and opens a new one. A SENTINEL row (event_id = -1) only
    flushes: it closes whatever is open and never opens a session —
    bounded feeds append one sentinel per user after the real data so the
    final open sessions drain deterministically (the availableNow analog
    of the watermark advancing past the last gap).

    Timestamps round-trip as integer NANOSECONDS through the state and
    the emitted frame (pd.Timestamp.value both ways), so session_start is
    bit-exact against the batch gaps-and-islands oracle.

    ``events`` must carry (user_id long, event_id long, ts timestamp).
    CONTRACT: batch-oracle equivalence requires the feed to be globally
    time-ordered ACROSS micro-batches per user (rows are re-sorted only
    within a batch). A cross-batch straggler older than the open
    session's last event is counted into that session without moving the
    gap anchor backward (last_ns advances by max(), never regresses) —
    a deliberate, bounded divergence from the batch gaps-and-islands
    oracle rather than silent state corruption."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_ns = gap_minutes * 60 * 1_000_000_000

    # nested class: cloudpickle serializes by value (foreign-cwd workers)
    class Sessionize(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._open = handle.getValueState("open", "j string")

        def handleInputRows(self, key, rows, timerValues):
            import json

            import pandas as pd

            cur = json.loads(self._open.get()[0]) if self._open.exists() else None
            pdf = pd.concat(list(rows)).sort_values(["ts", "event_id"])
            out = []
            for r in pdf.itertuples():
                t = int(pd.Timestamp(r.ts).value)
                sentinel = int(r.event_id) < 0
                if cur is not None and (sentinel or t - cur[1] >= gap_ns):
                    out.append(
                        (int(key[0]), pd.Timestamp(cur[0]), int(cur[2]))
                    )
                    cur = None
                if not sentinel:
                    if cur is None:
                        cur = [t, t, 1]  # (start_ns, last_ns, n)
                    else:
                        # max(): a cross-batch straggler with t < last_ns
                        # (rows are sorted only WITHIN a batch) counts
                        # toward the open session but must never move the
                        # gap anchor backward — otherwise one late event
                        # silently extends the session past its true gap.
                        cur[1] = max(cur[1], t)
                        cur[2] += 1
            if cur is None:
                self._open.clear()
            else:
                self._open.update((json.dumps(cur),))
            yield pd.DataFrame(
                out, columns=["user_id", "session_start", "n_events"]
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        Sessionize(),
        outputStructType="user_id long, session_start timestamp, n_events long",
        outputMode="Append",
        timeMode="None",
    )
