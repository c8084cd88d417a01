"""Round-15 property gates: the self-healing log-gated group fold (r14
verdict ticket #5 / ADVICE r14's double-adopt window), the
nprobe-from-marker-k serving invariant (ADVICE r14 medium), the
final-epoch marker reconcile (ADVICE r14), and the dirty-leaf partial
reclaim (ticket #6). The oracle sweep certifies value equality; these
pin the crash/replay and files-untouched invariants the sweep cannot
reach."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kasper_spark import index_catalog as cat
from kasper_spark.registry import QUERIES, load_all_operators
from tests.conftest import SF_ORACLE, SF_SMOKE  # noqa: F401

load_all_operators()


def test_ivf_nprobe_from_marker_k_not_mutated_n():
    """ADVICE r14 (medium): after a delete/reclaim shrinks the marker's
    n across an isqrt step, re-deriving nprobe from n would change the
    probe budget mid-lifecycle — serving must key nprobe off the stored
    k instead. The chosen sizes make the old derivation provably
    diverge, so this test bites."""
    from kasper_spark.operators.similarity import _ivf_nprobe, _scaledk_params

    k_built, _, nprobe_built = _scaledk_params(10_000)  # k=100, nprobe=10
    # a reclaim rewrote the marker with the shrunken n; k is untouched
    meta_after_delete = {"n": 8_000, "k": k_built, "train_n": 3_200}
    assert _ivf_nprobe(meta_after_delete) == nprobe_built == 10
    # the pre-fix derivation crosses the isqrt boundary — the divergence
    # the fix exists to prevent
    assert _scaledk_params(8_000)[2] == 9


def test_fold_group_determinism_no_double_adopt(spark, tmp_path):
    """The ADVICE r14 double-adopt scenario, replayed against the shared
    fold: crash AFTER adoption but BEFORE the fold record, then land
    MORE epochs, then fold again. The group key is a pure function of
    the epoch id, so the retry re-adopts over its own deterministic
    targets and the later epochs fold as a different group — total rows
    come out exactly once."""
    idx = str(tmp_path)
    pending = os.path.join(idx, "pending")
    table = os.path.join(idx, "bands")
    os.makedirs(pending)
    os.makedirs(table)
    log = cat.EpochLog(idx)

    def land(eid: int) -> None:
        stage = os.path.join(idx, f"stage-{eid}")
        (
            spark.range(eid * 10, eid * 10 + 10)
            .select(
                F.col("id").alias("doc_id"),
                (F.col("id") % 4).cast("long").alias("band"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(stage)
        )
        cat.adopt_staged(stage, pending, eid)

    land(0)
    land(1)

    boom = {"staged": False, "adopted": True, "recorded": False}

    def fault_after_adopt(point: str, gid: int) -> None:
        if boom.get(point):
            boom[point] = False
            raise RuntimeError(f"injected crash at {point} g{gid}")

    with pytest.raises(RuntimeError):
        cat.fold_pending_epochs(
            spark, pending, table, ["band"], log,
            group_size=2, fault=fault_after_adopt,
        )
    # the crash window: rows adopted into the table AND still pending
    assert cat.EpochLog(idx).is_committed("fold-bands-g0") is False
    land(2)
    land(3)
    cat.fold_pending_epochs(
        spark, pending, table, ["band"], log, group_size=2, final=True
    )
    ids = [r["doc_id"] for r in spark.read.parquet(table).collect()]
    assert sorted(ids) == list(range(40)), "fold duplicated or lost rows"
    assert not os.listdir(pending) or all(
        not f.endswith(".parquet") for f in os.listdir(pending)
    )


def test_lsh_fold_crash_recovers_without_rebuild(spark):
    """Crash-injection at every fold commit point of the LSH append
    twin: the run must recover by RE-RUNNING the fold (fold_retries) —
    no rebuild — and converge to the clean run's profile with zero
    duplicated band rows (r14 verdict ticket #5's done-bar)."""
    from kasper_spark.operators import dedup as D
    from kasper_spark.operators.streaming_twins import _lsh_append_run

    fired: set = set()

    def fold_fault(point: str, gid: int) -> None:
        if point not in fired:
            fired.add(point)
            raise RuntimeError(f"injected fold crash at {point} (g{gid})")

    idx, prof = _lsh_append_run(
        spark, SF_SMOKE, 3, fold_every=2, fold_fault=fold_fault,
        fold_retries=4,
    )
    assert fired == {"staged", "adopted", "recorded"}, fired
    crashed = sorted(map(tuple, prof.collect()))
    clean = sorted(
        map(tuple, QUERIES["lsh_index_build"](spark, SF_SMOKE).collect())
    )
    assert crashed == clean, "fold crash-recovery diverged from clean build"
    bands = spark.read.parquet(os.path.join(idx, "bands"))
    dup = (
        bands.groupBy("doc_id", "band")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .count()
    )
    assert dup == 0, "fold recovery duplicated band rows"
    served = sorted(map(tuple, D._search_lsh_index(spark, idx).collect()))
    want = sorted(
        map(tuple, QUERIES["lsh_neardup_search_only"](spark, SF_SMOKE).collect())
    )
    assert served == want


def test_final_epoch_marker_reconcile_after_crash(spark):
    """ADVICE r14: a crash between log.record and the marker refresh on
    the FINAL epoch replays into the is_committed early-return — the
    drain-time reconcile must still bring the marker's n in step with
    the rows on disk."""
    from kasper_spark.operators import similarity as S
    from kasper_spark.operators.streaming_twins import _ivf_append_run

    n_files = 3
    fired: list = []

    def fault(epoch_id: int, point: str) -> None:
        if point == "recorded" and epoch_id == n_files - 1 and not fired:
            fired.append(epoch_id)
            raise RuntimeError("injected crash after FINAL epoch record")

    idx, _prof = _ivf_append_run(spark, SF_SMOKE, n_files, fault=fault, retries=2)
    assert fired, "fault never fired — the test lost its scenario"
    rows = (
        spark.read.parquet(os.path.join(idx, "assignments"))
        .select("vec_id")
        .collect()
    )
    ids = [r["vec_id"] for r in rows]
    assert len(ids) == len(set(ids)), "replay duplicated vectors"
    assert S._ivf_index_meta(idx)["n"] == len(ids), (
        "marker n permanently behind the rows on disk — the final-epoch "
        "reconcile did not run"
    )


def test_ivf_pending_tail_served_before_fold(spark):
    """Mid-maintenance freshness for the IVF LSM tail: rows still in
    assignments_pending (not yet folded) must be visible to
    _search_persisted_index via the memtable-over-SSTable union."""
    from kasper_spark.operators import similarity as S
    from kasper_spark.operators.streaming_twins import _ivf_append_run

    # fold_every > epoch count: the mid-stream folds never run; we
    # reconstruct the pre-drain state by moving the drain-folded rows
    # back into the tail (the round-14 LSH test's move, on IVF)
    import shutil
    import tempfile

    idx, _ = _ivf_append_run(spark, SF_SMOKE, 2, fold_every=1000)
    want = sorted(
        map(tuple, QUERIES["ann_ivf_search_only"](spark, SF_SMOKE).collect())
    )
    mid = tempfile.mkdtemp(prefix="kasper-ivftail-")
    try:
        shutil.copytree(idx, os.path.join(mid, "index"))
        midx = os.path.join(mid, "index")
        assignments = os.path.join(midx, "assignments")
        tail = os.path.join(midx, S._IVF_PENDING)
        moved = []
        for root, _dirs, files in os.walk(assignments):
            for f in files:
                if f.startswith("epoch-fold-"):
                    moved.append(os.path.join(root, f))
        assert moved, "expected drain-folded epoch files in the lists"
        rel = spark.read.option("basePath", assignments).parquet(*moved).select(
            "vec_id", F.col("cluster_id").cast("long").alias("cluster_id")
        )
        os.makedirs(tail, exist_ok=True)
        rel.coalesce(1).write.mode("overwrite").parquet(tail + "-stage")
        cat.adopt_staged(tail + "-stage", tail, "re")
        for f in moved:
            os.remove(f)
        served = sorted(
            map(tuple, S._search_persisted_index(spark, SF_SMOKE, midx).collect())
        )
        assert served == want, "pending tail rows invisible to IVF serving"
    finally:
        shutil.rmtree(mid, ignore_errors=True)


def _leaf_stats(table: str) -> dict:
    out = {}
    for root, _dirs, files in os.walk(table):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                st = os.stat(p)
                out[os.path.relpath(p, table)] = (st.st_size, st.st_mtime_ns)
    return out


def test_partial_reclaim_touches_only_dirty_leaves(spark):
    """Ticket #6's physical half: a threshold-gated reclaim must rewrite
    ONLY the leaves over threshold — every clean leaf's files stay
    byte-untouched (same name, size, mtime) — while the kept tombstones
    keep masking the clean leaves' dead rows for serving."""
    from kasper_spark.operators import similarity as S

    idx = S._copy_ivf_index(spark, SF_SMOKE, "kasper-partphys-")
    assignments = os.path.join(idx, "assignments")
    a = spark.read.parquet(assignments).select(
        "vec_id", F.col("cluster_id").cast("long").alias("cluster_id")
    )
    prof = sorted(
        (r["c"], r["cluster_id"])
        for r in a.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    dirty_list = prof[0][1]          # smallest list: tombstone ALL of it
    clean_list = prof[-1][1]         # largest list: tombstone ONE row
    assert prof[-1][0] >= 2, "need a list with >= 2 rows for the clean case"
    one = a.filter(F.col("cluster_id") == clean_list).agg(
        F.min("vec_id").alias("v")
    ).collect()[0]["v"]
    (
        a.filter(
            (F.col("cluster_id") == dirty_list) | (F.col("vec_id") == one)
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(idx, S._TOMBSTONES))
    )
    before = _leaf_stats(assignments)
    # 90% threshold: the fully-dead list rewrites, the 1-row cohort stays
    reclaimed, dirty = S._ivf_reclaim_partial(spark, idx, 900)
    assert dirty == [dirty_list]
    after = _leaf_stats(assignments)
    dirty_prefix = f"cluster_id={dirty_list}"
    for rel, st in before.items():
        if rel.startswith(dirty_prefix):
            assert rel not in after, "fully-dead leaf should be gone"
        else:
            assert after.get(rel) == st, f"clean leaf file touched: {rel}"
    # kept tombstones: exactly the clean list's one row
    tomb = spark.read.parquet(os.path.join(idx, S._TOMBSTONES)).collect()
    assert [(r["vec_id"], r["cluster_id"]) for r in tomb] == [(one, clean_list)]
    # logical serving equals original-minus-tombstoned
    members = spark.read.parquet(assignments)
    dead = cat.tombstones_side(spark, os.path.join(idx, S._TOMBSTONES), "vec_id")
    served = sorted(
        r["vec_id"]
        for r in members.join(dead, "vec_id", "left_anti")
        .select("vec_id")
        .collect()
    )
    want = sorted(
        r["vec_id"]
        for r in a.filter(
            (F.col("cluster_id") != dirty_list) & (F.col("vec_id") != one)
        )
        .select("vec_id")
        .collect()
    )
    assert served == want


def test_partial_reclaim_threshold_zero_equals_full(spark):
    """reclaim(threshold=0) must reproduce the full reclaim's surviving
    row set (the verdict's equivalence criterion)."""
    from kasper_spark.operators import similarity as S

    def survivors(partial: bool):
        idx = S._copy_ivf_index(spark, SF_SMOKE, "kasper-parteq-")
        assignments = os.path.join(idx, "assignments")
        (
            spark.read.parquet(assignments)
            .filter(F.col("vec_id") % S._DELETE_MOD == S._DELETE_REM)
            .select(
                "vec_id", F.col("cluster_id").cast("long").alias("cluster_id")
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(idx, S._TOMBSTONES))
        )
        if partial:
            S._ivf_reclaim_partial(spark, idx, 0)
        else:
            S._ivf_reclaim_tombstones(spark, idx)
        rows = sorted(
            (r["vec_id"], int(r["cluster_id"]))
            for r in spark.read.parquet(assignments)
            .select("vec_id", F.col("cluster_id").cast("long").alias("cluster_id"))
            .collect()
        )
        return rows, S._ivf_index_meta(idx)["n"]

    part_rows, part_n = survivors(True)
    full_rows, full_n = survivors(False)
    assert part_rows == full_rows
    assert part_n == full_n == len(part_rows)


def test_retrain_old_generation_serves_until_flip(spark):
    """Ticket #3's mid-retrain serving criterion: between the new
    generation's build and the marker flip, serving must still be the
    OLD (stale) index; after the one atomic marker replace it must be
    the re-trained one — equal to the fresh build's serving."""
    from kasper_spark.operators import similarity as S

    idx = S._build_stale_ivf_index(spark, SF_SMOKE)
    stale_served = sorted(
        map(tuple, S._search_persisted_index(spark, SF_SMOKE, idx).collect())
    )
    seen: dict = {}

    def before_flip(i: str) -> None:
        seen["mid"] = sorted(
            map(tuple, S._search_persisted_index(spark, SF_SMOKE, i).collect())
        )
        seen["meta"] = S._ivf_index_meta(i)

    S._ivf_retrain(spark, SF_SMOKE, idx, before_flip=before_flip)
    assert seen["mid"] == stale_served, "mid-retrain serving left the old gen"
    assert int(seen["meta"].get("gen", 0)) == 0, "flip happened early"
    meta = S._ivf_index_meta(idx)
    assert meta["gen"] == 1
    new_served = sorted(
        map(tuple, S._search_persisted_index(spark, SF_SMOKE, idx).collect())
    )
    want = sorted(
        map(tuple, QUERIES["ann_ivf_search_only"](spark, SF_SMOKE).collect())
    )
    assert new_served == want, "post-flip serving != fresh-build serving"


def test_retrain_consumes_tombstones(spark):
    """A retrain applies pending takedowns: tombstoned ids are never
    re-assigned, the new generation starts with no tombstones, and the
    flipped marker's n counts the live membership only."""
    import glob

    from kasper_spark.operators import similarity as S

    idx = S._build_stale_ivf_index(spark, SF_SMOKE)
    a = spark.read.parquet(os.path.join(idx, "assignments"))
    (
        a.filter(F.col("vec_id") % S._DELETE_MOD == S._DELETE_REM)
        .select("vec_id")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(idx, S._TOMBSTONES))
    )
    all_ids = {r["vec_id"] for r in a.select("vec_id").collect()}
    dead_ids = {v for v in all_ids if v % S._DELETE_MOD == S._DELETE_REM}
    S._ivf_retrain(spark, SF_SMOKE, idx)
    meta = S._ivf_index_meta(idx)
    root = S._ivf_gen_root(idx, meta)
    new_ids = {
        r["vec_id"]
        for r in spark.read.parquet(os.path.join(root, "assignments"))
        .select("vec_id")
        .collect()
    }
    assert new_ids == all_ids - dead_ids, "retrain kept or lost wrong ids"
    assert not glob.glob(os.path.join(root, S._TOMBSTONES, "*.parquet")), (
        "the new generation must start with tombstones consumed"
    )
    assert meta["n"] == len(new_ids)


def test_generation_gc_removes_only_dead_generations(spark):
    """GC after a retrain must remove the superseded generation's
    artifacts and leave the live generation byte-untouched."""
    from kasper_spark.operators import similarity as S

    idx = S._build_stale_ivf_index(spark, SF_SMOKE)
    S._ivf_retrain(spark, SF_SMOKE, idx)
    live = S._ivf_gen_root(idx, S._ivf_index_meta(idx))
    live_before = _leaf_stats(live)
    assert os.path.isdir(os.path.join(idx, "assignments")), "stale gen-0 gone early"
    removed = S._ivf_generation_gc(idx)
    assert any(p.endswith("assignments") for p in removed)
    assert not os.path.isdir(os.path.join(idx, "assignments"))
    assert not os.path.isdir(os.path.join(idx, "centroids"))
    assert _leaf_stats(live) == live_before, "GC touched the live generation"
    # idempotent on a clean index
    assert S._ivf_generation_gc(idx) == []


def test_pq_codebook_retrain_serves_old_until_flip(spark):
    """The PQ-layer twin of the generation-flip serving criterion:
    mid-retrain ADC runs on the stale codebook; the single PQ-marker
    replace flips serving to the retrained layer, which equals the
    fresh build's serving."""
    from kasper_spark import index_catalog as icat
    from kasper_spark.operators import similarity as S

    idx = S._build_stale_pq_index(spark, SF_SMOKE)
    stale = sorted(
        map(tuple, S._search_pq_persisted_index(spark, SF_SMOKE, idx).collect())
    )
    seen: dict = {}

    def before_flip(i: str) -> None:
        seen["mid"] = sorted(
            map(tuple, S._search_pq_persisted_index(spark, SF_SMOKE, i).collect())
        )
        seen["meta"] = icat.marker_read_ints(i, S._PQ_MARKER)

    S._pq_retrain(spark, SF_SMOKE, idx, before_flip=before_flip)
    assert seen["mid"] == stale, "mid-retrain ADC left the old codebook"
    assert int(seen["meta"].get("gen", 0)) == 0, "PQ flip happened early"
    assert icat.marker_read_ints(idx, S._PQ_MARKER)["gen"] == 1
    new_served = sorted(
        map(tuple, S._search_pq_persisted_index(spark, SF_SMOKE, idx).collect())
    )
    want = sorted(
        map(tuple, QUERIES["ann_ivf_pq_search_only"](spark, SF_SMOKE).collect())
    )
    assert new_served == want, "post-flip ADC != fresh-build ADC"
