"""Round-14 property gates: the shared index-catalog protocol (ADVICE r13
— marker-guarded maintenance, exactly-once epoch appends) and the
null-correct histogram prefix rank. The oracle sweep certifies value
equality; these pin the crash/replay invariants the sweep cannot reach
(a micro-batch is never re-executed in a clean run)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kasper_spark import index_catalog as cat
from kasper_spark.registry import QUERIES, load_all_operators
from tests.conftest import SF_ORACLE, SF_SMOKE  # noqa: F401

load_all_operators()


def test_marker_roundtrip_and_atomic_tmp(tmp_path):
    idx = str(tmp_path)
    cat.marker_write(idx, "_KASPER_X_READY", n=7, k=3)
    assert cat.marker_exists(idx, "_KASPER_X_READY")
    assert cat.marker_read_ints(idx, "_KASPER_X_READY") == {"n": 7, "k": 3}
    assert not os.path.exists(os.path.join(idx, "_KASPER_X_READY.tmp"))
    cat.marker_remove(idx, "_KASPER_X_READY")
    assert not cat.marker_exists(idx, "_KASPER_X_READY")
    cat.marker_remove(idx, "_KASPER_X_READY")  # idempotent on absent


def test_guarded_maintenance_removes_then_restores(tmp_path):
    """Markers are ABSENT inside the block (a crash leaves the index
    visibly not-ready) and restored VERBATIM after, except markers the
    caller rewrote itself."""
    idx = str(tmp_path)
    cat.marker_write(idx, "_KASPER_A_READY", n=5)
    cat.marker_write(idx, "_KASPER_B_READY", m=2)
    with cat.guarded_maintenance(idx) as saved:
        assert sorted(saved) == ["_KASPER_A_READY", "_KASPER_B_READY"]
        assert not cat.marker_exists(idx, "_KASPER_A_READY")
        assert not cat.marker_exists(idx, "_KASPER_B_READY")
        cat.marker_write(idx, "_KASPER_B_READY", m=9)  # caller-updated
    assert cat.marker_read_ints(idx, "_KASPER_A_READY") == {"n": 5}
    assert cat.marker_read_ints(idx, "_KASPER_B_READY") == {"m": 9}


def test_guarded_maintenance_crash_leaves_markers_absent(tmp_path):
    idx = str(tmp_path)
    cat.marker_write(idx, "_KASPER_A_READY", n=5)
    with pytest.raises(RuntimeError):
        with cat.guarded_maintenance(idx):
            raise RuntimeError("simulated crash mid-swap")
    assert not cat.marker_exists(idx, "_KASPER_A_READY"), (
        "a crashed maintenance pass must leave the index visibly not-ready"
    )


def test_epoch_log_skip_and_total(tmp_path):
    idx = str(tmp_path)
    log = cat.EpochLog(idx)
    log.set_base(n=100)
    assert not log.is_committed(0)
    log.record(0, n=10)
    log.record(1, n=7)
    assert log.is_committed(0) and log.is_committed(1)
    assert not log.is_committed(2)
    assert log.total("n") == 117
    log.record(1, n=7)  # re-record is a no-op on the total's inputs
    assert log.total("n") == 117


def test_adopt_staged_is_replay_idempotent(spark, tmp_path):
    """The crash-replay contract: staging the SAME epoch twice (overwrite
    + adopt) must leave exactly one copy of its rows in the table — the
    double-append ADVICE r13 flagged must be impossible by construction."""
    table = str(tmp_path / "table")
    df = spark.range(0, 40).select(
        F.col("id").alias("vec_id"), (F.col("id") % 4).alias("cluster_id")
    )
    seed_stage = str(tmp_path / "stage-seed")
    df.repartition(F.col("cluster_id")).write.partitionBy("cluster_id").parquet(
        seed_stage
    )
    cat.adopt_staged(seed_stage, table, 0)
    epoch = spark.range(40, 60).select(
        F.col("id").alias("vec_id"), (F.col("id") % 4).alias("cluster_id")
    )
    for _attempt in range(2):  # first run + simulated micro-batch replay
        stage = str(tmp_path / "stage-e1")
        epoch.repartition(F.col("cluster_id")).write.mode("overwrite").partitionBy(
            "cluster_id"
        ).parquet(stage)
        cat.adopt_staged(stage, table, 1)
    got = sorted(
        map(
            tuple,
            spark.read.parquet(table)
            .select("vec_id", F.col("cluster_id").cast("long"))
            .collect(),
        )
    )
    assert got == [(i, i % 4) for i in range(60)], "replay duplicated rows"


def test_adopt_staged_flat_table_and_ordinal_cleanup(spark, tmp_path):
    """Flat (unpartitioned) adoption lands at the table root; a narrower
    replay removes stale higher-ordinal files from a wider prior attempt."""
    table = str(tmp_path / "flat")
    stage = str(tmp_path / "stage")
    spark.range(0, 10).repartition(2).write.parquet(stage)
    assert cat.adopt_staged(stage, table, 3) == 2
    # replay produces ONE file this time: ordinal 1 must be cleaned up
    spark.range(0, 10).coalesce(1).write.mode("overwrite").parquet(stage)
    assert cat.adopt_staged(stage, table, 3) == 1
    files = sorted(os.listdir(table))
    assert files == ["epoch-3-0.parquet"], files
    assert spark.read.parquet(table).count() == 10


def test_compaction_crash_gates_serving_on_marker(spark, tmp_path, monkeypatch):
    """compact_index_partitions must remove the READY markers before any
    leaf swap and NOT restore them if it crashes mid-pass (ADVICE r13:
    the old sequence could leave a leaf missing under a valid marker)."""
    import kasper_spark.maintenance as M

    idx = str(tmp_path / "idx")
    table = os.path.join(idx, "assignments")
    df = spark.range(0, 40).select(
        F.col("id").alias("vec_id"), (F.col("id") % 4).alias("cluster_id")
    )
    for _ in range(2):  # two appends -> 2 files per leaf, compactable
        df.repartition(F.col("cluster_id")).write.mode("append").partitionBy(
            "cluster_id"
        ).parquet(table)
    cat.marker_write(idx, "_KASPER_INDEX_READY", n=80, k=4, train_n=8)

    def boom(*a, **kw):
        raise RuntimeError("simulated crash mid-compaction")

    monkeypatch.setattr(M, "compact_parquet_dir", boom)
    with pytest.raises(RuntimeError):
        M.compact_index_partitions(spark, table, target_bytes=1 << 26)
    assert not cat.marker_exists(idx, "_KASPER_INDEX_READY"), (
        "crashed compaction left a valid READY marker over a possibly "
        "half-swapped index"
    )
    monkeypatch.undo()
    cat.marker_write(idx, "_KASPER_INDEX_READY", n=80, k=4, train_n=8)
    assert M.compact_index_partitions(spark, table, target_bytes=1 << 26) > 0
    assert cat.marker_read_ints(idx, "_KASPER_INDEX_READY")["n"] == 80


def test_hist_prefix_rank_null_values_match_window_spec(spark):
    """NULL-valued rows must rank exactly where the global window puts
    them (Spark orderBy ASC = nulls first) — ADVICE r13: the old inner
    join silently dropped them."""
    from pyspark.sql.window import Window

    from kasper_spark.functions.ranks import hist_prefix_rank

    rows = [(None, 3), (5, 1), (None, 1), (2, 2), (5, 0), (2, 9), (None, 2)]
    df = spark.createDataFrame(rows, "v int, k int")
    got = sorted(
        map(
            tuple,
            hist_prefix_rank(df, "v", "k", "r", n_name="n")
            .select("v", "k", "r", "n")
            .collect(),
        ),
        key=lambda t: (t[2],),
    )
    w = Window.orderBy(F.col("v").asc(), F.col("k").asc())
    want = sorted(
        map(
            tuple,
            df.select(
                "v",
                "k",
                F.row_number().over(w).cast("long").alias("r"),
                F.count(F.lit(1))
                .over(
                    Window.partitionBy().rowsBetween(
                        Window.unboundedPreceding, Window.unboundedFollowing
                    )
                )
                .cast("long")
                .alias("n"),
            ).collect(),
        ),
        key=lambda t: (t[2],),
    )
    assert got == want and len(got) == 7


def test_lsh_pending_tail_served_before_fold(spark, tmp_path):
    """Mid-maintenance freshness: rows still in the bands_pending tail
    (not yet folded into the partitioned layout) must be visible to
    _search_lsh_index — the memtable-over-SSTable union."""
    import shutil

    from kasper_spark.operators import dedup as D
    from kasper_spark.operators.streaming_twins import _lsh_append_run

    # fold_every > epoch count: the stream leaves everything in the tail,
    # and we snapshot the index BEFORE the final fold by copying it when
    # fold_pending('final') has already run — so instead run with a huge
    # fold_every and verify the folded result equals a tail-free serve.
    idx, _ = _lsh_append_run(spark, SF_SMOKE, 2, fold_every=1000)
    served = sorted(map(tuple, D._search_lsh_index(spark, idx).collect()))
    want = sorted(
        map(tuple, QUERIES["lsh_neardup_search_only"](spark, SF_SMOKE).collect())
    )
    assert served == want

    # now reconstruct a mid-stream state: move the folded epoch rows back
    # into a pending tail and assert serving still sees them via the union
    mid = str(tmp_path / "mid")
    shutil.copytree(idx, mid)
    bands = os.path.join(mid, "bands")
    tail = os.path.join(mid, D._LSH_PENDING)
    moved = []
    for root, _dirs, files in os.walk(bands):
        for f in files:
            if f.startswith("epoch-fold-"):
                moved.append(os.path.join(root, f))
    assert moved, "expected folded epoch files in the bands layout"
    rel_cols = spark.read.option("basePath", bands).parquet(*moved).select(
        "doc_id", "bsig", F.col("band").cast("int").alias("band"),
        F.col("bucket").cast("int").alias("bucket"),
    )
    os.makedirs(tail, exist_ok=True)
    rel_cols.coalesce(1).write.mode("overwrite").parquet(tail + "-stage")
    cat.adopt_staged(tail + "-stage", tail, "re")
    for f in moved:
        os.remove(f)
    mid_served = sorted(map(tuple, D._search_lsh_index(spark, mid).collect()))
    assert mid_served == want, "pending tail rows invisible to serving"


def test_delete_logical_equals_physical_serving(spark):
    """Mid-maintenance serving: with tombstones present and reclaim
    PENDING, serving must anti-join them and equal the post-reclaim
    serving bit-for-bit — a takedown is effective the moment the
    tombstone lands, not when compaction gets around to it."""
    import glob
    import os

    from pyspark.sql import functions as F

    from kasper_spark.operators import similarity as S

    idx = S._copy_ivf_index(spark, SF_SMOKE, "kasper-deltest-")
    assignments = os.path.join(idx, "assignments")
    (
        spark.read.parquet(assignments)
        .filter(F.col("vec_id") % S._DELETE_MOD == S._DELETE_REM)
        .select("vec_id")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(idx, S._TOMBSTONES))
    )
    logical = sorted(
        map(tuple, S._search_persisted_index(spark, SF_SMOKE, idx).collect())
    )
    reclaimed = S._ivf_reclaim_tombstones(spark, idx)
    assert reclaimed > 0, "test predicate deleted nothing"
    assert not glob.glob(os.path.join(idx, S._TOMBSTONES, "*.parquet")), (
        "reclaim must clear consumed tombstones"
    )
    physical = sorted(
        map(tuple, S._search_persisted_index(spark, SF_SMOKE, idx).collect())
    )
    assert logical == physical and logical
    # marker n reflects the reclaim
    n_disk = spark.read.parquet(assignments).count()
    assert S._ivf_index_meta(idx)["n"] == n_disk


def test_split_rebalances_storage_and_preserves_results(spark):
    """The storage split must actually move rows (child partition exists,
    parent shrank ~in half) while equal-budget serving stays IDENTICAL
    to the unsplit index."""
    import os

    from pyspark.sql import functions as F

    from kasper_spark.operators import similarity as S

    before = sorted(
        map(
            tuple,
            S._search_persisted_index(
                spark, SF_SMOKE, S._ensure_ivf_index(spark, SF_SMOKE)
            ).collect(),
        )
    )
    idx = S._copy_ivf_index(spark, SF_SMOKE, "kasper-splittest-")
    sizes0 = {
        int(r["cluster_id"]): r["c"]
        for r in spark.read.parquet(os.path.join(idx, "assignments"))
        .groupBy(F.col("cluster_id").cast("long").alias("cluster_id"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    parent, child = S._ivf_split_largest_list(spark, idx)
    assert sizes0[parent] == max(sizes0.values())
    sizes1 = {
        int(r["cluster_id"]): r["c"]
        for r in spark.read.parquet(os.path.join(idx, "assignments"))
        .groupBy(F.col("cluster_id").cast("long").alias("cluster_id"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert child in sizes1 and sizes1[child] > 0, "child list empty"
    assert sizes1[parent] + sizes1[child] == sizes0[parent], "rows lost/dup"
    assert sizes1[parent] < sizes0[parent]
    assert sum(sizes1.values()) == sum(sizes0.values())
    after = sorted(
        map(tuple, S._search_persisted_index(spark, SF_SMOKE, idx).collect())
    )
    assert after == before, "split changed equal-budget search results"


def test_lsh_delete_logical_equals_physical_serving(spark):
    """The LSH takedown path: with tombstones present and reclaim
    pending, serving must anti-join them and equal post-reclaim serving
    bit-for-bit (and tombstoned docs must vanish from both the query and
    the neighbor side)."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from kasper_spark.operators import dedup as D

    real = D._ensure_lsh_index(spark, SF_SMOKE)
    idx = os.path.join(tempfile.mkdtemp(prefix="kasper-lshdeltest-"), "index")
    shutil.copytree(real, idx)
    (
        spark.read.parquet(os.path.join(idx, "sigs"))
        .filter(F.col("doc_id") % D._LSH_DELETE_MOD == D._LSH_DELETE_REM)
        .select("doc_id")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(idx, D._LSH_TOMBSTONES))
    )
    logical = sorted(map(tuple, D._search_lsh_index(spark, idx).collect()))
    from kasper_spark import index_catalog as icat

    with icat.guarded_maintenance(idx):
        icat.reclaim_tombstones(
            spark,
            idx,
            {"sigs": [], "bands": ["band", "bucket"]},
            "doc_id",
            D._LSH_TOMBSTONES,
        )
    physical = sorted(map(tuple, D._search_lsh_index(spark, idx).collect()))
    assert logical == physical
    dead = {
        d
        for d in range(D._LSH_IDX_QUERIES)
        if d % D._LSH_DELETE_MOD == D._LSH_DELETE_REM
    }
    assert not any(r[0] in dead or r[1] in dead for r in physical), (
        "tombstoned doc still served"
    )


def test_streaming_delete_twin_cut_invariant_and_offline_equal(spark):
    """Takedowns arriving as a stream must converge to the offline
    delete+reclaim exactly, regardless of how the tombstone feed is cut,
    and mid-protocol the index must never serve a committed takedown."""
    from kasper_spark.operators.streaming_twins import _ivf_delete_run

    idx2, prof2 = _ivf_delete_run(spark, SF_SMOKE, 2)
    idx5, prof5 = _ivf_delete_run(spark, SF_SMOKE, 5)
    a = sorted(map(tuple, prof2.collect()))
    b = sorted(map(tuple, prof5.collect()))
    assert a == b and a, "delete twin not cut-invariant"
    offline = sorted(
        map(tuple, QUERIES["ann_ivf_index_delete"](spark, SF_SMOKE).collect())
    )
    assert a == offline, "streamed takedowns diverged from offline delete"


def test_equidepth_hist_form_matches_window_under_ties(spark):
    """The closed-form NTILE rank-range fold must equal the window
    NTILE(10) on adversarial shapes the orders data never reaches: heavy
    ties spanning bucket edges, n < k (empty buckets), one distinct
    value, and n == 1. Exercised through the same arithmetic the
    registered query uses, over a synthetic value column."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    cases = [
        [5] * 37,                                # one value, ties cross all edges
        [1, 1, 1, 2],                            # n < k: empty buckets
        [7],                                     # n == 1
        [1] * 9 + [2] * 9 + [3] * 9 + [4] * 6,   # tie groups vs 10 buckets
        list(range(100)) + [50] * 23,            # mixed uniques + one hot value
    ]
    for vals in cases:
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "k long, v long"
        )
        tiled = df.select(
            "v", F.ntile(10).over(Window.orderBy("v", "k")).alias("bucket")
        )
        want = sorted(
            map(
                tuple,
                tiled.groupBy("bucket")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.min("v").alias("lo"),
                    F.max("v").alias("hi"),
                )
                .select(F.col("bucket").cast("long"), "n", "lo", "hi")
                .collect(),
            )
        )
        hist = df.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("c"))
        w_before = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
        cum = hist.select(
            "v",
            "c",
            F.coalesce(F.sum("c").over(w_before), F.lit(0)).cast("long").alias("b"),
            F.sum("c").over(Window.partitionBy()).cast("long").alias("_n"),
        )
        bucket_of = (
            "CASE WHEN {i} <= _r * (_q + 1)"
            "     THEN ({i} - 1) div (_q + 1) + 1"
            "     ELSE _r + ({i} - _r * (_q + 1) - 1) div _q + 1 END"
        )
        spanned = (
            cum.withColumn("_q", F.expr("_n div 10"))
            .withColumn("_r", F.expr("_n % 10"))
            .withColumn("_first", F.expr(bucket_of.format(i="(b + 1)")))
            .withColumn("_last", F.expr(bucket_of.format(i="(b + c)")))
            .withColumn("bucket", F.explode(F.sequence("_first", "_last")))
            .withColumn(
                "_lo_rank", F.expr("(bucket - 1) * _q + least(bucket - 1, _r) + 1")
            )
            .withColumn("_hi_rank", F.expr("bucket * _q + least(bucket, _r)"))
            .withColumn(
                "_ov",
                F.expr("least(_hi_rank, b + c) - greatest(_lo_rank, b + 1) + 1"),
            )
        )
        got = sorted(
            map(
                tuple,
                spanned.groupBy(F.col("bucket").cast("long").alias("bucket"))
                .agg(
                    F.sum("_ov").cast("long").alias("n"),
                    F.min("v").alias("lo"),
                    F.max("v").alias("hi"),
                )
                .collect(),
            )
        )
        assert got == want, f"divergence on case {vals[:6]}... (n={len(vals)})"


def test_append_twin_survives_crash_replay_at_every_commit_point(spark):
    """END-TO-END exactly-once: kill the stream mid-epoch at each of the
    three commit points (staged / adopted / recorded) and let Structured
    Streaming re-execute the epoch from the SAME checkpoint. The final
    index must be row-identical to a clean run — zero duplicates, zero
    losses — and the marker's n must equal the rows on disk."""
    from pyspark.sql import functions as F

    from kasper_spark.operators import similarity as S
    from kasper_spark.operators.streaming_twins import _ivf_append_run

    fired: set = set()

    def fault(epoch_id: int, point: str) -> None:
        if point not in fired:
            fired.add(point)
            raise RuntimeError(f"injected crash at {point} (epoch {epoch_id})")

    idx, prof = _ivf_append_run(spark, SF_SMOKE, 4, fault=fault, retries=3)
    assert fired == {"staged", "adopted", "recorded"}, fired
    crashed = sorted(map(tuple, prof.collect()))
    clean = sorted(
        map(tuple, _ivf_append_run(spark, SF_SMOKE, 4)[1].collect())
    )
    assert crashed == clean, "crash-replay run diverged from clean run"
    rows = (
        spark.read.parquet(S._os.path.join(idx, "assignments"))
        .select("vec_id")
        .collect()
    )
    ids = [r["vec_id"] for r in rows]
    assert len(ids) == len(set(ids)), "replay duplicated vectors"
    assert S._ivf_index_meta(idx)["n"] == len(ids), "marker n out of step"
