"""Small-file compaction: metadata-only planning + lossless rewrite."""

from __future__ import annotations

import glob
import os
import tempfile

import pytest

from kasper_spark.catalog import load_table
from kasper_spark.maintenance import compact_parquet_dir, plan_compaction
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def fragmented(spark):
    """orders written as many tiny files (a streaming-sink-shaped mess)."""
    src = tempfile.mkdtemp(prefix="kasper-frag-")
    load_table(spark, SF_SMOKE, "orders").repartition(40).write.mode(
        "overwrite"
    ).parquet(src)
    return src


def test_plan_compaction_is_metadata_only_and_packs(fragmented):
    files = glob.glob(os.path.join(fragmented, "*.parquet"))
    assert len(files) == 40
    total = sum(os.path.getsize(f) for f in files)
    target = total // 4
    plan = plan_compaction(fragmented, target)
    # every group has 2+ files, stays under target, and no file repeats
    seen = set()
    for group in plan:
        assert len(group) > 1
        assert sum(os.path.getsize(f) for f in group) <= target
        for f in group:
            assert f not in seen
            seen.add(f)
    assert len(seen) > 30  # the tiny files overwhelmingly get packed

    # an already-compacted directory yields an empty plan
    assert plan_compaction(fragmented, target_bytes=1) == []


def test_compact_roundtrip_and_file_count(spark, fragmented):
    dst = tempfile.mkdtemp(prefix="kasper-compact-")
    total = sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(fragmented, "*.parquet"))
    )
    n = compact_parquet_dir(spark, fragmented, dst, target_bytes=total // 4 + 1)
    out_files = glob.glob(os.path.join(dst, "*.parquet"))
    assert len(out_files) == n <= 5

    before = sorted(map(str, spark.read.parquet(fragmented).collect()))
    after = sorted(map(str, spark.read.parquet(dst).collect()))
    assert before == after


def test_plan_compaction_is_partition_aware(spark, fragmented):
    """Groups never span Hive partition directories; the root of a
    partitioned layout is refused by the rewriter instead of flattened."""
    import shutil

    from kasper_spark.catalog import load_table
    from kasper_spark.maintenance import compact_parquet_dir, plan_compaction

    root = tempfile.mkdtemp(prefix="kasper-part-frag-")
    ev = load_table(spark, SF_SMOKE, "events")
    ev.withColumn("bucket", (ev.user_id % 3)).repartition(10).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(root)

    total = sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True)
    )
    plan = plan_compaction(root, total // 2)
    assert plan  # the tiny per-partition files are packable
    for group in plan:
        assert len({os.path.dirname(f) for f in group}) == 1  # never cross-partition

    with pytest.raises(ValueError, match="subdirectories"):
        compact_parquet_dir(spark, root, root + "-out", total // 2)
    shutil.rmtree(root)


def test_compact_refuses_mixed_layout_and_empty_dir(spark, fragmented):
    """Mixed root+partitioned layouts are refused (a flat rewrite would
    silently drop the root-level rows); empty dirs fail with a clear
    message, not a schema-inference error."""
    import shutil

    from kasper_spark.maintenance import compact_parquet_dir

    mixed = tempfile.mkdtemp(prefix="kasper-mixed-")
    src_file = glob.glob(os.path.join(fragmented, "*.parquet"))[0]
    shutil.copy(src_file, os.path.join(mixed, "root.parquet"))
    os.makedirs(os.path.join(mixed, "k=2"))
    shutil.copy(src_file, os.path.join(mixed, "k=2", "nested.parquet"))
    with pytest.raises(ValueError, match="subdirectories"):
        compact_parquet_dir(spark, mixed, mixed + "-out", 1 << 20)

    empty = tempfile.mkdtemp(prefix="kasper-empty-")
    with pytest.raises(ValueError, match="no parquet files"):
        compact_parquet_dir(spark, empty, empty + "-out", 1 << 20)
