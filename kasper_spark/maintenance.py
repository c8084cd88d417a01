"""Table-maintenance utilities: small-file compaction.

The operational reality of a 100 TB lake the reference never faces (its
only storage is Kafka + KV stores): streaming sinks and fine-grained
partitioned writes accrete thousands of KB-sized files, and at scan time
each file costs a task schedule + footer read + (on object stores) a
request round trip — a 100k-file partition can spend more time on file
overhead than on data. Compaction rewrites a directory into ~target-sized
files.

Design:
- `plan_compaction` is METADATA-ONLY (file listing + sizes, no data read):
  it bin-packs files into merge groups and is cheap enough to run in a
  scheduler loop to decide IF compaction is worth it.
- `compact_parquet_dir` does the rewrite with a single coalesce-free
  `repartition(n)` sized from the real byte total — an even shuffle-round
  rewrite (coalesce would inherit the skew of the input files). Row-group
  integrity, schema, and values are preserved (round-trip-tested).
- Rewrites land in a NEW directory; swapping it in is the caller's
  (atomic-rename / table-format-transaction) concern. Compacting in place
  under readers is exactly the race a table format's snapshot isolation
  exists to solve.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import SparkSession


def plan_compaction(
    path: str, target_bytes: int, small_file_factor: float = 0.5
) -> list[list[str]]:
    """Bin-pack the parquet files under ``path`` into merge groups of
    ~``target_bytes``. Files already >= ``small_file_factor * target_bytes``
    are left alone (rewriting them buys nothing). Returns only groups with
    2+ files — an empty plan means the directory is already well-laid-out.

    Partition-aware: files are grouped WITHIN their containing directory
    (merging across Hive partitions would rewrite rows into the wrong
    partition), so a partitioned table yields per-partition merge groups.

    First-fit-decreasing on size; deterministic (size desc, then name)."""
    files = sorted(
        (
            (os.path.getsize(f), f)
            for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        ),
        key=lambda t: (-t[0], t[1]),
    )
    small = [(sz, f) for sz, f in files if sz < target_bytes * small_file_factor]
    by_dir: dict[str, list[tuple[int, str]]] = {}
    for sz, f in small:
        by_dir.setdefault(os.path.dirname(f), []).append((sz, f))
    out: list[list[str]] = []
    for _dir in sorted(by_dir):
        groups: list[tuple[int, list[str]]] = []
        for sz, f in by_dir[_dir]:
            placed = False
            for i, (gsz, members) in enumerate(groups):
                if gsz + sz <= target_bytes:
                    groups[i] = (gsz + sz, members + [f])
                    placed = True
                    break
            if not placed:
                groups.append((sz, [f]))
        out.extend(members for _gsz, members in groups if len(members) > 1)
    return out


def compact_index_partitions(
    spark: SparkSession, table_dir: str, target_bytes: int = 128 * 1024 * 1024
) -> int:
    """Compact every leaf partition directory of a partitioned on-disk
    index table (the round-13 persisted indexes: assignments / pq_codes /
    pqres_codes / bands) in place, returning the number of leaves
    rewritten.

    Why this exists: the streaming append twins commit one part-file per
    micro-batch per touched partition, so a long-running maintained index
    accretes epoch-count small files per inverted list — exactly the
    overhead profile the module docstring describes. Each leaf is
    rewritten through compact_parquet_dir into a sibling temp dir and
    SWAPPED in by rename. The two renames per leaf are NOT atomic
    together, so the whole pass runs under guarded_maintenance (ADVICE
    r13): every ``_KASPER_*READY`` marker next to the table is removed
    first and restored only after all leaves are swapped — a crash at
    any point leaves the index visibly not-ready (marker-gated serving
    refuses it; recovery is a rebuild), never silently missing a leaf.
    Partition pruning is untouched (directory names are the partition
    values and never change); values and the serving results are
    preserved (round-trip-tested in tests/test_round13_ops.py).
    Single-writer rounds, like the index builds themselves: compacting
    under concurrent readers is the table-format-transaction concern the
    module docstring defers."""
    from kasper_spark.index_catalog import guarded_maintenance

    with guarded_maintenance(os.path.dirname(os.path.abspath(table_dir))):
        return _compact_index_partitions_unguarded(spark, table_dir, target_bytes)


def _compact_index_partitions_unguarded(
    spark: SparkSession, table_dir: str, target_bytes: int
) -> int:
    import shutil

    leaves = sorted(
        {
            os.path.dirname(f)
            for f in glob.glob(
                os.path.join(table_dir, "**", "*.parquet"), recursive=True
            )
        }
    )
    # scratch dirs live OUTSIDE the table root: a crash mid-swap must
    # never leave a "cluster_id=5.old"-shaped sibling that partition
    # discovery would parse as a (malformed) partition value.
    scratch = os.path.join(os.path.dirname(os.path.abspath(table_dir)), ".compact-scratch")
    os.makedirs(scratch, exist_ok=True)
    rewritten = 0
    for leaf in leaves:
        if len(glob.glob(os.path.join(leaf, "*.parquet"))) <= 1:
            continue
        rel = os.path.relpath(leaf, table_dir).replace(os.sep, "__")
        tmp = os.path.join(scratch, rel + ".compacting")
        old = os.path.join(scratch, rel + ".old")
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        compact_parquet_dir(spark, leaf, tmp, target_bytes)
        os.rename(leaf, old)
        os.rename(tmp, leaf)
        shutil.rmtree(old)
        rewritten += 1
    shutil.rmtree(scratch, ignore_errors=True)
    return rewritten


def compact_parquet_dir(
    spark: SparkSession, src: str, dst: str, target_bytes: int
) -> int:
    """Rewrite the parquet directory ``src`` into ``dst`` with files of
    ~``target_bytes``. Returns the number of output part-files requested.

    Sizing note: parquet re-encodes (and often re-compresses better, since
    bigger row groups mean bigger dictionary/RLE runs), so output files
    come out <= target; the goal is bounding file COUNT, not hitting an
    exact size.

    Flat directories only: a Hive-PARTITIONED table must be compacted one
    leaf directory at a time (rewriting across partitions would flatten
    the partition columns into data and destroy pruning), so this refuses
    nested layouts instead of silently collapsing them."""
    flat = glob.glob(os.path.join(src, "*.parquet"))
    nested = glob.glob(os.path.join(src, "**", "*.parquet"), recursive=True)
    if len(nested) > len(flat):
        # nested is the recursive superset of flat: ANY file under a
        # subdirectory means a (possibly mixed) partitioned layout, which
        # this flat rewrite would flatten or silently drop rows from.
        raise ValueError(
            f"{src} has {len(nested) - len(flat)} parquet files in "
            "subdirectories (partitioned or mixed layout): compact each "
            "leaf directory (see plan_compaction's per-directory groups) "
            "instead of the root"
        )
    if not flat:
        raise ValueError(f"no parquet files under {src}")
    total = sum(os.path.getsize(f) for f in flat)
    n = max(1, -(-total // target_bytes))  # ceil
    spark.read.parquet(src).repartition(n).write.mode("overwrite").parquet(dst)
    return n
