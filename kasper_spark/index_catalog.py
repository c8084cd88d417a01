"""Shared persisted-index catalog protocol: READY markers, marker-guarded
maintenance, and epoch-idempotent streaming appends.

Round 13 grew four persisted on-disk indexes (coarse IVF, IVF-PQ,
residual-PQ, MinHash-LSH), each carrying hand-rolled fingerprint/marker/
append plumbing; drift between four copies of the same protocol is the
likeliest future correctness bug (r13 verdict ticket #6). This module is
the single implementation all of them share:

- ``fingerprint_dir``: key an index directory by the source table's
  (abspath, size, mtime_ns) plus a LAYOUT VERSION, so a data refresh or
  an on-disk format change abandons stale dirs instead of misreading
  them.
- ``marker_write`` / ``marker_read`` / ``marker_remove``: the atomic
  (tmp + rename) key=value READY marker. Readers gate on the marker; a
  reader racing a writer sees either the old or the new marker, never a
  torn one.
- ``guarded_maintenance``: remove-markers-FIRST context manager for any
  in-place rewrite (compaction, delete reclaim, list split). A crash
  mid-maintenance leaves the markers ABSENT, so marker-gated serving can
  never observe a half-swapped index — the discipline every builder
  already follows, now enforced for maintenance too (ADVICE r13 flagged
  ``compact_index_partitions`` swapping leaves under a live marker).
- ``EpochLog`` + ``adopt_staged``: exactly-once micro-batch appends.
  Spark can re-execute a foreachBatch epoch after a failure; a blind
  ``mode("append")`` then double-appends rows (ADVICE r13 on the three
  index-append twins). The protocol here is idempotent at every crash
  point: (1) a committed epoch is SKIPPED on replay; (2) the epoch's
  output is staged with ``mode("overwrite")`` into an epoch-keyed
  scratch dir, so a replayed partial write self-overwrites; (3) staged
  part-files are adopted into the index leaves under DETERMINISTIC
  epoch-keyed names via ``os.replace`` — a replayed partial adoption
  overwrites the same targets; (4) the commit record (carrying the
  epoch's row count) lands atomically LAST, and derived marker state
  (e.g. the index's n) is recomputed from ``base + total()`` so it never
  double-counts.
"""

from __future__ import annotations

import glob
import hashlib
import os
import re
import tempfile
from contextlib import contextmanager
from collections.abc import Iterator


def fingerprint_dir(prefix: str, source_path: str, version: str = "v1") -> str:
    """A tmp-rooted index dir keyed by the source table file's identity
    (abspath + size + mtime_ns) and the on-disk layout version — any
    rewrite of the data or change of format yields a fresh key."""
    st = os.stat(source_path)
    tag = hashlib.md5(
        f"{os.path.abspath(source_path)}:{st.st_size}:{st.st_mtime_ns}:{version}".encode()
    ).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"{prefix}-{tag}")


def marker_path(idx: str, name: str) -> str:
    return os.path.join(idx, name)


def marker_write(idx: str, name: str, **fields) -> None:
    """(Re)write a READY marker ATOMICALLY (tmp + rename): a reader that
    races this sees either the old or the new fields, never a torn file."""
    tmp = os.path.join(idx, name + ".tmp")
    with open(tmp, "w") as f:
        f.write(" ".join(f"{k}={v}" for k, v in fields.items()) + "\n")
    os.replace(tmp, os.path.join(idx, name))


def marker_read(idx: str, name: str) -> dict[str, str]:
    with open(os.path.join(idx, name)) as f:
        return dict(kv.split("=", 1) for kv in f.read().split())


def marker_read_ints(idx: str, name: str) -> dict[str, int]:
    return {k: int(v) for k, v in marker_read(idx, name).items()}


def marker_exists(idx: str, name: str) -> bool:
    return os.path.exists(os.path.join(idx, name))


def marker_remove(idx: str, name: str) -> None:
    p = os.path.join(idx, name)
    if os.path.exists(p):
        os.remove(p)


MARKER_GLOB = "_KASPER_*READY"


@contextmanager
def guarded_maintenance(idx: str, names: list[str] | None = None) -> Iterator[dict[str, str]]:
    """Remove the index's READY markers BEFORE an in-place rewrite and
    restore them (verbatim) only after it completes. Serving is gated on
    the markers, so a crash anywhere inside the block leaves the index
    visibly not-ready instead of silently part-swapped; recovery is a
    rebuild (the builders' own remove-first discipline).

    ``names=None`` auto-discovers every ``_KASPER_*READY`` marker under
    ``idx``. Yields the saved marker texts keyed by name (so maintenance
    that changes derived fields, e.g. n after a delete, can rewrite its
    own markers instead — anything the caller re-creates inside the
    block is left untouched at exit)."""
    if names is None:
        names = sorted(
            os.path.basename(p)
            for p in glob.glob(os.path.join(idx, MARKER_GLOB))
            if not p.endswith(".tmp")
        )
    saved: dict[str, str] = {}
    for n in names:
        with open(os.path.join(idx, n)) as f:
            saved[n] = f.read()
        os.remove(os.path.join(idx, n))
    yield saved
    for n, text in saved.items():
        if os.path.exists(os.path.join(idx, n)):
            continue  # caller rewrote it with updated fields
        tmp = os.path.join(idx, n + ".tmp")
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, os.path.join(idx, n))


class EpochLog:
    """Per-epoch commit records for a maintained index (one file per
    committed epoch, written atomically), plus an optional base record
    for the seed build. ``total(field)`` = base + sum over committed
    epochs — the replay-safe way to derive a marker's running n."""

    def __init__(self, idx: str):
        self.dir = os.path.join(idx, "_epoch_log")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, epoch_id: int | str) -> str:
        return os.path.join(self.dir, f"epoch-{epoch_id}")

    def set_base(self, **fields) -> None:
        tmp = os.path.join(self.dir, "base.tmp")
        with open(tmp, "w") as f:
            f.write(" ".join(f"{k}={v}" for k, v in fields.items()) + "\n")
        os.replace(tmp, os.path.join(self.dir, "base"))

    def is_committed(self, epoch_id: int) -> bool:
        return os.path.exists(self._path(epoch_id))

    def record(self, epoch_id: int, **fields) -> None:
        tmp = self._path(epoch_id) + ".tmp"
        with open(tmp, "w") as f:
            f.write(" ".join(f"{k}={v}" for k, v in fields.items()) + "\n")
        os.replace(tmp, self._path(epoch_id))

    def total(self, field: str) -> int:
        out = 0
        for p in glob.glob(os.path.join(self.dir, "*")):
            if p.endswith(".tmp"):
                continue
            with open(p) as f:
                rec = dict(kv.split("=", 1) for kv in f.read().split())
            out += int(rec.get(field, 0))
        return out


def adopt_staged(staged_root: str, table_root: str, epoch_id: int | str) -> int:
    """Move an epoch's staged part-files into the index table under
    deterministic epoch-keyed names. Idempotent by construction: the
    target name depends only on (epoch, leaf, file ordinal), each move is
    an atomic ``os.replace``, and stale higher-ordinal files from an
    earlier wider attempt are removed — so any interleaving of crash and
    replay converges to exactly the epoch's rows, once. Returns the
    number of files adopted."""
    by_leaf: dict[str, list[str]] = {}
    for f in glob.glob(os.path.join(staged_root, "**", "*.parquet"), recursive=True):
        rel = os.path.relpath(os.path.dirname(f), staged_root)
        by_leaf.setdefault(rel, []).append(f)
    moved = 0
    pat = re.compile(rf"^epoch-{re.escape(str(epoch_id))}-(\d+)\.parquet$")
    for rel, files in sorted(by_leaf.items()):
        dst_dir = table_root if rel == "." else os.path.join(table_root, rel)
        os.makedirs(dst_dir, exist_ok=True)
        files = sorted(files)
        for j, f in enumerate(files):
            os.replace(f, os.path.join(dst_dir, f"epoch-{epoch_id}-{j}.parquet"))
            moved += 1
        for stale in glob.glob(
            os.path.join(dst_dir, f"epoch-{epoch_id}-*.parquet")
        ):
            m = pat.match(os.path.basename(stale))
            if m and int(m.group(1)) >= len(files):
                os.remove(stale)
    return moved


# Broadcast budget for the accumulated tombstone set. The serving
# anti-join and the reclaim pass WANT the delete side broadcast (it is
# normally tiny next to the corpus), but "small" must be measured, not
# assumed: at the 100 TB scale these docstrings claim, an unbounded
# accumulated delete set broadcast to every executor is an OOM, not an
# optimization (ADVICE r14). Under the cap we broadcast; over it we hand
# the join to the planner (AQE picks shuffle/broadcast from real sizes).
BROADCAST_TOMBSTONE_BYTES = 64 * 1024 * 1024


def tombstones_side(spark, tomb_dir: str, key_col: str):
    """The tombstone DataFrame for an anti-join, broadcast only while the
    on-disk delete set fits the broadcast budget. Returns None when there
    are no tombstone files (callers skip the join entirely)."""
    files = glob.glob(os.path.join(tomb_dir, "*.parquet"))
    if not files:
        return None
    from pyspark.sql import functions as F

    dead = spark.read.parquet(tomb_dir).select(key_col)
    if sum(os.path.getsize(f) for f in files) <= BROADCAST_TOMBSTONE_BYTES:
        return F.broadcast(dead)
    return dead


def fold_pending_epochs(
    spark,
    pending_dir: str,
    table_root: str,
    pcols: list[str],
    log: "EpochLog",
    group_size: int = 1,
    final: bool = False,
    fault=None,
) -> list[int]:
    """Fold a maintained index's flat LSM pending tail into its
    partitioned table layout, one DETERMINISTIC EPOCH GROUP at a time,
    each fold committed in the EpochLog — SELF-HEALING at every crash
    point, so recovery is re-running the fold, never a rebuild (r14
    verdict ticket #5; ADVICE r14 flagged the double-adopt window in the
    tag-per-trigger form):

    - an epoch belongs to group ``epoch_id // group_size`` — a pure
      function of the epoch id, so a group's pending-file set can never
      differ between a crashed fold and its retry (the failure mode of
      tagging folds by trigger: a later fold saw MORE files and
      re-adopted the earlier rows under a different tag);
    - fold targets are deterministic PER GROUP (``adopt_staged`` under
      tag ``fold-<table>-g<group>``), so a replayed fold overwrites its
      own files instead of duplicating them;
    - the fold record lands (atomically, via EpochLog.record) only after
      adoption, so a crash before it re-runs the same idempotent fold;
    - pending files are removed only after the record exists, so a crash
      between record and removal just re-removes — never re-adopts.

    Complete groups (``group_size`` epochs present) always fold; the
    trailing partial group folds only when ``final=True`` (the drain
    call — after which no epoch can ever join it, keeping its file set
    deterministic too). ``fault(point, group_id)`` is the
    crash-injection hook, called at the three per-group commit points
    ("staged", "adopted", "recorded").

    Returns the group ids folded (committed-and-cleaned) this call."""
    import shutil

    from pyspark.sql import functions as F

    table_tag = os.path.basename(table_root.rstrip("/"))
    by_group: dict[int, dict[int, list[str]]] = {}
    for f in glob.glob(os.path.join(pending_dir, "epoch-*.parquet")):
        m = re.match(r"^epoch-(\d+)-\d+\.parquet$", os.path.basename(f))
        if not m:
            continue
        eid = int(m.group(1))
        by_group.setdefault(eid // group_size, {}).setdefault(eid, []).append(f)
    folded: list[int] = []
    for gid in sorted(by_group):
        epochs = by_group[gid]
        if len(epochs) < group_size and not final:
            continue  # trailing partial group: only the drain folds it
        gfiles = sorted(f for files in epochs.values() for f in files)
        tag = f"fold-{table_tag}-g{gid}"
        if not log.is_committed(tag):
            stage = tempfile.mkdtemp(prefix="kasper-fold-")
            try:
                out = os.path.join(stage, "out")
                (
                    spark.read.parquet(*gfiles)
                    .repartition(*[F.col(c) for c in pcols])
                    .write.mode("overwrite")
                    .partitionBy(*pcols)
                    .parquet(out)
                )
                if fault is not None:
                    fault("staged", gid)
                adopt_staged(out, table_root, tag)
                if fault is not None:
                    fault("adopted", gid)
            finally:
                shutil.rmtree(stage, ignore_errors=True)
            log.record(tag)
            if fault is not None:
                fault("recorded", gid)
        for f in gfiles:
            os.remove(f)
        folded.append(gid)
    return folded


def _parquet_rows(path: str) -> int:
    """Exact row count of a parquet table from its footers (committed
    format metadata — equals a count() job by construction, without
    running one; round-15 opt for the reclaim passes)."""
    import pyarrow.dataset as _pads

    return _pads.dataset(path, format="parquet").count_rows()


def reclaim_tombstones(
    spark,
    idx: str,
    tables: dict[str, list[str]],
    key_col: str,
    tombstones: str = "tombstones",
) -> int:
    """Physically rewrite each of an index's tables without the
    tombstoned keys, preserving each table's partition layout, then
    consume the tombstone files. One distributed anti-join pass per
    table; the tombstone side broadcasts only while it fits the
    broadcast budget (see tombstones_side — an accumulated delete set
    past the cap falls back to a planner-chosen join, never an executor
    OOM). Returns the kept-row count of the FIRST table (the index's
    primary membership table, for the caller's marker refresh).

    MUST run inside guarded_maintenance: the per-table directory swap is
    not atomic across tables, and the marker guard is what makes a crash
    mid-reclaim visible instead of serving lists and codes from
    different generations. For the production dirty-leaf form that
    rewrites only partitions over a tombstone-fraction threshold, see
    reclaim_tombstones_partial."""
    import shutil

    from pyspark.sql import functions as F

    tomb_dir = os.path.join(idx, tombstones)
    dead = tombstones_side(spark, tomb_dir, key_col)
    if dead is None:
        return -1
    n_first = -1
    for t, pcols in tables.items():
        src = os.path.join(idx, t)
        kept = spark.read.parquet(src).join(dead, key_col, "left_anti")
        tmp = os.path.join(idx, t + ".reclaiming")
        shutil.rmtree(tmp, ignore_errors=True)
        if pcols:
            (
                kept.repartition(*[F.col(c) for c in pcols])
                .write.mode("overwrite")
                .partitionBy(*pcols)
                .parquet(tmp)
            )
        else:
            kept.write.mode("overwrite").parquet(tmp)
        if n_first < 0:
            n_first = _parquet_rows(tmp)
        shutil.rmtree(src)
        os.rename(tmp, src)
    for f in glob.glob(os.path.join(tomb_dir, "*.parquet")):
        os.remove(f)
    return n_first


def reclaim_tombstones_partial(
    spark,
    idx: str,
    tables: dict[str, list[str]],
    key_col: str,
    part_col: str,
    tombstones: str = "tombstones",
    min_dead_permille: int = 0,
) -> tuple[int, list[int]]:
    """Dirty-leaf reclaim (r14 verdict ticket #6): rewrite ONLY the
    partitions whose tombstone fraction crosses the threshold; clean
    leaves keep their files byte-untouched, and their few dead rows stay
    masked by the serving anti-join (their tombstones are KEPT, not
    consumed). A leaf is dirty iff ``dead > 0 AND dead * 1000 >=
    min_dead_permille * total`` — an exact integer gate, so the decision
    is engine- and float-independent. With threshold 0, every leaf
    holding at least one tombstone rewrites, which is row-identical to
    the full reclaim_tombstones pass (pinned in tests).

    Requires the tombstone files to carry ``part_col`` alongside
    ``key_col``: the delete path reads index membership to find its
    keys, so the leaf id is free at tombstone-write time — storing it is
    what lets a 100 TB reclaim locate dirty leaves from the (tiny)
    tombstone table alone instead of joining the whole index. Per-leaf
    totals come from one count over the primary table (count aggregates
    read parquet footers, not data pages).

    MUST run inside guarded_maintenance, same as reclaim_tombstones.
    Returns (rows_reclaimed, dirty_leaf_values)."""
    import shutil

    from pyspark.sql import functions as F

    tomb_dir = os.path.join(idx, tombstones)
    if not glob.glob(os.path.join(tomb_dir, "*.parquet")):
        return 0, []
    primary = next(iter(tables))
    dead_full = spark.read.parquet(tomb_dir)
    # leaf bookkeeping from metadata, not Spark jobs (round-15 opt): the
    # tombstone table is tiny by contract (one pyarrow read), and the
    # primary table's per-leaf totals are parquet footer row counts per
    # partition directory — both exact by the format.
    import collections

    import pyarrow.dataset as _pads

    dead_per_leaf = dict(
        collections.Counter(
            int(v)
            for v in _pads.dataset(tomb_dir, format="parquet")
            .to_table(columns=[part_col])
            .column(part_col)
            .to_pylist()
        )
    )
    total_per_leaf = {
        int(os.path.basename(leaf).split("=", 1)[1]): _parquet_rows(leaf)
        for leaf in glob.glob(
            os.path.join(idx, primary, f"{part_col}=*")
        )
        if os.path.isdir(leaf)
    }
    # Layout guard (ADVICE r15): the per-leaf totals come from a glob of
    # hive-style leaf dirs, so any rows living OUTSIDE that layout (loose
    # part files at the table root, a differently-encoded partition)
    # would be silently excluded where the replaced Spark groupBy counted
    # them. Fail loudly on an unexpected layout instead. (A null
    # partition's __HIVE_DEFAULT_PARTITION__ leaf already fails the int()
    # above, also loudly.)
    loose = glob.glob(os.path.join(idx, primary, "*.parquet"))
    if loose or not total_per_leaf:
        raise ValueError(
            f"reclaim_tombstones_partial: unexpected layout under "
            f"{os.path.join(idx, primary)!r} — "
            f"{len(total_per_leaf)} {part_col}= leaves, "
            f"{len(loose)} loose parquet files at the table root; the "
            "dirty-leaf gate requires a pure hive-partitioned layout"
        )
    dirty = sorted(
        p
        for p, dc in dead_per_leaf.items()
        if dc > 0
        and dc * 1000 >= min_dead_permille * total_per_leaf.get(p, 0)
    )
    if not dirty:
        return 0, []
    dead = tombstones_side(spark, tomb_dir, key_col)
    reclaimed = sum(dead_per_leaf[p] for p in dirty)
    for t, pcols in tables.items():
        src = os.path.join(idx, t)
        kept = (
            spark.read.parquet(src)
            .filter(F.col(part_col).cast("long").isin(dirty))
            .join(dead, key_col, "left_anti")
        )
        tmp = os.path.join(idx, t + ".reclaiming")
        shutil.rmtree(tmp, ignore_errors=True)
        (
            kept.repartition(*[F.col(c) for c in pcols])
            .write.mode("overwrite")
            .partitionBy(*pcols)
            .parquet(tmp)
        )
        # swap ONLY the dirty leaf directories; every other leaf's files
        # are never opened for write, let alone rewritten
        for p in dirty:
            leaf = f"{part_col}={p}"
            shutil.rmtree(os.path.join(src, leaf), ignore_errors=True)
            new_leaf = os.path.join(tmp, leaf)
            if os.path.isdir(new_leaf):
                os.rename(new_leaf, os.path.join(src, leaf))
        shutil.rmtree(tmp, ignore_errors=True)
    # consume only the DIRTY leaves' tombstones — the clean leaves' dead
    # rows are still on disk and serving still needs their mask
    keep_tomb = dead_full.filter(~F.col(part_col).cast("long").isin(dirty))
    tmp = tomb_dir + ".rewriting"
    shutil.rmtree(tmp, ignore_errors=True)
    keep_tomb.coalesce(1).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(tomb_dir)
    os.rename(tmp, tomb_dir)
    return reclaimed, dirty
