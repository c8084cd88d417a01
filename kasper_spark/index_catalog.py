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
    table (the tombstone side broadcasts — it is the accumulated delete
    set, small relative to the corpus by the time a reclaim is
    scheduled). Returns the kept-row count of the FIRST table (the
    index's primary membership table, for the caller's marker refresh).

    MUST run inside guarded_maintenance: the per-table directory swap is
    not atomic across tables, and the marker guard is what makes a crash
    mid-reclaim visible instead of serving lists and codes from
    different generations. Production gates this on a per-partition
    tombstone fraction and rewrites only dirty leaves — the plumbing is
    identical, the predicate is the caller's."""
    import shutil

    from pyspark.sql import functions as F

    tomb_dir = os.path.join(idx, tombstones)
    if not glob.glob(os.path.join(tomb_dir, "*.parquet")):
        return -1
    dead = spark.read.parquet(tomb_dir).select(key_col)
    n_first = -1
    for t, pcols in tables.items():
        src = os.path.join(idx, t)
        kept = spark.read.parquet(src).join(
            F.broadcast(dead), key_col, "left_anti"
        )
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
            n_first = spark.read.parquet(tmp).count()
        shutil.rmtree(src)
        os.rename(tmp, src)
    for f in glob.glob(os.path.join(tomb_dir, "*.parquet")):
        os.remove(f)
    return n_first
