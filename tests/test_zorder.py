"""Z-order layout: prove the multi-dimensional file-pruning claim with
parquet footer stats (the same min/max stats a 100 TB reader prunes on).

`zorder_key_events` itself is certified by the oracle-parity sweep; this
file tests the LAYOUT consequence: a Z-clustered write keeps per-file
min/max ranges tight on BOTH dimensions, while a single-column sort is
tight on one and spans the full domain on the other.
"""

from __future__ import annotations

import glob
import os
import tempfile

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from kasper_spark.catalog import load_table
from kasper_spark.operators.io_formats import write_zorder_layout
from tests.conftest import SF_SMOKE


def _file_stats(path: str, cols: tuple[str, str]) -> list[dict]:
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        mins: dict = {c: None for c in cols}
        maxs: dict = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            for c in cols:
                st = md.row_group(rg).column(names.index(c)).statistics
                assert st is not None and st.has_min_max
                mins[c] = st.min if mins[c] is None else min(mins[c], st.min)
                maxs[c] = st.max if maxs[c] is None else max(maxs[c], st.max)
        out.append({c: (mins[c], maxs[c]) for c in cols})
    return out


def _files_hit(stats: list[dict], col: str, lo, hi) -> int:
    return sum(1 for s in stats if not (s[col][1] < lo or s[col][0] > hi))


@pytest.fixture(scope="module")
def layouts(spark):
    events = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "value"
    )
    wd = tempfile.mkdtemp(prefix="kasper-zorder-")
    zpath = os.path.join(wd, "z")
    upath = os.path.join(wd, "u")
    write_zorder_layout(events, ("user_id", "value"), zpath, rows_per_file=100)
    (
        events.coalesce(1)
        .sortWithinPartitions("user_id")
        .write.option("maxRecordsPerFile", 100)
        .mode("overwrite")
        .parquet(upath)
    )
    cols = ("user_id", "value")
    return _file_stats(zpath, cols), _file_stats(upath, cols)


def test_zorder_prunes_both_dimensions(layouts):
    zstats, ustats = layouts
    n = len(zstats)
    assert n >= 8 and len(ustats) == n  # 1000 rows / 100-row files

    # 20%-wide boxes in the middle of each domain (sf0.001 events:
    # user_id 0..14, value ~0..328)
    user_box = (3, 5)
    value_box = (120.0, 185.0)

    # single-column sort: tight on its own column...
    assert _files_hit(ustats, "user_id", *user_box) <= max(2, n // 3)
    # ...but every file spans ~the full value range -> zero pruning
    assert _files_hit(ustats, "value", *value_box) == n

    # z-order: real pruning on BOTH dimensions
    z_user = _files_hit(zstats, "user_id", *user_box)
    z_value = _files_hit(zstats, "value", *value_box)
    assert z_user <= (2 * n) // 3, (z_user, n)
    assert z_value <= (2 * n) // 3, (z_value, n)
