"""DataFrame <-> Store bridges.

- store_to_df: materialize a Store (or tenant slice of a MultiStore) as a
  DataFrame for enrichment joins (B8). Small stores should be broadcast at
  join time; the reference's per-record Get
  (/root/reference/examples/word_count_example.go:35) becomes one hash join
  instead of N network RTTs.
- foreach_batch_writer: bulk-upsert each micro-batch into a Store — the
  engine-side analog of PutAll/Push flushes
  (/root/reference/topic_processor.go:249-257 order: write, then the
  checkpoint commits offsets). The store write happens on the DRIVER after
  collecting the (small, aggregated) batch output; high-volume sinks should
  use a distributed writer instead (documented limitation).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from kasper_spark.stores.base import MultiStore, Store, TenantKey


def store_to_df(
    spark: SparkSession, store: Store, value_decoder: Callable[[bytes], str] = None
) -> DataFrame:
    """Snapshot a Store as (key string, value binary|string) rows."""
    items = []
    if hasattr(store, "as_dict"):
        data = store.as_dict()
    else:
        raise ValueError("store_to_df requires a snapshot-capable store")
    for k, v in data.items():
        items.append((k, value_decoder(v) if value_decoder else bytes(v)))
    schema = "key string, value " + ("string" if value_decoder else "binary")
    return spark.createDataFrame(items, schema)


def foreach_batch_writer(
    store: Store,
    key_col: str = "key",
    value_col: str = "value",
    encoder: Callable[[object], bytes] = None,
):
    """Build a foreachBatch function bulk-upserting rows into a Store."""
    enc = encoder or (lambda v: v if isinstance(v, (bytes, bytearray)) else str(v).encode())

    def write(df: DataFrame, epoch_id: int) -> None:
        rows = df.select(key_col, value_col).collect()
        store.put_all({r[key_col]: enc(r[value_col]) for r in rows})
        store.flush()

    return write


def multi_foreach_batch_writer(
    store: MultiStore,
    tenant_col: str = "tenant",
    key_col: str = "key",
    value_col: str = "value",
    encoder: Callable[[object], bytes] = None,
):
    """foreachBatch function pushing (tenant, key, value) rows in one bulk
    Push across tenants (A20)."""
    enc = encoder or (lambda v: v if isinstance(v, (bytes, bytearray)) else str(v).encode())

    def write(df: DataFrame, epoch_id: int) -> None:
        rows = df.select(tenant_col, key_col, value_col).collect()
        store.push(
            {TenantKey(r[tenant_col], r[key_col]): enc(r[value_col]) for r in rows}
        )

    return write
