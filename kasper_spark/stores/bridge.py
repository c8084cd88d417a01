"""DataFrame <-> Store bridges.

- store_to_df: materialize a Store (or tenant slice of a MultiStore) as a
  DataFrame for enrichment joins (B8). Small stores should be broadcast at
  join time; the reference's per-record Get
  (/root/reference/examples/word_count_example.go:35) becomes one hash join
  instead of N network RTTs.
- foreach_batch_writer / multi_foreach_batch_writer: bulk-upsert each
  micro-batch into a Store — the engine-side analog of PutAll/Push flushes
  (/root/reference/topic_processor.go:249-257 order: write, then the
  checkpoint commits offsets). Two modes:

  * scale path (default): pass ``store_factory`` — a picklable zero-arg
    callable constructing the Store ON THE EXECUTOR. Each partition opens
    its own client and writes pipelined ``put_all``/``push`` batches of
    ``batch_size`` entries (mirroring the reference's MULTI/EXEC and _bulk
    batching, /root/reference/redis.go:121-136,
    /root/reference/elasticsearch.go:136-159). Nothing is collected to the
    driver, so the writer scales with the cluster.
  * driver path: pass a ``store`` instance AND ``small_output=True``. The
    batch is collected to the driver and written in one bulk call. Only for
    tiny aggregated outputs (e.g. a running-count table with a few hundred
    keys); anything high-volume must use the factory path.
"""

from __future__ import annotations

from typing import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

from kasper_spark.stores.base import MultiStore, Store, TenantKey

_SCALE_HINT = (
    "high-volume sinks must use the executor-side path: pass "
    "store_factory=<picklable zero-arg callable returning a {kind}> "
    "(a per-partition client is created on the executor and writes are "
    "pipelined in batches). For tiny aggregated outputs you may instead "
    "pass {arg}=<instance> together with small_output=True to collect the "
    "batch to the driver."
)


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


def _default_encoder(v: object) -> bytes:
    return v if isinstance(v, (bytes, bytearray)) else str(v).encode()


def foreach_batch_writer(
    store: Store | None = None,
    key_col: str = "key",
    value_col: str = "value",
    encoder: Callable[[object], bytes] = None,
    *,
    store_factory: Callable[[], Store] | None = None,
    small_output: bool = False,
    batch_size: int = 1000,
):
    """Build a foreachBatch function bulk-upserting rows into a Store.

    See module docstring for the two modes. Exactly one of ``store`` (with
    ``small_output=True``) or ``store_factory`` must be provided.
    """
    enc = encoder or _default_encoder
    if (store is None) == (store_factory is None):
        raise ValueError("pass exactly one of store= or store_factory=")
    if store is not None and not small_output:
        raise ValueError(
            "driver-side store writes require small_output=True; "
            + _SCALE_HINT.format(kind="Store", arg="store")
        )

    if store_factory is not None:

        def write(df: DataFrame, epoch_id: int) -> None:
            def write_partition(rows: Iterator) -> None:
                part_store = store_factory()
                buf: dict[str, bytes] = {}
                for r in rows:
                    buf[r[key_col]] = enc(r[value_col])
                    if len(buf) >= batch_size:
                        part_store.put_all(buf)
                        buf = {}
                if buf:
                    part_store.put_all(buf)
                part_store.flush()

            df.select(key_col, value_col).foreachPartition(write_partition)

        return write

    def write(df: DataFrame, epoch_id: int) -> None:
        rows = df.select(key_col, value_col).collect()
        store.put_all({r[key_col]: enc(r[value_col]) for r in rows})
        store.flush()

    return write


def multi_foreach_batch_writer(
    store: MultiStore | None = None,
    tenant_col: str = "tenant",
    key_col: str = "key",
    value_col: str = "value",
    encoder: Callable[[object], bytes] = None,
    *,
    store_factory: Callable[[], MultiStore] | None = None,
    small_output: bool = False,
    batch_size: int = 1000,
):
    """foreachBatch function pushing (tenant, key, value) rows in bulk
    Push calls across tenants (A20). Same two modes as
    foreach_batch_writer; the executor path pushes pipelined batches per
    partition (the ES MultiStore pre-creates indices per distinct tenant in
    each push, mirroring /root/reference/multi_elasticsearch.go:133-167)."""
    enc = encoder or _default_encoder
    if (store is None) == (store_factory is None):
        raise ValueError("pass exactly one of store= or store_factory=")
    if store is not None and not small_output:
        raise ValueError(
            "driver-side store writes require small_output=True; "
            + _SCALE_HINT.format(kind="MultiStore", arg="store")
        )

    if store_factory is not None:

        def write(df: DataFrame, epoch_id: int) -> None:
            def write_partition(rows: Iterator) -> None:
                part_store = store_factory()
                buf: dict[TenantKey, bytes] = {}
                for r in rows:
                    buf[TenantKey(r[tenant_col], r[key_col])] = enc(r[value_col])
                    if len(buf) >= batch_size:
                        part_store.push(buf)
                        buf = {}
                if buf:
                    part_store.push(buf)

            df.select(tenant_col, key_col, value_col).foreachPartition(write_partition)

        return write

    def write(df: DataFrame, epoch_id: int) -> None:
        rows = df.select(tenant_col, key_col, value_col).collect()
        store.push(
            {TenantKey(r[tenant_col], r[key_col]): enc(r[value_col]) for r in rows}
        )

    return write
