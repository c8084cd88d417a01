"""Store / MultiStore connector tier (SURVEY.md §2.A A13-A21).

The reference's processing state lives in a pluggable KV store
(string key -> bytes value) with in-memory, Redis and Elasticsearch
implementations (/root/reference/store.go:16-44). In this engine, Spark's
own state store covers *internal* operator state; this package provides the
kasper-compatible surface for apps that want explicit external
materialization:

- Store / MultiStore: the exact interface shape (get/get_all/put/put_all/
  delete/flush; tenant routing + bulk fetch/push)
- MapStore / MultiMapStore: in-memory implementations (A21)
- RedisStore / ElasticsearchStore: gated behind import-try (clients absent
  in this container) — same contract, same tenancy mapping
- DataFrame bridges: store_to_df (enrichment joins — B8) and
  foreach_batch_writer (bulk upsert per micro-batch — A15/A20)
"""

from kasper_spark.stores.base import Store, MultiStore, TenantKey
from kasper_spark.stores.memory import MapStore, MultiMapStore
from kasper_spark.stores.bridge import store_to_df, foreach_batch_writer

__all__ = [
    "Store",
    "MultiStore",
    "TenantKey",
    "MapStore",
    "MultiMapStore",
    "store_to_df",
    "foreach_batch_writer",
]
