"""Store contract tests — mirrors the reference's store test strategy
(SURVEY.md §5: map_test.go contract suite + shared testMultiStore), plus
the DataFrame bridges. Redis/ES variants run only when their clients and
services exist (import-gated, like kasper's KASPER_CI_HOST gating)."""

from __future__ import annotations

import json

import pytest

from kasper_spark.stores import (
    MapStore,
    MultiMapStore,
    TenantKey,
    foreach_batch_writer,
    store_to_df,
)
from kasper_spark.stores.bridge import multi_foreach_batch_writer


def store_contract(store):
    """The Store contract from /root/reference/map_test.go:25-114 (shape,
    not code): miss -> None, put/get/overwrite/delete idempotence, bulk
    get omits missing, bulk put upserts."""
    assert store.get("missing") is None
    store.put("a", b"1")
    assert store.get("a") == b"1"
    store.put("a", b"2")  # overwrite
    assert store.get("a") == b"2"
    store.put_all({"b": b"3", "c": b"4"})
    assert store.get_all(["a", "b", "c", "zz"]) == {"a": b"2", "b": b"3", "c": b"4"}
    store.delete("b")
    store.delete("b")  # idempotent
    assert store.get("b") is None
    store.flush()
    assert store.get("c") == b"4"


def multi_store_contract(ms):
    """Shared multitenant contract (/root/reference/multi_map_test.go:14-63
    semantics): tenant isolation, lazy creation, bulk fetch/push across
    tenants."""
    t1 = ms.tenant("marvel")
    t2 = ms.tenant("dc")
    t1.put("hero", b'{"name":"x"}')
    assert t2.get("hero") is None  # isolation
    assert ms.all_tenants() == ["dc", "marvel"]
    ms.push(
        {
            TenantKey("marvel", "h2"): b'{"name":"y"}',
            TenantKey("dc", "h3"): b'{"name":"z"}',
        }
    )
    got = ms.fetch(
        [TenantKey("marvel", "h2"), TenantKey("dc", "h3"), TenantKey("dc", "nope")]
    )
    assert got == {
        TenantKey("marvel", "h2"): b'{"name":"y"}',
        TenantKey("dc", "h3"): b'{"name":"z"}',
    }


def test_map_store_contract():
    store_contract(MapStore())


def test_multi_map_store_contract():
    multi_store_contract(MultiMapStore())


def test_redis_store_if_available():
    try:
        from kasper_spark.stores.redis_es import RedisStore

        store = RedisStore()
        store.get("ping")
    except Exception:
        pytest.skip("redis unavailable")
    store_contract(store)


def test_es_store_if_available():
    try:
        from kasper_spark.stores.redis_es import ElasticsearchStore

        store = ElasticsearchStore()
        store.get("ping")
    except Exception:
        pytest.skip("elasticsearch unavailable")
    store_contract(store)


def test_store_to_df_roundtrip(spark):
    store = MapStore()
    store.put_all({"k1": b"v1", "k2": b"v2"})
    df = store_to_df(spark, store)
    rows = {r["key"]: bytes(r["value"]) for r in df.collect()}
    assert rows == {"k1": b"v1", "k2": b"v2"}


def test_foreach_batch_writer(spark):
    store = MapStore()
    df = spark.createDataFrame([("a", "1"), ("b", "2")], "key string, value string")
    foreach_batch_writer(store)(df, 0)
    assert store.as_dict() == {"a": b"1", "b": b"2"}


def test_multi_foreach_batch_writer(spark):
    ms = MultiMapStore()
    df = spark.createDataFrame(
        [("t1", "a", "1"), ("t2", "b", "2")], "tenant string, key string, value string"
    )
    multi_foreach_batch_writer(ms)(df, 0)
    assert ms.tenant("t1").get("a") == b"1"
    assert ms.tenant("t2").get("b") == b"2"


def test_enrichment_join_via_store(spark):
    """B8: the per-record store Get becomes a broadcast hash join."""
    from pyspark.sql import functions as F

    store = MapStore()
    store.put_all({"w1": b"cat-a", "w2": b"cat-b"})
    dim = store_to_df(spark, store, value_decoder=lambda b: b.decode())
    facts = spark.createDataFrame([("w1", 10), ("w2", 5), ("w3", 1)], "key string, n int")
    out = facts.join(F.broadcast(dim), "key", "left").collect()
    got = {r["key"]: r["value"] for r in out}
    assert got == {"w1": "cat-a", "w2": "cat-b", "w3": None}
