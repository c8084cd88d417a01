"""Store contract tests — mirrors the reference's store test strategy
(SURVEY.md §5: map_test.go contract suite + shared testMultiStore), plus
the DataFrame bridges. Redis/ES variants run only when their clients and
services exist (import-gated, like kasper's KASPER_CI_HOST gating)."""

from __future__ import annotations

import json
import os

import pytest

from kasper_spark.stores import (
    MapStore,
    MultiMapStore,
    TenantKey,
    foreach_batch_writer,
    store_to_df,
)
from kasper_spark.stores.bridge import multi_foreach_batch_writer


def store_contract(store, enc=None, canon=None):
    """The Store contract from /root/reference/map_test.go:25-114 (shape,
    not code): miss -> None, put/get/overwrite/delete idempotence, bulk
    get omits missing, bulk put upserts.

    `enc` maps a scalar payload to the store's value bytes (ES requires
    JSON documents — /root/reference/elasticsearch.go:115-118); `canon`
    canonicalizes values read back for comparison (ES round-trips JSON
    content, not byte-identical serialization)."""
    enc = enc or (lambda s: s.encode())
    canon = canon or (lambda b: b)
    assert store.get("missing") is None
    store.put("a", enc("1"))
    assert canon(store.get("a")) == canon(enc("1"))
    store.put("a", enc("2"))  # overwrite
    assert canon(store.get("a")) == canon(enc("2"))
    store.put_all({"b": enc("3"), "c": enc("4")})
    got = {k: canon(v) for k, v in store.get_all(["a", "b", "c", "zz"]).items()}
    assert got == {"a": canon(enc("2")), "b": canon(enc("3")), "c": canon(enc("4"))}
    store.delete("b")
    store.delete("b")  # idempotent
    assert store.get("b") is None
    store.flush()
    assert canon(store.get("c")) == canon(enc("4"))


def multi_store_contract(ms, canon=None):
    """Shared multitenant contract (/root/reference/multi_map_test.go:14-63
    semantics): tenant isolation, lazy creation, bulk fetch/push across
    tenants."""
    canon = canon or (lambda b: b)
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
    assert {tk: canon(v) for tk, v in got.items()} == {
        TenantKey("marvel", "h2"): canon(b'{"name":"y"}'),
        TenantKey("dc", "h3"): canon(b'{"name":"z"}'),
    }


def test_map_store_contract():
    store_contract(MapStore())


def test_multi_map_store_contract():
    multi_store_contract(MultiMapStore())


# --- Redis / ES: live service when reachable, dict-backed fake otherwise --
# Either way the RedisStore/ElasticsearchStore code paths (prefixing, mget
# positional semantics, bulk op shaping, NotFound handling) EXECUTE; the
# fakes (tests/fake_stores.py) reproduce exactly the client surface used.


def _redis_store(prefix=""):
    from kasper_spark.stores.redis_es import RedisStore

    try:
        store = RedisStore(prefix=prefix)
        store.get("ping")
        return store
    except Exception:
        from tests.fake_stores import FakeRedis

        return RedisStore._from_client(FakeRedis(), prefix)


def _es_store(index="kasper"):
    from kasper_spark.stores.redis_es import ElasticsearchStore

    try:
        store = ElasticsearchStore(index=index)
        store.get("ping")
        return store
    except Exception:
        from tests.fake_stores import FakeElasticsearch

        return ElasticsearchStore._from_client(FakeElasticsearch(), index)


def _json_enc(s):
    return json.dumps({"v": s}).encode()


def test_redis_store_contract():
    store_contract(_redis_store())


def test_multi_redis_store_contract():
    from kasper_spark.stores.redis_es import MultiRedisStore

    try:
        ms = MultiRedisStore()
        ms._client.get("ping")
    except Exception:
        from tests.fake_stores import FakeRedis

        ms = MultiRedisStore._from_client(FakeRedis())
    multi_store_contract(ms)


def test_es_store_contract():
    # ES values must be JSON documents; reads round-trip JSON content
    store_contract(_es_store(), enc=_json_enc, canon=json.loads)


def test_multi_es_store_contract():
    from kasper_spark.stores.redis_es import MultiElasticsearchStore

    try:
        ms = MultiElasticsearchStore()
        ms._c.info()
    except Exception:
        from tests.fake_stores import FakeElasticsearch

        ms = MultiElasticsearchStore._from_client(FakeElasticsearch())
    multi_store_contract(ms, canon=json.loads)


def test_es_bulk_error_reasons_capped_at_five():
    """_bulk_index surfaces per-item failures but caps the reported reasons
    at the first 5 (/root/reference/elasticsearch.go:199-215 reports a
    bounded sample the same way) — 8 failing docs must raise ONE error
    naming exactly 5 reasons."""
    store = _es_store(index="kasper-bulkcap")
    store.put("seed", b'{"color": "2009-11-15T14:12:12"}')
    try:
        with pytest.raises(RuntimeError, match="bulk write failed") as ei:
            store.put_all(
                {f"bad{i}": b'{"color": "not-a-date"}' for i in range(8)}
            )
        assert str(ei.value).count("mapper_parsing_exception") == 5
    finally:
        try:
            store._c.indices.delete(index=store._index)
        except Exception:
            pass


def test_store_to_df_roundtrip(spark):
    store = MapStore()
    store.put_all({"k1": b"v1", "k2": b"v2"})
    df = store_to_df(spark, store)
    rows = {r["key"]: bytes(r["value"]) for r in df.collect()}
    assert rows == {"k1": b"v1", "k2": b"v2"}


def test_foreach_batch_writer(spark):
    store = MapStore()
    df = spark.createDataFrame([("a", "1"), ("b", "2")], "key string, value string")
    foreach_batch_writer(store, small_output=True)(df, 0)
    assert store.as_dict() == {"a": b"1", "b": b"2"}


def test_multi_foreach_batch_writer(spark):
    ms = MultiMapStore()
    df = spark.createDataFrame(
        [("t1", "a", "1"), ("t2", "b", "2")], "tenant string, key string, value string"
    )
    multi_foreach_batch_writer(ms, small_output=True)(df, 0)
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


def test_partitioned_store_writer_no_collect(spark, tmp_path):
    """Scale path: store_factory builds a per-partition client ON THE
    EXECUTOR and writes pipelined put_all batches — nothing is collected
    to the driver. Proven by recording writer PIDs: every write must come
    from a Python worker process, never the driver."""
    from kasper_spark.stores.base import Store

    target = str(tmp_path / "kv")
    os.makedirs(target)

    class FileStore(Store):
        """Shared-filesystem KV store: one file per key (hex-encoded),
        plus a PID marker per put_all so the test can see who wrote."""

        def __init__(self, root):
            self.root = root

        def get(self, key):
            p = os.path.join(self.root, key.encode().hex())
            if not os.path.exists(p):
                return None
            with open(p, "rb") as f:
                return f.read()

        def get_all(self, keys):
            out = {}
            for k in keys:
                v = self.get(k)
                if v is not None:
                    out[k] = v
            return out

        def put(self, key, value):
            with open(os.path.join(self.root, key.encode().hex()), "wb") as f:
                f.write(value)

        def put_all(self, kvs):
            for k, v in kvs.items():
                self.put(k, v)
            open(os.path.join(self.root, f"_pid_{os.getpid()}"), "w").close()

        def delete(self, key):
            p = os.path.join(self.root, key.encode().hex())
            if os.path.exists(p):
                os.remove(p)

        def flush(self):
            pass

    df = spark.range(0, 200, 1, 4).selectExpr(
        "concat('k', id) AS key", "cast(id AS string) AS value"
    )
    writer = foreach_batch_writer(
        store_factory=lambda: FileStore(target), batch_size=32
    )
    writer(df, 0)

    back = FileStore(target)
    assert back.get("k0") == b"0"
    assert back.get("k199") == b"199"
    keys = [f for f in os.listdir(target) if not f.startswith("_pid_")]
    assert len(keys) == 200
    writer_pids = {
        int(f.split("_pid_")[1]) for f in os.listdir(target) if f.startswith("_pid_")
    }
    assert writer_pids, "no writes recorded"
    assert os.getpid() not in writer_pids, "store write happened on the driver"


def test_partitioned_multi_store_writer_no_collect(spark, tmp_path):
    """Scale path for MultiStore: per-partition push batches, tenant ->
    subdirectory, written by executor workers only."""
    from kasper_spark.stores.base import MultiStore

    target = str(tmp_path / "mt")
    os.makedirs(target)

    class FileMultiStore(MultiStore):
        def __init__(self, root):
            self.root = root

        def tenant(self, tenant):
            raise NotImplementedError("write-only test store")

        def all_tenants(self):
            return sorted(os.listdir(self.root))

        def fetch(self, keys):
            out = {}
            for tk in keys:
                p = os.path.join(self.root, tk.tenant, tk.key.encode().hex())
                if os.path.exists(p):
                    with open(p, "rb") as f:
                        out[tk] = f.read()
            return out

        def push(self, entries):
            for tk, v in entries.items():
                d = os.path.join(self.root, tk.tenant)
                os.makedirs(d, exist_ok=True)
                with open(os.path.join(d, tk.key.encode().hex()), "wb") as f:
                    f.write(v)
            open(os.path.join(self.root, f"_pid_{os.getpid()}"), "w").close()

    df = spark.range(0, 100, 1, 4).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 'acme' ELSE 'globex' END AS tenant",
        "concat('k', id) AS key",
        "cast(id AS string) AS value",
    )
    writer = multi_foreach_batch_writer(
        store_factory=lambda: FileMultiStore(target), batch_size=16
    )
    writer(df, 0)

    back = FileMultiStore(target)
    got = back.fetch([TenantKey("acme", "k0"), TenantKey("globex", "k1")])
    assert got[TenantKey("acme", "k0")] == b"0"
    assert got[TenantKey("globex", "k1")] == b"1"
    assert set(back.all_tenants()) - {"acme", "globex"} == {
        f for f in os.listdir(target) if f.startswith("_pid_")
    }
    writer_pids = {
        int(f.split("_pid_")[1]) for f in os.listdir(target) if f.startswith("_pid_")
    }
    assert writer_pids and os.getpid() not in writer_pids


def test_store_writer_requires_explicit_small_output():
    """Driver-side collect is opt-in only: a bare store instance without
    small_output=True must be rejected with guidance to the scale path."""
    store = MapStore()
    with pytest.raises(ValueError, match="small_output=True"):
        foreach_batch_writer(store)
    with pytest.raises(ValueError, match="small_output=True"):
        multi_foreach_batch_writer(MultiMapStore())
    with pytest.raises(ValueError, match="exactly one"):
        foreach_batch_writer()
    with pytest.raises(ValueError, match="exactly one"):
        foreach_batch_writer(store, store_factory=lambda: MapStore())


def test_es_schema_inference_rejects_non_date():
    """Dynamic-mapping failure-mode parity
    (/root/reference/elasticsearch_test.go:43-49 single put, :121-137 bulk):
    the first write makes ES infer `color` as a date field; a later write
    with a non-date string must surface an error — as the client's 400 on a
    single put, and as a RuntimeError from _bulk_index's per-item error
    scan on a bulk put. Uses a throwaway index so inference state is
    isolated; runs against live ES when reachable, the inference-faithful
    fake otherwise."""
    import uuid as _uuid

    store = _es_store(index=f"kasper-dyn-{_uuid.uuid4().hex[:8]}")
    try:
        # trick dynamic mapping into typing `color` as date...
        store.put(
            "vorgansharax",
            b'{"color": "2009-11-15T14:12:12", "name": "Vorgansharax"}',
        )
        # ...then a plain string must be rejected, not silently coerced
        with pytest.raises(Exception):
            store.put("vorgansharax", b'{"color": "", "name": "Vorgansharax"}')
        with pytest.raises(RuntimeError, match="bulk write failed"):
            store.put_all(
                {
                    f"vorgansharax{i}": b'{"color": "", "name": "Vorgansharax"}'
                    for i in range(1, 8)
                }
            )
    finally:
        try:
            store._c.indices.delete(index=store._index)
        except Exception:
            pass
