"""Redis / Elasticsearch Store implementations — import-gated (neither
client library ships in this container; the default constructors raise a
clear error when the dependency is missing). Every class also exposes a
`_from_client` seam taking an already-built client, which is how (a) the
multitenant routers share one connection across tenant handles and (b) the
contract tests execute these code paths against dict-backed fake clients
(tests/fake_stores.py) when the real services are absent — the
pipelining/mget/bulk/error-shaping logic below runs either way.

Parity notes (semantics mirrored, not code):
- RedisStore: key namespacing under a prefix; batch ops pipelined in one
  round trip (/root/reference/redis.go:54-136 uses MULTI/EXEC); SAVE on
  flush (/root/reference/redis.go:150-155).
- MultiRedisStore tenancy mapping: "{tenant}/{prefix}/{key}"
  (/root/reference/multi_redis.go:44-104).
- ElasticsearchStore: one (index, type) per store; values must be JSON
  documents (/root/reference/elasticsearch.go:115-118); bulk ops via
  _mget/_bulk with per-item error surfacing
  (/root/reference/elasticsearch.go:86-159, 199-215); delete swallows 404
  (/root/reference/elasticsearch.go:165-179); _flush on flush.
- MultiElasticsearchStore: tenancy -> (index, type) via a user-provided
  mapping, indices pre-created on push
  (/root/reference/multi_elasticsearch.go:31-167).

At 100 TB these stores are *sinks/sources at the edge* (foreachBatch bulk
writes, scan-based reads), never per-row RTTs inside operators.
"""

from __future__ import annotations

import json

from kasper_spark.stores.base import MultiStore, Store, TenantKey

try:  # pragma: no cover - absent in this container
    import redis as _redis
except ImportError:  # pragma: no cover
    _redis = None

try:  # pragma: no cover
    import elasticsearch as _es
except ImportError:  # pragma: no cover
    _es = None

if _es is not None:  # pragma: no cover - real client present
    ES_NOT_FOUND: type[Exception] = _es.exceptions.NotFoundError
else:

    class ES_NOT_FOUND(Exception):  # noqa: N801 - exception alias
        """Stands in for elasticsearch.NotFoundError when the client
        library is absent; fake clients raise THIS class so the
        except-NotFound paths below execute identically either way."""


class RedisStore(Store):
    """Redis-backed Store; all batch ops are a single pipeline round trip."""

    def __init__(self, url: str = "redis://localhost:6379", prefix: str = ""):
        if _redis is None:
            raise ImportError("redis client not installed; RedisStore unavailable")
        self._r = _redis.Redis.from_url(url)
        self._prefix = prefix

    @classmethod
    def _from_client(cls, client, prefix: str = "") -> "RedisStore":
        """Build a store over an existing client connection (shared by
        MultiRedisStore tenant handles; also the fake-client test seam)."""
        store = cls.__new__(cls)
        store._r = client
        store._prefix = prefix
        return store

    def _k(self, key: str) -> str:
        return f"{self._prefix}/{key}" if self._prefix else key

    def get(self, key: str) -> bytes | None:
        return self._r.get(self._k(key))

    def get_all(self, keys: list[str]) -> dict[str, bytes]:
        if not keys:
            return {}
        vals = self._r.mget([self._k(k) for k in keys])
        return {k: v for k, v in zip(keys, vals) if v is not None}

    def put(self, key: str, value: bytes) -> None:
        self._r.set(self._k(key), value)

    def put_all(self, kvs: dict[str, bytes]) -> None:
        if kvs:
            self._r.mset({self._k(k): v for k, v in kvs.items()})

    def delete(self, key: str) -> None:
        self._r.delete(self._k(key))

    def flush(self) -> None:
        self._r.save()


class MultiRedisStore(MultiStore):
    """Tenant routing via key prefixes '{tenant}/{prefix}/{key}'."""

    def __init__(self, url: str = "redis://localhost:6379", prefix: str = "store"):
        if _redis is None:
            raise ImportError("redis client not installed; MultiRedisStore unavailable")
        self._client = _redis.Redis.from_url(url)
        self._prefix = prefix
        self._stores: dict[str, RedisStore] = {}

    @classmethod
    def _from_client(cls, client, prefix: str = "store") -> "MultiRedisStore":
        ms = cls.__new__(cls)
        ms._client = client
        ms._prefix = prefix
        ms._stores = {}
        return ms

    def tenant(self, tenant: str) -> RedisStore:
        # all tenant handles share ONE client/connection pool (the
        # reference's MultiRedis shares one redis.Client the same way)
        if tenant not in self._stores:
            self._stores[tenant] = RedisStore._from_client(
                self._client, f"{tenant}/{self._prefix}"
            )
        return self._stores[tenant]

    def all_tenants(self) -> list[str]:
        return sorted(self._stores)

    def fetch(self, keys: list[TenantKey]) -> dict[TenantKey, bytes]:
        if not keys:
            return {}
        raw = self._client.mget(
            [f"{tk.tenant}/{self._prefix}/{tk.key}" for tk in keys]
        )
        return {tk: v for tk, v in zip(keys, raw) if v is not None}

    def push(self, entries: dict[TenantKey, bytes]) -> None:
        if not entries:
            return
        self._client.mset(
            {f"{tk.tenant}/{self._prefix}/{tk.key}": v for tk, v in entries.items()}
        )


def _bulk_index(client, ops) -> None:
    """One _bulk call; surface the first few per-item errors
    (/root/reference/elasticsearch.go:199-215)."""
    resp = client.bulk(operations=ops)
    if resp.get("errors"):
        reasons = [
            i["index"].get("error", {}).get("reason", "?")
            for i in resp["items"]
            if i.get("index", {}).get("error")
        ][:5]
        raise RuntimeError(f"bulk write failed: {reasons}")


class ElasticsearchStore(Store):
    """ES-backed Store: one index per store, values are JSON docs."""

    def __init__(self, hosts: list[str] | None = None, index: str = "kasper"):
        if _es is None:
            raise ImportError(
                "elasticsearch client not installed; ElasticsearchStore unavailable"
            )
        self._c = _es.Elasticsearch(hosts or ["http://localhost:9200"])
        self._index = index

    @classmethod
    def _from_client(cls, client, index: str) -> "ElasticsearchStore":
        """Build a store sharing an existing client connection (used by the
        multitenant router so every tenant handle reuses one client)."""
        store = cls.__new__(cls)
        store._c = client
        store._index = index
        return store

    def get(self, key: str) -> bytes | None:
        # Only a missing doc (404) maps to None; connectivity/auth/cluster
        # errors propagate (the reference surfaces everything but NotFound).
        try:
            doc = self._c.get(index=self._index, id=key)
        except ES_NOT_FOUND:
            return None
        return json.dumps(doc["_source"]).encode()

    def get_all(self, keys: list[str]) -> dict[str, bytes]:
        if not keys:
            return {}
        res = self._c.mget(index=self._index, ids=keys)
        return {
            d["_id"]: json.dumps(d["_source"]).encode()
            for d in res["docs"]
            if d.get("found")
        }

    def put(self, key: str, value: bytes) -> None:
        # values must be JSON documents (elasticsearch.go:115-118)
        self._c.index(index=self._index, id=key, document=json.loads(value))

    def put_all(self, kvs: dict[str, bytes]) -> None:
        if not kvs:
            return
        ops = []
        for k, v in kvs.items():
            ops.append({"index": {"_index": self._index, "_id": k}})
            ops.append(json.loads(v))
        _bulk_index(self._c, ops)

    def delete(self, key: str) -> None:
        try:
            self._c.delete(index=self._index, id=key)
        except ES_NOT_FOUND:
            pass  # delete of a missing key is a no-op (elasticsearch.go:165-179)

    def flush(self) -> None:
        self._c.indices.flush(index=self._index)


class MultiElasticsearchStore(MultiStore):
    """Multitenant ES store: tenant -> index via a user-supplied tenancy
    mapping, mirroring ElasticsearchTenancy
    (/root/reference/multi_elasticsearch.go:31-41: the app decides how a
    tenant maps onto (index, type); ES 8 has no mapping types, so the
    mapping target is just the index name). Bulk fetch is ONE _mget
    spanning per-tenant indices (/root/reference/multi_elasticsearch.go:
    93-129); push pre-creates missing indices then issues one _bulk
    (/root/reference/multi_elasticsearch.go:133-167)."""

    def __init__(
        self,
        hosts: list[str] | None = None,
        index_for_tenant=lambda tenant: f"kasper_{tenant}",
    ):
        if _es is None:
            raise ImportError(
                "elasticsearch client not installed; MultiElasticsearchStore unavailable"
            )
        self._c = _es.Elasticsearch(hosts or ["http://localhost:9200"])
        self._index_for = index_for_tenant
        self._tenants: dict[str, ElasticsearchStore] = {}

    @classmethod
    def _from_client(
        cls, client, index_for_tenant=lambda tenant: f"kasper_{tenant}"
    ) -> "MultiElasticsearchStore":
        ms = cls.__new__(cls)
        ms._c = client
        ms._index_for = index_for_tenant
        ms._tenants = {}
        return ms

    def tenant(self, tenant: str) -> ElasticsearchStore:
        # lazily create + cache per-tenant handles
        # (/root/reference/multi_elasticsearch.go:70-78)
        if tenant not in self._tenants:
            self._tenants[tenant] = ElasticsearchStore._from_client(
                self._c, self._index_for(tenant)
            )
        return self._tenants[tenant]

    def all_tenants(self) -> list[str]:
        return sorted(self._tenants)

    def fetch(self, keys: list[TenantKey]) -> dict[TenantKey, bytes]:
        if not keys:
            return {}
        docs = [
            {"_index": self._index_for(tk.tenant), "_id": tk.key} for tk in keys
        ]
        res = self._c.mget(docs=docs)
        out: dict[TenantKey, bytes] = {}
        for tk, d in zip(keys, res["docs"]):
            if d.get("found"):
                out[tk] = json.dumps(d["_source"]).encode()
        return out

    def push(self, entries: dict[TenantKey, bytes]) -> None:
        if not entries:
            return
        # pre-create per DISTINCT tenant, not per key: a 10k-key batch for
        # one tenant is one exists() round trip, not 10k
        # (/root/reference/multi_elasticsearch.go:133-167 pre-creates per index)
        for tenant in {tk.tenant for tk in entries}:
            self.tenant(tenant)  # warm handle cache / tenant listing
            idx = self._index_for(tenant)
            if not self._c.indices.exists(index=idx):
                self._c.indices.create(index=idx)
        ops = []
        for tk, v in entries.items():
            ops.append({"index": {"_index": self._index_for(tk.tenant), "_id": tk.key}})
            ops.append(json.loads(v))
        _bulk_index(self._c, ops)
