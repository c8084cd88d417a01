"""In-memory Store / MultiStore (A21 — /root/reference/map.go,
/root/reference/multi_map.go). Used for tests and small broadcastable
lookup tables."""

from __future__ import annotations

import threading

from kasper_spark.stores.base import MultiStore, Store, TenantKey


class MapStore(Store):
    """Thread-safe dict-backed Store (/root/reference/map.go:4-64; kasper's
    is single-threaded by design, ours locks because Spark callbacks may
    run concurrently)."""

    def __init__(self) -> None:
        self._data: dict[str, bytes] = {}
        self._lock = threading.Lock()

    def get(self, key: str) -> bytes | None:
        with self._lock:
            return self._data.get(key)

    def get_all(self, keys: list[str]) -> dict[str, bytes]:
        with self._lock:
            return {k: self._data[k] for k in keys if k in self._data}

    def put(self, key: str, value: bytes) -> None:
        with self._lock:
            self._data[key] = value

    def put_all(self, kvs: dict[str, bytes]) -> None:
        with self._lock:
            self._data.update(kvs)

    def delete(self, key: str) -> None:
        with self._lock:
            self._data.pop(key, None)

    def flush(self) -> None:  # durability no-op (map.go:57-59)
        pass

    def as_dict(self) -> dict[str, bytes]:
        """GetMap() analog (/root/reference/map.go:62-64)."""
        with self._lock:
            return dict(self._data)


class MultiMapStore(MultiStore):
    """Tenant-routed in-memory stores (/root/reference/multi_map.go:6-75);
    tenants are created lazily and cached, tenant listing is sorted
    (multi_map.go:20)."""

    def __init__(self) -> None:
        self._tenants: dict[str, MapStore] = {}
        self._lock = threading.Lock()

    def tenant(self, tenant: str) -> MapStore:
        with self._lock:
            if tenant not in self._tenants:
                self._tenants[tenant] = MapStore()
            return self._tenants[tenant]

    def all_tenants(self) -> list[str]:
        with self._lock:
            return sorted(self._tenants)

    def fetch(self, keys: list[TenantKey]) -> dict[TenantKey, bytes]:
        out: dict[TenantKey, bytes] = {}
        for tk in keys:
            v = self.tenant(tk.tenant).get(tk.key)
            if v is not None:
                out[tk] = v
        return out

    def push(self, entries: dict[TenantKey, bytes]) -> None:
        for tk, v in entries.items():
            self.tenant(tk.tenant).put(tk.key, v)
