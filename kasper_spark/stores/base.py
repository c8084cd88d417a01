"""Store interfaces — the reference's contract, typed for Python.

Semantics preserved from /root/reference/store.go:16-44:
- get returns None on miss (kasper: (nil, nil))
- get_all omits missing keys
- delete is idempotent (no error when absent)
- flush forces durability (no-op where meaningless)
- MultiStore routes per-tenant and supports one bulk fetch/push across
  tenants (TenantKey pairs)
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass


@dataclass(frozen=True)
class TenantKey:
    """(tenant, key) pair — /root/reference/store.go:9-14."""

    tenant: str
    key: str


class Store(ABC):
    """string key -> bytes value KV store (/root/reference/store.go:16-31)."""

    @abstractmethod
    def get(self, key: str) -> bytes | None: ...

    @abstractmethod
    def get_all(self, keys: list[str]) -> dict[str, bytes]: ...

    @abstractmethod
    def put(self, key: str, value: bytes) -> None: ...

    @abstractmethod
    def put_all(self, kvs: dict[str, bytes]) -> None: ...

    @abstractmethod
    def delete(self, key: str) -> None: ...

    @abstractmethod
    def flush(self) -> None: ...


class MultiStore(ABC):
    """Tenant -> Store routing with bulk ops (/root/reference/store.go:33-44)."""

    @abstractmethod
    def tenant(self, tenant: str) -> Store: ...

    @abstractmethod
    def all_tenants(self) -> list[str]: ...

    @abstractmethod
    def fetch(self, keys: list[TenantKey]) -> dict[TenantKey, bytes]: ...

    @abstractmethod
    def push(self, entries: dict[TenantKey, bytes]) -> None: ...
