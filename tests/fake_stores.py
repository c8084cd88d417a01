"""Dict-backed fake clients for Redis and Elasticsearch, mimicking exactly
the client surface kasper_spark/stores/redis_es.py calls. They exist so the
store implementations' pipelining / mget / _bulk error-shaping / dynamic-
mapping code paths EXECUTE in a sandbox with no services — the contract
tests run against these when the live services are unreachable, and against
the real services when they are (tests/test_stores.py picks at runtime).

Fidelity notes (behaviors the fakes reproduce because the store code or the
reference's tests depend on them):
- redis: mget returns values positionally with None for misses; values are
  stored as bytes (redis-py encodes str transparently; our stores only ever
  pass bytes).
- elasticsearch: get/delete of a missing doc raise NotFoundError
  (ES_NOT_FOUND); mget returns {"docs": [...]} with per-doc `found` flags,
  in request order, supporting both the single-index (index=, ids=) and
  multi-index (docs=[{_index,_id}]) forms; bulk returns {"errors": bool,
  "items": [...]} with per-item error objects rather than raising.
- DYNAMIC MAPPING inference (/root/reference/elasticsearch_test.go:43-49):
  the first write of a field whose string value parses as an ISO date types
  that field `date` for the whole index; later writes of a non-date string
  to that field fail — a 400-style exception on single index(), a per-item
  error with a mapper_parsing_exception reason inside bulk().
"""

from __future__ import annotations

import re

from kasper_spark.stores.redis_es import ES_NOT_FOUND

_ISO_DATE = re.compile(r"^\d{4}-\d{2}-\d{2}([T ]\d{2}:\d{2}:\d{2}.*)?$")


class FakeRedis:
    """The subset of redis-py's Redis used by RedisStore/MultiRedisStore."""

    def __init__(self):
        self._d: dict[str, bytes] = {}
        self.save_calls = 0

    @staticmethod
    def _b(v) -> bytes:
        return v if isinstance(v, bytes) else str(v).encode()

    def get(self, key):
        return self._d.get(key)

    def mget(self, keys):
        return [self._d.get(k) for k in keys]

    def set(self, key, value):
        self._d[key] = self._b(value)

    def mset(self, mapping):
        for k, v in mapping.items():
            self._d[k] = self._b(v)

    def delete(self, key):
        self._d.pop(key, None)

    def save(self):
        self.save_calls += 1


class FakeBadRequestError(Exception):
    """Stands in for elasticsearch.BadRequestError (HTTP 400)."""


def _is_iso_date(v) -> bool:
    return isinstance(v, str) and bool(_ISO_DATE.match(v))


class _FakeIndices:
    def __init__(self, parent):
        self._p = parent
        self.flush_calls = 0

    def exists(self, index) -> bool:
        return index in self._p._indices

    def create(self, index) -> None:
        self._p._indices.setdefault(index, {})
        self._p._mappings.setdefault(index, {})

    def delete(self, index) -> None:
        self._p._indices.pop(index, None)
        self._p._mappings.pop(index, None)

    def flush(self, index=None) -> None:
        self.flush_calls += 1


class FakeElasticsearch:
    """The subset of elasticsearch-py's client used by the ES stores."""

    def __init__(self):
        self._indices: dict[str, dict[str, dict]] = {}
        self._mappings: dict[str, dict[str, str]] = {}
        self.indices = _FakeIndices(self)

    # -- dynamic mapping ---------------------------------------------------
    def _check_mapping(self, index: str, doc: dict) -> str | None:
        """Returns an error reason if `doc` violates the index's inferred
        field types, else records first-seen types and returns None."""
        if not isinstance(doc, dict):
            return "mapper_parsing_exception: document must be an object"
        mapping = self._mappings.setdefault(index, {})
        for field, value in doc.items():
            inferred = "date" if _is_iso_date(value) else type(value).__name__
            seen = mapping.get(field)
            if seen is None:
                mapping[field] = inferred
            elif seen == "date" and inferred != "date":
                return (
                    f"mapper_parsing_exception: failed to parse field "
                    f"[{field}] of type [date]"
                )
        return None

    def _put(self, index: str, id: str, doc: dict) -> str | None:
        reason = self._check_mapping(index, doc)
        if reason is None:
            self._indices.setdefault(index, {})[id] = doc
        return reason

    # -- document API ------------------------------------------------------
    def get(self, index, id):
        docs = self._indices.get(index, {})
        if id not in docs:
            raise ES_NOT_FOUND(f"no such doc {index}/{id}")
        return {"_id": id, "_source": docs[id]}

    def mget(self, index=None, ids=None, docs=None):
        if docs is None:
            docs = [{"_index": index, "_id": i} for i in ids]
        out = []
        for d in docs:
            idx, i = d["_index"], d["_id"]
            src = self._indices.get(idx, {}).get(i)
            out.append(
                {"_id": i, "found": src is not None}
                | ({"_source": src} if src is not None else {})
            )
        return {"docs": out}

    def index(self, index, id, document):
        reason = self._put(index, id, document)
        if reason is not None:
            raise FakeBadRequestError(reason)
        return {"result": "created"}

    def bulk(self, operations):
        items = []
        errors = False
        it = iter(operations)
        for action in it:
            assert set(action) == {"index"}, "only index actions implemented"
            doc = next(it)
            idx = action["index"]["_index"]
            id_ = action["index"]["_id"]
            reason = self._put(idx, id_, doc)
            if reason is None:
                items.append({"index": {"_id": id_, "status": 200}})
            else:
                errors = True
                items.append(
                    {"index": {"_id": id_, "status": 400, "error": {"reason": reason}}}
                )
        return {"errors": errors, "items": items}

    def delete(self, index, id):
        docs = self._indices.get(index, {})
        if id not in docs:
            raise ES_NOT_FOUND(f"no such doc {index}/{id}")
        del docs[id]
        return {"result": "deleted"}
