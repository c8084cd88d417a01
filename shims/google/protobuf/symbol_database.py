"""Symbol database stub: generated modules call ``Default()`` but the
state clients never use the returned registry."""


class _SymbolDatabase:
    def RegisterMessage(self, *_a, **_k):
        return None


_default = _SymbolDatabase()


def Default() -> _SymbolDatabase:
    return _default
