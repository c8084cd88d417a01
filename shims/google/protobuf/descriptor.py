"""Descriptor module stub: generated modules only read
``_USE_C_DESCRIPTORS`` (False selects the pure-Python post-build path,
which for this shim is a no-op beyond attribute assignment)."""

_USE_C_DESCRIPTORS = False
