"""kasper-spark mini-protobuf shim: see ``_mini.py`` for scope and intent.

Only the surface pyspark's generated ``StateMessage_pb2`` module touches is
provided (descriptor / descriptor_pool / runtime_version / symbol_database
/ internal.builder). This is original code written against the public
protobuf wire-format documentation — not a copy of the protobuf runtime.
"""

__version__ = "0.0.0-kasper-mini"
