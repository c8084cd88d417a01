# Namespace package for the kasper-spark mini-protobuf shim (see
# google/protobuf/_mini.py). Installed at the END of sys.path so any real
# protobuf installation always wins.
