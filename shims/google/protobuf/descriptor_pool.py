"""Descriptor pool stub: ``AddSerializedFile`` parses the serialized
FileDescriptorProto with the mini runtime and returns a FileDescriptor
carrying the message/enum model ``internal.builder`` turns into classes."""

from google.protobuf._mini import FileDescriptor


class _Pool:
    def __init__(self):
        self._files = {}

    def AddSerializedFile(self, serialized: bytes) -> FileDescriptor:
        fd = FileDescriptor(serialized)
        self._files[id(serialized)] = fd
        return fd


_default = _Pool()


def Default() -> _Pool:
    return _default
