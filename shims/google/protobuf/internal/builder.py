"""Builder stub: turns a parsed FileDescriptor into module-level message
classes, enum wrappers, and enum-value constants — the two calls every
protoc-generated ``*_pb2.py`` makes."""

from __future__ import annotations

from google.protobuf._mini import FileDescriptor, build_message_classes


def _descriptor_key(full_name: str, package: str) -> str:
    local = full_name[len(package) + 1 :] if package and full_name.startswith(package) else full_name
    return "_" + local.replace(".", "_").upper()


def BuildMessageAndEnumDescriptors(file_desc: FileDescriptor, module_globals) -> None:
    for mt in file_desc.message_types:
        module_globals[_descriptor_key(mt.full_name, file_desc.package)] = mt
    for et in file_desc.enum_types:
        module_globals["_" + et.name.upper()] = et


class _EnumTypeWrapper:
    def __init__(self, enum_type):
        self._enum_type = enum_type
        for name, number in enum_type.values.items():
            setattr(self, name, number)

    def Name(self, number: int) -> str:
        for name, value in self._enum_type.values.items():
            if value == number:
                return name
        raise ValueError(f"unknown enum value {number}")

    def Value(self, name: str) -> int:
        return self._enum_type.values[name]


def BuildTopDescriptorsAndMessages(
    file_desc: FileDescriptor, _module_name: str, module_globals
) -> None:
    classes = build_message_classes(file_desc)
    prefix = file_desc.package + "." if file_desc.package else ""
    for full_name, cls in classes.items():
        if full_name.startswith(prefix) and "." not in full_name[len(prefix):]:
            module_globals[cls.__name__] = cls
    for et in file_desc.enum_types:
        module_globals[et.name] = _EnumTypeWrapper(et)
        for name, number in et.values.items():
            module_globals[name] = number
