"""Runtime-version gate stub: the shim has no generated-vs-runtime skew to
validate (it is built for exactly one generated module), so validation is
a no-op."""


class Domain:
    PUBLIC = 1
    GOOGLE_INTERNAL = 2


def ValidateProtobufRuntimeVersion(*_args, **_kwargs) -> None:
    return None
