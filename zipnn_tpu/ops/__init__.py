from . import byte_group  # noqa: F401
