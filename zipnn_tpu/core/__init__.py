from . import dtypes, enums, header  # noqa: F401
