from . import field, ec  # noqa: F401
