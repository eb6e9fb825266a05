from . import eq  # noqa: F401
