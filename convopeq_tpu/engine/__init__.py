from .engine import ConvoPeqEngine  # noqa: F401
