from . import dsputil, wavio  # noqa: F401
