from . import crossfade, streaming, telemetry  # noqa: F401
