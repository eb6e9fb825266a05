from . import streaming, telemetry  # noqa: F401
