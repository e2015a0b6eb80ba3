from . import log, profiling  # noqa: F401
