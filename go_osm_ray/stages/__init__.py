from . import assign, filters  # noqa: F401
