from . import morton, tiles  # noqa: F401
