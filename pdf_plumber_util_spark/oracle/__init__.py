from . import pyref  # noqa: F401
