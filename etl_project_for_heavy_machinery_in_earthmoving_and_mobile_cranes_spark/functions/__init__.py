from . import labels, text  # noqa: F401
