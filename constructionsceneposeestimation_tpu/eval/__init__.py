from . import metrics, pipeline  # noqa: F401
