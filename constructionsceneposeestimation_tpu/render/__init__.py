from . import raycast, annotate, shading  # noqa: F401
