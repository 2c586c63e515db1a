from . import heatmap, decode, pnp, preprocess  # noqa: F401
