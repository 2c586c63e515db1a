from . import prng, profiling, viz  # noqa: F401
