from . import losses, loop  # noqa: F401
