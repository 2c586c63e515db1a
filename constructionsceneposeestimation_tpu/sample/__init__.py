from . import camera_sampler, placement, lighting  # noqa: F401
