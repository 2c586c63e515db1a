from . import rotation, camera, transforms  # noqa: F401
