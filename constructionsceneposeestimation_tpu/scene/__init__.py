from . import taxonomy, assets, kinematics  # noqa: F401
