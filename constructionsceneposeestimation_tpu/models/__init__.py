from . import backbone, pose_net  # noqa: F401
