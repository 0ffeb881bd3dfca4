from . import lie
from .pose import Pose2D, Pose3D

__all__ = ["lie", "Pose2D", "Pose3D"]
