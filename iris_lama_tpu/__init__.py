"""iris_lama_tpu — a TPU-native 2D laser localization and mapping framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
iris-ua/iris_lama (C++14, Eigen): sparse-dense mapping, NLLS scan matching,
online SLAM, particle-filter SLAM, and graph SLAM — with particles, map
patches and pose-graph blocks laid out as sharded arrays over TPU meshes
instead of threads and pointers.

Public API re-exports (import lazily-heavy modules directly if you need
only a subsystem):

    from iris_lama_tpu import Slam2D, Loc2D, PFSlam2D, GraphSlam2D, Pose2D
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy re-exports so `import iris_lama_tpu` stays light
    if name in ("Pose2D", "Pose3D"):
        from .core import pose
        return getattr(pose, name)
    if name in ("Slam2D", "Slam2DOptions"):
        from .algos import slam2d
        return getattr(slam2d, name)
    if name in ("Loc2D", "Loc2DOptions"):
        from .algos import loc2d
        return getattr(loc2d, name)
    if name in ("PFSlam2D", "PFSlam2DOptions"):
        from .algos import pf_slam2d
        return getattr(pf_slam2d, name)
    if name in ("GraphSlam2D", "GraphSlam2DOptions"):
        from .algos import graph_slam2d
        return getattr(graph_slam2d, name)
    if name == "SimplePGO":
        from .algos import simple_pgo
        return simple_pgo.SimplePGO
    if name in ("LidarOdometry2D", "LidarOdometry2DOptions"):
        from .algos import lidar_odometry_2d
        return getattr(lidar_odometry_2d, name)
    if name == "PointCloudXYZ":
        from .utils import cloud
        return cloud.PointCloudXYZ
    raise AttributeError(f"module 'iris_lama_tpu' has no attribute {name!r}")
