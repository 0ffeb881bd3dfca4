"""iris_lama_tpu — a TPU-native 2D laser localization and mapping framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
iris-ua/iris_lama (C++14, Eigen): sparse-dense mapping, NLLS scan matching,
online SLAM, particle-filter SLAM, and graph SLAM — with particles, map
patches and pose-graph blocks laid out as sharded arrays over TPU meshes
instead of threads and pointers.
"""

__version__ = "0.1.0"
