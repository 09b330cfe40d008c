"""hdl_graph_slam_tpu: a TPU-native 3D LiDAR graph-SLAM framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
koide3/hdl_graph_slam (reference mounted at /root/reference): voxel
prefiltering, NDT/GICP/VGICP scan-matching odometry, RANSAC floor detection,
loop closure, and a robustified SE(3)+plane pose-graph Levenberg-Marquardt
solver, all built on fixed-shape tensors, MXU-friendly brute-force neighbor
search, and jit/vmap/shard_map.
"""

__version__ = "0.1.0"
