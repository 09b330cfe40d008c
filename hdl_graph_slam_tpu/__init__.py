"""hdl_graph_slam_tpu: a TPU-native 3D LiDAR graph-SLAM framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
koide3/hdl_graph_slam (reference mounted at /root/reference): voxel
prefiltering, NDT/GICP/VGICP scan-matching odometry, RANSAC floor detection,
loop closure, and a robustified SE(3)+plane pose-graph Levenberg-Marquardt
solver, all built on fixed-shape tensors, MXU-friendly brute-force neighbor
search, and jit/vmap/shard_map.
"""

__version__ = "0.1.0"

# Matmul precision (round-4 correctness find): the TPU MXU's DEFAULT
# precision truncates f32 operands to bf16 (8-bit mantissa). At bf16, a
# single 4x4 pose composition perturbs the rotation block by up to
# ulp(1)=2^-8 (measured det(R)=1.0055 after ONE product; compounding at
# ~0.3%/frame through a turn until the pose-graph residuals see phantom
# chi2 and the optimizer corrupts the trajectory), transform_points moves
# 50 m points by ~7 cm, and the brute-force 1-NN mis-selects ~24% of
# neighbors on 8192^2 random clouds (argmin agreement vs f32: 0.756).
#
# Policy (PERF.md round-4 post-mortem, all numbers measured on chip):
# - global default HIGH (bf16_3x): rel err ~2e-5, NN argmin agreement vs
#   true f32 = 0.9993 (near-ties only) — exactness-per-cost for the bulk
#   distance matmuls. Measured on the r5 headline bench: 410 fps at the
#   corrupt bf16 DEFAULT, ~320 at this policy, 235 at global HIGHEST —
#   correctness costs ~22%, carried deliberately. ops/knn.py pins ALL
#   NN-selection matmuls at HIGH: a round-5 attempt to run the
#   covariance-kNN selection at bf16 DEFAULT (+21 fps) degraded golden
#   course odometry 46x (0.085 -> 3.96 m ATE) — bf16 distance noise at
#   60 m coordinate scale is larger than the inter-neighbor spacing
#   (see ops/knn.py docstring);
# - pose-manifold ops pin precision=HIGHEST regardless of the global flag:
#   HIGH still drifts det(R) by 2.4e-5 per product, and pose chains compose
#   hundreds of products. Every jit-traced pose product goes through
#   se3.compose / se3.transform_points / se3.se3_oplus — the LM/odometry
#   update (registration/base.py lm_loop), the graph residual chain
#   (graph/edges.py se3_se3) and the submap base-increment chains
#   (parallel/partition.py). Bulk POINT transforms inside registration
#   residuals/association (`src.xyz @ R.T` in gicp/vgicp/icp/knn) stay at
#   the global HIGH deliberately: they are leaf products (no compounding —
#   each LM iteration recomputes them from the f32 pose), their ~2e-5
#   relative error is ~1 mm at 50 m range (two orders below the sensor
#   noise the information matrices model), and they sit on the hot
#   8192-point paths where HIGHEST costs a measurable fraction of the
#   frame;
# - the backend additionally polar-projects incoming odometry onto SO(3)
#   (backend/slam.py add_frame) so graph measurements stay orthogonal no
#   matter what produced them.
# Respect an explicit user setting; otherwise make correctness the default.
import jax as _jax

if _jax.config.jax_default_matmul_precision is None:
    _jax.config.update("jax_default_matmul_precision", "high")
del _jax
