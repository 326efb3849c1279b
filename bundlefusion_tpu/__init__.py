"""bundlefusion_tpu — TPU-native real-time RGB-D SLAM / dense reconstruction.

A from-scratch JAX/XLA/Pallas re-design of the BundleFusion pipeline
(Dai et al., TOG 2017; reference C++/CUDA implementation surveyed in
SURVEY.md). The compute path is jitted XLA with Pallas kernels for the
hot ops; the host runtime (IO, orchestration, scheduling) is Python/C++.

Subpackages
-----------
- ``geometry``: se(3)/so(3) Lie math, Kabsch alignment, camera models.
- ``io``: .sens / TUM RGB-D readers, PLY export, synthetic scene rendering.
- ``ops``: image ops, SIFT-style feature detection, descriptor matching,
  the match-filter cascade.
- ``tsdf``: block-sparse TSDF voxel map: allocate, integrate, de-integrate,
  raycast, marching cubes.
- ``solver``: sparse + dense bundle-adjustment Gauss-Newton/PCG.
- ``pipeline``: online orchestration — submaps, keyframes, trajectory
  management, re-integration scheduling.
- ``parallel``: multi-chip sharding of matching and global BA.
- ``utils``: timing, metrics (ATE RMSE), logging.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry (poses, Kabsch, small solves) dominates accuracy; default all
# matmuls to full float32 on TPU. Throughput-critical big matmuls (descriptor
# matching) opt back into bf16 explicitly at the call site.
_jax.config.update("jax_default_matmul_precision", "highest")

from bundlefusion_tpu.config import AppConfig, BundlingConfig  # noqa: F401
