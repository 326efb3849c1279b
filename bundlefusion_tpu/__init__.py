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

# Persistent compilation cache: the engine compiles ~10 large fused programs
# (~5 min cold on the tunneled TPU); a warm cache cuts a fresh-process start
# to seconds. jax 0.9 ignores the JAX_COMPILATION_CACHE_DIR env var (the
# config no longer reads it), so set it programmatically — config.update is
# the only path that works on this runtime (verified: 2.4 s -> 0.28 s
# second-process compile).
import os as _os

_cache_dir = _os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")
if _cache_dir:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from bundlefusion_tpu.config import AppConfig, BundlingConfig  # noqa: F401
