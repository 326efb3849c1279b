"""Weighted Kabsch rigid alignment (batched, jittable).

Replaces the reference's hand-rolled device SVD + greedy Kabsch machinery
(``SiftGPU/cuda_kabsch.h:422-506``, ``cuda_svd3.h``) with a single masked
SVD-based solve on 3x3 covariances via ``jnp.linalg``; callers ``vmap`` over
image pairs. Also used for trajectory alignment in ATE RMSE
(``PoseHelper.h:35-79`` uses mLib ``EigenWrapperf::kabsch``).
"""

from __future__ import annotations

import jax.numpy as jnp

from bundlefusion_tpu.geometry.lie import _rt_to_mat


def kabsch(src, dst, weights=None):
    """Best rigid transform T with T @ src ~= dst (least squares).

    Args:
      src: [N, 3] source points.
      dst: [N, 3] target points.
      weights: optional [N] nonnegative weights (zeros mask points out).

    Returns:
      (T, residual2): 4x4 transform and mean squared residual over the
      weighted points.
    """
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.asarray(dst, jnp.float32)
    n = src.shape[0]
    if weights is None:
        weights = jnp.ones((n,), jnp.float32)
    w = weights / (jnp.sum(weights) + 1e-12)
    mu_s = jnp.sum(src * w[:, None], axis=0)
    mu_d = jnp.sum(dst * w[:, None], axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    # 3x3 cross-covariance
    H = (sc * w[:, None]).T @ dc
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.array([1.0, 1.0, 0.0], jnp.float32)) + jnp.diag(
        jnp.array([0.0, 0.0, 1.0], jnp.float32)
    ) * d
    R = Vt.T @ D @ U.T
    t = mu_d - R @ mu_s
    T = _rt_to_mat(R, t)
    res = dst - (src @ R.T + t)
    residual2 = jnp.sum(jnp.sum(res * res, axis=-1) * w)
    return T, residual2


def kabsch_condition(src, weights=None, thresh: float = 100.0):
    """Degeneracy check of the source point set, as in the reference's
    eigenvalue-ratio condition test (``cuda_kabsch.h:381-410``,
    KABSCH_CONDITION_THRESH): ratio of largest to smallest covariance
    eigenvalue must stay below ``thresh``.

    Returns (condition_ratio, ok_bool).
    """
    src = jnp.asarray(src, jnp.float32)
    n = src.shape[0]
    if weights is None:
        weights = jnp.ones((n,), jnp.float32)
    w = weights / (jnp.sum(weights) + 1e-12)
    mu = jnp.sum(src * w[:, None], axis=0)
    c = src - mu
    cov = (c * w[:, None]).T @ c
    ev = jnp.linalg.eigvalsh(cov)
    ratio = ev[2] / jnp.maximum(ev[0], 1e-12)
    return ratio, ratio < thresh
