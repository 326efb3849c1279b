import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bundlefusion_tpu.geometry import matrix_to_pose, pose_to_matrix
from bundlefusion_tpu.geometry.camera import unproject
from bundlefusion_tpu.io.synthetic import default_intrinsics, default_scene, render_frame
from bundlefusion_tpu.ops.image import compute_normals, rgb_to_intensity
from bundlefusion_tpu.pipeline.frames import DenseCache
from bundlefusion_tpu.solver.dense_term import (
    DenseTermParams,
    build_dense_system,
    dense_matvec,
    dense_rhs,
    find_overlapping_pairs,
)
from bundlefusion_tpu.solver.gn_pcg import SolverParams, solve_bundle
from bundlefusion_tpu.solver.residuals import create_corr_store

INTR = default_intrinsics(40, 30)
PARAMS = DenseTermParams(
    overlap_min_hits=5, min_corr_per_pair=100, max_pairs=8, depth_min=0.2
)


def make_cache(poses):
    n = len(poses)
    d_l, cp_l, n_l, i_l = [], [], [], []
    for T in poses:
        d, c = render_frame(default_scene(), INTR, jnp.asarray(T, jnp.float32))
        cp = unproject(d, INTR)
        d_l.append(d)
        cp_l.append(cp)
        n_l.append(compute_normals(cp))
        i_l.append(rgb_to_intensity(c))
    return DenseCache(
        depth=jnp.stack(d_l),
        campos=jnp.stack(cp_l),
        normal=jnp.stack(n_l),
        intensity=jnp.stack(i_l),
    )


@pytest.fixture(scope="module")
def three_frames():
    poses = []
    for i in range(3):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.04 * i
        poses.append(T)
    cache = make_cache(poses)
    gt = jnp.asarray(
        np.stack([np.asarray(matrix_to_pose(jnp.asarray(T))) for T in poses])
    )
    return poses, cache, gt


def test_find_overlapping_pairs(three_frames):
    poses, cache, gt = three_frames
    pairs, mask = find_overlapping_pairs(gt, jnp.ones(3, bool), cache, INTR, PARAMS)
    m = np.asarray(mask)
    got = set(map(tuple, np.asarray(pairs)[m]))
    assert got == {(0, 1), (0, 2), (1, 2)}


def test_dense_system_zero_residual_at_gt(three_frames):
    poses, cache, gt = three_frames
    pairs, mask = find_overlapping_pairs(gt, jnp.ones(3, bool), cache, INTR, PARAMS)
    sys = build_dense_system(gt, pairs, mask, cache, INTR, PARAMS)
    assert np.asarray(sys.mask).sum() >= 2
    # at ground truth the gradient (rhs) should be ~0 relative to curvature
    b = np.asarray(dense_rhs(sys, 3))
    H_scale = max(np.abs(np.asarray(sys.H)).max(), 1e-9)
    assert np.abs(b).max() / H_scale < 0.05, (np.abs(b).max(), H_scale)


def test_dense_matvec_symmetry(three_frames):
    poses, cache, gt = three_frames
    pairs, mask = find_overlapping_pairs(gt, jnp.ones(3, bool), cache, INTR, PARAMS)
    sys = build_dense_system(gt, pairs, mask, cache, INTR, PARAMS)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 6)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(3, 6)).astype(np.float32))
    Ax = dense_matvec(sys, x, 3)
    Ay = dense_matvec(sys, y, 3)
    # symmetric PSD: <y, Ax> == <x, Ay>, <x, Ax> >= 0
    assert float(jnp.sum(y * Ax)) == pytest.approx(float(jnp.sum(x * Ay)), rel=1e-3)
    assert float(jnp.sum(x * Ax)) >= -1e-5


def test_solve_bundle_dense_only_recovers_pose(three_frames):
    """Perturb poses, no sparse corrs at all -> dense ICP term alone should
    pull the trajectory back (dense-tracking sanity)."""
    poses, cache, gt = three_frames
    empty = create_corr_store(64)
    init = np.asarray(gt).copy()
    init[1:, 3:] += np.array([[0.01, -0.008, 0.012], [-0.01, 0.012, 0.01]])
    out, stats = solve_bundle(
        jnp.asarray(init),
        jnp.ones(3, bool),
        empty,
        cache,
        INTR,
        SolverParams(num_gn=4, num_pcg=30),
        PARAMS,
    )
    err0 = np.abs(init[1:] - np.asarray(gt)[1:]).max()
    err1 = np.abs(np.asarray(out)[1:] - np.asarray(gt)[1:]).max()
    assert err1 < err0 * 0.35, (err0, err1)
