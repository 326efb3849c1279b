"""Track-based keyframe fusion tests (SIFTImageManager::fuseToGlobal +
computeTracks semantics, SIFTImageManager.cpp:380-476)."""

import numpy as np
import jax.numpy as jnp

from bundlefusion_tpu.geometry.camera import CameraIntrinsics
from bundlefusion_tpu.pipeline.frames import create_keyframe_store, store_keypoints
from bundlefusion_tpu.pipeline.frontend import fuse_keyframe
from bundlefusion_tpu.ops.sift import SiftKeypoints
from bundlefusion_tpu.solver.residuals import append_corrs, create_corr_store

INTR = CameraIntrinsics(fx=100.0, fy=100.0, cx=80.0, cy=60.0, width=160, height=120)


def _make_store(S, K, world_pts, poses_inv):
    """Each frame observes the same world points (projected per pose)."""
    store = create_keyframe_store(S, K)
    M = world_pts.shape[0]
    for s in range(S):
        p_cam = world_pts @ poses_inv[s][:3, :3].T + poses_inv[s][:3, 3]
        u = p_cam[:, 0] / p_cam[:, 2] * INTR.fx + INTR.cx
        v = p_cam[:, 1] / p_cam[:, 2] * INTR.fy + INTR.cy
        kp = SiftKeypoints(
            pos=jnp.asarray(np.pad(np.stack([u, v], -1), ((0, K - M), (0, 0)))),
            scale=jnp.full((K,), 3.0),
            orientation=jnp.zeros((K,)),
            response=jnp.asarray(np.pad(np.linspace(1, 2, M), (0, K - M))),
            depth=jnp.asarray(np.pad(p_cam[:, 2], (0, K - M))),
            valid=jnp.asarray(np.arange(K) < M),
            desc=jnp.asarray(
                np.pad(np.eye(M, 128, dtype=np.float32), ((0, K - M), (0, 0)))
            ),
        )
        store = store_keypoints(store, jnp.asarray(s), kp)
    return store


def test_tracks_fuse_to_one_key_per_world_point():
    S, K, M = 3, 16, 6
    rng = np.random.default_rng(0)
    world = rng.uniform(-0.3, 0.3, (M, 3)).astype(np.float32) + [0, 0, 1.5]
    poses = np.stack([np.eye(4, dtype=np.float32)] * S)
    poses[1][:3, 3] = [0.05, 0, 0]
    poses[2][:3, 3] = [0.10, 0, 0]
    poses_inv = np.stack([np.linalg.inv(p) for p in poses])
    store = _make_store(S, K, world, poses_inv)

    # corrs: key m of frame s <-> key m of frame s-1, exact geometry
    corrs = create_corr_store(256)
    for s in range(1, S):
        p_i = world @ poses_inv[s][:3, :3].T + poses_inv[s][:3, 3]
        p_j = world @ poses_inv[s - 1][:3, :3].T + poses_inv[s - 1][:3, 3]
        corrs = append_corrs(
            corrs,
            jnp.full((M,), s, jnp.int32),
            jnp.full((M,), s - 1, jnp.int32),
            jnp.asarray(p_i),
            jnp.asarray(p_j),
            jnp.ones((M,), bool),
            jnp.asarray(s * K + np.arange(M), jnp.int32),
            jnp.asarray((s - 1) * K + np.arange(M), jnp.int32),
        )

    fused = fuse_keyframe(store, corrs, jnp.asarray(poses), 0, INTR, max_out_keys=32)
    n = int(jnp.sum(fused["valid"]))
    # one fused key per track == per world point (NOT the 18-key union)
    assert n == M, n
    # averaged positions project back to the frame-0 observations
    p0 = world @ poses_inv[0][:3, :3].T + poses_inv[0][:3, 3]
    got = np.sort(np.asarray(fused["depth"])[:n])
    np.testing.assert_allclose(got, np.sort(p0[:, 2]), atol=1e-3)
    # representative descriptors are one-hot rows matching the world points
    d = np.asarray(fused["desc"].astype(jnp.float32))[:n]
    assert set(np.argmax(d, -1).tolist()) == set(range(M))


def test_high_error_corrs_join_but_do_not_contribute():
    """A corr with error > 0.03 joins the component (keys marked used) but
    its positions are excluded from the average."""
    S, K, M = 2, 8, 2
    world = np.array([[0, 0, 1.0], [0.2, 0, 1.2]], np.float32)
    poses = np.stack([np.eye(4, dtype=np.float32)] * S)
    poses_inv = poses.copy()
    store = _make_store(S, K, world, poses_inv)

    corrs = create_corr_store(64)
    # good corr for point 0
    corrs = append_corrs(
        corrs, jnp.asarray([1]), jnp.asarray([0]),
        jnp.asarray(world[:1]), jnp.asarray(world[:1]), jnp.asarray([True]),
        jnp.asarray([1 * K + 0]), jnp.asarray([0 * K + 0]),
    )
    # bad corr for point 1 (0.5 m apart under identity trajectory)
    corrs = append_corrs(
        corrs, jnp.asarray([1]), jnp.asarray([0]),
        jnp.asarray(world[1:2] + np.array([0.5, 0, 0], np.float32)),
        jnp.asarray(world[1:2]), jnp.asarray([True]),
        jnp.asarray([1 * K + 1]), jnp.asarray([0 * K + 1]),
    )
    fused = fuse_keyframe(store, corrs, jnp.asarray(poses), 0, INTR, max_out_keys=16)
    n = int(jnp.sum(fused["valid"]))
    # only the good track produces a key (bad track has no contributing pos)
    assert n == 1, n
    assert abs(float(fused["depth"][0]) - 1.0) < 1e-4
