import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bundlefusion_tpu.geometry import (
    matrix_to_pose,
    pose_inverse,
    pose_to_matrix,
    se3_exp,
    se3_log,
    so3_exp,
    so3_log,
    transform_points,
)
from bundlefusion_tpu.geometry.lie import pose_delta


def random_rotation(rng, scale=np.pi * 0.9):
    w = rng.normal(size=3)
    w = w / np.linalg.norm(w) * rng.uniform(0, scale)
    return w


def test_so3_exp_orthonormal(rng):
    for _ in range(20):
        w = random_rotation(rng)
        R = np.asarray(so3_exp(jnp.asarray(w, jnp.float32)))
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-5)


def test_so3_log_roundtrip(rng):
    for _ in range(30):
        w = random_rotation(rng)
        R = so3_exp(jnp.asarray(w, jnp.float32))
        w2 = np.asarray(so3_log(R))
        np.testing.assert_allclose(w2, w, atol=2e-4)


def test_so3_small_angle(rng):
    w = np.array([1e-9, -1e-9, 1e-9], np.float32)
    R = np.asarray(so3_exp(jnp.asarray(w)))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)
    w2 = np.asarray(so3_log(jnp.eye(3)))
    np.testing.assert_allclose(w2, 0.0, atol=1e-5)


def test_se3_roundtrip(rng):
    for _ in range(20):
        xi = np.concatenate([random_rotation(rng, 2.5), rng.normal(size=3)])
        T = se3_exp(jnp.asarray(xi, jnp.float32))
        xi2 = np.asarray(se3_log(T))
        np.testing.assert_allclose(xi2, xi, atol=1e-3)


def test_pose_matrix_roundtrip(rng):
    for _ in range(20):
        pose = np.concatenate([random_rotation(rng), rng.normal(size=3)])
        T = pose_to_matrix(jnp.asarray(pose, jnp.float32))
        pose2 = np.asarray(matrix_to_pose(T))
        np.testing.assert_allclose(pose2, pose, atol=2e-4)


def test_pose_inverse(rng):
    pose = np.concatenate([random_rotation(rng), rng.normal(size=3)])
    T = pose_to_matrix(jnp.asarray(pose, jnp.float32))
    I = np.asarray(T @ pose_inverse(T))
    np.testing.assert_allclose(I, np.eye(4), atol=1e-5)


def test_transform_points(rng):
    pose = np.concatenate([random_rotation(rng), rng.normal(size=3)])
    T = np.asarray(pose_to_matrix(jnp.asarray(pose, jnp.float32)))
    pts = rng.normal(size=(17, 3)).astype(np.float32)
    expected = pts @ T[:3, :3].T + T[:3, 3]
    got = np.asarray(transform_points(jnp.asarray(T), jnp.asarray(pts)))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_pose_delta_identity():
    T = jnp.eye(4)
    assert float(pose_delta(T, T)) == pytest.approx(0.0, abs=1e-4)


def test_pose_delta_translation():
    Ta = jnp.eye(4)
    Tb = Ta.at[:3, 3].set(jnp.array([3.0, 0.0, 4.0]))
    assert float(pose_delta(Ta, Tb)) == pytest.approx(5.0, abs=1e-4)


def test_vmap_exp(rng):
    ws = rng.normal(size=(8, 3)).astype(np.float32)
    Rs = jax.vmap(so3_exp)(jnp.asarray(ws))
    assert Rs.shape == (8, 3, 3)
    for i in range(8):
        np.testing.assert_allclose(
            np.asarray(Rs[i]), np.asarray(so3_exp(jnp.asarray(ws[i]))), atol=1e-6
        )
