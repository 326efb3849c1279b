import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bundlefusion_tpu.geometry import kabsch, pose_to_matrix, transform_points
from bundlefusion_tpu.geometry.kabsch import kabsch_condition


def make_rigid(rng):
    w = rng.normal(size=3)
    w = w / np.linalg.norm(w) * rng.uniform(0.1, 2.0)
    t = rng.normal(size=3)
    return np.asarray(pose_to_matrix(jnp.asarray(np.concatenate([w, t]), jnp.float32)))


def test_kabsch_exact(rng):
    for _ in range(10):
        T = make_rigid(rng)
        src = rng.normal(size=(25, 3)).astype(np.float32)
        dst = src @ T[:3, :3].T + T[:3, 3]
        T_est, res2 = kabsch(jnp.asarray(src), jnp.asarray(dst))
        np.testing.assert_allclose(np.asarray(T_est), T, atol=1e-4)
        assert float(res2) < 1e-8


def test_kabsch_weighted_ignores_outliers(rng):
    T = make_rigid(rng)
    src = rng.normal(size=(30, 3)).astype(np.float32)
    dst = src @ T[:3, :3].T + T[:3, 3]
    dst[25:] += 10.0  # gross outliers
    w = np.ones(30, np.float32)
    w[25:] = 0.0
    T_est, res2 = kabsch(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(T_est), T, atol=1e-4)
    assert float(res2) < 1e-8


def test_kabsch_noise_residual(rng):
    T = make_rigid(rng)
    src = rng.normal(size=(100, 3)).astype(np.float32)
    noise = rng.normal(size=(100, 3)).astype(np.float32) * 0.01
    dst = src @ T[:3, :3].T + T[:3, 3] + noise
    T_est, res2 = kabsch(jnp.asarray(src), jnp.asarray(dst))
    # residual ~ noise level
    assert float(res2) < 3 * (0.01**2) * 3
    np.testing.assert_allclose(np.asarray(T_est)[:3, 3], T[:3, 3], atol=0.05)


def test_kabsch_reflection_guard(rng):
    # degenerate planar points should still produce a proper rotation (det=+1)
    src = rng.normal(size=(20, 3)).astype(np.float32)
    src[:, 2] = 0.0
    T = make_rigid(rng)
    dst = src @ T[:3, :3].T + T[:3, 3]
    T_est, _ = kabsch(jnp.asarray(src), jnp.asarray(dst))
    det = float(jnp.linalg.det(T_est[:3, :3]))
    assert det == pytest.approx(1.0, abs=1e-4)


def test_kabsch_condition_degenerate(rng):
    good = rng.normal(size=(25, 3)).astype(np.float32)
    _, ok = kabsch_condition(jnp.asarray(good))
    assert bool(ok)
    # nearly collinear points -> huge eigenvalue ratio
    t = rng.normal(size=(25, 1)).astype(np.float32)
    line = t @ np.array([[1.0, 2.0, 3.0]], np.float32) + rng.normal(size=(25, 3)) * 1e-4
    ratio, ok = kabsch_condition(jnp.asarray(line.astype(np.float32)))
    assert not bool(ok)


def test_kabsch_vmap(rng):
    Ts = [make_rigid(rng) for _ in range(4)]
    srcs = rng.normal(size=(4, 25, 3)).astype(np.float32)
    dsts = np.stack([srcs[i] @ Ts[i][:3, :3].T + Ts[i][:3, 3] for i in range(4)])
    T_est, res2 = jax.vmap(kabsch)(jnp.asarray(srcs), jnp.asarray(dsts))
    assert T_est.shape == (4, 4, 4)
    for i in range(4):
        np.testing.assert_allclose(np.asarray(T_est[i]), Ts[i], atol=1e-4)


def test_kabsch_fast_matches_svd(rng):
    from bundlefusion_tpu.geometry.kabsch import kabsch_fast

    for _ in range(5):
        T = make_rigid(rng)
        src = rng.normal(size=(40, 3)).astype(np.float32)
        dst = src @ T[:3, :3].T + T[:3, 3] + rng.normal(size=(40, 3)).astype(np.float32) * 0.01
        w = rng.uniform(0.1, 1.0, size=40).astype(np.float32)
        w[30:] = 0.0
        T_svd, r_svd = kabsch(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w))
        T_fast, r_fast = kabsch_fast(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(T_fast), np.asarray(T_svd), atol=2e-3)
        assert abs(float(r_fast) - float(r_svd)) < 1e-4


def test_sym3_eigenvalues(rng):
    from bundlefusion_tpu.geometry.kabsch import sym3_eigenvalues

    for _ in range(10):
        A = rng.normal(size=(3, 3))
        A = (A + A.T).astype(np.float32)
        ev = np.asarray(sym3_eigenvalues(jnp.asarray(A)))
        ev_ref = np.linalg.eigvalsh(A)
        np.testing.assert_allclose(ev, ev_ref, atol=1e-4)
    # batched
    As = rng.normal(size=(16, 3, 3))
    As = (As + As.transpose(0, 2, 1)).astype(np.float32)
    evs = np.asarray(sym3_eigenvalues(jnp.asarray(As)))
    for i in range(16):
        np.testing.assert_allclose(evs[i], np.linalg.eigvalsh(As[i]), atol=1e-4)
