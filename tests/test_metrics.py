import numpy as np

from bundlefusion_tpu.utils.metrics import evaluate_ate_rmse


def make_traj(rng, n=50):
    poses = np.tile(np.eye(4), (n, 1, 1))
    t = np.cumsum(rng.normal(size=(n, 3)) * 0.05, axis=0)
    poses[:, :3, 3] = t
    return poses


def test_ate_identical(rng):
    gt = make_traj(rng)
    rmse, n = evaluate_ate_rmse(gt, gt)
    assert rmse < 1e-9
    assert n == 50


def test_ate_rigid_invariance(rng):
    gt = make_traj(rng)
    # apply a global rigid transform: ATE should be ~0 after alignment
    theta = 0.7
    R = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ]
    )
    est = gt.copy()
    est[:, :3, 3] = gt[:, :3, 3] @ R.T + np.array([1.0, -2.0, 0.5])
    rmse, _ = evaluate_ate_rmse(est, gt)
    assert rmse < 1e-9


def test_ate_known_error(rng):
    gt = make_traj(rng)
    est = gt.copy()
    # alternate +d/-d on x: after optimal alignment RMSE ~= d
    d = 0.02
    est[::2, 0, 3] += d
    est[1::2, 0, 3] -= d
    rmse, _ = evaluate_ate_rmse(est, gt)
    assert abs(rmse - d) < 0.005


def test_ate_skips_invalid(rng):
    gt = make_traj(rng)
    est = gt.copy()
    est[10] = np.nan  # lost frame
    rmse, n = evaluate_ate_rmse(est, gt)
    assert n == 49
    assert rmse < 1e-9
